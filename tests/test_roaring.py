"""Roaring bitmap codec: byte-level cross-validation vs org.roaringbitmap.

The pure-Python portable serialization (sources/roaring.py) backs Delta
deletion vectors. Its ground truth is the RoaringBitmap reference
implementation on Spark's JVM classpath (RoaringBitmap-1.3.0.jar — the
library delta-spark itself links): our bytes must be BYTE-IDENTICAL to
the JVM's no-run serialization, the JVM must deserialize our output, and
we must deserialize the JVM's output including run-optimized bitmaps."""

from __future__ import annotations

import pytest

from projectdatalake_spark.sources.roaring import (
    deserialize_rba,
    deserialize_roaring32,
    serialize_rba,
    serialize_roaring32,
    z85_decode,
    z85_encode,
)

CASES = [
    [],
    [0],
    [1, 2, 3, 70000, 70001],
    list(range(0, 10000)),                 # bitmap container (card > 4096)
    [0, 65535, 65536, (1 << 32) - 1],      # container boundaries + max uint32
    list(range(5, 100000, 7)),             # multi-container mixed
]


def _jvm_bitmap(jvm, vals):
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in vals:
        rb.add(v if v < (1 << 31) else v - (1 << 32))  # java int wraparound
    return rb


def _jvm_serialize(jvm, rb):
    bos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(bos))
    return bytes(bos.toByteArray())


@pytest.mark.parametrize("vals", CASES)
def test_byte_identical_with_reference(spark, vals):
    jvm = spark.sparkContext._jvm
    assert serialize_roaring32(vals) == _jvm_serialize(jvm, _jvm_bitmap(jvm, vals))


@pytest.mark.parametrize("vals", CASES)
def test_jvm_deserializes_ours(spark, vals):
    jvm = spark.sparkContext._jvm
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    bis = jvm.java.io.ByteArrayInputStream(bytearray(serialize_roaring32(vals)))
    rb.deserialize(jvm.java.io.DataInputStream(bis))
    assert rb.getCardinality() == len(set(vals))
    for v in list(vals)[:20]:
        assert rb.contains(v if v < (1 << 31) else v - (1 << 32))


@pytest.mark.parametrize("vals", CASES)
def test_we_deserialize_run_optimized(spark, vals):
    # runOptimize() produces the SERIAL_COOKIE format with run containers —
    # the read-side shape we must accept from foreign writers
    jvm = spark.sparkContext._jvm
    rb = _jvm_bitmap(jvm, vals)
    rb.runOptimize()
    got, _ = deserialize_roaring32(_jvm_serialize(jvm, rb))
    assert got == set(vals)


def test_rba_64bit_roundtrip():
    vals = [0, 1, (1 << 32) + 5, (1 << 33) + 7, 123456789, (1 << 40)]
    assert deserialize_rba(serialize_rba(vals)) == set(vals)
    assert deserialize_rba(serialize_rba([])) == set()


def test_z85_roundtrip_all_pads():
    import os as _os

    for n in range(0, 17):
        b = _os.urandom(n)
        enc = z85_encode(b)
        assert len(enc) % 5 == 0
        assert z85_decode(enc)[:n] == b
