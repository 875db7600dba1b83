"""Avro codec: spec byte-vectors + cross-validation against REAL Avro.

The pure-Python object-container codec (sources/avro_codec.py) backs the
Iceberg metadata layer. Its ground truth here is twofold: hand-computed
byte sequences from the public Avro spec (zigzag varints), and the
Apache Avro reference implementation itself — avro-1.12.1.jar ships on
Spark's JVM classpath, so every container we write is read back with
`org.apache.avro.file.DataFileReader`, and containers written by the JVM
library are read back with our decoder. Bytes-level interop, not
self-agreement."""

from __future__ import annotations

import json
import tempfile

import pytest

from projectdatalake_spark.sources.avro_codec import (
    _decode_long,
    _encode_long,
    read_container,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "path", "type": "string"},
        {"name": "sizes", "type": ["null", {"type": "map", "values": "long"}], "default": None},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "nested", "type": ["null", {
            "type": "record", "name": "inner",
            "fields": [{"name": "a", "type": "double"}, {"name": "b", "type": "boolean"}],
        }], "default": None},
    ],
}

RECORDS = [
    {"status": 1, "snapshot_id": 1 << 55, "path": "s3://bucket/a=1/f.parquet",
     "sizes": {"c1": 10, "c2": 1 << 40}, "tags": ["x", "y"],
     "nested": {"a": 3.5, "b": True}},
    {"status": 2, "snapshot_id": None, "path": "relative.parquet",
     "sizes": None, "tags": [], "nested": None},
    {"status": 0, "snapshot_id": -7, "path": "", "sizes": {}, "tags": ["z"],
     "nested": {"a": -0.25, "b": False}},
]


def test_zigzag_spec_vectors():
    # the exact examples from the Avro specification's encoding table
    import io

    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
               -64: b"\x7f", 64: b"\x80\x01"}
    for n, b in vectors.items():
        assert _encode_long(n) == b
        assert _decode_long(io.BytesIO(b)) == n
    for n in (1 << 62, -(1 << 62), 123456789012345):
        import io as _io

        assert _decode_long(_io.BytesIO(_encode_long(n))) == n


def test_self_roundtrip():
    data = write_container(SCHEMA, RECORDS)
    schema, records = read_container(data)
    assert schema == SCHEMA
    assert records == RECORDS


def test_empty_container():
    data = write_container(SCHEMA, [])
    _, records = read_container(data)
    assert records == []


def test_jvm_avro_reads_our_container(spark):
    jvm = spark.sparkContext._jvm
    data = write_container(SCHEMA, RECORDS)
    f = tempfile.NamedTemporaryFile(suffix=".avro", delete=False)
    f.write(data)
    f.close()
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(f.name), reader)
    got = []
    while dfr.hasNext():
        got.append(str(dfr.next()))
    # the JVM reader exposes the writer schema it parsed from our metadata
    parsed_name = json.loads(str(dfr.getSchema().toString()))["name"]
    dfr.close()
    assert len(got) == len(RECORDS)
    assert str(1 << 55) in got[0] and "s3://bucket/a=1/f.parquet" in got[0]
    assert '"snapshot_id": null' in got[1]
    assert parsed_name == "entry"


def test_we_read_jvm_avro_container(spark):
    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    out = tempfile.NamedTemporaryFile(suffix=".avro", delete=False)
    out.close()
    dfw.create(schema, jvm.java.io.File(out.name))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("status", 7)
    # py4j sends int32-sized Python ints as java Integer, which Avro's
    # ["null","long"] union rejects — use a value that forces a Long
    rec.put("snapshot_id", 99 + (1 << 40))
    rec.put("path", "jvm.parquet")
    tags = jvm.java.util.ArrayList()
    tags.add("t1")
    rec.put("tags", tags)
    dfw.append(rec)
    dfw.close()
    _, records = read_container(open(out.name, "rb").read())
    assert records == [
        {"status": 7, "snapshot_id": 99 + (1 << 40), "path": "jvm.parquet",
         "sizes": None, "tags": ["t1"], "nested": None}
    ]


def test_unsupported_codec_refused():
    data = bytearray(write_container(SCHEMA, RECORDS))
    # corrupt the codec entry: rewrite container with a fake codec
    from projectdatalake_spark.sources.avro_codec import _MAGIC

    bad = write_container(SCHEMA, [], extra_meta={"avro.codec": b"deflate"})
    with pytest.raises(ValueError, match="codec"):
        read_container(bad)
    assert bytes(data[:4]) == _MAGIC
