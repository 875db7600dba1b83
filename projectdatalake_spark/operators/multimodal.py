"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): treat image/audio/video as ``binary``
columns with typed metadata, and run decode / feature-extraction / chunking
as Arrow-batched operations. The media codec libraries are not available in
this container, so the decode kernels are STUBS behind an import-try: a
clearly-marked deterministic fake stands in so the Spark-side contract —
schema, batch shape, mapInPandas signature, partitioning — is real and
tested end to end. Swapping in a real decoder changes only the kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def to_binary(text: Column) -> Column:
    """Encode a string column as an opaque binary payload (stand-in for
    raw media bytes in the test corpus)."""
    return F.encode(text, "UTF-8")


def payload_metadata(payload: Column) -> dict[str, Column]:
    """Typed metadata over an opaque payload — computable without decode."""
    return {
        "n_bytes": F.octet_length(payload),
        "digest": F.md5(payload),
        "magic": F.hex(F.substring(payload, 1, 4)),
    }


def chunk_payload(payload: Column, chunk_bytes: int) -> Column:
    """Split a binary payload into fixed-size chunks (array<binary>) —
    the shuffle-safe unit for distributing large blobs.

    An empty payload yields an empty array (guarded: F.sequence(0, -1)
    would otherwise count DOWN and fabricate two phantom chunks)."""
    n_chunks = F.ceil(F.octet_length(payload) / F.lit(chunk_bytes)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return F.when(
        F.octet_length(payload) > 0,
        F.transform(
            starts, lambda i: F.substring(payload, i * chunk_bytes + 1, chunk_bytes)
        ),
    ).otherwise(F.array().cast("array<binary>"))


# --- decode kernels (Arrow-batched) ----------------------------------------
#
# Real decoders exist for the two uncompressed formats a pure-numpy parser
# can handle — BMP (24-bit BITMAPINFOHEADER) and PPM (binary P6) — plus a
# PIL path for every other format when pillow is installed on the cluster.
# Payloads in none of those categories fall back to a clearly-deterministic
# fake derived from payload size, so the pipeline never hard-fails on an
# unknown codec; it degrades to metadata-only features.

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def encode_bmp(width: int, height: int, pixel: int) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (pure stdlib): a width×height
    image with every channel byte set to ``pixel``. The writer is the test
    fixture for the real decoder — separate code paths, so a decode bug
    cannot cancel out an encode bug (both would have to invert padding,
    offsets, and row order identically)."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    data = bytes([pixel]) * (width * 3)
    pad = b"\x00" * (stride - width * 3)
    pixels = (data + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def encode_ppm(width: int, height: int, pixel: int) -> bytes:
    """Minimal binary-P6 PPM encoder (fixture twin of the PPM decoder)."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes([pixel]) * (width * height * 3)


def _decode_real(buf: bytes):
    """Parse an image payload with real (pure-numpy) codecs.

    Returns (width, height, mean_luma) — mean_luma is the mean of all RGB
    channel bytes / 255 — or None if the payload is not a supported format.
    Supported without any library: BMP (24-bit, uncompressed, bottom-up or
    top-down) and PPM (binary P6, maxval 255). With pillow importable, any
    PIL-supported format.
    """
    import re
    import struct

    import numpy as np

    if buf[:2] == b"BM" and len(buf) >= 54:
        off, = struct.unpack_from("<I", buf, 10)
        width, height = struct.unpack_from("<ii", buf, 18)
        bpp, = struct.unpack_from("<H", buf, 28)
        comp, = struct.unpack_from("<I", buf, 30)
        if bpp != 24 or comp != 0 or width <= 0 or height == 0:
            return None
        rows = abs(height)
        stride = (width * 3 + 3) // 4 * 4
        if len(buf) < off + rows * stride:
            return None
        px = np.frombuffer(buf, dtype=np.uint8, count=rows * stride, offset=off)
        px = px.reshape(rows, stride)[:, : width * 3]
        return width, rows, float(px.mean()) / 255.0
    if buf[:2] == b"P6":
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", buf[:64])
        if not m:
            return None
        width, height, maxval = (int(m.group(i)) for i in (1, 2, 3))
        if maxval != 255:
            return None
        off = m.end()
        n = width * height * 3
        if len(buf) < off + n:
            return None
        px = np.frombuffer(buf, dtype=np.uint8, count=n, offset=off)
        return width, height, float(px.mean()) / 255.0
    try:  # pragma: no cover - pillow not in this container
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(buf))
        arr = np.asarray(img.convert("RGB"))
        return int(img.width), int(img.height), float(arr.mean()) / 255.0
    except Exception:
        return None


def _fake_decode_features(n_bytes: int):
    """Deterministic fallback for undecodable payloads: metadata derived
    from payload size only. Keeps determinism, schema, and vectorization so
    pipelines over opaque/unsupported media still run end to end."""
    width = 64 + n_bytes % 192
    height = 64 + (n_bytes * 7) % 192
    mean_luma = (n_bytes % 256) / 255.0
    return width, height, mean_luma


def decode_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    Batches stream through the Python worker as pandas frames (no per-row
    pickling); output schema is fixed. BMP/PPM payloads (and any format PIL
    can read, when installed) are REALLY decoded; other payloads get the
    deterministic size-derived fake.
    """

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                decoded = _decode_real(buf)
                w, h, luma = decoded if decoded else _fake_decode_features(len(buf))
                rows.append((doc_id, len(buf), w, h, luma))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "mean_luma"]
            ).astype(
                {"n_bytes": "int32", "width": "int32", "height": "int32", "mean_luma": "float64"}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=_DECODE_SCHEMA)


def sample_frames(
    payload: Column, frame_bytes: int, every_n: int
) -> Column:
    """Frame sampling stub: treat the payload as fixed-size frames and keep
    every ``every_n``-th one (array<binary>). Real video demuxing would
    replace the fixed-stride slicing with container parsing."""
    n_frames = F.floor(F.octet_length(payload) / F.lit(frame_bytes)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return F.when(n_frames > 0, F.transform(
        idx, lambda i: F.substring(payload, i * frame_bytes + 1, frame_bytes)
    )).otherwise(F.array().cast("array<binary>"))


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
        T.StructField("thumb_bytes", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    max_side: int = 64,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched image resize (STUB kernel, real plumbing).

    The fake decode derives (w, h) from payload size exactly like
    ``decode_image_features``; the resize math (aspect-preserving clamp to
    ``max_side``) and the Arrow batch plumbing are the real algorithm.
    BMP/PPM (or PIL-readable) payloads would resize from their REAL
    dimensions via ``_decode_real``; size-derived fakes cover the rest —
    pipelines never hard-fail on an unknown codec.
    """

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                decoded = _decode_real(buf)
                w, h, _ = decoded if decoded else _fake_decode_features(len(buf))
                scale = min(1.0, max_side / max(w, h))
                out_w = max(1, int(w * scale))
                out_h = max(1, int(h * scale))
                rows.append((doc_id, out_w, out_h, scale, out_w * out_h * 3))
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "scale", "thumb_bytes"]
            ).astype({"out_w": "int32", "out_h": "int32", "scale": "float64", "thumb_bytes": "int32"})

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=_RESIZE_SCHEMA)


# --- audio (WAV/PCM): the uncompressed audio twin of the BMP/PPM path ----

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms_amplitude", T.IntegerType()),
    ]
)


def encode_wav(n_samples: int, sample_rate: int, n_channels: int, amplitude: int) -> bytes:
    """Minimal 16-bit PCM WAV encoder (pure stdlib) — the fixture twin of
    the real parser below. Samples are a ±amplitude square wave (same
    value on every channel), so RMS == amplitude exactly in integer
    arithmetic and the decode oracle needs no float tolerance."""
    import struct

    frames = []
    for i in range(n_samples):
        v = amplitude if i % 2 == 0 else -amplitude
        frames.append(struct.pack("<h", v) * n_channels)
    data = b"".join(frames)
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    header = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _parse_wav(buf: bytes):
    """REAL RIFF/WAVE parse (pure numpy): walk the chunk list, read the
    fmt block, and compute sample count + RMS from the actual PCM bytes.
    Returns (sample_rate, n_channels, n_samples, rms) or None."""
    import struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, body)
            if fmt_tag != 1 or bits != 16:
                return None
        elif cid == b"data" and rate:
            count = min(size, len(buf) - body) // 2
            px = np.frombuffer(buf, dtype="<i2", count=count, offset=body)
            n_samples = count // channels
            rms = float(np.sqrt(np.mean(px.astype(np.float64) ** 2))) if count else 0.0
            return rate, channels, n_samples, rms
        pos = body + size + (size & 1)  # RIFF chunks are 2-byte aligned
    return None


def decode_audio_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched WAV metadata extraction via mapInPandas: sample rate,
    channel count, per-channel sample count, integer duration, and RMS
    amplitude — parsed from the real bytes, not trusted metadata. Rows
    that are not parseable WAV yield NULL fields (schema stays fixed)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                meta = _parse_wav(buf)
                if meta is None:
                    rows.append((doc_id, len(buf), None, None, None, None, None))
                else:
                    rate, channels, n_samples, rms = meta
                    rows.append(
                        (doc_id, len(buf), rate, channels, n_samples,
                         n_samples * 1000 // rate, int(round(rms)))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "n_channels",
                    "n_samples", "duration_ms", "rms_amplitude",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=_AUDIO_SCHEMA)


# --- perceptual image hashing: the image rung of the dedup ladder ---------


def encode_bmp_gradient(width: int, height: int, seed: int) -> bytes:
    """24-bit BMP with a seed-parameterized GRADIENT (pixel value varies
    with x, y) — unlike the flat-color encoder, gradients give dHash
    something to hash: the same seed at ANY resolution renders the same
    pattern, which is exactly what a perceptual hash must be invariant
    to."""
    import struct

    import numpy as np

    x = np.arange(width, dtype=np.float64)[None, :] / max(1, width - 1)
    y = np.arange(height, dtype=np.float64)[:, None] / max(1, height - 1)
    # non-separable pattern on purpose: a pure f(x)+g(y) image gives a
    # dHash whose 8 rows are identical (horizontal differences cancel
    # the y term) — 8 effective bits and constant collisions
    g = (
        127.5
        + 55.0 * np.sin(2 * np.pi * (seed % 5 + 1) * x / 5 + 0.9 * seed)
        + 45.0 * np.cos(2 * np.pi * (seed % 4 + 1) * y / 4 + 0.4 * seed)
        + 45.0 * np.sin(2 * np.pi * (seed % 3 + 1) * x * y + 0.7 * seed)
    )
    px = np.clip(g, 0, 255).astype(np.uint8)
    rgb = np.repeat(px[:, :, None], 3, axis=2)
    stride = (width * 3 + 3) // 4 * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = rgb.reshape(height, width * 3)
    body = rows[::-1].tobytes()  # bottom-up, the common BMP layout
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54, 40, width, height,
        1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + body


def _decode_pixels(buf: bytes):
    """Full-pixel twin of ``_decode_real``: (width, height, HxWx3 uint8
    array) for BMP (24-bit uncompressed, bottom-up or top-down) and PPM
    (P6, maxval 255), or None for unsupported payloads."""
    import re
    import struct

    import numpy as np

    if buf[:2] == b"BM" and len(buf) >= 54:
        off, = struct.unpack_from("<I", buf, 10)
        width, height = struct.unpack_from("<ii", buf, 18)
        bpp, = struct.unpack_from("<H", buf, 28)
        comp, = struct.unpack_from("<I", buf, 30)
        if bpp != 24 or comp != 0 or width <= 0 or height == 0:
            return None
        rows = abs(height)
        stride = (width * 3 + 3) // 4 * 4
        if len(buf) < off + rows * stride:
            return None
        px = np.frombuffer(buf, dtype=np.uint8, count=rows * stride, offset=off)
        px = px.reshape(rows, stride)[:, : width * 3].reshape(rows, width, 3)
        if height > 0:
            px = px[::-1]  # bottom-up storage → top-down array
        return width, rows, px
    if buf[:2] == b"P6":
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", buf[:64])
        if not m:
            return None
        width, height, maxval = (int(m.group(i)) for i in (1, 2, 3))
        if maxval != 255:
            return None
        off = m.end()
        n = width * height * 3
        if len(buf) < off + n:
            return None
        px = np.frombuffer(buf, dtype=np.uint8, count=n, offset=off)
        return width, height, px.reshape(height, width, 3)
    return None


def _dhash64(px, grid: int = 8) -> int:
    """64-bit difference hash: grayscale → block-average to (grid,
    grid+1) → horizontal gradient sign bits. Block averaging makes the
    hash RESOLUTION-INVARIANT (the property the tests pin); the gradient
    makes it brightness/contrast-shift tolerant."""
    import numpy as np

    g = px.astype(np.float64).mean(axis=2)  # luma
    h, w = g.shape
    # area-weighted downsample to (grid, grid+1) via prefix sums — exact
    # block means for any input size, no interpolation library needed
    ys = (np.linspace(0, h, grid + 1)).astype(np.int64)
    xs = (np.linspace(0, w, grid + 2)).astype(np.int64)
    P = np.zeros((h + 1, w + 1), dtype=np.float64)
    P[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
    cells = np.empty((grid, grid + 1), dtype=np.float64)
    for i in range(grid):
        for j in range(grid + 1):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            area = max(1, (y1 - y0) * (x1 - x0))
            cells[i, j] = (
                P[y1, x1] - P[y0, x1] - P[y1, x0] + P[y0, x0]
            ) / area
    bits = (cells[:, 1:] > cells[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # surface as SIGNED 64-bit so it fits Spark's LongType
    return v - (1 << 64) if v >= (1 << 63) else v


def _phash64(px, size: int = 32, grid: int = 8) -> int:
    """64-bit PERCEPTUAL HASH (the classic pHash recipe): grayscale →
    exact area-downsample to ``size``² (prefix sums, like _dhash64) →
    2-D DCT-II (orthonormal matrix form, pure numpy) → keep the
    low-frequency ``grid``² corner → threshold each AC coefficient
    against the MEDIAN of the 63 AC terms (DC dropped). The median
    threshold makes the hash EXACTLY invariant under positive contrast
    scaling (DCT is linear: scaling multiplies every coefficient, so
    every comparison against the median is unchanged) — the property
    dHash's gradient signs only approximate; low frequencies make it
    resolution-robust."""
    import numpy as np

    g = px.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.linspace(0, h, size + 1)).astype(np.int64)
    xs = (np.linspace(0, w, size + 1)).astype(np.int64)
    P = np.zeros((h + 1, w + 1), dtype=np.float64)
    P[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
    cells = np.empty((size, size), dtype=np.float64)
    for i in range(size):
        for j in range(size):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            area = max(1, (y1 - y0) * (x1 - x0))
            cells[i, j] = (
                P[y1, x1] - P[y0, x1] - P[y1, x0] + P[y0, x0]
            ) / area
    n = size
    k = np.arange(n)
    D = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct = D @ cells @ D.T
    low = dct[:grid, :grid].flatten()[1:]  # drop DC
    med = np.median(low)
    bits = low > med
    v = 0
    for b in bits:  # 63 bits; top bit stays 0
        v = (v << 1) | int(b)
    return v


def image_phash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-image 64-bit pHash (DCT low-frequency signs, _phash64) over
    the real decoders — the frequency-domain rung of the image ladder
    next to [[image_dhash]]'s gradient rung: exactly contrast-scale
    invariant and resolution-robust; unsupported payloads get the same
    deterministic byte-hash fallback. Downstream banded Hamming dedup
    reuses ``dhash_dup_pairs`` (pass hash_col='phash').

    100 TB: 8 bytes per image, one Arrow-batched pass; joins run on the
    hash table, never payloads."""

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                dec = _decode_pixels(buf)
                if dec is None:
                    hv = int.from_bytes(
                        hashlib.md5(buf).digest()[:8], "big", signed=True
                    )
                    out.append((doc_id, hv & 0x7FFFFFFFFFFFFFFF, False))
                else:
                    _w, _h, px = dec
                    out.append((doc_id, _phash64(px), True))
            yield pd.DataFrame(
                out, columns=["doc_id", "phash", "decoded"]
            ).astype({"phash": "int64"})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="doc_id long, phash long, decoded boolean"
    )


def image_dhash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-image 64-bit dHash over the REAL decoders (BMP/PPM full-pixel
    parse; unsupported payloads get a deterministic byte-hash fallback so
    pipelines never hard-fail) — Arrow-batched numpy, no per-row Python
    boundary beyond the one kernel.

    100 TB: the hash is 8 bytes per image computed in one pass over the
    payload column; all downstream dedup joins run on the hash table,
    never the payloads."""

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                dec = _decode_pixels(buf)
                if dec is None:
                    hv = int.from_bytes(
                        hashlib.md5(buf).digest()[:8], "big", signed=True
                    )
                    out.append((doc_id, 0, 0, hv, False))
                else:
                    w, h, px = dec
                    out.append((doc_id, w, h, _dhash64(px), True))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "dhash", "decoded"]
            ).astype(
                {"width": "int32", "height": "int32", "dhash": "int64"}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        schema="doc_id long, width int, height int, dhash long, decoded boolean",
    )


def dhash_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, hash_col: str = "dhash"
) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance, BANDED: the
    64-bit hash splits into 4 x 16-bit bands; pairs within
    ``max_hamming`` <= 3 must agree exactly on >= 1 band (pigeonhole:
    3 differing bits cannot touch all 4 bands), so candidate generation
    is an equality join on (band_idx, band_value) — EXACT at this
    threshold, no recall loss. The same banding scheme as the SimHash
    text rung, applied to the image rung.

    100 TB: the join shuffles 4 small rows per image on band buckets;
    the Hamming check (xor + bit_count, codegen'd) runs only inside
    buckets. No all-pairs anywhere."""
    if max_hamming >= 4:
        raise ValueError(
            "4x16 banding is exact only for max_hamming <= 3 — add bands "
            "or accept recall loss explicitly"
        )
    bands = []
    for i in range(4):
        bands.append(
            hashes.select(
                F.col("doc_id"),
                F.col(hash_col).alias("__h"),
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(hash_col), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    left = banded.toDF("id1", "h1", "band", "band_val")
    right = banded.toDF("id2", "h2", "band", "band_val")
    cand = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "h1", "h2")
        .dropDuplicates(["id1", "id2"])
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.select(
        "id1", "id2", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# --- audio fingerprinting: the audio rung of the dedup ladder --------------


def encode_wav_tones(
    n_samples: int, sample_rate: int, freqs: tuple[float, ...], amplitude: int
) -> bytes:
    """16-bit PCM WAV of a SUM OF SINES — tonal content for the spectral
    fingerprint (the flat square-wave fixture has energy everywhere and
    fingerprints uselessly). Deterministic pure-numpy synthesis."""
    import struct

    import numpy as np

    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    sig = np.zeros_like(t)
    for f in freqs:
        sig += np.sin(2 * np.pi * f * t)
    if freqs:
        sig = sig / len(freqs)
    data = (sig * amplitude).astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    header = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _wav_samples(buf: bytes):
    """(sample_rate, mono float64 samples) via the real RIFF walk, or
    None. Multi-channel audio mixes down by mean."""
    import struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, rate, channels = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            if fmt_tag != 1 or bits != 16:
                return None
        elif cid == b"data" and rate:
            count = min(size, len(buf) - body) // 2
            px = np.frombuffer(buf, dtype="<i2", count=count, offset=body)
            n = count // channels * channels
            mono = px[:n].astype(np.float64).reshape(-1, channels).mean(axis=1)
            return rate, mono
        pos = body + size + (size & 1)
    return None


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 1024,
    hop: int = 512,
    n_bands: int = 8,
) -> DataFrame:
    """Spectral LANDMARK fingerprint (a constellation-style reduction of
    the Shazam idea, numpy rFFT only): Hann-windowed frames → magnitude
    spectrum → the peak bin in each of ``n_bands`` equal spectral bands
    → the document's fingerprint is the DISTINCT set of (band, peak-bin)
    landmarks. Amplitude-invariant by construction (argmax ignores
    global scale) and robust to appended silence (silent frames add ~no
    landmarks above the noise gate). Emits (id, sr, n_frames, landmarks
    array<int>); non-WAV payloads yield an empty landmark set.

    100 TB: one Arrow-batched pass emitting a few dozen ints per clip;
    matching is an inverted-index join on landmark values — payload
    bytes are never touched again."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                parsed = _wav_samples(bytes(buf))
                if parsed is None:
                    out.append((int(doc_id), 0, 0, []))
                    continue
                rate, x = parsed
                if len(x) < frame:
                    x = np.pad(x, (0, frame - len(x)))
                win = np.hanning(frame)
                counts: dict[int, int] = {}
                n_frames = 0
                peak_all = max(1e-9, float(np.abs(x).max()))
                for s in range(0, len(x) - frame + 1, hop):
                    seg = x[s : s + frame]
                    if float(np.abs(seg).max()) < 0.01 * peak_all:
                        continue  # silence gate: padding adds no marks
                    n_frames += 1
                    mag = np.abs(np.fft.rfft(seg * win))
                    nb = len(mag) // n_bands
                    frame_peak = float(mag.max())
                    for b in range(n_bands):
                        lo, hi = b * nb, (b + 1) * nb
                        band = mag[lo:hi]
                        # significance gate: a band holding only
                        # quantization noise has an unstable argmax —
                        # only REAL spectral peaks become landmarks
                        if float(band.max()) < 0.05 * frame_peak:
                            continue
                        m = b * 4096 + int(band.argmax())
                        counts[m] = counts.get(m, 0) + 1
                # stability gate: landmarks seen in one lone frame are
                # transients (tone/silence boundary leakage) — keep the
                # peaks the clip actually SUSTAINS
                floor = max(1, int(0.25 * n_frames))
                marks = {m for m, c in counts.items() if c >= floor}
                out.append(
                    (int(doc_id), int(rate), n_frames, sorted(marks))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "sample_rate", "n_frames", "landmarks"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        schema=(
            "doc_id long, sample_rate int, n_frames int, landmarks array<int>"
        ),
    )


def encode_wav_melody(
    sample_rate: int,
    segments: list[tuple[tuple[float, ...], int]],
    amplitude: int = 12000,
) -> bytes:
    """16-bit PCM WAV of CONSECUTIVE tone segments — time-VARYING
    spectral content, which constellation pair-hashes need (a steady
    tone has the same peaks in every frame, so every anchor-target pair
    degenerates to one hash; a melody gives each time step a distinct
    frequency transition). ``segments`` is ``[(freqs, n_samples), ...]``;
    ``((), n)`` inserts silence. Deterministic pure-numpy synthesis."""
    import struct

    import numpy as np

    parts = []
    for freqs, n in segments:
        t = np.arange(n, dtype=np.float64) / sample_rate
        sig = np.zeros_like(t)
        for f in freqs:
            sig += np.sin(2 * np.pi * f * t)
        if freqs:
            sig = sig / len(freqs)
        parts.append(sig)
    sig = np.concatenate(parts) if parts else np.zeros(0)
    data = (sig * amplitude).astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    header = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def audio_constellation(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 1024,
    hop: int = 512,
    n_bands: int = 8,
    max_dt: int = 32,
    fan_out: int = 5,
) -> DataFrame:
    """CONSTELLATION fingerprint (the Shazam anchor-target form, Wang
    2003 "An Industrial-Strength Audio Search Algorithm"): per-frame
    spectral peaks (per-band argmax, significance-gated like
    ``audio_fingerprint``) become a time-frequency point cloud; each
    anchor peak pairs with up to ``fan_out`` later peaks within
    ``max_dt`` frames, and the HASH packs (f_anchor, f_target, dt) —
    time-OFFSET-invariant by construction, which is what makes matching
    shift-robust: a clip cut seconds into the original still shares its
    pair hashes, only their anchor TIMES shift, and the voting join
    recovers that constant offset. Per-frame landmark Jaccard
    (``audio_dup_pairs``) cannot do this — its marks carry no relative
    timing. Emits one row per (clip, hash, anchor_frame).

    100 TB: one Arrow-batched pass emitting O(peaks·fan_out) ints per
    clip; matching is an equality join on the hash value — audio bytes
    are never touched again, and hashes (20 bits of freq pair + 8 bits
    of dt) spread uniformly for the shuffle."""
    # the packed hash (f1 << 18) | (f2 << 8) | dt gives dt 8 bits and
    # each frequency bin 10 — parameters outside those widths would
    # silently bleed fields into each other (colliding hashes, spurious
    # offset votes), so refuse loudly instead
    n_bins = frame // 2 + 1
    if max_dt > 255:
        raise ValueError(
            f"max_dt={max_dt} overflows the 8-bit dt field (max 255)"
        )
    if n_bins > 1024:
        raise ValueError(
            f"frame={frame} yields {n_bins} FFT bins; the 10-bit "
            "frequency fields cap at 1024 (frame <= 2046)"
        )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids_out, hashes_out, ts_out = [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                parsed = _wav_samples(bytes(buf))
                if parsed is None:
                    continue
                _rate, x = parsed
                if len(x) < frame:
                    x = np.pad(x, (0, frame - len(x)))
                win = np.hanning(frame)
                peak_all = max(1e-9, float(np.abs(x).max()))
                peaks: list[tuple[int, int]] = []  # (frame_idx, global bin)
                for s in range(0, len(x) - frame + 1, hop):
                    seg = x[s : s + frame]
                    if float(np.abs(seg).max()) < 0.01 * peak_all:
                        continue  # silence adds no peaks; t keeps ticking
                    t = s // hop
                    mag = np.abs(np.fft.rfft(seg * win))
                    nb = len(mag) // n_bands
                    frame_peak = float(mag.max())
                    for b in range(n_bands):
                        band = mag[b * nb : (b + 1) * nb]
                        # significance gate: quantization-noise bands have
                        # an unstable argmax — no real peak, no point
                        if float(band.max()) < 0.05 * frame_peak:
                            continue
                        peaks.append((t, b * nb + int(band.argmax())))
                # anchor→target pairing within the target zone, capped
                # fan-out; peaks are (t, f)-sorted so the pairing (and
                # the hash set) is deterministic
                peaks.sort()
                did = int(doc_id)
                for i, (t1, f1) in enumerate(peaks):
                    paired = 0
                    for t2, f2 in peaks[i + 1 :]:
                        dt = t2 - t1
                        if dt < 1:
                            continue  # same frame: no time transition
                        if dt > max_dt or paired >= fan_out:
                            break
                        h = (f1 << 18) | (f2 << 8) | dt
                        ids_out.append(did)
                        hashes_out.append(h)
                        ts_out.append(t1)
                        paired += 1
            yield pd.DataFrame(
                {"doc_id": ids_out, "hash": hashes_out, "t": ts_out}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="doc_id long, hash long, t int"
    )


def audio_constellation_dup_pairs(
    prints: DataFrame, min_votes: int = 20
) -> DataFrame:
    """Shift-robust audio duplicate pairs by TIME-OFFSET VOTING over
    constellation hashes: equality-join on the hash (inverted index —
    clips sharing no hash never meet), then each matching hash votes for
    offset = t_anchor1 − t_anchor2; a true duplicate — even one shifted
    by seconds — concentrates its votes at ONE offset, while chance
    hash collisions scatter across offsets. Emits (id1, id2, offset,
    votes) for the winning offset of every pair clearing ``min_votes``
    (ties break toward the smallest |offset|, then offset —
    deterministic).

    Votes count DISTINCT hashes, not occurrences: a sustained chord
    emits the same (f1, f2, dt) hash in every one of its frames, and
    occurrence-votes would let a single repeated hash fake a
    concentration (measured: a REVERSED melody — same chords, different
    order — collected 58 same-offset occurrence-votes from one note's
    repeats). Each (clip, hash) is reduced to its FIRST anchor time
    before the join; a true duplicate still aligns every distinct hash
    at the one true offset, while repeats contribute exactly one vote.

    100 TB: two shuffles on hash/pair — never all-pairs, never audio
    bytes; the vote histogram is a count over (pair, offset) grain."""
    return offset_vote_pairs(prints, min_votes)


def offset_vote_pairs(prints: DataFrame, min_votes: int) -> DataFrame:
    """Generic TIME-OFFSET VOTING matcher over (doc_id, hash, t) prints —
    the machinery both the audio constellation and the video frame-hash
    rungs share: equality-join on hash (inverted index), vote for
    ``t1 − t2`` per matching hash, keep each pair's winning offset when
    its DISTINCT-hash votes clear ``min_votes`` (each (doc, hash) is
    reduced to its first t before the join — repeats of one hash cannot
    fake a concentration). Ties break toward the smallest |offset|,
    then offset."""
    from pyspark.sql import Window

    firsts = prints.groupBy("doc_id", "hash").agg(F.min("t").alias("t"))
    a = firsts.toDF("id1", "hash", "t1")
    b = firsts.toDF("id2", "hash", "t2")
    votes = (
        a.join(b, "hash")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy(
            "id1", "id2", (F.col("t1") - F.col("t2")).alias("offset")
        )
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("id1", "id2").orderBy(
        F.col("votes").desc(), F.abs(F.col("offset")), F.col("offset")
    )
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter((F.col("r") == 1) & (F.col("votes") >= min_votes))
        .select(
            "id1", "id2",
            F.col("offset").cast("int").alias("offset"),
            F.col("votes").cast("int").alias("votes"),
        )
    )


# --- video fingerprinting: the video rung of the dedup ladder --------------


def encode_video_frames(frames: list[bytes]) -> bytes:
    """Minimal deterministic frame-sequence container ("VSEQ"): magic +
    u32 frame count + per-frame (u32 length + image bytes). A stand-in
    for real video codecs (absent in this container — the decode seam is
    the same shape either way: bytes → per-frame pixel arrays)."""
    import struct

    out = bytearray(b"VSEQ")
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def _iter_video_frames(buf: bytes):
    import struct

    if buf[:4] != b"VSEQ" or len(buf) < 8:
        return
    (n,) = struct.unpack_from("<I", buf, 4)
    pos = 8
    for _ in range(n):
        if pos + 4 > len(buf):
            return
        (ln,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if pos + ln > len(buf):
            return
        yield buf[pos : pos + ln]
        pos += ln


def video_frame_hashes(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame 64-bit dHash of a VSEQ video payload → (doc_id, hash,
    t) prints for ``offset_vote_pairs`` — the VIDEO rung of the dedup
    ladder (image rung: ``image_dhash``; audio rung:
    ``audio_constellation``). dHash is resolution-invariant (area-exact
    block means), so a re-rendered copy at a different resolution still
    matches frame for frame; a clip CUT k frames into the original
    matches at offset k via the voting join. Non-VSEQ payloads emit no
    prints.

    100 TB: one Arrow pass, 8 bytes per frame out; matching joins hash
    prints, never video bytes."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, hashes, ts = [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                for t, frame in enumerate(_iter_video_frames(bytes(buf))):
                    dec = _decode_pixels(frame)
                    if dec is None:
                        continue
                    _w, _h, px = dec
                    ids.append(int(doc_id))
                    hashes.append(_dhash64(px))
                    ts.append(t)
            yield pd.DataFrame({"doc_id": ids, "hash": hashes, "t": ts})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="doc_id long, hash long, t int"
    )


def video_dup_pairs(
    prints: DataFrame, max_hamming: int = 3, min_votes: int = 8
) -> DataFrame:
    """Shift-robust video duplicate pairs: banded-Hamming frame-hash
    matching + time-offset voting. Frame dHashes of a re-rendered copy
    (other resolution / mild re-encode) differ by a few BITS, not zero,
    so the join key is the 4×16-bit band split (pigeonhole: hamming ≤ 3
    guarantees ≥ 1 exact band — EXACT recall at d ≤ max_hamming ≤ 3,
    same guarantee as ``dhash_dup_pairs``); candidates then filter on
    true Hamming and vote for ``t1 − t2``. Votes count DISTINCT left
    hashes per (pair, offset) — a frame hash repeated across a static
    scene contributes one vote, like the audio rung's first-occurrence
    rule. A clip cut k frames in matches at offset k; a reversed clip
    (same frame SET) scatters one vote per scene and stays under
    ``min_votes``."""
    from pyspark.sql import Window

    if max_hamming > 3:
        raise ValueError(
            "4x16-band pigeonhole guarantees recall only for hamming <= 3"
        )
    firsts = prints.groupBy("doc_id", "hash").agg(F.min("t").alias("t"))
    banded = None
    for band in range(4):
        bv = F.shiftrightunsigned(F.col("hash"), band * 16).bitwiseAND(
            F.lit(0xFFFF)
        )
        piece = firsts.select(
            "doc_id", "hash", "t",
            F.lit(band).alias("band"), bv.alias("band_val"),
        )
        banded = piece if banded is None else banded.unionByName(piece)
    a = banded.toDF("id1", "h1", "t1", "band", "band_val")
    b = banded.toDF("id2", "h2", "t2", "band", "band_val")
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "h1", "h2", "t1", "t2")
        .dropDuplicates(["id1", "id2", "h1", "h2", "t1", "t2"])
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    votes = (
        cand.filter(ham <= max_hamming)
        .groupBy("id1", "id2", (F.col("t1") - F.col("t2")).alias("offset"))
        .agg(F.countDistinct("h1").alias("votes"))
    )
    w = Window.partitionBy("id1", "id2").orderBy(
        F.col("votes").desc(), F.abs(F.col("offset")), F.col("offset")
    )
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter((F.col("r") == 1) & (F.col("votes") >= min_votes))
        .select(
            "id1", "id2",
            F.col("offset").cast("int").alias("offset"),
            F.col("votes").cast("int").alias("votes"),
        )
    )


def audio_dup_pairs(fps: DataFrame, min_jaccard: float = 0.6) -> DataFrame:
    """Near-duplicate audio pairs by landmark-set Jaccard, as an
    INVERTED-INDEX join: explode landmarks, equality-join on the
    landmark value, count shared marks per pair, Jaccard from the two
    set sizes. No all-pairs comparison anywhere; clips sharing zero
    landmarks never meet."""
    sized = fps.select(
        "doc_id", F.size("landmarks").alias("n_marks"), "landmarks"
    ).filter(F.col("n_marks") > 0)
    inv = sized.select(
        "doc_id", "n_marks", F.explode("landmarks").alias("mark")
    )
    a = inv.toDF("id1", "n1", "mark")
    b = inv.toDF("id2", "n2", "mark")
    shared = (
        a.join(b, "mark")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared"))
    return shared.select(
        "id1", "id2",
        F.round(jac, 4).alias("jaccard"),
        F.col("shared").cast("int").alias("shared"),
    ).filter(jac >= min_jaccard)
