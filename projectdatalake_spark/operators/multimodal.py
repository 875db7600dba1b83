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
    the shuffle-safe unit for distributing large blobs."""
    n_chunks = F.ceil(F.octet_length(payload) / F.lit(chunk_bytes)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        starts, lambda i: F.substring(payload, i * chunk_bytes + 1, chunk_bytes)
    )


# --- decode kernels (Arrow-batched; real codec behind import-try) ----------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_decode_features(n_bytes):
    """Deterministic fake decode: metadata derived from payload size.

    Stands in for a real image decode (PIL/libvips not in this container);
    keeps every pipeline property — determinism, schema, vectorization —
    so the plumbing is fully testable.
    """
    width = 64 + n_bytes % 192
    height = 64 + (n_bytes * 7) % 192
    mean_luma = (n_bytes % 256) / 255.0
    return width, height, mean_luma


def decode_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched 'decode' + feature extraction via mapInPandas.

    Batches stream through the Python worker as pandas frames (no per-row
    pickling); output schema is fixed. With a real codec installed, the
    kernel decodes ``pdf[payload_col]`` bytes instead of the fake.
    """
    try:  # pragma: no cover - real codec not in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode intentionally stubbed: wire PIL.Image.open "
            "over io.BytesIO(payload) here when codecs are available"
        )
    except ImportError:
        pass

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int32")
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "width": (64 + n % 192).astype("int32"),
                    "height": (64 + (n * 7) % 192).astype("int32"),
                    "mean_luma": (n % 256) / 255.0,
                }
            )
            yield out

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
    ``max_side``) and the Arrow batch plumbing are the real algorithm —
    with codecs installed the kernel body swaps to PIL's
    ``Image.thumbnail`` over the actual pixels.
    """
    try:  # pragma: no cover - real codec not in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real resize intentionally stubbed: decode payload, call "
            "Image.thumbnail((max_side, max_side)), re-encode"
        )
    except ImportError:
        pass

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            w = (64 + n % 192).astype("int64")
            h = (64 + (n * 7) % 192).astype("int64")
            scale = np.minimum(1.0, max_side / np.maximum(w, h))
            out_w = np.maximum(1, np.floor(w * scale)).astype("int32")
            out_h = np.maximum(1, np.floor(h * scale)).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "out_w": out_w,
                    "out_h": out_h,
                    "scale": scale,
                    # fake thumbnail payload size: 3 bytes/pixel
                    "thumb_bytes": (out_w.astype("int64") * out_h * 3).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=_RESIZE_SCHEMA)
