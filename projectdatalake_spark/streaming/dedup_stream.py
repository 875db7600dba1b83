"""Streaming near-duplicate detection: a live corpus deduplicates
against a GROWING MinHash-LSH index, one micro-batch at a time.

The production shape for "dedup the ingest, not the warehouse": each
micro-batch (a) joins its band rows against the frozen index built by
every PRIOR batch (per-batch cost tracks the batch — the
``minhash_lsh_apply_batch`` contract), (b) appends its own band/shingle
rows to the index, and (c) emits the verified near-dup pairs it
introduced. The union of per-batch pair sets EXACTLY equals the one-shot
``minhash_lsh_pairs`` over the whole corpus (banding is deterministic
per doc; gated in tests) — streaming changes WHEN pairs are discovered,
never WHICH.

Idempotence (foreachBatch is at-least-once per batch): every write lands
in a ``batch_id=N`` subdirectory with mode=overwrite, so a replayed
batch overwrites its own partial output byte-for-byte; the index read
filters ``batch_id < current`` so a replay never sees its own crashed
attempt's rows (which would double the shingle join and duplicate
pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BANDED_SCHEMA = "doc_id long, band int, bkey long"
_SH_SCHEMA = "doc_id long, sh array<string>"
# banded-index directory buckets: batch_id=N/bq=M, bq = pmod(xxhash64(
# band, bkey), _N_BUCKETS). A batch's candidate join needs only the
# buckets its own band rows hash into, so the index read partition-prunes
# to those directories — at 100 TB raise the bucket count so each stays
# executor-sized; the pruning mechanics are identical.
_N_BUCKETS = 16


def _bucket_of(band, bkey):
    return F.pmod(F.xxhash64(band, bkey), F.lit(_N_BUCKETS)).cast("int")


def _read_indexed(
    spark,
    path: str,
    schema: str,
    before_batch: int,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Index rows from batches strictly before ``before_batch`` (replay
    safety), or an empty frame when nothing is indexed yet. ``buckets``
    (banded index only) prunes the scan to the given ``bq`` partition
    directories — candidates require (band, bkey) equality, hence equal
    bucket, so the pruning is exact.

    Only a MISSING path means "nothing indexed" — any other read failure
    (corruption, transient IO) must propagate so the micro-batch fails
    and retries; swallowing it would silently drop every cross-batch
    pair this batch owes, and the batch-id watermark means those pairs
    would never be re-derived."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return spark.createDataFrame([], schema)
    read_schema = schema + ", batch_id int"
    if buckets is not None:
        read_schema += ", bq int"
    df = (
        spark.read.option("basePath", path)
        .schema(read_schema)
        .parquet(path)
        .filter(F.col("batch_id") < before_batch)
    )
    if buckets is not None:
        df = df.filter(F.col("bq").isin(buckets)).drop("bq")
    return df.drop("batch_id")


def minhash_dedup_stream(
    docs_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    available_now: bool = True,
):
    """Start the streaming dedup query over a (doc_id, text) stream.
    Pairs land under ``pairs_dir/batch_id=N``; the index accumulates
    under ``index_dir/banded/batch_id=N/bq=M`` (bucketed — see 100 TB
    note) and ``index_dir/shingles/batch_id=N``. ``ordered=False``
    apply mode: file sources batch by discovery order, not doc id, so
    a later batch may carry smaller ids — both join directions are
    taken and pairs canonicalize to (least, greatest).

    100 TB: the recurring cost is the batch's band rows joined against
    ONLY the index buckets they hash into — the banded index lives
    bucketed on disk (``batch_id=N/bq=M``) and each micro-batch first
    derives its own band rows, collects the ≤ ``_N_BUCKETS`` touched
    bucket ids (metadata-grain), and partition-prunes the index scan to
    those directories (plan-asserted in tests). The shingle index is
    read unpruned by necessity: verification joins resolve CANDIDATE ids,
    which may live in any bucket. The corpus is never rescanned."""
    from projectdatalake_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_apply_batch,
    )

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        b_banded = b_sh = None
        try:
            # batch band rows FIRST: their bucket set drives index pruning
            b_banded, b_sh = minhash_band_index(
                batch_df, num_hashes, bands
            )
            b_banded = b_banded.withColumn(
                "bq", _bucket_of(F.col("band"), F.col("bkey"))
            ).persist()
            b_sh = b_sh.persist()
            touched = sorted(
                r.bq for r in b_banded.select("bq").distinct().collect()
            )
            banded = _read_indexed(
                spark, f"{index_dir}/banded", _BANDED_SCHEMA, batch_id,
                buckets=touched,
            )
            shingles = _read_indexed(
                spark, f"{index_dir}/shingles", _SH_SCHEMA, batch_id
            )
            pairs, _, _ = minhash_lsh_apply_batch(
                banded, shingles, batch_df, threshold,
                num_hashes=num_hashes, bands=bands, ordered=False,
                precomputed=(b_banded.drop("bq"), b_sh),
            )
            # batch-id-stamped overwrites: replays rewrite their own dirs
            pairs.write.mode("overwrite").parquet(
                f"{pairs_dir}/batch_id={batch_id}"
            )
            b_banded.write.partitionBy("bq").mode("overwrite").parquet(
                f"{index_dir}/banded/batch_id={batch_id}"
            )
            b_sh.write.mode("overwrite").parquet(
                f"{index_dir}/shingles/batch_id={batch_id}"
            )
        finally:
            batch_df.unpersist()
            for cached in (b_banded, b_sh):
                if cached is not None:
                    cached.unpersist()

    writer = docs_stream.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
