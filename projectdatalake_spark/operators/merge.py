"""MERGE / upsert / SCD2 without a transactional table format.

The north star targets Delta/Iceberg tables whose MERGE INTO handles
upserts natively; those jars are absent here, so the engine provides the
classic emulation — anti-join + union for upsert, window-closed intervals
for SCD2 — over plain DataFrames. With Delta present these become thin
wrappers over ``DeltaTable.merge`` (same call sites, documented).

Scale notes: ``merge_upsert`` is one anti-join (shuffle or broadcast by
source size) + a union — no driver involvement; ``scd2_apply`` is a window
over the key — one shuffle. Both compose with dynamic partition overwrite
(sources.writers) so only touched partitions rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from projectdatalake_spark.operators.relational import join_anti


def merge_upsert(
    target: DataFrame, source: DataFrame, key: Sequence[str]
) -> DataFrame:
    """Upsert semantics of MERGE INTO: source rows win on key match,
    unmatched target rows survive. Schemas must align by name."""
    keys = list(key)
    kept = join_anti(target, source.select(*keys), keys)
    return kept.unionByName(source.select(*target.columns))


def touched_partition_filter(
    source: DataFrame,
    partition_cols: Sequence[str],
    max_partitions: int = 10_000,
) -> tuple[F.Column, list[tuple]]:
    """Predicate selecting exactly the partitions present in ``source``.

    The distinct partition tuples are collected (driver-small by contract —
    a MERGE touching more than ``max_partitions`` partitions is a full-table
    rewrite in disguise and raises instead). The returned column prunes the
    target scan to touched partitions only.
    """
    pcols = list(partition_cols)
    vals = source.select(*pcols).distinct().limit(max_partitions + 1).collect()
    if len(vals) > max_partitions:
        raise ValueError(
            f"merge source touches more than max_partitions={max_partitions} "
            "partitions; partition-scoped MERGE no longer helps — use a "
            "full-table merge_upsert + overwrite instead"
        )
    tuples = [tuple(r[c] for c in pcols) for r in vals]
    if len(pcols) == 1:
        pred = F.col(pcols[0]).isin([t[0] for t in tuples])
    else:
        pred = F.lit(False)
        for t in tuples:
            conj = F.lit(True)
            for c, v in zip(pcols, t):
                conj = conj & (F.col(c) == F.lit(v))
            pred = pred | conj
    return pred, tuples


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key: Sequence[str],
    partition_cols: Sequence[str],
    max_partitions: int = 10_000,
) -> list[tuple]:
    """Partition-scoped MERGE INTO against a hive-partitioned parquet table.

    The 100 TB upsert path absent Delta/Iceberg: a 0.1% delta must NOT
    rewrite the table. Only the partitions present in ``source`` are (a)
    read — the partition filter prunes the target scan to k partitions —
    (b) merged via the anti-join + union, and (c) rewritten, via dynamic
    partition overwrite (sources.writers.write_partitioned), which replaces
    exactly the partitions in the written frame. Untouched partition files
    are never opened or rewritten (byte-identical after the merge —
    asserted in tests/test_merge_partitioned.py).

    ``source`` must carry the partition columns with final values. Returns
    the touched partition tuples.
    """
    from projectdatalake_spark.sources.writers import write_partitioned

    pred, tuples = touched_partition_filter(source, partition_cols, max_partitions)
    target = spark.read.parquet(target_path).filter(pred)
    merged = merge_upsert(target, source.select(*target.columns), key)
    write_partitioned(merged, target_path, list(partition_cols), dynamic=True)
    return tuples


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: Sequence[str],
    effective_col: str = "effective_from",
) -> DataFrame:
    """Slowly-changing-dimension type 2: append update rows, then derive
    each version's validity interval and current flag per key.

    Output adds ``effective_to`` (next version's start, null if open) and
    ``is_current``. Both inputs must carry ``effective_col``.
    """
    keys = list(key)
    all_rows = dim.unionByName(updates.select(*dim.columns))
    w = Window.partitionBy(*keys).orderBy(F.col(effective_col))
    return all_rows.withColumn(
        "effective_to", F.lead(effective_col).over(w)
    ).withColumn("is_current", F.col("effective_to").isNull())


def scd2_apply_incremental(
    table,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> int:
    """ONE transactional SCD2 maintenance batch against a STORED history
    table (txlog/Delta — anything exposing ``snapshot()`` +
    ``merge_upsert``): the batch's keys get their CURRENT version closed
    (``end_col`` = the update's ``ts_col``, ``current_col`` = false) and
    a fresh open version appended — both through one merge commit on the
    composite (keys + ``ts_col``) identity, so readers see the old or
    the new history atomically, never a half-closed row.

    Contract: ``updates`` carries the key columns, the new attribute
    values, and ``ts_col``; each update's ``ts_col`` must be LATER than
    the key's current version, and the batch holds AT MOST ONE row per
    key (both asserted — two same-key updates would each close the same
    current row, landing two closed rows under one (keys, ts) merge
    identity and two open ``is_current`` rows). An out-of-order or
    multi-version feed needs the batch-rebuild ``scd2_apply``, or fold
    the batch to its latest row per key first. Unknown keys simply
    insert.

    100 TB: only the batch's keys move — the close-out frame is
    current-rows semi-joined to the batch, the merge rewrites only files
    holding matched rows (stats/bloom-pruned by the table), history for
    untouched keys is never read. The batch-rebuild form is O(history);
    this is O(batch)."""
    cur = table.snapshot().filter(F.col(current_col))
    upd = updates
    # O(batch) guard: a multi-version batch would silently corrupt history
    dup = (
        upd.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "SCD2 incremental apply requires at most one update per key "
            "per batch — fold the batch to its latest row per key, or "
            "use the batch rebuild (scd2_apply)"
        )
    j = cur.alias("c").join(upd.alias("u"), keys, "inner")
    bad = j.filter(
        F.col(f"u.{ts_col}") <= F.col(f"c.{ts_col}")
    ).limit(1).count()
    if bad:
        raise ValueError(
            "SCD2 incremental apply requires strictly advancing "
            f"{ts_col} per key — out-of-order feeds need the batch "
            "rebuild (scd2_apply)"
        )
    attr_cols = [
        c for c in cur.columns if c not in {*keys, ts_col, end_col, current_col}
    ]
    closed = j.select(
        *[F.col(f"c.{k}") for k in keys],
        *[F.col(f"c.{a}").alias(a) for a in attr_cols],
        F.col(f"c.{ts_col}").alias(ts_col),
        F.col(f"u.{ts_col}").alias(end_col),
        F.lit(False).alias(current_col),
    )
    fresh = upd.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(a) for a in attr_cols],
        F.col(ts_col).alias(ts_col),
        F.lit(None).cast("timestamp_ntz").alias(end_col),
        F.lit(True).alias(current_col),
    )
    return table.merge_upsert(
        closed.unionByName(fresh), keys=[*keys, ts_col]
    )
