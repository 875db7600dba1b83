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

from pyspark.sql import DataFrame, Window, functions as F

from projectdatalake_spark.operators.relational import join_anti


def merge_upsert(
    target: DataFrame, source: DataFrame, key: Sequence[str]
) -> DataFrame:
    """Upsert semantics of MERGE INTO: source rows win on key match,
    unmatched target rows survive. Schemas must align by name."""
    keys = list(key)
    kept = join_anti(target, source.select(*keys), keys)
    return kept.unionByName(source.select(*target.columns))


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
