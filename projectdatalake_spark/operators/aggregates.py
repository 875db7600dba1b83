"""Aggregate surface: groupBy/agg, multidimensional grouping, pivot.

The reference contains *no* aggregation (SURVEY.md §2.4 — `max` is imported
and never used, reference etl.py:7), but its stated purpose is "song play
analysis" (reference README.md:4), so the engine exposes the standard
aggregate surface as first-class operators. All Catalyst built-ins:
hash aggregates with map-side partial aggregation, so a groupBy over 100 TB
shuffles only one partial row per (task, group), not the input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def aggregate(
    df: DataFrame, keys: Sequence[str], *aggs: Column, having: Column | None = None
) -> DataFrame:
    """groupBy().agg() with an optional HAVING filter (post-agg predicate)."""
    out = df.groupBy(*keys).agg(*aggs)
    return out.filter(having) if having is not None else out


def rollup(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Hierarchical subtotals: (k1,k2), (k1), () — one pass, one shuffle."""
    return df.rollup(*keys).agg(*aggs)


def cube(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """All grouping combinations of ``keys`` in one pass."""
    return df.cube(*keys).agg(*aggs)


def grouping_sets(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    keys: Sequence[str],
    *aggs: Column,
) -> DataFrame:
    """Explicit grouping sets (Spark 4 DataFrame API)."""
    return df.groupingSets([list(s) for s in sets], *keys).agg(*aggs)


def pivot(
    df: DataFrame,
    key: str,
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    fill: object | None = None,
) -> DataFrame:
    """Wide pivot with an explicit value list.

    Passing ``values`` matters at scale: without it Spark runs an extra
    distinct-collect job over the pivot column before planning.
    """
    out = df.groupBy(key).pivot(pivot_col, list(values)).agg(agg)
    if fill is not None:
        out = out.na.fill(fill, subset=list(values))
    return out
