"""Skew-handling joins: salting for hot keys.

At 100 TB a handful of hot join keys (the reference's J4 joins on
(title, artist-name) — popular songs dominate plays) can put one shuffle
partition orders of magnitude above the rest. AQE's skew-join splitting
(enabled in session.RUNTIME_CONFS) handles sort-merge skew at runtime;
explicit salting remains the tool when the build side must replicate —
e.g. a skewed fact⋈dim join that cannot broadcast, or aggregations.

``salted_join`` replicates each right-side row ``salt`` times and spreads
left rows uniformly across the salt space, so a hot key's rows land on
``salt`` partitions instead of one. Output is identical to the plain join
(tested); cost is ``salt``× the right side — use for dimension-ish right
sides only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with ``salt``-way key spreading.

    Left rows get a uniform pseudo-random salt derived from their own key
    columns + a per-row disambiguator (xxhash64 of all columns — cheap,
    deterministic); right rows are exploded across all salt values. The
    join key becomes (on…, salt), giving ``salt`` shuffle partitions per
    hot key.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join replicates the right side; right/full-outer "
            "semantics would duplicate unmatched right rows"
        )
    keys = list(on)
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__salt", salt_col)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, keys + ["__salt"], how)
    return out.drop("__salt")


def salted_groupby_count(df: DataFrame, keys: Sequence[str], salt: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys: pre-aggregate on
    (key, salt), then combine — the classic partial-combine pattern made
    explicit. (Spark's hash aggregate already partials map-side; explicit
    salting additionally splits a hot key across reducers.)"""
    keys = list(keys)
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__n").alias("n"))
