"""As-of (temporal nearest-match) joins.

Not present in the reference (SURVEY.md §2.3 'not present'), but essential
for its event-log domain (enrich each event with the most recent dimension
state). Spark has no native ASOF JOIN, so the engine provides two
implementations with different scale envelopes:

- ``asof_join``: declarative range-join + window pick. Catalyst plans the
  equi conjunct as a hash join; the range residual multiplies matches, and
  a per-left-row window keeps the nearest. Right-sized when the per-key
  match fan-out is modest (dimension history tables).
- ``asof_join_grouped``: cogrouped Arrow path running ``pandas.merge_asof``
  per key group — linear in group size after the shuffle, the better plan
  when fan-out is large. Requires per-key data to fit an executor (salt or
  time-bucket the key if it cannot).

Both produce identical results (tested); both shuffle each side once on the
by-key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    left_keys: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' = smallest
    >=) within the same by-key. Unmatched left rows survive with nulls
    (left-outer semantics, like the reference's J4 soft FKs).

    ``left_keys`` must uniquely identify left rows (window partition).
    Ties on ``right_ts`` break by the right row with the highest sort order
    of all its columns — callers wanting a specific tiebreak should ensure
    ``right_ts`` is unique per by-key.

    direction='nearest' picks the right row minimizing |right_ts −
    left_ts| in either direction (equidistant pairs prefer the EARLIER
    right row — backward, matching pandas merge_asof). It drops the
    range predicate, so the per-key join is a full per-key product
    before the window; right-sized for dimension-sized right sides —
    use asof_join_grouped (merge_asof does 'nearest' natively, linear)
    when both sides are large.
    """

    def _as_num(name: str, df_: DataFrame):
        dtype = dict(df_.dtypes).get(name, "")
        c = F.col(name)
        if dtype == "timestamp_ntz":
            # epoch micros from the WALL-CLOCK fields: a cast through the
            # session TZ would shift two ntz values straddling a DST
            # transition by different offsets, skewing |distance| by up
            # to an hour and picking the wrong nearest row
            day = F.datediff(
                F.to_date(c), F.lit("1970-01-01").cast("date")
            ).cast("long")
            sec = F.date_part(F.lit("SECOND"), c)  # µs-fraction decimal
            return (
                day * F.lit(86_400_000_000)
                + F.hour(c).cast("long") * F.lit(3_600_000_000)
                + F.minute(c).cast("long") * F.lit(60_000_000)
                + (sec * F.lit(1_000_000)).cast("long")
            ).cast("double")
        if dtype.startswith("timestamp"):
            return F.unix_micros(c).cast("double")
        if dtype == "date":
            return F.unix_date(c).cast("double")
        return c.cast("double")

    if direction == "backward":
        range_cond = F.col(right_ts) <= F.col(left_ts)
        order = [F.col(right_ts).desc_nulls_last()]
    elif direction == "forward":
        range_cond = F.col(right_ts) >= F.col(left_ts)
        order = [F.col(right_ts).asc_nulls_last()]
    elif direction == "nearest":
        range_cond = F.lit(True)
        dist = F.abs(_as_num(left_ts, left) - _as_num(right_ts, right))
        order = [dist.asc_nulls_last(), F.col(right_ts).asc_nulls_last()]
    else:
        raise ValueError(f"unknown direction: {direction}")

    joined = left.join(
        right, (F.col(by_left) == F.col(by_right)) & range_cond, "left"
    )
    w = Window.partitionBy(*[F.col(k) for k in left_keys]).orderBy(*order)
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    direction: str = "backward",
    right_tiebreak: Sequence[str] = (),
    n_buckets: int = 64,
) -> DataFrame:
    """Arrow-vectorized as-of join: cogroup both sides on HASH BUCKETS of
    the by-key and run one ``pandas.merge_asof(by=key)`` per bucket. One
    shuffle per side; no row explosion — the linear-fan-out plan for
    power-law by-keys, where the declarative ``asof_join`` range join
    would explode candidates before its window.

    Bucketing matters: cogrouping on the raw key runs one Python kernel
    invocation per key (~10 ms fixed overhead each — 2000 keys cost ~18 s
    regardless of data volume); ``n_buckets`` hash buckets amortize that
    to ``n_buckets`` invocations, with merge_asof's ``by=`` doing the
    per-key matching vectorized inside the batch (measured 18.3 s → 1.6 s
    on 100k events × 150k orders). Size ``n_buckets`` ≈ cluster cores.

    ``right_tiebreak``: columns that order rows sharing the same
    ``right_ts`` — the match picks the greatest tiebreak value (matching a
    ``row_number() OVER (ORDER BY ts DESC, tiebreak DESC) = 1`` pick).
    Without it, ties resolve by input order (nondeterministic under
    shuffles).
    """
    import pandas as pd

    left_cols = left.schema
    right_cols = [f for f in right.schema if f.name != by_right]
    out_schema = type(left_cols)(list(left_cols) + list(right_cols))

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            for f in right_cols:
                lpdf[f.name] = None
            out = lpdf
        else:
            # ascending (ts, tiebreak) sort: merge_asof takes the LAST
            # matching row per by-key, i.e. greatest ts then greatest
            # tiebreak — deterministic
            rpdf = rpdf.sort_values([right_ts, *right_tiebreak], kind="mergesort")
            out = pd.merge_asof(
                lpdf,
                rpdf,
                left_on=left_ts,
                right_on=right_ts,
                left_by=by_left,
                right_by=by_right,
                direction=direction,
            ).drop(columns=[by_right])
        # unmatched rows surface as NaN even in integer columns; hand Arrow
        # explicit Nones so non-float output fields convert cleanly
        for f in right_cols:
            col = out[f.name]
            if col.isna().any():
                out[f.name] = col.astype("object").where(col.notna(), None)
        return out

    lb = left.groupBy(F.pmod(F.hash(F.col(by_left)), F.lit(n_buckets)))
    rb = right.groupBy(F.pmod(F.hash(F.col(by_right)), F.lit(n_buckets)))
    return lb.cogroup(rb).applyInPandas(lambda _key, l, r: merge(l, r), schema=out_schema)
