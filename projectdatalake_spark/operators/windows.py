"""Window-function surface: ranking, running aggregates, offsets, sessions.

None of these exist in the reference (SURVEY.md §2.6: no Window import
anywhere), but the idiomatic replacement for its conditional dedup is a
window (D4), and an analytics platform needs top-k/running/sessionization.
All Catalyst built-ins: a window spec costs one shuffle on its partition
keys; specs sharing keys reuse the same exchange.

Determinism note: every ordered spec used in oracle-checked queries must
order by a *unique* key suffix — within-tie row order is engine-dependent.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F


def spec(partition_by: Sequence[str | Column], order_by: Sequence[Column] | None = None) -> WindowSpec:
    w = Window.partitionBy(*partition_by)
    return w.orderBy(*order_by) if order_by else w


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — the scale-safe form of a
    correlated LIMIT: one shuffle, no driver involvement."""
    w = spec(partition_by, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def running(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    **aggs: Column,
) -> DataFrame:
    """Running aggregates over rows UNBOUNDED PRECEDING..CURRENT ROW."""
    w = spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumns({name: agg.over(w) for name, agg in aggs.items()})


def with_lag(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    offset: int = 1,
    out: str | None = None,
) -> DataFrame:
    w = spec(partition_by, order_by)
    return df.withColumn(out or f"{col}_lag", F.lag(col, offset).over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[Column] = (),
) -> DataFrame:
    """Batch sessionization: split a user's event stream where the gap to
    the previous event exceeds ``gap_seconds`` (lag + running count of
    session starts). Adds ``session_id`` (0-based per user).

    The streaming equivalent is ``F.session_window`` (streaming/events.py);
    this batch form backs oracle checks and backfills. One shuffle on
    ``user_col``; state is O(1) per row — safe at any scale.
    """
    order = [F.col(ts_col), *order_tiebreak]
    w = spec([user_col], order)
    prev = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            spec([user_col], order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def forward_fill(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    out: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward gap fill: within each partition,
    NULLs in ``col`` take the most recent non-NULL value in ``order_by``
    order (``last(..., ignorenulls=True)`` over UNBOUNDED
    PRECEDING..CURRENT ROW — ANSI ``LAST_VALUE ... IGNORE NULLS``).

    Scale: one shuffle on the partition keys, state is a single value per
    partition during the sort-based window scan — the canonical time-series
    densification primitive (pair with a spine join for fixed-grid output).
    """
    w = spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out or col, F.last(col, ignorenulls=True).over(w))


def rolling_with_halo(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    bucket: Column,
    frame_rows: int,
    aggs: dict[str, Callable[[WindowSpec], Column]],
) -> DataFrame:
    """Trailing ROWS-frame window decomposed into parallel buckets with a
    halo — the 100 TB execution of a global per-stream rolling window.

    A spec like ``PARTITION BY event_type ORDER BY ts ROWS BETWEEN n
    PRECEDING AND 1 PRECEDING`` puts each type's entire history in ONE
    task — correct, but a single straggler partition at scale. This
    operator computes the identical result embarrassingly parallel:

    1. assign each row a coarse ``bucket`` (e.g. day/week number);
    2. within (partition, bucket), the LAST ``frame_rows`` rows are
       replicated into the NEXT populated bucket as halo rows (context
       only — they emit no output);
    3. the trailing frame runs within (partition, bucket) — tasks
       parallel across buckets — and halo rows supply the cross-boundary
       context the global form would have seen.

    EXACT under one precondition: every populated bucket (except a
    partition's first) holds >= ``frame_rows`` rows, so one bucket's
    tail is the complete trailing context (equality property-tested in
    tests/test_properties.py). Sparse/empty buckets are handled — the
    halo targets the next POPULATED bucket via a dense bucket sequence
    (distinct (partition, bucket) pairs are window-ranked; that frame is
    one row per bucket, metadata-sized). Pick buckets coarse enough for
    the precondition; if a stream is so sparse that no such bucket
    exists, it is small enough for the single-task global form.

    ``aggs`` maps output column name -> (WindowSpec -> Column), e.g.
    ``{"m": lambda w: F.avg("value").over(w)}``; the frame is
    ``rowsBetween(-frame_rows, -1)`` (self-excluded trailing window).
    Cost: one tiny shuffle for the bucket sequence, one hash shuffle of
    data + halo replicas on (partition, bucket) — vs the global form's
    one shuffle on partition alone; the halo duplicates only
    frame_rows x n_buckets rows.
    """
    b = df.withColumn("__bucket", bucket.cast("long"))
    pcols = [F.col(c) for c in partition_by]

    # dense bucket sequence per partition (tiny frame: one row per
    # populated bucket) so halos skip over empty buckets
    seq_w = Window.partitionBy(*partition_by).orderBy("__bucket")
    seq = (
        b.select(*partition_by, "__bucket")
        .distinct()
        .withColumn("__seq", F.row_number().over(seq_w))
    )
    b = b.join(F.broadcast(seq), on=[*partition_by, "__bucket"])

    rev_w = (
        Window.partitionBy(*partition_by, "__seq")
        .orderBy(*[F.col(c).desc() for c in order_by])
    )
    tail = (
        b.withColumn("__rev", F.row_number().over(rev_w))
        .where(F.col("__rev") <= frame_rows)
        .drop("__rev")
        .withColumn("__seq", F.col("__seq") + 1)
        .withColumn("__halo", F.lit(True))
    )
    body = b.withColumn("__halo", F.lit(False))
    u = body.unionByName(tail)

    win = (
        Window.partitionBy(*partition_by, "__seq")
        .orderBy(*order_by)
        .rowsBetween(-frame_rows, -1)
    )
    out = u.select(
        "*", *[fn(win).alias(name) for name, fn in aggs.items()]
    )
    return out.where(~F.col("__halo")).drop("__bucket", "__seq", "__halo")
