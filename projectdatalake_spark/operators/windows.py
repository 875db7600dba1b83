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

    EXACT for EVERY bucket distribution (no populated-bucket
    precondition): each row's GLOBAL stream position is recovered as
    bucket-start offset (prefix sum over the metadata-sized bucket
    frame) + rank within its bucket (parallel across buckets), and a
    bucket's halo is exactly the ``frame_rows`` global predecessors of
    its first row — reaching across as many sparse earlier buckets as
    needed. The origin→target bucket pairs come from a self-join of the
    tiny bucket frame (one row per populated bucket), so the data-side
    join stays a plain equi-join on (partition, bucket); a row is
    replicated once per target bucket it serves (≥1 only while the
    intervening buckets hold < frame_rows rows). Equality with the
    global form is driver-hash-proven (anomaly_zscore_bucketed) and
    property-tested, including adversarially sparse buckets, in
    tests/test_properties.py.

    ``aggs`` maps output column name -> (WindowSpec -> Column), e.g.
    ``{"m": lambda w: F.avg("value").over(w)}``; the frame is
    ``rowsBetween(-frame_rows, -1)`` (self-excluded trailing window).
    Cost: one tiny shuffle for the bucket frame, one hash shuffle of
    data + halo replicas on (partition, bucket) — vs the global form's
    one shuffle on partition alone; the halo duplicates only
    ~frame_rows x n_buckets rows.
    """
    b = df.withColumn("__bucket", bucket.cast("long"))

    # per-(partition, bucket) counts → dense seq + global start offsets;
    # one row per POPULATED bucket: metadata-sized, broadcast everywhere
    seq_w = Window.partitionBy(*partition_by).orderBy("__bucket")
    seq = (
        b.groupBy(*partition_by, "__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__seq", F.row_number().over(seq_w))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    seq_w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    b = b.join(
        F.broadcast(seq.select(*partition_by, "__bucket", "__seq", "__off")),
        on=[*partition_by, "__bucket"],
    )
    in_w = Window.partitionBy(*partition_by, "__seq").orderBy(*order_by)
    b = b.withColumn("__pos", F.col("__off") + F.row_number().over(in_w))

    # origin bucket o serves target bucket t iff o's global row range
    # (off_o, off_o+cnt_o] intersects t's halo range (off_t-frame, off_t]
    # — a tiny×tiny self-join producing the (origin seq → target) pairs
    # the data equi-joins against (never a data-side range join)
    o = seq.select(
        *partition_by,
        F.col("__seq").alias("__oseq"),
        F.col("__off").alias("__ooff"),
        F.col("__cnt").alias("__ocnt"),
    )
    tgt = seq.select(
        *partition_by,
        F.col("__seq").alias("__tseq"),
        F.col("__off").alias("__toff"),
    )
    pairs = (
        o.join(tgt, on=list(partition_by))
        .where(
            (F.col("__oseq") < F.col("__tseq"))
            & (F.col("__ooff") + F.col("__ocnt") > F.col("__toff") - frame_rows)
        )
        .select(
            *partition_by,
            F.col("__oseq").alias("__seq"),
            "__tseq",
            "__toff",
        )
    )
    halo = (
        b.join(F.broadcast(pairs), on=[*partition_by, "__seq"])
        .where(
            (F.col("__pos") > F.col("__toff") - frame_rows)
            & (F.col("__pos") <= F.col("__toff"))
        )
        .drop("__seq", "__toff")
        .withColumnRenamed("__tseq", "__seq")
        .withColumn("__halo", F.lit(True))
    )
    body = b.withColumn("__halo", F.lit(False))
    u = body.unionByName(halo.select(*body.columns))

    win = (
        Window.partitionBy(*partition_by, "__seq")
        .orderBy(*order_by)
        .rowsBetween(-frame_rows, -1)
    )
    out = u.select(
        "*", *[fn(win).alias(name) for name, fn in aggs.items()]
    )
    return out.where(~F.col("__halo")).drop(
        "__bucket", "__seq", "__halo", "__off", "__pos"
    )


def holt_forecast(
    daily: DataFrame,
    key_col: str = "event_type",
    time_col: str = "d",
    val_col: str = "x",
    horizon: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt's linear-trend smoothing per key, forecasting ``horizon``
    steps ahead (see queries.ts_holt_forecast for the exactness
    contract: power-of-two alpha/beta make the recurrence bitwise
    replayable by a recursive-CTE oracle). The recurrence is sequential
    per key but keys are independent — applyInPandas runs the tight
    loop group-locally; series length is steps-per-key, never corpus
    size. Keys with < 2 observations are excluded."""
    import pandas as pd

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        xs = pdf[val_col].to_numpy()
        if len(xs) < 2:
            return pd.DataFrame(columns=[key_col, "h", "forecast"])
        l = float(xs[0])
        b = float(xs[1]) - float(xs[0])
        for t in range(1, len(xs)):
            x = float(xs[t])
            l_new = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (l_new - l) + (1.0 - beta) * b
            l = l_new
        key = pdf[key_col].iloc[0]
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": list(range(1, horizon + 1)),
                "forecast": [l + float(h) * b for h in range(1, horizon + 1)],
            }
        )

    return daily.groupBy(key_col).applyInPandas(
        holt, schema=f"{key_col} string, h int, forecast double"
    )
