"""Aggregate/window operator semantics + plan-shape assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from projectdatalake_spark.operators import aggregates as A, windows as W
from projectdatalake_spark.plans import physical_plan
from projectdatalake_spark.sources import load_table


def test_rollup_rowcounts(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], ["k1", "k2", "v"]
    )
    out = A.rollup(df, ["k1", "k2"], F.sum("v").alias("s"))
    # 3 leaf groups + 2 k1 subtotals + 1 grand total
    assert out.count() == 6
    grand = out.filter(F.col("k1").isNull() & F.col("k2").isNull()).collect()
    assert grand[0].s == 6


def test_cube_includes_all_combinations(spark):
    df = spark.createDataFrame([("a", "x", 1), ("b", "y", 2)], ["k1", "k2", "v"])
    out = A.cube(df, ["k1", "k2"], F.count(F.lit(1)).alias("n"))
    # 2 leaves + 2 k1 + 2 k2 + 1 grand
    assert out.count() == 7


def test_pivot_fill_zero(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "t"])
    out = A.pivot(df, "k", "t", ["a", "b"], F.count(F.lit(1)), fill=0)
    rows = {r.k: (r.a, r.b) for r in out.collect()}
    assert rows == {1: (2, 0), 2: (0, 1)}


def test_top_k_per_group_rank_boundary(spark):
    df = spark.createDataFrame(
        [("g", i, float(100 - i)) for i in range(10)], ["g", "id", "v"]
    )
    out = W.top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 3)
    assert [r.id for r in out.orderBy("rn").collect()] == [0, 1, 2]


def test_sessionize_gap_split(spark):
    # user 1: events at t=0,10,1000,1005 with gap 60 → sessions {0,10} {1000,1005}
    df = spark.createDataFrame(
        [(1, 0.0), (1, 10.0), (1, 1000.0), (1, 1005.0), (2, 5.0)], ["u", "t"]
    )
    out = W.sessionize(df, "u", "t", gap_seconds=60)
    got = {(r.u, r.t): r.session_id for r in out.collect()}
    assert got == {(1, 0.0): 0, (1, 10.0): 0, (1, 1000.0): 1, (1, 1005.0): 1, (2, 5.0): 0}


def test_snowflake_join_broadcasts_dims(spark, sf_dir):
    from projectdatalake_spark.queries import QUERIES

    df = QUERIES["multi_join_snowflake"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    plan = physical_plan(li.select("l_quantity"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_forward_fill_locf(spark):
    from pyspark.sql import functions as F

    from projectdatalake_spark.operators import windows as W

    df = spark.createDataFrame(
        [
            ("u1", 1, None), ("u1", 2, 10.0), ("u1", 3, None), ("u1", 4, 20.0),
            ("u2", 1, None), ("u2", 2, None),
        ],
        "user string, t int, v double",
    )
    out = W.forward_fill(df, "v", ["user"], [F.col("t")], out="filled")
    got = {(r.user, r.t): r.filled for r in out.collect()}
    assert got == {
        ("u1", 1): None, ("u1", 2): 10.0, ("u1", 3): 10.0, ("u1", 4): 20.0,
        ("u2", 1): None, ("u2", 2): None,
    }


def test_rolling_with_halo_equals_global_window(spark):
    """The bucketed+halo decomposition (the 100 TB execution of a
    trailing per-stream rolling window) must EQUAL the single-task
    global-window form row for row — avg, stddev and count over the
    trailing 100-event frame, on the real events corpus with 5-day
    buckets."""
    from pyspark.sql import Window
    from tests.conftest import SF_ORACLE

    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    gwin = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
    )

    def key(r):
        return (
            r.event_type,
            r.event_id,
            None if r.m is None else f"{r.m:.9g}",
            None if r.s is None else f"{r.s:.9g}",
            r.c,
        )

    global_rows = {
        key(r)
        for r in ev.select(
            "event_type",
            "event_id",
            F.avg("value").over(gwin).alias("m"),
            F.stddev_samp("value").over(gwin).alias("s"),
            F.count("value").over(gwin).alias("c"),
        ).collect()
    }
    halo_rows = {
        key(r)
        for r in W.rolling_with_halo(
            ev,
            partition_by=["event_type"],
            order_by=["ts", "event_id"],
            bucket=F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 5),
            frame_rows=100,
            aggs={
                "m": lambda w: F.avg("value").over(w),
                "s": lambda w: F.stddev_samp("value").over(w),
                "c": lambda w: F.count("value").over(w),
            },
        ).select("event_type", "event_id", "m", "s", "c").collect()
    }
    assert halo_rows == global_rows
    assert len(halo_rows) == ev.count()


def test_rolling_with_halo_sparse_buckets_exact(spark):
    """Adversarially SPARSE buckets: every bucket holds fewer rows than
    the frame, so a bucket's trailing context spans MANY earlier buckets
    (the case the one-bucket-back halo used to get wrong — round-4
    verdict carry-over #8). The decomposition must still equal the
    global window exactly, for every frame size probed."""
    from pyspark.sql import Window

    rows = []
    # key A: 2 rows in each of 12 buckets; key B: 1 row per bucket,
    # with gaps (empty buckets) thrown in
    for bkt in range(12):
        rows.append(("A", bkt * 10 + 1, float(bkt * 2)))
        rows.append(("A", bkt * 10 + 2, float(bkt * 2 + 1)))
        if bkt % 3 != 2:  # holes in B's bucket sequence
            rows.append(("B", bkt * 10 + 5, float(100 + bkt)))
    df = spark.createDataFrame(rows, "k string, t long, value double")
    for frame in (1, 3, 7, 50):
        gwin = Window.partitionBy("k").orderBy("t").rowsBetween(-frame, -1)
        want = {
            (r.k, r.t, r.c, None if r.m is None else round(r.m, 9))
            for r in df.select(
                "k", "t",
                F.count("value").over(gwin).alias("c"),
                F.avg("value").over(gwin).alias("m"),
            ).collect()
        }
        got = {
            (r.k, r.t, r.c, None if r.m is None else round(r.m, 9))
            for r in W.rolling_with_halo(
                df,
                partition_by=["k"],
                order_by=["t"],
                bucket=F.floor(F.col("t") / 10),
                frame_rows=frame,
                aggs={
                    "c": lambda w: F.count("value").over(w),
                    "m": lambda w: F.avg("value").over(w),
                },
            ).select("k", "t", "c", "m").collect()
        }
        assert got == want, f"frame={frame}"


def test_heavy_hitters_exact_candidates_and_counts(spark):
    """Two-pass exact heavy hitters: on a Zipf-ish stream split across
    partitions, the candidate/verify result must EQUAL the full global
    aggregate for every value above the N/capacity pigeonhole bound, and
    the returned counts must be exact (pass 2 recounts, never sums
    truncated partials)."""
    # value i appears (50 - i) times, i in 0..49, shuffled across 8 parts
    rows = [(f"v{i:02d}",) for i in range(50) for _ in range(50 - i)]
    df = spark.createDataFrame(rows, ["t"]).repartition(8)
    recount, total, parts = A.heavy_hitters_exact(df, "t", k=5, capacity=10)
    got = {r["value"]: r["cnt"] for r in recount.collect()}
    parts.unpersist()
    assert total == sum(50 - i for i in range(50))
    exact = {f"v{i:02d}": 50 - i for i in range(50)}
    # every candidate's count is exact
    assert all(got[v] == exact[v] for v in got)
    # completeness above the bound: anything with count > N/capacity is in
    bound = total / 10
    assert all(v in got for v, c in exact.items() if c > bound)
    # the top-5 specifically are present and correctly ordered
    top5 = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [v for v, _ in top5] == ["v00", "v01", "v02", "v03", "v04"]


def test_heavy_hitters_nulls_ignored(spark):
    """Null values never become candidates (they carry the partition-size
    sentinel rows) and don't corrupt the total."""
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",), (None,)], "t string"
    ).repartition(3)
    recount, total, parts = A.heavy_hitters_exact(df, "t", k=2, capacity=4)
    got = {r["value"]: r["cnt"] for r in recount.collect()}
    parts.unpersist()
    assert got == {"a": 2, "b": 1}
    assert total == 5  # sentinel counts rows, including nulls


def test_kmv_sketch_partition_invariant_and_accurate(spark):
    """The KMV sketch is a pure function of the SET of hashes — the
    k smallest distinct values — so it must be identical under any
    partitioning (the mergeability contract), and (k-1)/u_k must land
    within the ~1/sqrt(k) band of the true distinct count."""
    import random

    rnd = random.Random(7)
    # ~2000 distinct elements, duplicated, well-mixed hash values
    els = [(("g"), (x * 48271) % 2147483647)
           for x in rnd.sample(range(1, 3_000_000), 2000) for _ in (0, 1)]
    df = spark.createDataFrame(els, "k string, h long")
    outs = []
    for nparts in (1, 7, 32):
        row = A.kmv_sketches(df.repartition(nparts), "k", "h", 128).collect()[0]
        outs.append((row["n_seen"], tuple(row["sketch"])))
    assert outs[0] == outs[1] == outs[2]
    n_seen, sketch = outs[0]
    assert n_seen == 128 and list(sketch) == sorted(sketch)
    est = 127.0 * 2147483646.0 / sketch[-1]
    assert abs(est - 2000) / 2000 < 0.30  # 3.4 sigma at k=128


def test_hll_sketch_union_and_error(spark):
    """DataSketches HLL: sketch-of-union == union-of-sketches EXACTLY
    (mergeability — the property that lets 100 TB rollups combine stored
    partials instead of rescanning), and the estimate lands within 2% of
    exact at 200k distinct (lgK=12 → ~1.6% stderr)."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 400_000)
        .select(
            (F.col("id") % 200_000).alias("k"),
            (F.col("id") % 2).cast("int").alias("half"),
        )
    )
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k", F.lit(12))).alias("w")
    ).collect()[0]["w"]
    unioned = (
        df.groupBy("half")
        .agg(F.hll_sketch_agg("k", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"))
        .collect()[0]["u"]
    )
    assert unioned == whole
    assert abs(whole - 200_000) / 200_000 <= 0.02, whole


def test_bloom_filter_no_false_negatives_and_fpr_bound(spark):
    """Bloom membership contract: every true key passes (no false
    negatives — join semantics depend on it); the false-positive rate of
    an UNDERSIZED filter stays within ~3x the analytic (1 - e^{-kn/m})^k
    bound; and the bloom-reduced inner join equals the plain join row
    for row."""
    import math

    from projectdatalake_spark.operators import aggregates as A

    dim = spark.range(0, 2000).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 40000).select(
        (F.col("id") % 30000).alias("k"), F.col("id").alias("v")
    )
    # well-sized filter: reduction is near-exact
    bloom = A.bloom_build(dim, "k", m_bits=1 << 20, k=5)
    red = A.bloom_might_contain(fact, "k", bloom)
    true_n = fact.join(dim.distinct(), "k", "left_semi").count()
    assert red.count() >= true_n  # no false negatives, structurally
    # reduced inner join == plain inner join, exactly
    got = sorted(map(tuple, A.bloom_semi_reduce_join(fact, dim, "k").collect()))
    want = sorted(map(tuple, fact.join(dim, "k", "inner").collect()))
    assert got == want
    # undersized filter: measured FPR within 3x of theory
    m, kk, n = 1 << 14, 3, 2000
    small = A.bloom_build(dim, "k", m_bits=m, k=kk)
    red2 = A.bloom_might_contain(fact, "k", small)
    n_fact = fact.count()
    fp = red2.count() - true_n
    fpr = fp / (n_fact - true_n)
    theory = (1 - math.exp(-kk * n / m)) ** kk
    assert fpr <= 3 * theory + 0.01, (fpr, theory)
    # still zero false negatives even undersized
    missed = (
        fact.join(dim.distinct(), "k", "left_semi")
        .exceptAll(A.bloom_might_contain(fact, "k", small)
                   .join(dim.distinct(), "k", "left_semi"))
        .count()
    )
    assert missed == 0


def test_bloom_m_bits_rounds_up_to_byte_boundary(spark):
    """m_bits not divisible by 8 used to index one byte past the bitmap
    for some keys (pos >> 3 on an m_bits//8 array); bloom_build now
    rounds m_bits up to the byte boundary and carries the rounded value
    in the filter tuple so probe and build agree."""
    from projectdatalake_spark.operators import aggregates as A

    dim = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    fact = spark.range(0, 4000).select((F.col("id") % 2000).alias("k"))
    bloom = A.bloom_build(dim, "k", m_bits=(1 << 14) + 3, k=3)
    assert bloom[1] % 8 == 0 and bloom[1] >= (1 << 14) + 3
    true_n = fact.join(dim.distinct(), "k", "left_semi").count()
    red = A.bloom_might_contain(fact, "k", bloom)
    missed = (
        fact.join(dim.distinct(), "k", "left_semi")
        .exceptAll(red.join(dim.distinct(), "k", "left_semi"))
        .count()
    )
    assert missed == 0 and red.count() >= true_n
