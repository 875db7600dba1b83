"""Plan-quality sweep over the whole query registry.

The engine's scale contract, enforced mechanically: no accidental
cartesian products, no row-at-a-time Python UDFs in the registry (pandas
UDFs only), and spot assertions that pushdown/broadcast happen where the
operator docstrings promise them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from projectdatalake_spark.plans import physical_plan
from projectdatalake_spark.sources import load_table

# queries whose *point* is an explicit cross/nested-loop product
CARTESIAN_OK = {"join_cross_small", "ann_topk_bruteforce"}
# streaming queries materialize via a sink — explain on the returned batch
# table says nothing about the streaming plan
SKIP = {"stream_tumbling_agg", "stream_sliding_agg", "stream_dedup_keys",
        "stream_stateful_totals"}


# The three registry-wide sweeps below share one session-scoped build of
# every query's DataFrame (conftest.query_frames) — each used to rebuild
# all ~412 frames itself, which made plan construction the single biggest
# cost of the suite (r13; see OPTIMIZATION_r13.md §pytest).


@pytest.fixture(scope="module")
def query_plans(query_frames) -> dict:
    """name → physical plan string, computed once for both plan sweeps."""
    return {
        name: physical_plan(df)
        for name, df in query_frames.items()
        if name not in SKIP
    }


def test_no_accidental_cartesian_products(query_plans):
    for name, plan in query_plans.items():
        if name in CARTESIAN_OK:
            continue
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_no_row_at_a_time_python_udfs(query_plans):
    for name, plan in query_plans.items():
        # BatchEvalPython = pickled row-at-a-time UDF; ArrowEvalPython /
        # MapInPandas / FlatMapGroupsInPandas are the sanctioned paths
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time UDF"


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ["join_inner_orders_customer", "tpch_q3_shipping", "star_fact_enrich"]:
        plan = physical_plan(entry_mod.queries()[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan}"


def test_scan_projection_pruned(spark, sf_dir):
    df = entry_mod.queries()["scan_project"](spark, sf_dir)
    plan = physical_plan(df)
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:400]


def test_partition_pruning_after_partitioned_write(spark, sf_dir, tmp_path):
    # the star-schema layout exists so analysis queries prune partitions:
    # prove a month filter reads only that month's files
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    out = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    back = spark.read.parquet(out).filter(F.col("day") == 5)
    plan = physical_plan(back)
    assert "PartitionFilters: [isnotnull(day" in plan, plan
    assert back.count() == ev.filter(F.col("day") == 5).count()


def test_aqe_splits_skewed_join(spark):
    """AQE's runtime skew handling must actually fire: a join whose
    shuffle has one dominant key (90% of rows) re-plans mid-query into
    SortMergeJoin(skew=true) with a split-and-replicated AQEShuffleRead
    — the no-salting-needed half of the skew story (operators/skew.py
    salting is the WRITE-side half for aggregations). Inspecting the
    SAME QueryExecution after the action matters: AQE finalizes the
    plan during execution."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "512k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 300_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cbo_reorders_joins_from_stats(spark):
    """Cost-based join reordering: with ANALYZE'd column stats and CBO
    on, a query WRITTEN in a bad order (fact ⋈ mid-size first, 10-row
    dim last) must be reordered so the tiny dim joins the fact FIRST —
    the smallest intermediate. This is the catalog-stats half of join
    planning (AQE handles the runtime half); at 100 TB, table/column
    stats are what let Catalyst pick build sides and orders before a
    single byte moves."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        for t in ("cbo_big", "cbo_mid", "cbo_tiny"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("m")
        ).write.mode("overwrite").saveAsTable("cbo_big")
        spark.range(0, 5_000).select(
            F.col("id").alias("m2"), (F.col("id") % 10).alias("t")
        ).write.mode("overwrite").saveAsTable("cbo_mid")
        spark.range(0, 10).select(F.col("id").alias("t2")).write.mode(
            "overwrite"
        ).saveAsTable("cbo_tiny")
        for t in ("cbo_big", "cbo_mid", "cbo_tiny"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        # deliberately bad source order: big ⋈ mid (100× fan-out) … ⋈ tiny
        q = spark.sql(
            "SELECT count(*) AS n FROM cbo_big "
            "JOIN cbo_mid ON cbo_mid.m2 = cbo_big.m "
            "JOIN cbo_tiny ON cbo_big.m = cbo_tiny.t2"
        )
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        i_tiny, i_mid = plan.index(".cbo_tiny["), plan.index(".cbo_mid[")
        assert i_tiny < i_mid, f"CBO did not reorder tiny before mid:\n{plan}"
    finally:
        for t in ("cbo_big", "cbo_mid", "cbo_tiny"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")


# Queries whose optimized plans carry a GLOBAL (partition-less) window,
# each audited to a provably bounded grain — day/bin grids, top-k heads,
# distinct-segment frames — where a single-partition window is the
# correct, bounded plan (documented in each query's docstring). Pinned
# name → count so a future unbounded global window cannot hide inside
# the "WindowExec: No Partition Defined" log noise (round-10 hygiene):
# any NEW site, or a new window at an existing site, fails this gate
# and must be either partitioned or audited onto this list.
GLOBAL_WINDOWS_OK = {
    "agg_contribution_pareto": 1,
    "curriculum_quality_phases": 1,
    "customer_rfm_segments": 3,
    "gini_customer_revenue": 1,
    "ks_test_two_sample": 1,
    "orders_backlog_running": 1,
    "pareto_frontier": 1,
    "path_trigram_top": 1,
    "survival_kaplan_meier": 2,
    "ts_stl_weekly": 2,
    # r13: the global median window over ~2.9M pairs became a two-pass
    # bucketed rank selection; the one remaining partition-less window
    # ranks only the target bucket's ~n/2048 rows (bounded grain)
    "ts_theil_sen_trend": 1,
    "txlog_incremental_topk_cdc": 1,
    "win_cumulative_distinct": 1,
    "win_rolling_median": 1,
    "zipf_slope_tokens": 1,
}


def _count_global_windows(df) -> int:
    """Global-window count from the OPTIMIZED logical plan (py4j walk:
    Window nodes with an empty partitionSpec) — the mechanical form of
    the 'No Partition Defined' warning."""

    def walk(jnode) -> int:
        n = 0
        if (
            jnode.getClass().getSimpleName() == "Window"
            and jnode.partitionSpec().isEmpty()
        ):
            n += 1
        ch = jnode.children()
        for i in range(ch.size()):
            n += walk(ch.apply(i))
        return n

    return walk(df._jdf.queryExecution().optimizedPlan())


def test_global_windows_allowlisted(query_frames):
    got = {}
    for name, df in query_frames.items():
        if name in SKIP:
            continue
        n = _count_global_windows(df)
        if n:
            got[name] = n
    assert got == GLOBAL_WINDOWS_OK, (
        "global (partition-less) windows drifted from the audited "
        f"allowlist — new: { {k: v for k, v in got.items() if GLOBAL_WINDOWS_OK.get(k) != v} }, "
        f"gone: { {k: v for k, v in GLOBAL_WINDOWS_OK.items() if got.get(k) != v} }; "
        "partition the window or audit the bounded grain into "
        "GLOBAL_WINDOWS_OK"
    )
