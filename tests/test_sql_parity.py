"""SQL front-end parity sweep (SURVEY.md §3).

The reference abandoned its SQL entry point after an EMR metastore failure
(reference README.md:44-45); this engine restores it as a PEER entry point:
``spark.sql`` over registered temp views must produce the same result as
the DataFrame-API query for the same logic. This sweep runs every
shared-ANSI oracle (SQL that parses identically in DuckDB and Spark)
verbatim through spark.sql and compares it row-for-row with its DataFrame
twin. DuckDB-vs-Spark parity for the same strings is covered by the driver
gate; this closes the triangle.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pytest

from projectdatalake_spark import queries as Q
from tests.conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Every oracle here is shared-ANSI: it runs unmodified on both DuckDB and
# Spark SQL. (Excluded: QUALIFY queries — DuckDB extension — and anything
# using epoch_ns/list_* DuckDB builtins.)
SHARED_ANSI = [
    "scan_project",
    "project_rename",
    "filter_pred_complex",
    "join_inner_orders_customer",
    "join_semi_customers_with_orders",
    "join_anti_customers_no_orders",
    "multi_join_snowflake",
    "agg_stats_by_group",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "set_union_all",
    "set_intersect",
    "set_except_all",
    "sort_limit_topk",
    "tpch_q18_large_orders",
    "win_running_sum",
    "scalar_subquery_above_avg",
    "string_functions",
    "win_rank_dense",
    "tpch_q5_local_volume",
    "tpch_q6_forecast",
    "tpch_q10_returned",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "null_handling",
    "tpch_q4_priority",
    "tpch_q7_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q12_shipmode",
    "tpch_q16_supplier_cnt",
    "tpch_q19_disjunctive",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    # round 3
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q20_part_promotion",
    "agg_regression_stats",
    "csv_roundtrip",
    "orc_roundtrip",
    "join_bucketed_colocated",
    "txlog_optimize_compact",
    "txlog_vacuum_reclaim",
    "txlog_checkpoint_read",
    "agg_bitwise",
    "safe_arithmetic",
    "scan_provenance",
    "interval_overlap_join",
    # round 4 (shared-ANSI: lead window; correlated NOT EXISTS; 3-way
    # self-join — excluded: retention_cohorts (DuckDB 3-arg datediff),
    # weighted_sample_priority ('0x'||hex CAST), list_*-based oracles)
    "event_transitions",
    "pareto_frontier",
    "graph_triangle_counts",
    # round-4 closing wave (window stddev/lag, scalar subqueries with
    # NOT IN / NOT EXISTS, plain aggregate — all shared-ANSI)
    "anomaly_rolling_zscore",
    "ewma_daily_smoothing",
    "sql_not_in_nulls",
    "source_reputation",
    "docs_reputable_sources",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"  # two Spark plans may merge float partials in
        # different orders; 9 significant digits is far beyond any real
        # divergence while absorbing last-ulp noise
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return v


def _multiset(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows, key=repr)


@pytest.fixture(scope="module")
def views(spark):
    for t in TABLES:
        Q._t(spark, SF_SMOKE, t).createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("name", SHARED_ANSI)
def test_sql_matches_dataframe_twin(views, name):
    spark = views
    sql_result = spark.sql(Q.ORACLES[name])
    df_result = Q.QUERIES[name](spark, SF_SMOKE)
    assert sorted(sql_result.columns) == sorted(df_result.columns)
    assert _multiset(sql_result) == _multiset(df_result)
