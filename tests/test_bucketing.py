"""Bucketed co-located joins: the write-once/shuffle-never layout.

At 100 TB the dominant cost of a repeated fact-fact join is the shuffle;
bucketing both tables on the join key moves that shuffle to write time.
These tests assert the physical property, not just the result: a join of
two co-bucketed tables must contain NO shuffle exchange, and bucket-count
mismatches must still produce correct results (Spark shuffles the
mismatched side only).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from projectdatalake_spark.sources.readers import load_table
from projectdatalake_spark.sources.writers import write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the shuffle-vs-bucket choice is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        j.write.format("noop").mode("overwrite").save()
        plan = _plan(j)
        assert "Exchange" not in plan, f"co-bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correctness(bucketed_tables):
    spark = bucketed_tables
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    expected = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).count()
    got = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert got == expected


def test_bucketed_groupby_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    agg = spark.table("b_orders").groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    agg.write.format("noop").mode("overwrite").save()
    plan = _plan(agg)
    assert "Exchange" not in plan, f"groupBy on bucket key still shuffles:\n{plan}"
