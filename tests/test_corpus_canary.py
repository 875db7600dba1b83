"""Corpus canaries: loud failures when the driver regenerates testdata.

Round 3 found the corpus CAN change shape between rounds (events.ts went
TIMESTAMP(NANOS) → TIMESTAMP(MICROS), silently breaking every ts_ns
consumer and mis-decoding the streaming path 1000×). Value literals are a
second, sneakier dependency: if a dimension value a query filters on
disappears (e.g. region names), the query AND its oracle both return empty
— a hash "pass" that proves nothing. These tests pin every corpus
assumption the query set makes, so a regeneration shows up as a named
failure here instead of silent vacuous passes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from projectdatalake_spark import queries as Q
from projectdatalake_spark.sources.readers import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_events_time_columns(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    dt = dict(ev.dtypes)
    assert dt["ts"] in ("timestamp_ntz", "timestamp"), dt
    assert dt["ts_ns"] == "bigint", dt
    # ts_ns is epoch nanos of ts (the contract every ts_ns consumer assumes)
    bad = ev.filter(
        F.unix_micros(F.col("ts").cast("timestamp")) * 1000 != F.col("ts_ns")
    )
    assert bad.count() == 0


def test_event_types_include_purchase(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert "purchase" in types, types


def test_region_names(spark):
    names = {
        r[0]
        for r in load_table(spark, SF_SMOKE, "region").select("r_name").collect()
    }
    # literals used by tpch_q2 (AFRICA) and q5/q8 (ASIA)
    assert {"AFRICA", "ASIA"} <= names, names


def test_nation_names(spark):
    names = {
        r[0]
        for r in load_table(spark, SF_SMOKE, "nation").select("n_name").collect()
    }
    # literals used by q7 (3, 7), q8 (5), q11 (3), q20 (1, 2)
    assert {"NATION_1", "NATION_2", "NATION_3", "NATION_5", "NATION_7"} <= names, names


def test_part_literals(spark):
    p = load_table(spark, SF_SMOKE, "part")
    types = {r[0] for r in p.select("p_type").distinct().collect()}
    assert {"STANDARD", "PROMO", "ECONOMY"} <= types, types
    brands = {r[0] for r in p.select("p_brand").distinct().collect()}
    assert {"Brand#11", "Brand#12", "Brand#13", "Brand#22", "Brand#3"} <= brands
    assert p.filter(F.col("p_name").like("small%")).count() > 0


def test_date_ranges_cover_query_filters(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    lo, hi = o.agg(F.min("o_orderdate"), F.max("o_orderdate")).collect()[0]
    assert str(lo) <= "1996-01-01", lo  # q4/q20 windows
    assert str(hi) >= "2001-01-01", hi  # anti-join recency filter


# The literal-dependent queries must return ROWS at oracle scale — an empty
# result that hash-matches an empty oracle is a vacuous pass.
LITERAL_QUERIES = [
    "filter_events_eq",
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_volume",
    "tpch_q7_volume",
    "tpch_q8_market_share",
    "tpch_q14_promo",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q20_part_promotion",
    "join_anti_customers_no_orders",
    # probes a literal o_orderkey inside a txlog bloom filter — empty-vs-empty
    # against the oracle would pass vacuously if the corpus dropped the key
    "txlog_bloom_skipping",
]


@pytest.mark.parametrize("name", LITERAL_QUERIES)
def test_literal_query_nonempty(spark, name):
    assert Q.QUERIES[name](spark, SF_ORACLE).count() > 0
