"""As-of join: declarative and Arrow-cogrouped implementations agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from projectdatalake_spark.operators import asof


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 1, 50), (4, 2, 300), (5, 3, 10)],
        ["eid", "uid", "t"],
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 200, "b"), (2, 300, "c"), (4, 1, "d")],
        ["ruid", "rt", "state"],
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _fixtures(spark)
    out = asof.asof_join(left, right, "t", "rt", "uid", "ruid", ["eid"])
    got = {r.eid: r.state for r in out.collect()}
    # eid1 t=100 → rt=90; eid2 t=205 → rt=200; eid3 t=50 → no match;
    # eid4 t=300 → rt=300 (inclusive); eid5 uid=3 → no right rows at all
    assert got == {1: "a", 2: "b", 3: None, 4: "c", 5: None}


def test_asof_forward_semantics(spark):
    left, right = _fixtures(spark)
    out = asof.asof_join(left, right, "t", "rt", "uid", "ruid", ["eid"], direction="forward")
    got = {r.eid: r.state for r in out.collect()}
    assert got == {1: "b", 2: None, 3: "a", 4: "c", 5: None}


def test_grouped_matches_declarative(spark):
    left, right = _fixtures(spark)
    a = asof.asof_join(left, right, "t", "rt", "uid", "ruid", ["eid"])
    b = asof.asof_join_grouped(left, right, "t", "rt", "uid", "ruid")
    cols = ["eid", "uid", "t", "rt", "state"]
    sa = sorted(tuple(r) for r in a.select(*cols).collect())
    sb = sorted(tuple(r) for r in b.select(*cols).collect())
    assert sa == sb


def test_asof_left_rowcount_preserved(spark, sf_dir):
    from projectdatalake_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_orderdate"), F.col("o_orderkey")
    )
    out = asof.asof_join(ev, orders, "ts", "o_orderdate", "user_id", "o_custkey", ["event_id"])
    assert out.count() == ev.count()
