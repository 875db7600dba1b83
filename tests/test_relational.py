"""Relational-core semantics, including the must-preserve subtleties of
SURVEY.md §5.3 (conditional dedup ties, left-join null FKs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from projectdatalake_spark.operators import relational as R


def _users(spark):
    # Mirrors the reference's users dedup fixture (SURVEY.md §2.3 note):
    # user 1 has free+paid (drop free), user 2 free only, user 3 paid only,
    # user 4 has TWO distinct rows at the same kept level (both survive),
    # user 5 has two distinct paid rows plus a free row (both paid survive).
    rows = [
        (1, "Ann", "free"),
        (1, "Ann", "paid"),
        (2, "Bob", "free"),
        (3, "Cat", "paid"),
        (4, "Dee", "free"),
        (4, "Dey", "free"),
        (5, "Eve", "paid"),
        (5, "Evy", "paid"),
        (5, "Eve", "free"),
    ]
    return spark.createDataFrame(rows, ["user_id", "name", "level"])


EXPECTED = {
    (1, "Ann", "paid"),
    (2, "Bob", "free"),
    (3, "Cat", "paid"),
    (4, "Dee", "free"),
    (4, "Dey", "free"),
    (5, "Eve", "paid"),
    (5, "Evy", "paid"),
}


def test_dedup_prefer_window(spark):
    out = R.dedup_prefer(_users(spark), ["user_id"], F.col("level") == "paid")
    assert {tuple(r) for r in out.collect()} == EXPECTED


def test_dedup_prefer_reference_faithful(spark):
    out = R.dedup_prefer_reference(_users(spark), ["user_id"], "level", "paid")
    assert {tuple(r) for r in out.collect()} == EXPECTED


def test_dedup_implementations_agree(spark):
    u = _users(spark)
    a = R.dedup_prefer(u, ["user_id"], F.col("level") == "paid")
    b = R.dedup_prefer_reference(u, ["user_id"], "level", "paid")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_left_join_keeps_unmatched_with_nulls(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k2", "w"])
    out = R.join_equi(left, right, F.col("k") == F.col("k2"), how="left")
    rows = {tuple(r) for r in out.select("k", "w").collect()}
    assert rows == {(1, "x"), (2, None)}


def test_semi_anti_partition_input(spark):
    left = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    right = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["k"])
    semi = {r.k for r in R.join_semi(left, right, ["k"]).collect()}
    anti = {r.k for r in R.join_anti(left, right, ["k"]).collect()}
    assert semi == {0, 2, 4, 6, 8}
    assert anti == {1, 3, 5, 7, 9}
    assert semi | anti == set(range(10))


def test_dedup_rows_idempotent(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    once = R.dedup_rows(df)
    twice = R.dedup_rows(once)
    assert once.count() == twice.count() == 2


def test_top_k_uses_take_ordered(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 37)
    out = R.top_k(df, [F.col("v").desc(), F.col("id")], 5)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "simple")
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 5


def test_deterministic_id_dense_and_stable(spark):
    df = spark.createDataFrame(
        [(g, i, f"{g}-{i}") for g in range(3) for i in range(10)], ["g", "i", "v"]
    ).repartition(8)
    a = R.deterministic_id(df, ["g"], ["i"], out="rid")
    ids = sorted(r.rid for r in a.collect())
    assert ids == list(range(1, 31))  # dense 1..N
    # stable across runs and partitioning
    b = R.deterministic_id(df.repartition(3), ["g"], ["i"], out="rid")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dedup_prefer_null_matches_reference_form(spark):
    """ADVICE round 1: a NULL prefer value must mean 'not preferred' in
    BOTH forms — a key whose rows are all NULL-prefer keeps every row."""
    from projectdatalake_spark.operators.relational import (
        dedup_prefer,
        dedup_prefer_reference,
    )

    rows = [
        ("u1", "paid"), ("u1", "free"),       # mixed → paid only
        ("u2", "free"), ("u2", "free"),       # no preferred → both kept
        ("u3", None), ("u3", None),           # all-NULL key → BOTH kept
        ("u4", None), ("u4", "paid"),         # NULL + paid → paid only
        ("u5", None), ("u5", "free"),         # NULL + free, no paid → both
    ]
    df = spark.createDataFrame(rows, "user_id string, level string")
    fast = dedup_prefer(df, ["user_id"], F.col("level") == "paid")
    faithful = dedup_prefer_reference(df, ["user_id"], "level", "paid")
    key = lambda r: (r.user_id, r.level or "")
    assert sorted(fast.collect(), key=key) == sorted(faithful.collect(), key=key)
    kept_u3 = [r for r in fast.collect() if r.user_id == "u3"]
    assert len(kept_u3) == 2, "all-NULL-prefer key must keep its rows"
