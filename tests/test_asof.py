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


def test_interval_point_join_equals_naive(spark):
    from projectdatalake_spark.operators.rangejoin import interval_point_join
    from projectdatalake_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sid"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("w_end"),
    )
    naive = {
        (r.pid, r.sid)
        for r in points.join(
            intervals,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("w_start") <= F.col("pts"))
            & (F.col("pts") <= F.col("w_end")),
        ).collect()
    }
    assert naive, "fixture should produce matches"
    # exact at any bucket width (width only changes replication factor)
    for width in ("6 hours", "1 day", "7 days"):
        iv = intervals.withColumnRenamed("s_user", "user_id")
        fast = {
            (r.pid, r.sid)
            for r in interval_point_join(
                iv, points, "w_start", "w_end", "pts",
                on=["user_id"], bucket_width=width,
            ).collect()
        }
        assert fast == naive, width


def test_interval_point_join_left_keeps_unmatched(spark):
    from projectdatalake_spark.operators.rangejoin import interval_point_join

    intervals = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-02 00:00:00")], ["iid", "lo", "hi"]
    ).select("iid", F.col("lo").cast("timestamp_ntz"), F.col("hi").cast("timestamp_ntz"))
    intervals = intervals.toDF("iid", "lo", "hi")
    points = spark.createDataFrame(
        [(10, "2024-01-01 12:00:00"), (11, "2024-03-01 00:00:00")], ["pid", "pts"]
    ).select("pid", F.col("pts").cast("timestamp_ntz").alias("pts"))
    out = interval_point_join(
        intervals, points, "lo", "hi", "pts", bucket_width="1 day", how="left"
    )
    got = {(r.pid, r.iid) for r in out.collect()}
    assert got == {(10, 1), (11, None)}


def test_asof_nearest_semantics(spark):
    left, right = _fixtures(spark)
    out = asof.asof_join(
        left, right, "t", "rt", "uid", "ruid", ["eid"], direction="nearest"
    )
    got = {r.eid: r.state for r in out.collect()}
    # eid1 t=100 → rt=90 (d=10 beats d=100); eid2 t=205 → rt=200 (d=5);
    # eid3 t=50 → rt=90 (nearest FORWARD — backward alone finds nothing);
    # eid4 t=300 → rt=300 (d=0); eid5 uid=3 → no right rows at all
    assert got == {1: "a", 2: "b", 3: "a", 4: "c", 5: None}
    # equidistant tie prefers the EARLIER right row (backward, the
    # merge_asof convention): t=145 sits exactly between rt=90 and rt=200
    tie = spark.createDataFrame([(6, 1, 145)], ["eid", "uid", "t"])
    got6 = asof.asof_join(
        tie, right, "t", "rt", "uid", "ruid", ["eid"], direction="nearest"
    ).collect()[0]
    assert got6.state == "a" and got6.rt == 90


def test_asof_nearest_grouped_matches_declarative(spark):
    left, right = _fixtures(spark)
    a = asof.asof_join(
        left, right, "t", "rt", "uid", "ruid", ["eid"], direction="nearest"
    )
    b = asof.asof_join_grouped(
        left, right, "t", "rt", "uid", "ruid", direction="nearest"
    )
    cols = ["eid", "uid", "t", "rt", "state"]
    sa = sorted(tuple(r) for r in a.select(*cols).collect())
    sb = sorted(tuple(r) for r in b.select(*cols).collect())
    assert sa == sb


def test_asof_nearest_timestamp_tz_independent(spark):
    """Distance compares epoch micros, so the session timezone cancels
    for timestamp_ntz inputs."""
    left = spark.createDataFrame(
        [(1, 1, "2024-03-10 12:00:00")], ["eid", "uid", "t"]
    ).select("eid", "uid", F.col("t").cast("timestamp_ntz").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-03-10 10:00:00", "x"), (1, "2024-03-10 13:30:00", "y")],
        ["ruid", "rt", "state"],
    ).select("ruid", F.col("rt").cast("timestamp_ntz").alias("rt"), "state")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "Asia/Tokyo", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            out = asof.asof_join(
                left, right, "t", "rt", "uid", "ruid", ["eid"],
                direction="nearest",
            ).collect()
            assert out[0].state == "y", tz  # 1.5h beats 2h in every TZ
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_asof_nearest_ntz_across_dst_transition(spark):
    """timestamp_ntz distances must come from wall-clock fields, not a
    cast through the session timezone: 2024-03-10 02:00 doesn't exist in
    America/Los_Angeles, so a cast shifts values on opposite sides of the
    gap by different offsets — here it would shrink the 2.5h-away
    candidate to 1.5h and beat the true 2.25h nearest."""
    left = spark.createDataFrame(
        [(1, 1, "2024-03-10 03:30:00")], ["eid", "uid", "t"]
    ).select("eid", "uid", F.col("t").cast("timestamp_ntz").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-03-10 01:00:00", "x"), (1, "2024-03-10 05:45:00", "y")],
        ["ruid", "rt", "state"],
    ).select("ruid", F.col("rt").cast("timestamp_ntz").alias("rt"), "state")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/Los_Angeles", "Europe/Berlin"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            out = asof.asof_join(
                left, right, "t", "rt", "uid", "ruid", ["eid"],
                direction="nearest",
            ).collect()
            assert out[0].state == "y", tz  # 2.25h wall beats 2.5h wall
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
