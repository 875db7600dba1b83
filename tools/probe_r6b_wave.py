"""Deep scale probe for the round-6 continuation wave: corpus statistics
(Zipf slope, hapax ratios, tokenizer fertility) and event-series
diagnostics (per-user entropy, mean-shift changepoint).

Same discipline as probe_r6_wave: run each operator at 1x and 10x its
natural growth axis and report the PER-UNIT cost ratio
(10x wall / 10 / 1x wall) — ~1.0 = the plan stayed linear on the axis
that grows at 100 TB. The corpus-stat queries all reduce to one
shuffle-on-token aggregate (the corpus_dup_ngrams shape, measured
near-linear in round 6); this probe pins that the new ones inherit it.

Prints one JSON dict; BASELINE.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.readers import load_table  # noqa: E402


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def zipf(docs):
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("f"))
    w = Window.orderBy(F.col("f").desc(), "tok")
    ranked = freq.select("f", F.row_number().over(w).alias("r")).filter(
        F.col("r") <= 1000
    )
    return ranked.agg(
        F.regr_slope(F.log("f"), F.log("r")).alias("s")
    )


def hapax(docs):
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    return freq.groupBy("source").agg(
        F.count(F.lit(1)).alias("types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax"),
    )


def fertility(docs):
    from projectdatalake_spark.queries import _BPE_PATTERN

    n_bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    ).cast("double")
    n_ws = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("double")
    return docs.groupBy("source").agg(
        (F.sum(n_bpe) / F.sum(n_ws)).alias("fert")
    )


def entropy(events):
    c = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    pd_ = c.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("event_type").alias("et"), F.col("n")))
        ).alias("arr"),
        F.sum("n").alias("tot"),
    )
    term = lambda s: (s["n"] / F.col("tot")) * F.log(s["n"] / F.col("tot"))
    return pd_.select(
        "user_id",
        (-F.aggregate("arr", F.lit(0.0), lambda a, s: a + term(s))).alias("h"),
    )


def changepoint(events):
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("d")
    wp = Window.partitionBy("event_type")
    scored = (
        daily.select(
            "event_type", "d",
            F.sum("x").over(wo).alias("cs"),
            F.row_number().over(wo).alias("i"),
            F.sum("x").over(wp).alias("tot"),
            F.count(F.lit(1)).over(wp).alias("n"),
        )
        .filter(F.col("i") < F.col("n"))
        .select(
            "event_type", "d",
            F.abs(
                F.col("cs") / F.col("i")
                - (F.col("tot") - F.col("cs")) / (F.col("n") - F.col("i"))
            ).alias("gap"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(F.col("gap").desc(), "d")
    return scored.withColumn("rn", F.row_number().over(wr)).filter("rn = 1")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-r6b-wave")
    out: dict = {"sf_dir": sf_dir}

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    out["docs_1x"] = docs.count()
    docs10 = docs.crossJoin(
        F.broadcast(spark.range(10).select(F.col("id").alias("k")))
    ).select(
        (F.col("doc_id") * 10 + F.col("k")).alias("doc_id"),
        F.concat(F.lit("v"), F.col("k"), F.lit(" "), F.col("text")).alias("text"),
        "source",
    )
    for name, fn in (("zipf", zipf), ("hapax", hapax), ("fertility", fertility)):
        t1 = timed(fn(docs))
        t10 = timed(fn(docs10))
        out[name] = {"t1": t1, "t10": t10, "per_doc_ratio": round(t10 / 10 / t1, 2)}

    events = load_table(spark, sf_dir, "events")
    out["events_1x"] = events.count()
    ev10 = events.crossJoin(
        F.broadcast(spark.range(10).select(F.col("id").alias("k")))
    ).select(
        (F.col("event_id") * 10 + F.col("k")).alias("event_id"),
        "ts",
        # 10x KEYS for the per-user aggregate; same day grain
        (F.col("user_id") * 10 + F.col("k")).alias("user_id"),
        "event_type",
        "value",
    )
    for name, fn in (("entropy", entropy), ("changepoint", changepoint)):
        t1 = timed(fn(events))
        t10 = timed(fn(ev10))
        out[name] = {"t1": t1, "t10": t10, "per_unit_ratio": round(t10 / 10 / t1, 2)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
