"""Deep scale probe for the round-5 query wave (round-6 verdict item 9):
BM25 retrieval, Holt forecasting, AQP hash-sampling, char entropy.

Same discipline as the MinHash/pipeline/merge probes: run each operator
at 1x and 10x its natural scale axis and report the PER-UNIT cost ratio
(10x wall / 10 / 1x wall) — ~1.0 means the plan stayed linear on the
axis that grows at 100 TB; quadratic candidate generation, re-derived
subplans, or driver-side loops show up as ratios >> 1.

Scale axes chosen to match what actually grows in production:
  bm25          docs 10x (postings + df + dl all grow; query set fixed)
  char_entropy  docs 10x (pure per-doc explode/agg)
  holt          KEYS 10x (series length is bounded by the calendar;
                fleet growth = more keys, run group-locally in parallel)
  aqp           rows 10x (sample predicate must stay scan-pushed)

Prints one JSON dict; BASELINE.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark.operators import text as TX  # noqa: E402
from projectdatalake_spark.operators import windows as W  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.readers import load_table  # noqa: E402


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-r6-wave")
    out: dict = {"sf_dir": sf_dir}

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    docs10 = docs.crossJoin(
        F.broadcast(spark.range(10).select(F.col("id").alias("k")))
    ).select(
        (F.col("doc_id") * 10 + F.col("k")).alias("doc_id"),
        F.concat(F.lit("v"), F.col("k"), F.lit(" "), F.col("text")).alias("text"),
    )
    out["docs_1x"] = n_docs

    qdf = spark.createDataFrame(
        [(1, "spark"), (1, "query"), (2, "hash"), (2, "join"), (2, "fast"),
         (3, "dup"), (3, "vector")],
        "query_id int, term string",
    )
    out["bm25_1x"] = timed(TX.bm25_topk(docs, qdf, k=3))
    out["bm25_10x"] = timed(TX.bm25_topk(docs10, qdf, k=3))
    out["perdoc_ratio_bm25"] = round(out["bm25_10x"] / 10 / out["bm25_1x"], 3)

    out["entropy_1x"] = timed(TX.char_entropy(docs))
    out["entropy_10x"] = timed(TX.char_entropy(docs10))
    out["perdoc_ratio_entropy"] = round(
        out["entropy_10x"] / 10 / out["entropy_1x"], 3
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    daily10 = daily.crossJoin(
        F.broadcast(spark.range(10).select(F.col("id").alias("k")))
    ).select(
        F.concat("event_type", F.lit("#"), "k").alias("event_type"), "d", "x"
    )
    out["holt_keys_1x"] = daily.select("event_type").distinct().count()
    out["holt_1x"] = timed(W.holt_forecast(daily))
    out["holt_10x"] = timed(W.holt_forecast(daily10))
    out["perkey_ratio_holt"] = round(out["holt_10x"] / 10 / out["holt_1x"], 3)

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    o10 = o.crossJoin(
        F.broadcast(spark.range(10).select(F.col("id").alias("k")))
    ).select(
        (F.col("o_orderkey") * 10 + F.col("k")).alias("o_orderkey"),
        "o_orderpriority", "o_totalprice",
    )

    def aqp(df):
        t = df.select(
            "o_orderpriority", "o_totalprice",
            (
                ((F.col("o_orderkey") * 48271) % F.lit(2147483647).cast("long"))
                % 100
            ).alias("bucket"),
        )
        est = (
            t.filter(F.col("bucket") < 10)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_sample"),
                (F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double")
                 / 0.1).alias("est_total"),
            )
        )
        exact = t.groupBy("o_orderpriority").agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double").alias("exact_total")
        )
        return est.join(exact, "o_orderpriority")

    out["aqp_rows_1x"] = o.count()
    out["aqp_1x"] = timed(aqp(o))
    out["aqp_10x"] = timed(aqp(o10))
    out["perrow_ratio_aqp"] = round(out["aqp_10x"] / 10 / out["aqp_1x"], 3)

    # round-6 wave: corpus-wide dup 5-grams + bigram LM — the two ops
    # whose frequency tables grow WITH the corpus (the axis that could
    # go quadratic if the gram join ever became a self-join)
    def dup_ngrams(docs_df):
        toks = F.split(F.lower(F.col("text")), " ")
        grams_expr = F.when(
            F.size(toks) >= 5,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 4),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 5)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = docs_df.select("doc_id", F.explode(grams_expr).alias("gram"))
        gc = g.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
        dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        return (
            g.join(gc, "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"), dup.alias("dup_grams"))
        )

    def bigram_lp(docs_df):
        toks = F.split(F.lower(F.col("text")), " ")
        bigrams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        )
        b = docs_df.select("doc_id", F.explode(bigrams).alias("bg"))
        freq = b.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
        total = freq.agg(F.sum("cnt").alias("n"))
        return (
            b.join(freq, "bg")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.avg(F.log(F.col("cnt") / F.col("n"))).alias("lp"))
        )

    out["dupgrams_1x"] = timed(dup_ngrams(docs))
    out["dupgrams_10x"] = timed(dup_ngrams(docs10))
    out["perdoc_ratio_dupgrams"] = round(
        out["dupgrams_10x"] / 10 / out["dupgrams_1x"], 3
    )
    out["bigram_1x"] = timed(bigram_lp(docs))
    out["bigram_10x"] = timed(bigram_lp(docs10))
    out["perdoc_ratio_bigram"] = round(
        out["bigram_10x"] / 10 / out["bigram_1x"], 3
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
