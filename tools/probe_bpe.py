"""Decomposition probe for bpe_encode_tokens (round-11 verdict "What's
wrong" #3 — the third-heaviest extended entry, 18.96 s at sf0.1, had no
recorded breakdown; one-off, not part of bench.py — the probe_pipeline
sibling).

The registered query is train + encode fused:

    train    — bpe_train_merges(docs, 12): 12 iterative Spark rounds of
               pair counting over the DISTINCT-WORD vocabulary
    vocab    — word explode + distinct (one shuffle, corpus-touched)
    fold     — bpe_apply_merges over the distinct words only (Catalyst
               array folds, scan-stage — the Zipf-grain design claim)
    encode   — full encode: vocab + fold + corpus join + per-doc agg

Splitting them answers the verdict's question directly: is the 19 s the
merge fold (would need caching/batching work), or the iterative TRAINER
the query deliberately includes (already its own bench entry,
bpe_train_merges-shaped cost, linear in n_merges)?

Prints one JSON dict: wall per stage, distinct-word count, and the
fold's per-word cost. Scaling grain claim under test: encode-minus-train
must be ~two corpus touches + a vocabulary-sized fold, NOT n_merges
iterative jobs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark.operators import text as TX  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-bpe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()  # warm the scan

    out: dict = {"sf_dir": sf_dir}

    t0 = time.perf_counter()
    merges = TX.bpe_train_merges(docs, n_merges=12)
    out["train_12_merges"] = round(time.perf_counter() - t0, 3)

    words = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("w")
    ).filter(F.length("w") > 0)
    t0 = time.perf_counter()
    vocab = words.select("w").distinct()
    out["n_distinct_words"] = vocab.count()
    out["vocab_distinct"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    folded = vocab.select(
        "w",
        F.size(
            TX.bpe_apply_merges(
                F.concat(
                    F.split(F.col("w"), ""), F.array(F.lit("</w>"))
                ),
                merges,
            )
        ).alias("w_tokens"),
    )
    folded.write.format("noop").mode("overwrite").save()
    out["fold_distinct_words"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    TX.bpe_encode_tokens(docs, merges).write.format("noop").mode(
        "overwrite"
    ).save()
    out["encode_full"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    TX.bpe_encode_tokens(docs, TX.bpe_train_merges(docs, n_merges=12)).write.format(
        "noop"
    ).mode("overwrite").save()
    out["query_shape_train_plus_encode"] = round(time.perf_counter() - t0, 3)

    out["fold_us_per_word"] = round(
        out["fold_distinct_words"] * 1e6 / max(1, out["n_distinct_words"]), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
