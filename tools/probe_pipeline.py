"""Deep scale probe for the composed LLM-curation pipeline (one-off, not
part of bench.py — the round-3 MinHash probe's sibling).

Runs pipelines/llm_corpus.curate over the sf0.1 documents table at
1× / 10× / 100× document counts (5k → 500k, salted near-dup clones like
the MinHash probe: one leading token differs per clone, so clones are
NOT exact dups and survive stage 2, stressing every later stage), with
PER-STAGE accounting via curate(through=...):

    quality   — featurize + ratio filters (pure projection)
    dedup     — + content-hash window (one hash shuffle)
    decontam  — + holdout-gram broadcast semi/anti join
    pack      — + split projection + per-shard running-sum window (full)

Prints one JSON dict: cumulative stage walls, full-pipeline wall,
survivor counts per stage, and per-INPUT-doc cost ratios vs 1×. The
property under test is the 100 TB claim in llm_corpus.py's header:
every stage is shuffle-bounded (no self-join, no quadratic candidate
step), so per-doc cost must stay ~flat while docs grow 100×.

Caveat the numbers honestly: the fixture scales the HOLDOUT with the
corpus (bucket ≥ 97 of every clone), so the broadcast side grows too —
at a real 100 TB the holdout is eval-suite-sized and fixed. That makes
this probe an upper bound on decontamination cost growth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark.pipelines import llm_corpus  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.readers import load_table  # noqa: E402

STAGES = ("quality", "dedup", "decontam", "pack")


def salted(docs, k: int):
    """k near-dup clones per doc (distinct ids, one leading token differs)."""
    return docs.crossJoin(F.broadcast(
        docs.sparkSession.range(k).select(F.col("id").alias("k"))
    )).select(
        (F.col("doc_id") * k + F.col("k")).alias("doc_id"),
        F.concat(F.lit("v"), F.col("k"), F.lit(" "), F.col("text")).alias("text"),
        "lang",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-pipeline")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")

    def timed(mk) -> float:
        # mk is a THUNK: curate() eagerly materializes its cache (the
        # count() inside), so construction must happen inside the timer
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm JVM + parquet footers
    llm_corpus.curate(base).write.format("noop").mode("overwrite").save()
    llm_corpus.release_cache()

    out: dict = {}
    for mult in (1, 10, 100):
        frame = base if mult == 1 else salted(base, mult)
        entry: dict = {"docs": frame.count()}
        for stage in STAGES:
            entry[f"wall_{stage}"] = timed(
                lambda stage=stage: llm_corpus.curate(frame, through=stage)
            )
            llm_corpus.release_cache()
        # survivor accounting (untimed; cached prefix reused inside one pass)
        counts = (
            llm_corpus.curate(frame, through="decontam")
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
        entry["survivors_decontam"] = counts
        entry["survivors_pack"] = llm_corpus.curate(frame).count()
        llm_corpus.release_cache()
        out[f"x{mult}"] = entry

    for mult in (10, 100):
        for stage in STAGES:
            out[f"perdoc_ratio_{stage}_x{mult}"] = round(
                out[f"x{mult}"][f"wall_{stage}"]
                / mult
                / out["x1"][f"wall_{stage}"],
                3,
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
