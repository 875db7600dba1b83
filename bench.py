"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The metric is total wall time of the headline set (warm session, median of
REPS per query). BASELINE.md records the history.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational / analytic core
    "q1_pricing_summary",
    "multi_join_snowflake",
    "tpch_q3_shipping",
    "join_inner_orders_customer",
    "dedup_conditional_prefer",
    "time_parts",
    "derive_columns",
    "agg_cube",
    "win_topk_per_group",
    "win_running_sum",
    "asof_join_events_orders",
    "sessionize_events",
    # north-star document/vector operators
    "text_quality",
    "text_fingerprint",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "neardup_cosine_pairs",
    "ann_topk_bruteforce",
    # streaming
    "stream_tumbling_agg",
]
REPS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM + parquet footers once
    for n in names:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    for n in names:
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        per_query[n] = round(statistics.median(times), 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
