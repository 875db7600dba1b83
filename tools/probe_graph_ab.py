"""Idle-vs-loaded A/B for the order-pinned graph proof rungs (round-11
verdict "What's wrong" #2 / "Next round" #5): graph_pagerank drifted
r8 ~20 s → r10 30.9 → r11 29.9 in DRIVER-context runs and was twice
adjudicated "environmental" without a controlled measurement. This
probe times the two rungs plus one plan-pinned non-graph control
(q1_pricing_summary) and stamps the 1/5/15-minute load averages before
and after — run it once on a quiet machine and once bracketing a loaded
window (e.g. while the full pytest suite runs) and the pair settles
whether the trend is the machine or the code.

Prints one JSON dict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projectdatalake_spark.queries import QUERIES  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-graph-ab")
    out: dict = {"sf_dir": sf_dir, "load_before": os.getloadavg()}
    for name in ("q1_pricing_summary", "graph_pagerank", "graph_kcore"):
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    out["load_after"] = os.getloadavg()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
