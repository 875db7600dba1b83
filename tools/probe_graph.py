"""Deep probe: exact vs DOULION-sampled triangle counting at sf0.1
(one-off, the curation/MinHash probes' sibling).

The sf0.1 co-purchase graph is adversarially dense (~1.1 M distinct
edges over 20 k parts, avg degree ~110 — far above power-law reality),
which makes it the right stress fixture: wedge volume, the cost driver,
scales with Σ min-degree². The probe measures the exact pass and the
p ∈ {0.1, 0.3, 0.5} sampled passes (wall + relative error), printing
one JSON dict. The property under test: sampled wall ≈ p²·exact-wall
(wedges shrink quadratically in p) while error stays in the few-percent
band the gate bounds at smoke scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projectdatalake_spark.operators import graph as G  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-graph")
    li = load_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li).persist()
    out: dict = {"n_edges": edges.count()}

    t0 = time.perf_counter()
    exact = G.triangles(edges).count()
    out["exact_triangles"] = exact
    out["wall_exact"] = round(time.perf_counter() - t0, 3)

    for p in (0.1, 0.3, 0.5):
        t0 = time.perf_counter()
        row = G.triangle_count_estimate(edges, p=p).collect()[0]
        out[f"wall_p{p}"] = round(time.perf_counter() - t0, 3)
        out[f"est_p{p}"] = row.est_triangles
        out[f"relerr_p{p}"] = round(abs(row.est_triangles - exact) / exact, 4)
    edges.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
