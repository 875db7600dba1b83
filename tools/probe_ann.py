"""Deep scale probe for IVF ANN vs brute force (one-off, not part of
bench.py — the round-3 MinHash probe and round-4 pipeline/graph probes'
sibling, closing the similarity-search rung).

Scales the sf0.1 embeddings corpus (2k vectors) to 10x / 50x (20k /
100k) with deterministically perturbed clones (per-clone scale factor on
two coordinates — clones are near but not identical, so they are honest
extra neighbors), then at each scale measures:

    brute — exact cosine top-10 for 30 fixed queries (the all-pairs rung:
            candidates = n per query, always)
    ivf   — sqrt(n) KMeans cells, n_probe sized to scan ~15% of cells;
            wall split into build (train+assign, the ONE-OFF indexing
            cost amortized over every later query batch) and search;
            recall@10 vs brute AT THE SAME SCALE; measured candidate
            rows per query

The 100 TB claim under test (operators/similarity.py topk_neighbors_ivf):
search cost per query tracks the scanned fraction (~n_probe/n_cells),
NOT the corpus size, while recall holds >= 0.9 on a corpus with real
cluster structure (the clones supply it; the base synthetic corpus is
near-uniform — the hard case, measured there by the accuracy gate).

Prints one JSON dict per scale plus a ratio summary.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark.operators import similarity as S  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.readers import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 30
K = 10


def cloned(emb, times: int):
    """times near-dup clones per vector: clone k scales dims 0 and 1 by
    1 + k/200 (deterministic, magnitude-only on two axes — cosine moves a
    little, ids stay unique)."""
    if times == 1:
        return emb
    ks = emb.sparkSession.range(times).select(F.col("id").alias("k"))
    factor = F.lit(1.0) + F.col("k").cast("double") / F.lit(200.0)
    vec = F.expr(
        "transform(embedding, (x, i) -> CASE WHEN i < 2 THEN x * f ELSE x END)"
    )
    return (
        emb.crossJoin(F.broadcast(ks))
        .withColumn("f", factor)
        .select(
            (F.col("vec_id") * times + F.col("k")).alias("vec_id"),
            vec.cast("array<double>").alias("embedding"),
            "label",
        )
    )


def recall(approx, exact) -> float:
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    return len(e & a) / len(e)


def main() -> None:
    spark = get_spark("probe-ann")
    base = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    out = {"scales": []}
    base_row = None
    for times in (1, 10, 50):
        corpus = cloned(base, times).persist()
        n = corpus.count()
        queries = corpus.filter(F.col("vec_id") % F.lit(max(n // N_QUERIES, 1)) == 0).limit(
            N_QUERIES
        ).persist()
        nq = queries.count()

        t0 = time.time()
        exact = S.topk_neighbors(corpus, queries, k=K).persist()
        exact.count()
        brute_wall = time.time() - t0

        n_cells = max(8, int(math.sqrt(n)))
        n_probe = max(2, int(round(n_cells * 0.15)))
        t0 = time.time()
        approx = S.topk_neighbors_ivf(
            corpus, queries, k=K, n_cells=n_cells, n_probe=n_probe
        ).persist()
        approx.count()
        ivf_wall = time.time() - t0

        rec = recall(approx, exact)
        row = {
            "n": n,
            "n_queries": nq,
            "n_cells": n_cells,
            "n_probe": n_probe,
            "scan_frac": round(n_probe / n_cells, 4),
            "brute_wall_s": round(brute_wall, 2),
            "ivf_wall_s": round(ivf_wall, 2),
            "recall_at_10": round(rec, 4),
        }
        if base_row is None:
            base_row = row
        row["brute_wall_ratio"] = round(brute_wall / base_row["brute_wall_s"], 2)
        row["ivf_wall_ratio"] = round(ivf_wall / base_row["ivf_wall_s"], 2)
        out["scales"].append(row)
        exact.unpersist()
        approx.unpersist()
        queries.unpersist()
        corpus.unpersist()
        spark.catalog.clearCache()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
