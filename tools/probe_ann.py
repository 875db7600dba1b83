"""Deep scale probe for IVF ANN vs brute force (one-off, not part of
bench.py — the round-3 MinHash probe and round-4 pipeline/graph probes'
sibling, closing the similarity-search rung).

Scales the sf0.1 embeddings corpus (2k vectors) to 10x / 50x (20k /
100k) with deterministically perturbed clones (per-clone scale factor on
two coordinates — clones are near but not identical, so they are honest
extra neighbors), then at each scale measures, for 30 fixed queries:

    brute  — exact cosine top-10 (candidates = n per query, always)
    build  — ivf_index: sqrt(n) KMeans cells (the ONE-OFF indexing cost;
             the cell-assigned corpus is the persistable artifact, so
             this amortizes over every later query batch)
    search — ivf_search with n_probe ~ 15% of cells (the RECURRING
             per-batch cost the 100 TB claim is about)
    recall@10 vs brute AT THE SAME SCALE, and the exact candidate rows
    per query (probed-cell sizes from the cell histogram)

The claim under test (operators/similarity.py): search cost per query
tracks the scanned fraction (~n_probe/n_cells of the corpus), NOT the
corpus size, while recall holds once the corpus has real cluster
structure (the clones supply it; the 1x base synthetic corpus is
near-uniform — the known-hard case, where the accuracy gate instead
scans 38% for 0.9+).

Prints one JSON dict. Run on an otherwise idle machine.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
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


def candidate_rows_per_query(assigned, centers, queries, n_probe) -> float:
    """Exact mean candidate rows per query: sum of probed-cell sizes,
    recomputed driver-side from the cell histogram (mirrors ivf_search's
    probe-cell assignment)."""
    hist = {r.cell: r["count"] for r in assigned.groupBy("cell").count().collect()}
    total = 0
    q_rows = queries.select("vec_id", "embedding").collect()
    for r in q_rows:
        qv = np.asarray(r.embedding, dtype="float64")
        qn = np.linalg.norm(qv)
        d2 = ((centers - qv / (qn if qn > 0 else 1.0)) ** 2).sum(axis=1)
        total += sum(hist.get(int(c), 0) for c in np.argsort(d2)[:n_probe])
    return total / len(q_rows)


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
        queries = corpus.filter(
            F.col("vec_id") % F.lit(max(n // N_QUERIES, 1)) == 0
        ).limit(N_QUERIES).persist()
        nq = queries.count()

        t0 = time.time()
        exact = S.topk_neighbors(corpus, queries, k=K).persist()
        exact.count()
        brute_wall = time.time() - t0

        n_cells = max(8, int(math.sqrt(n)))
        n_probe = max(2, int(round(n_cells * 0.15)))

        t0 = time.time()
        assigned, centers = S.ivf_index(corpus, n_cells=n_cells)
        assigned = assigned.persist()
        assigned.count()
        build_wall = time.time() - t0

        t0 = time.time()
        approx = S.ivf_search(
            assigned, centers, queries, k=K, n_probe=n_probe
        ).persist()
        approx.count()
        search_wall = time.time() - t0

        rec = recall(approx, exact)
        cand = candidate_rows_per_query(assigned, centers, queries, n_probe)
        row = {
            "n": n,
            "n_queries": nq,
            "n_cells": n_cells,
            "n_probe": n_probe,
            "cand_rows_per_query": int(cand),
            "cand_frac": round(cand / n, 4),
            "brute_wall_s": round(brute_wall, 2),
            "ivf_build_wall_s": round(build_wall, 2),
            "ivf_search_wall_s": round(search_wall, 2),
            "recall_at_10": round(rec, 4),
        }
        if base_row is None:
            base_row = row
        row["brute_ratio"] = round(brute_wall / base_row["brute_wall_s"], 2)
        row["search_ratio"] = round(search_wall / base_row["ivf_search_wall_s"], 2)
        out["scales"].append(row)
        exact.unpersist()
        approx.unpersist()
        assigned.unpersist()
        queries.unpersist()
        corpus.unpersist()
        spark.catalog.clearCache()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
