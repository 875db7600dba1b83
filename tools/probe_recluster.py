"""Scale probe: incremental recluster cost must track INGEST, not table size.

Builds a clustered TxTable of P disjoint key pockets (the steady-state
layout), then appends ONE overlapping batch (the fresh ingest) and runs
``recluster()``. The honest metric is the fraction of live files the
pass rewrites: at steady state it should approximate the ingest
fraction, independent of how many converged pockets exist. Run at two
pocket counts to show the rewritten-file count stays flat while the
table grows.

Usage: python tools/probe_recluster.py
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark.session import get_spark  # noqa: E402
from projectdatalake_spark.sources.txlog import TxTable  # noqa: E402

ROWS_PER_POCKET = 20_000
POCKET_WIDTH = 10_000


def run(spark, n_pockets: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"probe_rc_{n_pockets}_") + "/t"
    base = (
        spark.range(0, ROWS_PER_POCKET * n_pockets)
        .select(
            F.col("id").alias("rid"),
            # n_pockets disjoint key ranges, ~ROWS_PER_POCKET rows each
            (
                (F.col("id") % n_pockets) * POCKET_WIDTH
                + F.floor(F.col("id") / n_pockets) % POCKET_WIDTH
            ).alias("v"),
        )
    )
    t = TxTable.create(
        spark, root, base, cluster_by=("v",),
        cluster_target_files=4 * n_pockets,
    )
    assert t.recluster() is None, "steady-state table must start converged"
    files_before = len(t._active_files())
    # the fresh ingest: one batch overlapping exactly ONE pocket
    t.append(
        spark.range(0, ROWS_PER_POCKET).select(
            (10_000_000 + F.col("id")).alias("rid"),
            (F.col("id") % POCKET_WIDTH).alias("v"),  # pocket 0's range
        )
    )
    files_live = t._active_files()
    t0 = time.time()
    v = t.recluster()
    wall = time.time() - t0
    assert v is not None
    after = {a["path"] for a in t._active_files()}
    rewritten = [a for a in files_live if a["path"] not in after]
    assert t.recluster() is None, "one pass must converge"
    n_ingest = len(files_live) - files_before
    return {
        "pockets": n_pockets,
        "files_steady": files_before,
        "files_ingest": n_ingest,
        "files_rewritten": len(rewritten),
        # THE invariant: steady files touched = rewritten - ingest ≈ one
        # pocket's file count, independent of how many pockets exist —
        # maintenance cost tracks ingest, not table size
        "steady_files_touched": len(rewritten) - n_ingest,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    spark = get_spark("probe_recluster")
    for n in (4, 16):
        print(json.dumps(run(spark, n)))
    spark.stop()


if __name__ == "__main__":
    main()
