"""Document deduplication at scale: exact, shingle-Jaccard, MinHash-LSH,
SimHash.

North-star surface (BASELINE.json): the dedup ladder of an LLM-data
pipeline, ordered by cost:

1. ``exact_groups`` — hash-groupBy on normalized content. One shuffle on
   the content hash; the only O(n) exact method.
2. ``jaccard_pairs`` — EXACT shingle-Jaccard pairs via a prefix-filtered
   set-similarity join (AllPairs/PPJoin family): inverted index on
   rarity-ordered prefixes + size/positional filters + exact verification.
   Near-linear candidate generation; ``jaccard_pairs_allpairs`` keeps the
   naive quadratic form as its equality-tested semantic oracle.
3. ``minhash_lsh_pairs`` — MinHash signatures + LSH banding: candidate
   generation is linear (explode bands → shuffle on band key), then only
   candidates pay the exact-Jaccard verification. The 100 TB path.
4. ``simhash`` (operators.text.simhash64) — 64-bit fingerprints compared
   by Hamming distance; cheapest, coarsest.

All candidate generation is pure DataFrame ops (no UDFs); the quadratic
step never materializes outside a block/bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from projectdatalake_spark.operators.text import normalize, shingles, tokens


def exact_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups on normalized content: one row per distinct
    content with the canonical (min) id and multiplicity."""
    return (
        df.groupBy(F.md5(normalize(F.col(text_col))).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def incremental_exact(
    incoming: DataFrame,
    base_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: survivors of a NEW batch against an
    already-deduped corpus, given only the corpus's content-hash index
    (``base_hashes``: one ``content_hash`` column — at 100 TB this is the
    persisted artifact a snapshot dedup maintains, never the corpus
    itself). Within-batch dupes collapse to the min-id canonical first
    (one hash aggregate over the BATCH), then one left-anti join against
    the index drops everything the corpus already has. Cost tracks the
    batch size plus a hash-key shuffle of the index — never a re-dedup of
    the corpus. Returns (content_hash, doc_id, n_batch)."""
    batch = (
        incoming.groupBy(
            F.md5(normalize(F.col(text_col))).alias("content_hash")
        )
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_batch"),
        )
    )
    return batch.join(
        base_hashes.select("content_hash"), "content_hash", "left_anti"
    )


def _jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    block_cols: Sequence[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """EXACT near-duplicate pairs by word-``n``-gram shingle Jaccard, via a
    prefix-filtered set-similarity join (AllPairs/PPJoin family).

    Candidate generation is an inverted-index join, not all-pairs: each
    shingle set is sorted by global token rarity (ascending document
    frequency), and only its *prefix* — the first
    ``|X| - ceil(t·|X|) + 1`` tokens — is indexed. Soundness: for a pair
    with J ≥ t, the required overlap is ``o ≥ α = ceil(t/(1+t)·(|A|+|B|))``;
    take w = the globally smallest common token. Every common token sorts
    at or after w in BOTH sets, so ``o ≤ 1 + min(|A|-1-pos_A(w),
    |B|-1-pos_B(w))`` — which forces ``pos_X(w) ≤ |X| - α ≤ |X| -
    ceil(t·|X|)`` (since ``α ≥ t·max(|A|,|B|)``). Hence w lands in both
    prefixes, and the same inequality doubles as an exact PPJoin-style
    *positional filter* on the join: a shared token at positions (pa, pb)
    can only witness a qualifying pair if ``1 + min(|A|-1-pa, |B|-1-pb) ≥
    t/(1+t)·(|A|+|B|)``. A size-ratio bound (``t·|A| ≤ |B| ≤ |A|/t``)
    prunes further, and exact Jaccard verification on the candidates
    removes false positives — output is IDENTICAL to the naive quadratic
    form (``jaccard_pairs_allpairs``, equality-tested), but candidate cost
    follows shared-rare-token collisions instead of |block|².

    Rarity ordering is what makes the prefix index sparse: hot shingles
    (boilerplate phrases) sort to the suffix and are never indexed, so the
    per-token bucket sizes stay small — the property that keeps this join
    near-linear at 100 TB. ``block_cols`` (e.g. language) further restrict
    pairs as before and remain part of the output semantics.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    t_frac = threshold / (1.0 + threshold)
    _release_caches()
    sh = _blocked_shingles(df, block_cols, text_col, id_col, n)
    ex = sh.select(
        F.col(id_col), *[F.col(c) for c in block_cols], F.explode("sh").alias("tok")
    )
    tok_freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    # re-collect each set sorted by (rarity, token): a deterministic total
    # order shared by all sets, as the prefix theorem requires
    ordered = (
        ex.join(tok_freq, "tok")
        .groupBy(id_col, *block_cols)
        .agg(F.array_sort(F.collect_list(F.struct("tok_df", "tok"))).alias("ord"))
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            # struct-field pluck via GetArrayStructFields (codegen) —
            # the r12 CodegenFallback veto: a transform() lambda here
            # de-compiled this whole Project (same element order either way)
            F.col("ord").getField("tok").alias("sh"),
            F.size("ord").alias("sz"),
        )
        .persist()
    )
    _LIVE_CACHES.append(ordered)
    # epsilon guards float rounding toward MORE candidates, never fewer
    p_len = (
        F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9)) + 1
    ).cast("int")
    pref = ordered.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col("sz"),
        F.posexplode(F.slice("sh", 1, p_len)).alias("pos", "tok"),
    )
    left = pref.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
        "tok",
    )
    right = pref.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
        F.col("tok").alias("tok_b"),
    )
    cond = (
        (F.col("tok") == F.col("tok_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.col("sz_b") >= F.lit(threshold) * F.col("sz_a") - F.lit(1e-9))
        & (F.col("sz_a") >= F.lit(threshold) * F.col("sz_b") - F.lit(1e-9))
        # positional filter: remaining-suffix overlap must still reach α
        & (
            F.lit(1)
            + F.least(
                F.col("sz_a") - 1 - F.col("pos_a"), F.col("sz_b") - 1 - F.col("pos_b")
            )
            >= F.lit(t_frac) * (F.col("sz_a") + F.col("sz_b")) - F.lit(1e-9)
        )
    )
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    candidates = left.join(right, cond).select("id_a", "id_b").dropDuplicates()
    return (
        candidates.join(
            ordered.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(ordered.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _blocked_shingles(
    df: DataFrame,
    block_cols: Sequence[str],
    text_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """(id, *blocks, sh): non-empty shingle sets, spread for parallelism."""
    slim = df.select(F.col(id_col), *[F.col(c) for c in block_cols], F.col(text_col))
    target = df.sparkSession.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    toked = slim.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        tokens(F.col(text_col)).alias("toks"),
    )
    return toked.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        shingles(F.col("toks"), n).alias("sh"),
    ).filter(F.size("sh") > 0)


def jaccard_pairs_allpairs(
    df: DataFrame,
    threshold: float,
    block_cols: Sequence[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Naive blocked all-pairs shingle Jaccard — the quadratic-within-block
    reference form ``jaccard_pairs`` is equality-tested against
    (tests/test_text_dedup_similarity.py). Only viable with strong
    blocking; kept as the semantic oracle for the prefix-filtered join.
    """
    slim = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols], F.col(text_col)
    )
    target = df.sparkSession.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    toked = slim.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        tokens(F.col(text_col)).alias("toks"),
    )
    sh = toked.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        shingles(F.col("toks"), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    left = sh.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("sh").alias("sh_a"),
    )
    right = sh.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("sh").alias("sh_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    return (
        left.join(right, cond)
        .select("id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sh): shingle sets, spread across the cluster.

    Small document tables often arrive as one or two parquet splits; the
    per-doc shingle/hash work is CPU-bound, so under-partitioned input
    serializes it on one core. Repartitioning (id, text) pairs is cheap
    relative to the work and restores full parallelism — the same logic a
    100 TB run applies per file-split.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    slim = df.select(F.col(id_col), F.col(text_col))
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    toked = slim.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    return toked.select(
        F.col(id_col), shingles(F.col("toks"), n).alias("sh")
    ).filter(F.size("sh") > 0)


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """MinHash signatures over word-``n``-gram shingles → one column per
    hash (h0..h{k-1}) plus the shingle set.

    Hash family: xxhash64(shingle, seed_i). Computed via explode →
    k min-aggregates: each shingle is hashed exactly k times inside one
    hash-aggregate (map-side partial), and the aggregation barrier
    materializes the signature so downstream band expressions reference
    plain columns — never re-evaluating the MinHash work. (The naive
    array-of-transforms form re-inlines the whole signature expression
    into every element_at reference: ~32× the work.)
    """
    sh_df = shingle_sets(df, text_col, id_col, n)
    return minhash_from_shingles(sh_df, num_hashes, id_col)


def minhash_from_shingles(
    sh_df: DataFrame, num_hashes: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """Hash family: h_i(s) = xxhash64(xxhash64(s), i) — the variable-length
    shingle STRING is hashed once per row, and the k family members rehash
    the resulting 8-byte long (k× cheaper than k string hashes; same
    independence, since xxhash64 seeded by i mixes the base hash fully).
    Map-side partial min means the shuffle carries k longs per doc."""
    exploded = sh_df.select(F.col(id_col), F.explode("sh").alias("s")).select(
        F.col(id_col), F.xxhash64("s").alias("hs")
    )
    return exploded.groupBy(id_col).agg(
        *[F.min(F.xxhash64("hs", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact verification.

    Pipeline (all DataFrame ops, linear except within buckets):
    signatures → split into ``bands`` bands of ``num_hashes/bands`` rows →
    band-hash → explode → self-join per (band, hash) bucket → distinct
    candidate pairs → verify with exact shingle Jaccard ≥ ``threshold``.

    With 32 hashes / 8 bands (r=4), P(candidate) = 1-(1-j^4)^8: ~0.04 at
    j=0.3, ~0.99 at j=0.8 — tuned for high-threshold dedup. Candidates are
    a superset of true pairs only probabilistically; the verification join
    removes false positives, while false negatives are the (small,
    quantified) LSH miss rate.
    """
    rows_per_band = num_hashes // bands
    # the shingle table feeds both signature generation and final
    # verification, and the banded index is self-joined: persist both so
    # each is computed once (at warehouse scale these would be materialized
    # tables between pipeline stages — the reference's own
    # materialization-barrier pattern, SURVEY.md §2.9 W2). Prior
    # invocations' caches are released here — deferred, so the returned
    # frame stays lazy — bounding executor storage to one invocation
    # instead of accumulating for the session lifetime.
    _release_caches()
    sh_df = shingle_sets(df, text_col, id_col, n).persist()
    sigs = minhash_from_shingles(sh_df, num_hashes, id_col)
    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    )
    # bucket join on id pairs only — shingle arrays are joined back later so
    # the band explode/shuffle carries (id, band, bkey), not document bodies.
    # NOT persisted: both sides of the self-join share the signature
    # aggregation's exchange, which Spark reuses (ReusedExchange) — a cache
    # here just replaces that reuse with two cache scans and blocks AQE.
    banded = sigs.withColumn("band_key", band_keys).select(
        F.col(id_col), F.posexplode("band_key").alias("band", "bkey")
    )
    left = banded.select(
        F.col("band"), F.col("bkey"), F.col(id_col).alias("id_a")
    )
    right = banded.select(
        F.col("band").alias("band_b"), F.col("bkey").alias("bkey_b"),
        F.col(id_col).alias("id_b"),
    )
    candidates = (
        left.join(
            right,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_tbl = sh_df
    _LIVE_CACHES.append(sh_df)
    return (
        candidates.join(
            sh_tbl.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(sh_tbl.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# Persisted intermediates from the latest minhash_lsh_pairs call, released
# on the next call so repeated bench/verify invocations hold at most one
# invocation's cache (ADVICE: unbounded persist accumulation). A frame
# returned earlier stays CORRECT after its caches are released — Spark
# recomputes from source lineage — it just loses the reuse speedup.
_LIVE_CACHES: list[DataFrame] = []


def minhash_band_index(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The PERSISTABLE MinHash-LSH index: ``(banded, shingles)`` where
    ``banded`` is (id, band, bkey) — one row per doc per band — and
    ``shingles`` is (id, sh) for exact verification. Banding is a pure
    per-doc function (xxhash family, no corpus statistics), so index
    rows never change once written: store ``banded`` partitioned by
    band / bucketed by bkey and ``shingles`` bucketed by id, and
    incremental batches (``minhash_lsh_apply_batch``) touch only their
    own buckets. This is the dedup-ladder twin of the SemDeDup frozen
    cell index and the ivf_index/ivf_search split: build once, amortize
    across every future ingest batch."""
    rows_per_band = num_hashes // bands
    sh_df = shingle_sets(df, text_col, id_col, n)
    sigs = minhash_from_shingles(sh_df, num_hashes, id_col)
    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    banded = sigs.withColumn("band_key", band_keys).select(
        F.col(id_col), F.posexplode("band_key").alias("band", "bkey")
    )
    return banded, sh_df


def minhash_lsh_apply_batch(
    index_banded: DataFrame,
    index_shingles: DataFrame,
    batch: DataFrame,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    ordered: bool = True,
    precomputed: tuple[DataFrame, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """INCREMENTAL MinHash-LSH: near-dup pairs involving ONLY the new
    batch, against a frozen band index — per-batch cost tracks the
    batch (its band rows join the index's matching buckets), never the
    corpus. With ``ordered=True`` (default) batch ids must exceed all
    indexed ids (append-only contract, same as
    semantic_dedup_apply_batch); ``ordered=False`` lifts that contract
    for sources that deliver ids out of order (file streams batch by
    discovery order, not id order — streaming.dedup_stream): candidates
    take BOTH join directions and canonicalize to (least, greatest),
    costing one extra shingle-side join key resolution, nothing more.

    Exactness: banding is deterministic per doc, so
    ``pairs(base) ∪ apply(batch).pairs == pairs(base ∪ batch)`` EXACTLY
    — gated in tests/test_accuracy_gates.py (both modes). Returns
    ``(pairs, batch_banded, batch_shingles)``; append the latter two to
    the index for the next batch.

    100 TB: the candidate join's right side is the BATCH's band rows;
    with the index stored bucketed by (band, bkey) the join prunes to
    touched buckets, and verification joins batch shingles (small)
    against only candidate ids from the index.

    ``precomputed``: the batch's own ``(banded, shingles)`` when the
    caller already derived them (streaming.dedup_stream computes the
    batch's band rows FIRST to learn which index buckets to read, so
    recomputing here would double the minhash pass). MUST equal
    ``minhash_band_index(batch, ...)``'s output — the caller passing a
    pruned index is only exact because candidates require (band, bkey)
    equality, hence equal bucket."""
    if precomputed is not None:
        b_banded, b_sh = precomputed
    else:
        b_banded, b_sh = minhash_band_index(
            batch, num_hashes, bands, text_col, id_col, n
        )
    all_banded = index_banded.unionByName(b_banded)
    right = b_banded.select(
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
        F.col(id_col).alias("id_b"),
    )
    join_on = (
        (F.col("band") == F.col("band_b"))
        & (F.col("bkey") == F.col("bkey_b"))
    )
    if ordered:
        cand = (
            all_banded.select("band", "bkey", F.col(id_col).alias("id_a"))
            .join(right, join_on & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b")
        )
    else:
        both = (
            all_banded.select("band", "bkey", F.col(id_col).alias("id_x"))
            .join(right, join_on & (F.col("id_x") != F.col("id_b")))
        )
        cand = both.select(
            F.least(F.col("id_x"), F.col("id_b")).alias("id_a"),
            F.greatest(F.col("id_x"), F.col("id_b")).alias("id_b"),
        )
    candidates = cand.dropDuplicates(["id_a", "id_b"])
    all_sh = index_shingles.unionByName(b_sh)
    sh_b_side = b_sh if ordered else all_sh
    pairs = (
        candidates.join(
            all_sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh_b_side.select(
                F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
            ),
            "id_b",
        )
        .select(
            "id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs, b_banded, b_sh


def _release_caches() -> None:
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: every node
    gets ``cluster_id`` = the minimum id reachable through pair edges
    (singletons map to themselves). The final rung of the dedup ladder —
    "keep one doc per cluster" needs clusters, not pairs, because near-dup
    is not transitive at the pair level.

    Algorithm: iterative min-label propagation — each round joins labels
    across edges and keeps the minimum; converges in O(cluster diameter)
    rounds (near-dup clusters are shallow). Each round is one shuffle on
    the edge key; ``localCheckpoint`` truncates lineage so plans stay flat.
    For graphs with large diameters use the alternating big-star/small-star
    variant; dedup clusters do not need it.
    """
    spark = pairs.sparkSession
    # partition the static edge table by its per-round join key ONCE
    # (guide §2.4, the pagerank links pattern): every round's
    # edges⋈labels join then reuses the cached layout and only the small
    # (node, label) vector reshuffles
    npart = spark.sparkContext.defaultParallelism
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .dropDuplicates()
        .repartition(npart, "dst")
        .persist()
    )
    labels = nodes.select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels[id_col])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # the convergence flag rides along in the checkpointed frame: a
        # label changed iff some neighbor's label beat it, so `chg` is
        # known at update time — no second labels-vs-labels join per round
        stepped = (
            labels.join(neighbor_min, labels[id_col] == neighbor_min.src, "left")
            .select(
                F.col(id_col),
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
                F.coalesce(
                    F.col("nbr_min") < F.col("cluster_id"), F.lit(False)
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        labels = stepped.drop("chg")
        if stepped.filter("chg").limit(1).count() == 0:
            break
    edges.unpersist()
    return labels


def containment_pairs(
    df: DataFrame,
    threshold: float,
    block_cols: Sequence[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """EXACT asymmetric containment pairs: ``|A∩B| / |A| ≥ t`` — "document
    A is mostly contained in B" (quote/near-subset detection, the dedup
    case Jaccard misses when a short doc is embedded in a long one).

    Same inverted-index machinery as ``jaccard_pairs`` but asymmetric:
    the CONTAINED side indexes only its rarity-ordered prefix of length
    ``|A| - ceil(t·|A|) + 1`` (a qualifying pair shares ≥ ceil(t·|A|)
    tokens, more than fit in A's suffix alone), while the CONTAINER side
    indexes every token (no size bound constrains B from below relative
    to overlap position). Exact overlap verification on candidates;
    returns (id_a, id_b, containment) where id_a is the contained doc —
    both orientations of every pair are examined, and self-pairs are
    excluded. Output equality with the naive quadratic form is tested.
    """
    _release_caches()
    sh = _blocked_shingles(df, block_cols, text_col, id_col, n)
    ex = sh.select(
        F.col(id_col), *[F.col(c) for c in block_cols], F.explode("sh").alias("tok")
    )
    tok_freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    ordered = (
        ex.join(tok_freq, "tok")
        .groupBy(id_col, *block_cols)
        .agg(F.array_sort(F.collect_list(F.struct("tok_df", "tok"))).alias("ord"))
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            # GetArrayStructFields pluck, not a transform() lambda — keeps
            # this Project inside whole-stage codegen (r12 HOF veto)
            F.col("ord").getField("tok").alias("sh"),
            F.size("ord").alias("sz"),
        )
        .persist()
    )
    _LIVE_CACHES.append(ordered)
    p_len = (
        F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9)) + 1
    ).cast("int")
    contained = ordered.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("sz").alias("sz_a"),
        F.explode(F.slice("sh", 1, p_len)).alias("tok"),
    )
    container = ordered.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.explode("sh").alias("tok_b"),
    )
    cond = (F.col("tok") == F.col("tok_b")) & (F.col("id_a") != F.col("id_b"))
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    candidates = contained.join(container, cond).select("id_a", "id_b").dropDuplicates()
    return (
        candidates.join(
            ordered.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(ordered.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    k: int = 2,
    block_cols: Sequence[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
    q: int = 3,
) -> DataFrame:
    """EXACT edit-distance pairs (``levenshtein ≤ k``) via an Ed-Join-style
    prefix-filtered q-gram join (Xiao/Wang/Lin, VLDB'08) — the
    entity-resolution candidate generator that stays near-linear when the
    corpus shares long constant prefixes (where naive first-chars or
    segment blocking collapses to one quadratic block).

    Candidate lemma: order each string's positional q-grams by global
    rarity ``(freq, gram, pos)``; if ``ed(a, b) ≤ k`` then the two
    ``k·q+1``-length prefixes share a gram occurrence whose positions
    differ by ≤ k (each edit destroys ≤ q grams, so the rarest common
    surviving occurrence sits within both prefixes; its position shifts
    by at most the net indels). Candidates therefore join on
    ``(block, gram)`` with the ±k position band and the |len| ≤ k length
    filter, and only candidates pay the bounded-levenshtein verification
    — which early-exits once the distance must exceed ``k``.

    Strings shorter than ``q + k`` additionally carry a sentinel gram so
    sub-q-length strings still pair (any partner within distance k is
    itself shorter than ``q + k``). Output: one row per unordered pair
    (``id_a < id_b``) with the exact distance; equality with the naive
    blocked quadratic form (``edit_distance_pairs_allpairs``) is tested.
    """
    prefix_len = k * q + 1
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"),
    )
    grams = F.when(
        F.col("_len") >= q,
        F.transform(
            F.sequence(F.lit(0), F.col("_len") - q),
            lambda i: F.struct(
                F.col("_txt").substr(i + 1, F.lit(q)).alias("g"),
                i.cast("int").alias("pos"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<g:string,pos:int>>"))
    sentinel = F.when(
        F.col("_len") < q + k,
        F.array(F.struct(F.lit("").alias("g"), F.lit(0).alias("pos"))),
    ).otherwise(F.array().cast("array<struct<g:string,pos:int>>"))
    ex = base.select(
        *[F.col(c) for c in block_cols],
        "_id",
        "_txt",
        "_len",
        F.explode(F.concat(grams, sentinel)).alias("gp"),
    )
    freq = ex.groupBy(F.col("gp.g").alias("g")).agg(F.count(F.lit(1)).alias("gf"))
    prefixes = (
        ex.join(freq, ex["gp.g"] == freq["g"], "inner")
        .groupBy("_id", *block_cols)
        .agg(
            F.first("_txt").alias("_txt"),
            F.first("_len").alias("_len"),
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("gf", F.col("gp.g").alias("g"), F.col("gp.pos").alias("pos")))
                ),
                1,
                prefix_len,
            ).alias("pref"),
        )
        .select(
            *[F.col(c) for c in block_cols],
            "_id",
            "_txt",
            "_len",
            F.explode("pref").alias("gp"),
        )
    )
    a = prefixes.select(
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("txt_a"),
        F.col("_len").alias("len_a"),
        F.col("gp.g").alias("g_a"),
        F.col("gp.pos").alias("pos_a"),
    )
    b = prefixes.select(
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("txt_b"),
        F.col("_len").alias("len_b"),
        F.col("gp.g").alias("g_b"),
        F.col("gp.pos").alias("pos_b"),
    )
    cond = (
        (F.col("g_a") == F.col("g_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("pos_a") - F.col("pos_b")) <= k)
        & (F.abs(F.col("len_a") - F.col("len_b")) <= k)
    )
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    dist = F.levenshtein("txt_a", "txt_b", k)
    return (
        a.join(b, cond)
        .dropDuplicates(["id_a", "id_b", *[f"{c}_a" for c in block_cols]])
        .filter(dist >= 0)
        .select(
            *[F.col(f"{c}_a").alias(c) for c in block_cols],
            "id_a",
            "id_b",
            dist.cast("int").alias("edit_dist"),
        )
    )


def edit_distance_pairs_deletion(
    df: DataFrame,
    k: int = 2,
    block_cols: Sequence[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT edit-distance pairs (``levenshtein ≤ k``, k ∈ {1, 2}) via
    deletion neighborhoods (FastSS family) — the scale path for SHORT
    strings (names, titles, SKUs: entity resolution keys).

    Lemma: take an optimal alignment of a and b with d deletions, i
    insertions, s substitutions, d+i+s ≤ k. Deleting from ``a`` its d
    deleted + s substituted characters and from ``b`` its i inserted + s
    substituted characters yields the SAME string — so every qualifying
    pair shares a member of the two ≤k-deletion neighborhoods, and the
    candidate join is a plain equi-join on the variant (hashed to 64
    bits; collisions only add candidates, the bounded-levenshtein verify
    removes them). Deletion variants of near-full string length are
    almost unique, so bucket sizes track TRUE duplicates — immune to the
    corpus-constant prefixes that degenerate gram-prefix schemes
    (q-gram rarity picks corpus-wide-constant grams when per-string gram
    entropy is low, collapsing Ed-Join's candidates to all-pairs; see
    ``edit_distance_pairs``, the complementary LONG-string path — its
    per-string cost is O(L) where this one's is O(C(L, k))).

    Output: one row per unordered pair (``id_a < id_b``) with the exact
    distance; equality with the naive blocked quadratic form and with
    the Ed-Join form is pytest-pinned.
    """
    if k not in (1, 2):
        raise ValueError(
            f"deletion-neighborhood join supports k in {{1, 2}}, got {k}; "
            "variant count C(L, k) is impractical beyond — use "
            "edit_distance_pairs (gram-prefix) for larger thresholds"
        )
    # the variant explode multiplies CPU ~C(L,k)-fold per row; spread the
    # source rows across the cluster FIRST (a small-table scan is often one
    # file → one partition, which would serialize the whole expansion).
    # Explicit partition count: AQE would coalesce a column-only
    # repartition back to 1 because the PRE-explode map output is tiny.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"),
    ).repartition(n_parts, F.col("_id"))
    t, L = F.col("_txt"), F.col("_len")
    empty = F.array().cast("array<string>")
    d0 = F.array(t)
    d1 = F.when(
        L >= 1,
        F.transform(
            F.sequence(F.lit(0), L - 1),
            lambda i: F.concat(t.substr(F.lit(1), i), t.substr(i + 2, L)),
        ),
    ).otherwise(empty)
    variants = F.concat(d0, d1)
    if k == 2:
        d2 = F.when(
            L >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), L - 2),
                    lambda i: F.transform(
                        F.sequence(i + 1, L - 1),
                        lambda j: F.concat(
                            t.substr(F.lit(1), i),
                            t.substr(i + 2, j - i - 1),
                            t.substr(j + 2, L),
                        ),
                    ),
                )
            ),
        ).otherwise(empty)
        variants = F.concat(variants, d2)
    ex = base.select(
        *[F.col(c) for c in block_cols],
        "_id",
        "_txt",
        "_len",
        F.explode(F.array_distinct(variants)).alias("v"),
    ).withColumn("vh", F.xxhash64("v")).drop("v")
    a = ex.select(
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("txt_a"),
        F.col("_len").alias("len_a"),
        "vh",
    )
    b = ex.select(
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("txt_b"),
        F.col("_len").alias("len_b"),
        F.col("vh").alias("vh_b"),
    )
    cond = (
        (F.col("vh") == F.col("vh_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= k)
    )
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    dist = F.levenshtein("txt_a", "txt_b", k)
    return (
        a.join(b, cond)
        .dropDuplicates(["id_a", "id_b", *[f"{c}_a" for c in block_cols]])
        .filter(dist >= 0)
        .select(
            *[F.col(f"{c}_a").alias(c) for c in block_cols],
            "id_a",
            "id_b",
            dist.cast("int").alias("edit_dist"),
        )
    )


def edit_distance_pairs_allpairs(
    df: DataFrame,
    k: int = 2,
    block_cols: Sequence[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Naive blocked quadratic form of ``edit_distance_pairs`` — its
    equality-tested semantic oracle (same role jaccard_pairs_allpairs
    plays for the prefix-filtered Jaccard join)."""
    a = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("txt_a"),
    )
    b = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("txt_b"),
    )
    dist = F.levenshtein("txt_a", "txt_b", k)
    return (
        a.join(b, list(block_cols)) if block_cols else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b")).filter(dist >= 0).select(
        *[F.col(c) for c in block_cols],
        "id_a",
        "id_b",
        dist.cast("int").alias("edit_dist"),
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup: split each document
    into fixed ``chunk_words``-token chunks and keep only each chunk's
    FIRST occurrence corpus-wide (ordered by id, then position — the
    deterministic survivor policy). Returns one row per chunk:
    (id, chunk_idx, chunk_text, keep).

    This is the boilerplate-stripping pass LLM corpora need (repeated
    headers/footers/license blocks survive document-level dedup); real
    corpora chunk on structural delimiters, the fixed token window is the
    delimiter-free equivalent over this testdata.

    Scale: tokenize once per document (the token array is materialized as
    a column, so the per-chunk slices reference it instead of re-splitting
    — the Catalyst re-inline trap documented in BASELINE.md), then ONE
    hash shuffle on chunk_text for the first-occurrence window. Chunks
    per doc = O(len/chunk_words); no quadratic stage anywhere.
    """
    # split("") yields [""] — drop empty tokens so an empty/whitespace
    # document produces zero chunks, not one phantom empty chunk
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    n_chunks = F.ceil(F.size("__toks") / F.lit(chunk_words)).cast("int")
    chunks = F.when(
        F.size("__toks") > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(F.col("__toks"), i * chunk_words + 1, chunk_words), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select(id_col, F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    w = Window.partitionBy("chunk_text").orderBy(id_col, "chunk_idx")
    return ex.withColumn("keep", F.row_number().over(w) == 1)


def simhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """SimHash LSH pair join: banded 64-bit fingerprints → candidate
    pairs on band equality → exact Hamming verification.

    Splits each ``simhash_table`` fingerprint into ``n_bands`` equal-width
    bit bands; two documents become a candidate pair iff they agree on at
    least one whole band. By pigeonhole this is EXACT (100% recall, not
    approximate) for any pair with Hamming distance <= n_bands - 1: d
    differing bits can touch at most d bands, leaving a shared one. The
    verify step then makes precision exact too, so with the default
    (8 bands, max_hamming=7) the output equals the brute-force all-pairs
    Hamming <= 7 join — asserted in tests/test_accuracy_gates.py.

    This closes the signature->pairs gap the MinHash ladder already has
    (minhash_lsh_pairs): SimHash is the fingerprint family for
    bag-of-words cosine-style similarity, MinHash for set Jaccard.

    Scale: candidate generation is one explode (x n_bands) + one
    equi-join shuffle on (band, key) — linear in documents plus the
    candidate count, never all-pairs. Band width trades bucket collision
    rate against the exactness radius: 8x8-bit bands verify up to d=7 but
    collide more (256 buckets/band); 4x16-bit bands (max_hamming<=3)
    collide 256x less — pick the widest band whose radius covers the
    dedup threshold. Returns (id_a, id_b, hamming).
    """
    from projectdatalake_spark.operators.text import hamming64, simhash_table

    if 64 % n_bands != 0:
        raise ValueError("n_bands must divide 64")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the exactness radius "
            f"{n_bands - 1} of {n_bands} bands — raise n_bands"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1

    # Both sides of the self-join hang off the signature table, and the
    # 64-vote aggregate behind it is the expensive part; without a
    # materialization barrier Catalyst plans it TWICE (no ReusedExchange —
    # the two sides' exchanges differ past the id< pushdown). Persist the
    # (id, simhash) frame — 16 bytes/doc, the thing you'd checkpoint at
    # 100 TB anyway — so the aggregation runs once.
    sigs = simhash_table(df, text_col=text_col, id_col=id_col).persist()
    _release_caches()
    _LIVE_CACHES.append(sigs)
    bands = sigs.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        # a pair sharing k bands appears k times — dedup before the verify
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )
