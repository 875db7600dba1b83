"""Text analysis operators for large-scale document pipelines.

North-star surface (BASELINE.json): language identification, quality
scoring, token counting, document fingerprinting — the per-document feature
extraction an LLM training-data pipeline runs over billions of documents.

Everything here is pure Catalyst expressions (split/regexp/array ops inside
whole-stage codegen): zero Python execution per row, embarrassingly
parallel, no shuffle — the 100 TB-safe shape for per-doc featurization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language function-word lists (public knowledge). Distinct-hit
# counts over these drive the language-ID heuristic.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "es": ["el", "la", "los", "de", "y", "es", "que", "un"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans"],
}


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (order-sensitive document signature).

    Token *sets* saturate on small vocabularies; shingles are the standard
    near-dup unit (MinHash literature). Returns empty array for docs with
    fewer than ``n`` tokens.

    Built by zipping ``n`` shifted slices of the token array — ``toks`` is
    referenced a constant number of times, so even if Catalyst inlines an
    expensive producer expression (e.g. the regex split) it costs O(n)
    evaluations per row, not O(tokens) as an element_at-per-position
    formulation would (that shape re-tokenized the document per shingle).
    """
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, cnt)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.array_distinct(grams)


# --- quality features -------------------------------------------------------


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither word chars nor whitespace."""
    return F.length(F.regexp_replace(text, r"[\w\s]", "")) / F.length(text)


def digit_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^0-9]", "")) / F.length(text)


def stopword_hits(toks: Column, lang: str) -> Column:
    """Distinct stopword hits for one language."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), stop))


def quality_features(text: Column) -> dict[str, Column]:
    """Per-document quality signals (all per-row, deterministic)."""
    toks = tokens(text)
    n_toks = F.size(toks)
    return {
        "n_chars": F.length(text),
        "n_tokens": n_toks,
        "avg_token_len": (F.length(F.regexp_replace(text, r"\s+", "")) / n_toks),
        "uniq_token_ratio": (F.size(F.array_distinct(toks)) / n_toks),
        "punct_ratio": punct_ratio(text),
        "digit_ratio": digit_ratio(text),
        "stopword_ratio": (
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))) / n_toks
        ),
    }


def langid(text: Column) -> Column:
    """n-gram-free language-ID heuristic: most distinct function-word hits
    wins; ties resolve to the alphabetically first language; zero hits →
    'und' (BCP-47 undetermined)."""
    toks = tokens(text)
    hits = {lang: stopword_hits(toks, lang) for lang in sorted(STOPWORDS)}
    best: Column = F.lit("und")
    best_score: Column = F.lit(0)
    # alphabetical chain: earlier language wins ties (strict > afterwards)
    for lang in sorted(STOPWORDS):
        cond = hits[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, hits[lang]).otherwise(best_score)
    return best


# --- fingerprinting ---------------------------------------------------------


def normalize(text: Column) -> Column:
    """Canonical form for hashing: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint_md5(text: Column) -> Column:
    """Content hash of the normalized text (exact-dup key)."""
    return F.md5(normalize(text))


def fingerprint_weighted(text: Column) -> Column:
    """Order-sensitive 64-bit-ish fingerprint: position-weighted sum of a
    cheap per-token hash (length/first/last char codes). A rolling-hash
    analog expressible in ANSI SQL (oracle parity) and in one Spark
    posexplode-free aggregate."""
    # index-aware transform: each token is visited exactly once (an
    # element_at over the inlined split expression would re-tokenize the
    # document once per reference — O(tokens²) regex work)
    terms = F.transform(
        tokens(text),
        lambda t, i: (i + 1).cast("long")
        * (F.length(t) * 131 + F.ascii(t) * 7 + F.ascii(F.reverse(t))),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash64(text: Column) -> Column:
    """64-bit SimHash over token xxhash64 values.

    Per token, each of the 64 bits votes ±1; the fingerprint sets bit b iff
    the aggregate vote is positive. Near-identical documents differ in few
    bits (compare with ``hamming64``). Pure higher-order-function
    expressions — no UDF.
    """
    # bit masks as Python-side literals (bit 63 is the sign bit of a long)
    masks = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))

    def bitsof(h: Column) -> Column:
        return F.array(
            *[F.when(h.bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1) for m in masks]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bitsof(h), lambda a, b: a + b),
    )
    weights = F.array(
        *[
            F.when(F.element_at(votes, b + 1) > 0, F.lit(m).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for b, m in enumerate(masks)
        ]
    )
    return F.aggregate(weights, F.lit(0).cast("long"), lambda acc, x: acc + x)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) for a whole table — the scale path for SimHash.

    Same fingerprint as ``simhash64`` but computed via explode + 64
    per-bit vote aggregates behind an aggregation barrier: the pure
    expression form's ``votes`` array gets re-inlined by Catalyst into all
    64 bit extractions (64× the work — measured 118 s for 5k docs vs ~2 s
    this way). Rows with no tokens are dropped.
    """
    masks = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    slim = df.select(F.col(id_col), F.col(text_col))
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    hashes = slim.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))
    votes = hashes.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b, m in enumerate(masks)
        ]
    )
    sim = None
    for b, m in enumerate(masks):
        term = F.when(F.col(f"v{b}") > 0, F.lit(m).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return votes.select(F.col(id_col), sim.alias("simhash"))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature bundle to a documents DataFrame."""
    text = F.col(text_col)
    feats = quality_features(text)
    return df.withColumns(
        {
            **feats,
            "lang_pred": langid(text),
            "content_hash": fingerprint_md5(text),
            "fingerprint": fingerprint_weighted(text),
            "simhash": simhash64(text),
        }
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram language model — the cheap stand-in for the perplexity-based
    quality filters LLM pipelines run (a doc full of rare tokens scores
    low; repetitive common-token spam scores high). Two passes: (1) token
    frequencies via one hash aggregate, (2) score = avg ln(count/total)
    per document. Returns (id, logprob rounded 4dp, n_tokens).

    Scale: the frequency table is vocabulary-sized, broadcast here; at
    web scale (vocab >> broadcast threshold) swap the broadcast for a
    shuffle hash join on token — the plan is otherwise unchanged. The
    scalar total rides a 1-row broadcast cross join, never the driver.
    """
    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("__n"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(F.log(F.col("cnt") / F.col("__n"))), 4).alias("logprob"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
        )
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon character entropy (see queries.text_char_entropy
    for the float-discipline contract: terms folded in SORTED char order so
    the double sum is order-pinned and replayable by a SQL oracle).

    Returns (id, n_chars, n_distinct, entropy rounded 4dp). Linear:
    sequence/substring explode + two hash aggregates keyed (doc, char)
    then doc — shuffle-bounded at any corpus size."""
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col})),"
                f" i -> substring({text_col}, i, 1))"
            )
        ).alias("ch"),
    )
    cc = chars.groupBy(id_col, "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    pd_ = cc.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("ch", "c"))).alias("arr"),
        F.sum("c").alias("n"),
    )
    terms = F.transform(
        F.col("arr"), lambda s: (s["c"] / F.col("n")) * F.log(s["c"] / F.col("n"))
    )
    return pd_.select(
        F.col(id_col),
        F.col("n").cast("long").alias("n_chars"),
        F.size("arr").alias("n_distinct"),
        F.round(
            F.lit(0.0) - F.aggregate(terms, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("entropy"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k retrieval as an inverted-index join (see
    queries.text_bm25_topk for the plan-shape and float contracts).
    ``queries`` is a driver-small (query_id, term) table, broadcast.

    Returns (query_id, doc_id, rank, score rounded 4dp). The postings
    join shuffles on term (the inverted-index partitioning); per-query
    top-k is a WindowGroupLimit window."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = (
        tf.join(F.broadcast(queries), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc_id", "term",
            (
                idf * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * ((1.0 - b) + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("term").alias("t"), "c"))
                ),
                lambda s: s["c"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", F.round("score", 4).alias("score"))
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[int, str, str, int]]:
    """TRAIN BPE MERGES over a corpus (Sennrich et al. 2016, the
    tokenizer-training step every LLM data pipeline runs before
    anything tokenizes): reduce the corpus to its DISTINCT-WORD table
    with counts (the classic trick — iterations run on the vocabulary
    grain, never the corpus grain), represent each word as a symbol
    array (chars + a `</w>` end marker), then ``n_merges`` times: count
    weighted adjacent symbol pairs (one distributed aggregate), pick
    the argmax pair with (count DESC, left, right) tie-break —
    deterministic across runs — broadcast it, and merge its occurrences
    LEFT-TO-RIGHT, NON-OVERLAPPING in every word (a Catalyst aggregate
    fold; 'aaa' under (a,a) yields ['aa','a'], the reference
    semantics). Returns [(step, left, right, pair_count)].

    Exactness: equality-gated against a pure-Python reference BPE on
    the same word counts (tests/test_accuracy_gates.py).

    100 TB: the corpus is touched ONCE (word counting); each merge
    iteration is one pair-count aggregate + one map-only transform over
    the distinct-word table (≪ corpus; Zipf makes it tiny relative to
    tokens); plans localCheckpoint every iteration so lineage stays
    flat. The argmax reaching the driver is one row per iteration."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            "cnt",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = (
            words.select(
                F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                    "i", "a"
                ),
                F.col("syms"),
                F.col("cnt"),
            )
            .select(
                F.col("a"),
                F.element_at("syms", F.col("i") + 2).alias("b"),
                F.col("cnt"),
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((step, a, b, n))
        ab = a + b
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        words = words.select(merged.alias("syms"), "cnt").localCheckpoint(
            eager=True
        )
    return merges


def bpe_apply_merges(syms: Column, merges) -> Column:
    """Apply an ordered BPE merge list to a symbol-array column — each
    merge is the SAME left-to-right, non-overlapping Catalyst fold the
    trainer uses ('aaa' under (a,a) → ['aa','a']), so train and encode
    share semantics by construction."""
    def one_merge(a: str, b: str):
        ab = a + b

        def fold(acc, s):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
                ),
            ).otherwise(F.concat(acc, F.array(s)))

        return fold

    for _step, a, b, _n in merges:
        syms = F.aggregate(
            syms, F.array().cast("array<string>"), one_merge(a, b)
        )
    return syms


def bpe_encode_tokens(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENCODE a corpus under a trained BPE merge list — the apply half
    of [[bpe_train_merges]], and the token-count every packing/budget
    stage downstream actually needs: per document, the number of BPE
    tokens (and word count) under the trained vocabulary.

    Scale shape (the trainer's trick, reused): the merges are applied
    ONCE per DISTINCT word (vocabulary grain — Zipf makes it ≪ corpus),
    entirely JVM-side (Catalyst array folds, no Python in the path),
    then token counts join back to the corpus on the word and aggregate
    per document. The corpus is touched twice (word explode + join),
    the merge loop never.

    Exactness: equality-gated against a pure-Python reference encoder
    in tests/test_accuracy_gates.py (same gate family as training)."""
    words = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    ).filter(F.length("w") > 0)
    vocab = words.select("w").distinct().select(
        "w",
        F.concat(F.split(F.col("w"), ""), F.array(F.lit("</w>"))).alias(
            "syms"
        ),
    )
    encoded = vocab.select(
        "w", F.size(bpe_apply_merges(F.col("syms"), merges)).alias("w_tokens")
    )
    return (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.sum("w_tokens").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
