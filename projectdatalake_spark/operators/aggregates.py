"""Aggregate surface: groupBy/agg, multidimensional grouping, pivot.

The reference contains *no* aggregation (SURVEY.md §2.4 — `max` is imported
and never used, reference etl.py:7), but its stated purpose is "song play
analysis" (reference README.md:4), so the engine exposes the standard
aggregate surface as first-class operators. All Catalyst built-ins:
hash aggregates with map-side partial aggregation, so a groupBy over 100 TB
shuffles only one partial row per (task, group), not the input.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def aggregate(
    df: DataFrame, keys: Sequence[str], *aggs: Column, having: Column | None = None
) -> DataFrame:
    """groupBy().agg() with an optional HAVING filter (post-agg predicate)."""
    out = df.groupBy(*keys).agg(*aggs)
    return out.filter(having) if having is not None else out


def rollup(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Hierarchical subtotals: (k1,k2), (k1), () — one pass, one shuffle."""
    return df.rollup(*keys).agg(*aggs)


def cube(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """All grouping combinations of ``keys`` in one pass."""
    return df.cube(*keys).agg(*aggs)


def grouping_sets(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    keys: Sequence[str],
    *aggs: Column,
) -> DataFrame:
    """Explicit grouping sets (Spark 4 DataFrame API)."""
    return df.groupingSets([list(s) for s in sets], *keys).agg(*aggs)


def pivot(
    df: DataFrame,
    key: str,
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    fill: object | None = None,
) -> DataFrame:
    """Wide pivot with an explicit value list.

    Passing ``values`` matters at scale: without it Spark runs an extra
    distinct-collect job over the pivot column before planning.
    """
    out = df.groupBy(key).pivot(pivot_col, list(values)).agg(agg)
    if fill is not None:
        out = out.na.fill(fill, subset=list(values))
    return out


# --- count-min sketch (mergeable item-frequency estimation) ---------------

#: Default CMS geometry: depth-4 / width-256 ⇒ ε = e/256 ≈ 1.1% of the
#: stream length (overestimate bound), failure prob e⁻⁴ ≈ 1.8%.
CMS_SEEDS = (17, 291, 1373, 77)


def cms_sketch(
    df: DataFrame, item_col: str, width: int = 256, seeds=CMS_SEEDS
) -> DataFrame:
    """Count-min sketch as a PLAIN AGGREGATE: (row, bucket) → count for
    depth hash rows of ``width`` buckets (Cormode & Muthukrishnan '05).

    Building the sketch as a DataFrame (not an opaque binary blob) makes
    mergeability STRUCTURAL: partial sketches from any sharding merge by
    summing counts on (row, bucket) — the same two-level aggregation
    pattern as the HLL partials — and the estimate is itself a join, so
    the whole path stays JVM-side. Size is depth×width rows regardless
    of stream length: the 100 TB frequency-tracking shape."""
    from pyspark.sql import functions as F

    rows = [
        df.select(
            F.lit(i).alias("cms_row"),
            F.pmod(F.xxhash64(F.col(item_col), F.lit(seed)), F.lit(width)).alias(
                "cms_bucket"
            ),
        )
        for i, seed in enumerate(seeds)
    ]
    all_rows = rows[0]
    for r in rows[1:]:
        all_rows = all_rows.unionAll(r)
    return all_rows.groupBy("cms_row", "cms_bucket").agg(
        F.count(F.lit(1)).alias("cms_count")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 256,
    seeds=CMS_SEEDS,
) -> DataFrame:
    """Point-frequency estimates for ``items`` against a sketch: probe
    each hash row's bucket and take the min (the CM estimator). The
    sketch side is depth×width tiny — broadcast; never ≥ 1 shuffle of
    the item set."""
    from pyspark.sql import functions as F

    probes = items.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cms_row"),
                        F.pmod(
                            F.xxhash64(F.col(item_col), F.lit(seed)), F.lit(width)
                        ).alias("cms_bucket"),
                    )
                    for i, seed in enumerate(seeds)
                ]
            )
        ).alias("p"),
    ).select(item_col, "p.cms_row", "p.cms_bucket")
    return (
        probes.join(F.broadcast(sketch), ["cms_row", "cms_bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cms_count"), F.lit(0))).alias("est_count")
        )
    )


# --- exact distributed top-k heavy hitters (candidate / verify) ------------


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT top-k most frequent values of ``col`` without a global
    GROUP BY over every distinct value — the two-pass candidate/verify
    pattern that survives 100 TB vocabularies:

    Pass 1 (candidates): each partition counts its own values exactly
    (a Counter per Arrow batch run, mapInPandas) and emits only its top
    ``capacity`` — plus one null-keyed row carrying the partition's row
    count. A value absent from EVERY partition's top-``capacity`` has
    per-partition count ≤ n_p/capacity (it is below the partition's
    capacity-th counter), so its GLOBAL count is ≤ N/capacity — the
    pigeonhole bound that makes the candidate set provably complete
    whenever the true k-th count exceeds N/capacity.

    Pass 2 (verify): exact recount of candidates only — a broadcast
    semi-join against the (≤ partitions × capacity)-row candidate set,
    then one small hash aggregate. The result carries every candidate's
    EXACT global count.

    The runtime guarantee check (k-th exact count > N/capacity) and the
    loud fallback to a full global aggregate live in the query wrapper
    (queries.text_heavy_hitters) — this operator returns the candidate
    recount frame plus the threshold inputs, never a silently-maybe-
    wrong answer.

    Returns ``(recount_df[value, cnt], total_rows, partials_df)``; the
    partials frame is evaluated once (persisted — it is ≤ partitions ×
    capacity rows); callers unpersist it after materializing recount.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    def partials(batches):
        from collections import Counter

        c: Counter = Counter()
        n = 0
        for pdf in batches:
            vals = pdf[col]
            c.update(vals[vals.notna()].tolist())
            n += len(pdf)
        top = c.most_common(capacity)
        yield pd.DataFrame(
            {
                "value": [t for t, _ in top] + [None],
                "cnt": [int(v) for _, v in top] + [n],
            }
        )

    parts = (
        df.select(F.col(col).alias(col))
        .mapInPandas(partials, schema=f"value string, cnt long")
        .persist()
    )
    total = parts.filter(F.col("value").isNull()).agg(
        F.sum("cnt").alias("n")
    ).collect()[0]["n"] or 0
    cand = parts.filter(F.col("value").isNotNull()).select("value").distinct()
    recount = (
        df.select(F.col(col).alias("value"))
        .join(F.broadcast(cand), "value", "inner")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return recount, total, parts


# --- KMV (k-minimum-values) distinct sketch ---------------------------------


def kmv_sketches(
    df: DataFrame,
    key_col: str,
    hash_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-key KMV distinct sketch: the ``k`` smallest DISTINCT values of
    ``hash_col`` (a uniform integer hash of the element) per key.

    Mergeable-partial shape, same as heavy_hitters_exact: each partition
    reduces its own rows to ≤ k distinct minima per key (mapInPandas,
    numpy unique — bounded state, no unbounded collect_set), then ONE
    small hash aggregate merges the ≤ partitions × k survivors per key.
    That is exactly how a sketch aggregates at 100 TB: bounded per-task
    state, tiny mergeable partials, never a shuffle of the distinct
    element universe.

    Returns one row per key: (key, sketch array<long> ascending, n_seen
    = number of sketch entries, ≤ k). The KMV estimator and any
    union/intersection combine run on this driver-sized frame.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    def partials(batches):
        acc: dict = {}
        for pdf in batches:
            for kk, grp in pdf.groupby(key_col, sort=False)[hash_col]:
                u = grp.unique()
                prev = acc.get(kk)
                arr = u if prev is None else np.concatenate([prev, u])
                arr = np.unique(arr)  # sorts ascending
                acc[kk] = arr[:k]
        if acc:
            yield pd.DataFrame(
                {
                    key_col: np.repeat(
                        list(acc.keys()), [len(v) for v in acc.values()]
                    ),
                    hash_col: np.concatenate(list(acc.values())),
                }
            )

    parts = df.select(key_col, hash_col).mapInPandas(
        partials, schema=f"{key_col} string, {hash_col} long"
    )
    return parts.groupBy(key_col).agg(
        F.slice(F.array_sort(F.collect_set(hash_col)), 1, k).alias("sketch"),
        F.least(
            F.size(F.array_sort(F.collect_set(hash_col))), F.lit(k)
        ).alias("n_seen"),
    )


# --- bloom filter (membership pushdown for join reduction) ------------------


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5):
    """Build a BLOOM FILTER over ``df[col]`` — constant memory regardless
    of NDV, the membership structure engines push into join probes when
    the key set outgrows an IN-filter (the NDV-semi-join's complement:
    that one broadcasts exact distinct keys, this one broadcasts m/8
    bytes whatever the cardinality).

    Split of labor: hashing runs JVM-SIDE as two ``xxhash64`` Catalyst
    expressions (seeds 0x5ee0 / 0xb100), so Python never sees a raw
    value; each partition then ORs its k double-hashed positions
    (``(h1 + i·h2) mod m``, Kirsch-Mitzenmacher) into a numpy bitmap and
    emits ONE m/8-byte row — the driver ORs the partials (bounded:
    partitions × m/8 bytes). Returns (bitmap bytes, m_bits, k).

    100 TB: one linear scan, one bitmap per partition over the wire; the
    filter itself broadcasts to every probe task afterwards."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    # positions index bytes as pos >> 3 for pos < m_bits, so the bitmap
    # needs ceil(m_bits/8) bytes; a non-multiple-of-8 m_bits would index
    # one byte past an m_bits//8 array for some keys — round up instead
    m_bits = (m_bits + 7) & ~7

    hashed = df.select(
        F.xxhash64(F.col(col), F.lit(0x5EE0)).alias("h1"),
        F.xxhash64(F.col(col), F.lit(0xB100)).alias("h2"),
    )

    def partial(batches):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            h1 = pdf["h1"].values.astype(np.uint64)
            h2 = pdf["h2"].values.astype(np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bits, (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashed.mapInPandas(partial, schema="bits binary").collect()
    import numpy as _np

    merged = _np.zeros(m_bits // 8, dtype=_np.uint8)
    for r in parts:
        merged |= _np.frombuffer(r["bits"], dtype=_np.uint8)
    return merged.tobytes(), m_bits, k


def bloom_might_contain(
    df: DataFrame, col: str, bloom: tuple, keep_col: str | None = None
) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` MIGHT be in the bloom filter
    (no false negatives — an inner/semi join downstream is unaffected;
    false positives just ride through to the join). Same JVM-side
    xxhash64 pair as ``bloom_build``; the Python boundary is one
    Arrow-batched numpy gather over the broadcast bitmap."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    bits_bytes, m_bits, k = bloom
    sc = df.sparkSession.sparkContext
    bits_b = sc.broadcast(np.frombuffer(bits_bytes, dtype=np.uint8))

    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = bits_b.value
        a = h1.values.astype(np.uint64)
        b = h2.values.astype(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            ok &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return pd.Series(ok)

    probe.__annotations__ = {
        "h1": pd.Series, "h2": pd.Series, "return": pd.Series
    }
    mc = pandas_udf(probe, "boolean")
    out = df.withColumn(
        "__bloom_ok",
        mc(
            F.xxhash64(F.col(col), F.lit(0x5EE0)),
            F.xxhash64(F.col(col), F.lit(0xB100)),
        ),
    )
    if keep_col:
        return out.withColumnRenamed("__bloom_ok", keep_col)
    return out.filter(F.col("__bloom_ok")).drop("__bloom_ok")


def bloom_semi_reduce_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """BLOOM-REDUCED JOIN: build a bloom over the dim's keys, drop fact
    rows that cannot match BEFORE the join shuffle, then join. The
    big-corpus complement of ``iceberg_interop.ndv_semi_reduce_join`` —
    exact IN-filters stop scaling when the dim's distinct-key set
    outgrows a broadcast, a bloom is m/8 bytes at ANY cardinality and
    trades that for a bounded false-positive ride-through (≈ (1 −
    e^{−kn/m})^k; FPs are discarded by the join itself, so inner/semi
    results are EXACTLY the plain join's)."""
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            "bloom reduction only preserves semantics for inner/semi joins"
        )
    bloom = bloom_build(dim.select(key), key, m_bits=m_bits, k=k)
    reduced = bloom_might_contain(fact, key, bloom)
    if how in ("left_semi", "semi"):
        return reduced.join(dim.select(key).distinct(), key, "left_semi")
    return reduced.join(dim, key, how)


# --- KLL quantile sketch (mergeable rank/quantile summaries) -----------------


class KLLSketch:
    """KLL quantile sketch (Karnin–Lang–Liberty 2016, the DataSketches
    quantiles family): a stack of compactors where an item at level i
    represents 2^i input rows; when a level overflows, it sorts and
    promotes every other item to the next level. O(k·log(n/k)) retained
    items give ε ≈ O(1/k) normalized rank error at ANY n — the quantile
    member of the mergeable-sketch shelf (CMS/KMV/HLL/theta), same
    contract: per-shard sketches build in one pass and MERGE without
    revisiting rows.

    EXACT MODE (the hash-provable rung, the theta precedent): until the
    first compaction (n ≤ k) every input survives at level 0 with
    weight 1, so ``quantile_disc`` reproduces percentile_disc exactly.
    ``is_exact`` reports which regime the sketch is in; size k above
    the grain's row count when an exact oracle gate rides on it.

    Compaction uses a deterministic alternating selector instead of a
    coin flip — reproducible across runs and engines; the classic
    randomized guarantee becomes an empirical error gate
    (tests/test_accuracy_gates.py pins rank error and merge parity).
    """

    _CAP_RATIO = 2.0 / 3.0

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("KLL k must be ≥ 8")
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._coin = 0
        # exact stream extremes (round 12): compaction discards retained
        # items, so min/max of the RETAINED set drift from the stream's —
        # tracked separately, exactly like the DataSketches family, and
        # required for the official-layout export to carry true bounds
        self._min: float | None = None
        self._max: float | None = None

    # -- capacity & compaction -------------------------------------------
    def _capacity(self, level: int) -> int:
        # top level gets k, each level below shrinks by 2/3 (min 2)
        depth = len(self.compactors)
        return max(2, int(self.k * (self._CAP_RATIO ** (depth - 1 - level))))

    @property
    def num_retained(self) -> int:
        return sum(len(c) for c in self.compactors)

    def is_exact(self) -> bool:
        return len(self.compactors) == 1

    def _compress(self) -> None:
        while True:
            total_cap = sum(
                self._capacity(i) for i in range(len(self.compactors))
            )
            if self.num_retained < total_cap:
                return
            for i, c in enumerate(self.compactors):
                if len(c) >= self._capacity(i):
                    if i + 1 == len(self.compactors):
                        self.compactors.append([])
                    c.sort()
                    # deterministic alternating selector (see class doc)
                    self._coin ^= 1
                    # WEIGHT-PRESERVING compaction (round 12): only an
                    # EVEN count may promote (half the items at double
                    # weight = the same total); an odd level keeps its
                    # smallest item in place — the classic KLL rule.
                    # Restores the invariant Σ len(level)·2^level == n,
                    # which makes the distributed builders' driver-side
                    # reconstruction of n from retained weights EXACT
                    # (it drifted ±1 per odd compaction before).
                    odd = len(c) % 2
                    self.compactors[i + 1].extend(c[odd + self._coin :: 2])
                    self.compactors[i] = c[:odd]
                    break

    # -- build ------------------------------------------------------------
    def _track(self, value: float) -> None:
        if self._min is None or value < self._min:
            self._min = value
        if self._max is None or value > self._max:
            self._max = value

    def update(self, value: float) -> None:
        value = float(value)
        self.compactors[0].append(value)
        self.n += 1
        self._track(value)
        self._compress()

    def update_many(self, values) -> None:
        vals = [float(v) for v in values]
        self.compactors[0].extend(vals)
        self.n += len(vals)
        for v in vals:
            self._track(v)
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        """Union: concatenate per-level item lists, then compress — the
        mergeable-partial operation (weights are level-determined, so
        concatenation is exact; compression re-establishes capacity)."""
        out = KLLSketch(min(self.k, other.k))
        depth = max(len(self.compactors), len(other.compactors))
        out.compactors = [
            list(self.compactors[i] if i < len(self.compactors) else [])
            + list(other.compactors[i] if i < len(other.compactors) else [])
            for i in range(depth)
        ]
        out.n = self.n + other.n
        mins = [m for m in (self._min, other._min) if m is not None]
        maxs = [m for m in (self._max, other._max) if m is not None]
        out._min = min(mins) if mins else None
        out._max = max(maxs) if maxs else None
        out._compress()
        return out

    @property
    def min_value(self) -> float | None:
        """Exact stream minimum (None when empty). Pre-round-12 blobs
        restored without the tracked tail fall back to the retained
        minimum — approximately right, flagged in from_bytes."""
        if self._min is None and self.n:
            return min(v for c in self.compactors for v in c)
        return self._min

    @property
    def max_value(self) -> float | None:
        if self._max is None and self.n:
            return max(v for c in self.compactors for v in c)
        return self._max

    # -- query --------------------------------------------------------------
    def _weighted(self) -> list[tuple[float, int]]:
        items: list[tuple[float, int]] = []
        for level, c in enumerate(self.compactors):
            w = 1 << level
            items.extend((v, w) for v in c)
        items.sort(key=lambda t: t[0])
        return items

    def quantile_disc(self, q: float) -> float:
        """percentile_disc semantics: the smallest retained value whose
        cumulative weight reaches ceil(q·n) (1-based). Exact while
        ``is_exact``; ±ε·n ranks otherwise."""
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile fraction out of range: {q}")
        if self.n == 0:
            raise ValueError("empty sketch")
        target = max(1, math.ceil(q * self.n))
        cum = 0
        items = self._weighted()
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    def rank(self, value: float) -> int:
        """Estimated number of input rows ≤ value."""
        return sum(w for v, w in self._weighted() if v <= value)


    # -- serialization (engine blob format "graft-kll-v1": magic, k, n,
    # level count, then per level an item count + float64 items, then one
    # trailing byte carrying the alternating-selector phase (_coin) so a
    # RESUMED sketch compacts bitwise-identically to the live original —
    # without it a deserialized sketch restarts the selector and diverges
    # from its twin on the next compaction; little-endian throughout —
    # NOT the Apache DataSketches KLL binary layout, which this engine
    # does not claim to implement) --------------------------------------
    def to_bytes(self) -> bytes:
        import struct as _struct

        out = [b"KLL1", _struct.pack("<IQI", self.k, self.n, len(self.compactors))]
        for c in self.compactors:
            out.append(_struct.pack("<I", len(c)))
            out.append(_struct.pack(f"<{len(c)}d", *c))
        out.append(_struct.pack("<B", self._coin & 1))
        if self.n:
            # round-12 tail: the exact stream extremes (compaction can
            # discard the retained min/max) — optional for back-compat
            out.append(
                _struct.pack("<dd", self.min_value, self.max_value)
            )
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        import struct as _struct

        if data[:4] != b"KLL1":
            raise ValueError("not a graft-kll-v1 payload")
        k, n, levels = _struct.unpack_from("<IQI", data, 4)
        sk = cls(k)
        sk.n = n
        sk.compactors = []
        off = 4 + 16
        for _ in range(levels):
            (cnt,) = _struct.unpack_from("<I", data, off)
            off += 4
            sk.compactors.append(
                list(_struct.unpack_from(f"<{cnt}d", data, off))
            )
            off += 8 * cnt
        # selector phase (absent in pre-round-10 blobs: default 0, the
        # constructor's phase — those blobs never carried one)
        if off < len(data):
            (sk._coin,) = _struct.unpack_from("<B", data, off)
            off += 1
        if off + 16 <= len(data):
            sk._min, sk._max = _struct.unpack_from("<dd", data, off)
        # pre-round-12 blobs: extremes degrade to the retained set's
        # (the min_value/max_value properties derive them on demand)
        return sk

    # -- Apache DataSketches KLL binary layout (round 12 — the last
    # sketch-interop refusal). The COMPACT serialized form of
    # org.apache.datasketches.kll.KllDoublesSketch (datasketches-java
    # 6.x, cross-validated byte-for-byte against the copy Spark bundles
    # — tests/test_accuracy_gates.py::test_kll_datasketches_layout):
    #   byte 0  preamble ints (2 empty/single, 5 full)
    #   byte 1  serial version (1 full/empty, 2 single-item)
    #   byte 2  family id (15 = KLL)
    #   byte 3  flags (1 EMPTY, 2 LEVEL_ZERO_SORTED, 4 SINGLE_ITEM)
    #   bytes 4-5  k (uint16 LE);  byte 6  m (8);  byte 7  unused
    # full form continues:
    #   bytes 8-15  n (uint64);  16-17  minK;  18  numLevels;  19 unused
    #   numLevels × uint32  level offsets into the FULL item array
    #     (capacity per their (k·(2/3)^depth rounded, floor m) formula;
    #     free space below levels[0]; retained = capacity − levels[0])
    #   min item, max item (float64)
    #   the retained items, level 0 first; level 0 in REVERSE insertion
    #   order (their array fills top-down), levels ≥ 1 sorted ----------

    @staticmethod
    def _ds_int_cap_aux(k: int, depth: int) -> int:
        # KllHelper.intCapAux: rounded k·(2/3)^depth via exact integer
        # arithmetic, halved-depth recursion past 30 to bound the shift
        def aux_aux(kk: int, d: int) -> int:
            tmp = (kk << (d + 1)) // (3 ** d)
            return (tmp + 1) >> 1

        if depth <= 30:
            return aux_aux(k, depth)
        half = depth // 2
        return KLLSketch._ds_int_cap_aux(aux_aux(k, half), depth - half)

    @staticmethod
    def _ds_total_capacity(k: int, m: int, num_levels: int) -> int:
        return sum(
            max(m, KLLSketch._ds_int_cap_aux(k, num_levels - lvl - 1))
            for lvl in range(num_levels)
        )

    _DS_FAMILY_KLL = 15
    _DS_M = 8

    def to_datasketches_bytes(self) -> bytes:
        """Serialize as an Apache DataSketches ``KllDoublesSketch``
        compact image — external DataSketches readers (java/cpp/python)
        heapify it directly. Lossy ONLY in the selector phase (_coin),
        which the official layout has no slot for; the graft blob keeps
        it, so resumed-compaction determinism rides the graft twin."""
        import struct as _struct

        if self.n == 0:
            return _struct.pack(
                "<BBBBHBB", 2, 1, self._DS_FAMILY_KLL, 1, self.k, self._DS_M, 0
            )
        if self.n == 1:
            (item,) = [v for c in self.compactors for v in c]
            return _struct.pack(
                "<BBBBHBB", 2, 2, self._DS_FAMILY_KLL, 4, self.k, self._DS_M, 0
            ) + _struct.pack("<d", item)
        num_levels = len(self.compactors)
        cap = self._ds_total_capacity(self.k, self._DS_M, num_levels)
        retained = self.num_retained
        if retained > cap:
            # the engine's compactors (min level cap 2 vs their 8) can
            # transiently hold more than the official capacity — a state
            # the official offsets cannot express; normalize by
            # compacting a copy down (never raises: compression strictly
            # reduces retained)
            twin = KLLSketch(self.k)
            twin.compactors = [list(c) for c in self.compactors]
            twin.n, twin._coin = self.n, self._coin
            twin._min, twin._max = self._min, self._max
            twin._compress()
            return twin.to_datasketches_bytes()
        head = _struct.pack(
            "<BBBBHBB", 5, 1, self._DS_FAMILY_KLL, 0, self.k, self._DS_M, 0
        )
        body = [
            head,
            _struct.pack("<QHBB", self.n, self.k, num_levels, 0),
        ]
        off = cap - retained
        for c in self.compactors:
            body.append(_struct.pack("<I", off))
            off += len(c)
        body.append(_struct.pack("<dd", self.min_value, self.max_value))
        body.append(
            _struct.pack(
                f"<{len(self.compactors[0])}d", *reversed(self.compactors[0])
            )
        )
        for c in self.compactors[1:]:
            body.append(_struct.pack(f"<{len(c)}d", *sorted(c)))
        return b"".join(body)

    @classmethod
    def from_datasketches_bytes(cls, data: bytes) -> "KLLSketch":
        """Parse an Apache DataSketches ``KllDoublesSketch`` compact
        image (the inverse of ``to_datasketches_bytes``; also reads
        images produced by the official library)."""
        import struct as _struct

        pre_ints, ser_ver, family, flags, k, m, _u = _struct.unpack_from(
            "<BBBBHBB", data, 0
        )
        if family != cls._DS_FAMILY_KLL:
            raise ValueError(f"not a KLL sketch image (family {family})")
        if m != cls._DS_M:
            raise ValueError(f"unsupported KLL m={m} (expected {cls._DS_M})")
        sk = cls(k)
        if flags & 1:  # EMPTY
            return sk
        if flags & 4:  # SINGLE_ITEM
            (item,) = _struct.unpack_from("<d", data, 8)
            sk.update(item)
            return sk
        n, min_k, num_levels, _u2 = _struct.unpack_from("<QHBB", data, 8)
        offs = list(
            _struct.unpack_from(f"<{num_levels}I", data, 20)
        )
        pos = 20 + 4 * num_levels
        mn, mx = _struct.unpack_from("<dd", data, pos)
        pos += 16
        n_items = (len(data) - pos) // 8
        items = list(_struct.unpack_from(f"<{n_items}d", data, pos))
        bounds = offs + [offs[0] + n_items]
        sk.n = int(n)
        sk.k = int(min_k)  # error guarantees follow the smallest k merged
        sk._min, sk._max = mn, mx
        sk.compactors = [
            items[bounds[i] - offs[0] : bounds[i + 1] - offs[0]]
            for i in range(num_levels)
        ]
        # the image stores level 0 in reverse insertion order (their
        # array fills top-down); restore insertion order so export
        # re-reverses to the identical bytes (round-trip stability)
        sk.compactors[0] = list(reversed(sk.compactors[0]))
        return sk


def column_kll_sketch(df: DataFrame, col: str, k: int = 200) -> KLLSketch:
    """One-pass distributed KLL over ``df[col]``: each partition reduces
    its rows to ONE bounded sketch (mapInPandas — O(k·log(n/k)) state
    per task), partials travel as (level, value) rows — a sketch's
    entire state — and the driver merges ≤ #partitions sketches. The
    same two-level shape every sketch on this shelf uses: bounded task
    state, tiny mergeable partials, never a value-universe shuffle.
    Nulls are skipped (SQL aggregate semantics)."""
    import pandas as pd

    def partials(batches):
        sk = KLLSketch(k)
        for pdf in batches:
            vals = pdf[col].dropna()
            if len(vals):
                sk.update_many(vals.to_numpy())
        rows = [
            (level, v)
            for level, c in enumerate(sk.compactors)
            for v in c
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["level", "value"])

    parts = df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        partials, schema="level int, value double"
    )
    out = KLLSketch(k)
    for r in parts.collect():  # ≤ partitions × O(k log(n/k)) rows
        while len(out.compactors) <= r.level:
            out.compactors.append([])
        out.compactors[r.level].append(r.value)
        out.n += 1 << r.level
    out._compress()
    return out


def grouped_kll_quantiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    qs: Sequence[float],
    k: int = 200,
    require_exact: bool = False,
) -> DataFrame:
    """Per-key KLL quantiles as a DataFrame op (the grouped sibling of
    ``column_kll_sketch``, shaped like kmv_sketches): each partition
    reduces its rows to one bounded sketch PER KEY it holds (mapInPandas
    — O(keys-in-task · k·log(n/k)) state), partials travel as
    (key, level, value) rows, and ONE applyInPandas per key merges ≤
    partitions sketches and reads the quantiles — the value universe
    never shuffles, only sketch state does. Returns one row per key:
    (key, q_25, q_50, ... — columns named from ``qs``).

    ``require_exact``: raise unless EVERY key's sketch stayed exact
    (n ≤ k) — the oracle-gating switch; estimation-mode accuracy is the
    column form's property gate (same compactor code)."""
    import pandas as pd

    def partials(batches):
        acc: dict = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=[val_col])
            for kk, grp in pdf.groupby(key_col, sort=False)[val_col]:
                sk = acc.get(kk)
                if sk is None:
                    sk = acc[kk] = KLLSketch(k)
                sk.update_many(grp.to_numpy())
        rows = [
            (kk, level, v)
            for kk, sk in acc.items()
            for level, c in enumerate(sk.compactors)
            for v in c
        ]
        if rows:
            yield pd.DataFrame(rows, columns=[key_col, "level", "value"])

    parts = df.select(
        F.col(key_col), F.col(val_col).cast("double").alias(val_col)
    ).mapInPandas(partials, schema=f"{key_col} string, level int, value double")

    qcols = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k)
        sk.compactors = [
            [] for _ in range(int(pdf["level"].max()) + 1)
        ]
        for level, v in zip(pdf["level"], pdf["value"]):
            sk.compactors[int(level)].append(float(v))
        sk.n = int((pdf["level"].map(lambda l: 1 << int(l))).sum())
        sk._compress()
        if require_exact and not sk.is_exact():
            raise ValueError(
                f"grouped_kll_quantiles: key {pdf[key_col].iloc[0]!r} left "
                f"exact mode (n={sk.n} > k={k}) — raise k or drop "
                "require_exact"
            )
        return pd.DataFrame(
            [
                [pdf[key_col].iloc[0]]
                + [sk.quantile_disc(q) for q in qs]
            ],
            columns=[key_col] + qcols,
        )

    out_schema = f"{key_col} string, " + ", ".join(
        f"{c} double" for c in qcols
    )
    return parts.groupBy(key_col).applyInPandas(finish, schema=out_schema)
