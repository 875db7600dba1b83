"""Relational core: projections, filters, derivations, joins, dedup.

Reference parity (SURVEY.md §2.2-2.4): P1-P6, J1-J4, D1-D4. Each helper is a
thin declarative wrapper over the DataFrame API so Catalyst keeps full
optimization freedom (column pruning, predicate pushdown, join selection).

Scale notes per operator are inline; the common themes:
- joins against small dimensions take an explicit ``broadcast`` hint;
- dedup is a hash aggregate (map-side partial) — no sort required;
- anti/semi joins use the native join types rather than the reference's
  left-join + IS NULL emulation (reference etl.py:111-116), which Catalyst
  executes with the same hash strategies minus the null-filter pass.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


# --- projections (P1-P3; reference etl.py:46, 56-60, 110) ------------------


def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Column-list projection (P1/P3). Catalyst prunes the scan to match."""
    return df.select(*columns)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Projection with rename (P2; reference selectExpr "a as b" etl.py:56-60).

    ``mapping`` is {source_column: output_name}; order defines output order.
    """
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


# --- filters & derivations (P4-P6) -----------------------------------------


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Row filter (P4; reference etl.py:91). Pushed to the scan by Catalyst."""
    return df.filter(predicate)


def derive(df: DataFrame, **cols: Column) -> DataFrame:
    """Add/replace derived columns (P6; reference withColumn etl.py:92,164-168).

    Uses ``withColumns`` (single projection) rather than chained
    ``withColumn`` calls, which each add an analyzer pass.
    """
    return df.withColumns(dict(cols))


# --- joins (J1-J4; reference etl.py:106-116, 149-155) ----------------------


def join_equi(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join (J3/J4 and friends).

    ``broadcast_right=True`` ships the build side to every executor —
    correct for true dimensions (region/nation/customer-scale), never for
    fact-fact joins. With AQE on, Spark also upgrades to broadcast at
    runtime when the built side turns out small.
    """
    r = F.broadcast(right) if broadcast_right else right
    if isinstance(on, Column):
        return left.join(r, on, how)
    return left.join(r, list(on), how)


def join_semi(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """EXISTS: native left-semi join (SURVEY.md §2.3 'not present' gap filled)."""
    return left.join(right, on if isinstance(on, Column) else list(on), "left_semi")


def join_anti(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS: native left-anti join — the idiomatic form of the
    reference's left-join + ``isNull`` filter (J2, reference etl.py:111-116)."""
    return left.join(right, on if isinstance(on, Column) else list(on), "left_anti")


def join_theta(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """Inner theta join (J1; reference etl.py:107-109).

    When the condition contains at least one equi conjunct Catalyst still
    plans a hash/sort-merge join with the theta part as a residual filter;
    a pure inequality degenerates to broadcast-nested-loop — acceptable only
    when one side is dimension-sized.
    """
    return left.join(right, condition, "inner")


# --- dedup (D1-D4; reference etl.py:61, 102, 132, 106-116) -----------------


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Full-row (or subset-key) dedup (D1-D3; reference drop_duplicates
    etl.py:61, distinct etl.py:102/132). A partial-aggregate-backed hash
    aggregate: combines map-side before the shuffle, so the shuffle carries
    only distinct rows per task."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_prefer(
    df: DataFrame,
    key: Sequence[str],
    prefer: Column,
) -> DataFrame:
    """Conditional key-level dedup, *reference-faithful* semantics (D4).

    The reference drops a user's ``free`` rows iff that user also has a
    ``paid`` row (J1 theta self-join + J2 manual anti-join, reference
    etl.py:104-116; semantic note SURVEY.md §2.3). Generalized: for each
    ``key`` group, if any row satisfies ``prefer``, keep *only* the rows
    that satisfy it; otherwise keep all rows. Rows that tie (several rows
    satisfying ``prefer``, or several non-preferred rows when none is
    preferred) are ALL kept — this is exactly the reference behaviour and
    differs from a row_number()=1 dedup.

    Implementation: one window max over the key — a single shuffle on
    ``key``, no self-join, no driver round-trips. Equivalent to (and
    cheaper than) the reference's theta-join + anti-join pair, which
    shuffles the table three times.

    A NULL ``prefer`` means "not preferred" (matching the anti-join form,
    where a NULL level simply never equals the preferred value): rows with
    NULL prefer are kept iff their key group has no preferred row.
    """
    pref = F.coalesce(prefer, F.lit(False))
    w = Window.partitionBy(*key)
    flag = F.max(pref.cast("int")).over(w)
    return (
        df.withColumn("__has_pref", flag)
        .filter((F.col("__has_pref") == 0) | pref)
        .drop("__has_pref")
    )


def dedup_prefer_reference(
    df: DataFrame,
    key: Sequence[str],
    level_col: str,
    preferred_value: str,
) -> DataFrame:
    """Reference-shaped implementation of D4, kept for parity testing.

    Mirrors the exact dataflow of reference etl.py:104-116: a theta
    self-join finds (key, non-preferred-level) pairs for keys that also
    carry the preferred level, then an anti-join removes them. We use the
    native left-anti join instead of left-join + IS NULL (J2) — identical
    output, one less filter pass.

    NULL levels: the inequality is null-SAFE, so a NULL level counts as an
    ordinary non-preferred value and is dropped when its key has the
    preferred level — matching ``dedup_prefer``'s NULL-means-not-preferred
    contract. (Raw SQL three-valued logic would silently exempt NULL rows
    from dedup: ``'paid' <> NULL`` is NULL, never true.)
    """
    kcols = list(key)
    right = df.select(
        *[F.col(c).alias(f"{c}__r") for c in kcols],
        F.col(level_col).alias(f"{level_col}__r"),
    ).dropDuplicates()
    cond = (
        ~F.col(level_col).eqNullSafe(F.col(f"{level_col}__r"))
        & (F.col(level_col) == F.lit(preferred_value))
    )
    for c in kcols:
        cond = cond & (F.col(c) == F.col(f"{c}__r"))
    dupes = (
        df.join(right, cond, "inner")
        .select(
            *[F.col(f"{c}__r").alias(f"{c}__d") for c in kcols],
            F.col(f"{level_col}__r").alias(f"{level_col}__d"),
        )
        .dropDuplicates()
    )
    # the removal join must also be null-safe on the level column (a plain
    # equi-join would never match the NULL rows the dupes table names)
    anti_cond = F.col(level_col).eqNullSafe(F.col(f"{level_col}__d"))
    for c in kcols:
        anti_cond = anti_cond & (F.col(c) == F.col(f"{c}__d"))
    return join_anti(df, dupes, anti_cond).select(*df.columns)


# --- set operations & ordering (SURVEY.md §2.6 — engine-added surface) -----


def union_all(*dfs: DataFrame) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    plus a k-row driver merge, never a full sort of the input."""
    return df.orderBy(*order_by).limit(k)


def deterministic_id(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    out: str = "row_id",
) -> DataFrame:
    """Dense, deterministic, run-stable surrogate ids without a global
    window.

    A single ``row_number() OVER (ORDER BY …)`` funnels every row through
    one task; ``monotonically_increasing_id`` is distributed but changes
    across runs (SURVEY.md §2.5 F9). This takes the middle path: number
    rows within each ``partition_by`` group, then add broadcast cumulative
    group offsets — two distributed shuffles, no task sees more than one
    group, and ids are contiguous from 1 in (group, order) order.
    ``order_by`` should be unique within a group for full determinism.

    Constraint: the offsets table is one row PER GROUP and its cumulative
    sum runs in a single task, so ``partition_by`` cardinality must be
    driver-small (≲ millions — year/month here). For a high-cardinality
    ``partition_by`` the single-partition window over #groups rows becomes
    the funnel; use a two-level scheme (group-of-groups offsets) or accept
    non-contiguous ids via ``monotonically_increasing_id``.
    """
    if not partition_by:
        raise ValueError(
            "deterministic_id requires partition_by; a fully global dense "
            "id is a single-task sort — use monotonically_increasing_id "
            "if ids need not be contiguous"
        )
    pcols = list(partition_by)
    group_w = Window.partitionBy(*pcols).orderBy(*order_by)
    offsets_w = Window.orderBy(*pcols).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        df.groupBy(*pcols)
        .count()
        .withColumn("__offset", F.coalesce(F.sum("count").over(offsets_w), F.lit(0)))
        .drop("count")
    )
    return (
        df.withColumn("__rn", F.row_number().over(group_w))
        .join(F.broadcast(offsets), pcols)
        .withColumn(out, F.col("__offset") + F.col("__rn"))
        .drop("__rn", "__offset")
    )
