"""Scalar & array expression surface.

Reference parity (SURVEY.md §2.5): the reference's entire function surface is
time-part extraction, an epoch-millis cast, and a monotonically increasing id
(F1-F11, reference etl.py:92, 124-131, 164-168). This module re-expresses
those as Catalyst built-ins and adds the array/vector/text expressions the
scale extensions need. Everything here compiles to JVM-side codegen — no
Python execution in any of these expressions.

Known deviation (documented, SURVEY.md §2.5 F7): the reference derives the
fact-table partition year with ``date_format(ts,'YYYY')`` — *week-year* — a
latent bug around Dec 29-Jan 3 that Spark 3+'s datetime formatter rejects
outright. We implement calendar ``year()`` (the author's evident intent).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# --- time (F1-F8) ----------------------------------------------------------


def epoch_millis_to_ts(col: Column) -> Column:
    """Epoch milliseconds → timestamp preserving fractional seconds.

    Exactly the reference's ``(ts/1000).cast(TimestampType())`` semantics
    (F1, reference etl.py:92): division keeps the fraction, so a DOUBLE
    input carrying fractional milliseconds (1234.56 → 1.23456 s) lands as
    microseconds rather than truncating at the millisecond (precision is
    the double mantissa — exact through epoch µs ≈ year 2255). Integer-ms
    inputs (the reference's data) are bit-identical either way
    (oracle-proven)."""
    return F.timestamp_micros((col.cast("double") * 1000).cast("long"))


def epoch_ms(col: Column) -> Column:
    """Timestamp → epoch milliseconds (inverse convenience; floor)."""
    return (col.cast("double") * 1000).cast("long")


def weekday_name(col: Column) -> Column:
    """Full weekday name, 'Monday'... (F2, reference date_format 'EEEE'
    etl.py:124)."""
    return F.date_format(col, "EEEE")


def calendar_parts(col: Column) -> dict[str, Column]:
    """hour/day/week/month/year bundle (F3-F8, reference etl.py:125-131,
    165-168; calendar year per the documented F7 deviation)."""
    return {
        "hour": F.hour(col),
        "day": F.dayofmonth(col),
        "week": F.weekofyear(col),
        "month": F.month(col),
        "year": F.year(col),
        "weekday": weekday_name(col),
    }


# --- json (engine-added; events.props) -------------------------------------


def json_get(col: Column, field: str) -> Column:
    """Extract a scalar from a JSON-string column (string-typed result)."""
    return F.get_json_object(col, f"$.{field}")


# --- vectors (engine-added; embeddings) ------------------------------------
# All JVM-side Catalyst expressions, no Python worker. Elements are cast to
# double BEFORE multiplication so accumulation is double-precision end to
# end. NOTE (round 12): higher-order functions (ZipWith/ArrayAggregate) are
# CodegenFallback — interpreted per element, one allocated zipped array per
# call, and their presence vetoes whole-stage codegen for the WHOLE
# enclosing operator — hence the unrolled fixed-dim forms below.


def _vec_dot_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two float vectors, accumulating left-to-right in
    double (the fold 0.0 + a0*b0 + a1*b1 + ...).

    Without ``dim``: the generic higher-order fold — correct for any
    lengths, but ZipWith/ArrayAggregate are CodegenFallback, so ANY
    operator containing it loses whole-stage codegen (the veto is
    structural: one fallback expression de-compiles the whole Filter/
    Project). With ``dim=d``: the same fold unrolled into plain
    GetArrayItem arithmetic — identical IEEE op order, stays inside
    codegen — null-gated on both arrays being exactly ``d`` long.
    Callers pass ``dim`` only where the corpus dimension is known
    (literal centers, probed schema); for every d-length input the two
    forms are bitwise identical, and non-d rows yield NULL (the fold
    also yields NULL for every length mismatch except the both-longer-
    than-d case, which a fixed-dim corpus never produces)."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    if dim is None or dim <= 0:
        return _vec_dot_fold(ad, bd)
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(ad, i) * F.get(bd, i)
    return F.when((F.size(ad) == dim) & (F.size(bd) == dim), acc)


def vec_dots_literal(a: Column, centers: list[list[float]]) -> list[Column]:
    """One unrolled dot product per literal center, sharing the per-index
    ``get(a, i)`` subexpressions across centers (built once, reused —
    both the Python construction cost and codegen's subexpression
    elimination benefit). Same null-gate contract as ``vec_dot(dim=d)``."""
    if not centers:
        return []
    d = len(centers[0])
    if not all(len(c) == d for c in centers):
        raise ValueError(
            "vec_dots_literal: all centers must share one dimension "
            f"(got lengths {sorted({len(c) for c in centers})})"
        )
    ad = a.cast("array<double>")
    gets = [F.get(ad, i) for i in range(d)]
    size_ok = F.size(ad) == d
    out = []
    for c in centers:
        acc = F.lit(0.0)
        for i in range(d):
            acc = acc + gets[i] * F.lit(float(c[i]))
        out.append(F.when(size_ok, acc))
    return out


def l2_norm(a: Column) -> Column:
    return F.sqrt(vec_dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two float vectors: dot/(|a||b|)."""
    return vec_dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- text (engine-added; documents) ----------------------------------------


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(col), r"\s+")


def quality_punct_ratio(col: Column) -> Column:
    """Fraction of non-word, non-space characters (quality signal)."""
    return F.length(F.regexp_replace(col, r"[\w\s]", "")) / F.length(col)
