"""Scalar/array expression surface (SURVEY.md §2.5 F1-F11 + extensions)."""

from projectdatalake_spark.functions.scalar import (  # noqa: F401
    calendar_parts,
    cosine_similarity,
    epoch_millis_to_ts,
    epoch_ms,
    json_get,
    l2_norm,
    quality_punct_ratio,
    tokens,
    vec_dot,
    weekday_name,
)
