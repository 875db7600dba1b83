"""Property-based differential tests (hypothesis).

Each property pits an engine operator against an independently-written
reference implementation (pure Python, or the reference-faithful Spark
form) on randomized small inputs — the operators' semantic contracts must
hold on EVERY input, not just the corpus the oracles sample.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from projectdatalake_spark.operators.dedup import connected_components
from projectdatalake_spark.operators.merge import merge_upsert
from projectdatalake_spark.operators.relational import (
    dedup_prefer,
    dedup_prefer_reference,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_spark = None


def _get_spark():
    # session-scoped fixture can't cross into @given; reuse the active session
    from projectdatalake_spark.session import get_spark

    global _spark
    if _spark is None:
        _spark = get_spark("pytest", shuffle_partitions=8)
    return _spark


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),  # key
            st.sampled_from(["paid", "free", "trial", None]),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_dedup_prefer_forms_equivalent(rows):
    spark = _get_spark()
    if not rows:
        return
    df = spark.createDataFrame(
        [(f"u{k}", lvl) for k, lvl in rows], "user_id string, level string"
    )
    fast = dedup_prefer(df, ["user_id"], F.col("level") == "paid")
    faithful = dedup_prefer_reference(df, ["user_id"], "level", "paid")
    key = lambda r: (r.user_id, r.level or "")
    assert sorted(fast.collect(), key=key) == sorted(faithful.collect(), key=key)


@SETTINGS
@given(
    target=st.lists(st.tuples(st.integers(0, 9), st.integers(-100, 100)), max_size=20),
    source=st.lists(st.tuples(st.integers(0, 9), st.integers(-100, 100)), max_size=20),
)
def test_merge_upsert_contract(target, source):
    spark = _get_spark()
    # unique keys per side (MERGE contract: source keys unique)
    target = list({k: v for k, v in target}.items())
    source = list({k: v for k, v in source}.items())
    if not target and not source:
        return
    t = spark.createDataFrame(target or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    )
    s = spark.createDataFrame(source or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    )
    got = {r.k: r.v for r in merge_upsert(t, s, ["k"]).collect()}
    expected = dict(target)
    expected.update(dict(source))
    assert got == expected


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        max_size=20,
    )
)
def test_connected_components_vs_union_find(edges):
    spark = _get_spark()
    n = 15
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(None, None)],
        "id_a long, id_b long",
    ).filter(F.col("id_a").isNotNull())
    got = {
        r.doc_id: r.cluster_id for r in connected_components(pairs, nodes).collect()
    }

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}
    assert got == expected
