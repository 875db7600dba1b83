"""Driver-contract smoke: entry() runs and every query executes at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_query_has_runnable_plan(query_frames):
    # frames built once per session (conftest.query_frames — r13: the
    # four registry sweeps no longer rebuild all ~412 plans each)
    assert query_frames, "query registry is empty"
    for name, df in query_frames.items():
        # schema resolution + a cheap action on the smoke scale
        assert df.columns, name
        df.limit(1).collect()


def test_oracles_reference_known_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
