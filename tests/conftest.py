from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projectdatalake_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def query_frames(spark, sf_dir) -> dict:
    """Every registered query's DataFrame, built ONCE per session.

    The registry-wide sweeps (runnable-plan, no-cartesian, no-row-UDF,
    global-window audit) each rebuilt all ~412 frames — four times ~5-8
    minutes of pure plan construction, the dominant cost of the whole
    suite (r13 durations: the four sweeps were 474+327+322+292 s of a
    35-minute run). Building a frame is idempotent (driver-side probes
    inside query functions re-run, at smoke scale), so one shared build
    preserves exactly what each sweep asserted."""
    import __spark_entry__ as entry_mod

    return {
        name: fn(spark, sf_dir) for name, fn in entry_mod.queries().items()
    }
