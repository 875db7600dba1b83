"""Doc-honesty gates: numbers the front-door docs quote must match the
code they describe (round-6 verdict: README undercounted the registry by
25% because the count was free prose)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_readme_registry_counts_match_registry():
    from projectdatalake_spark import queries as Q

    text = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) queries \((\d+) oracle-backed\)", text)
    assert m, "README.md must state the registry size"
    assert int(m.group(1)) == len(Q.QUERIES), (
        f"README says {m.group(1)} queries; registry has {len(Q.QUERIES)} — "
        "update the line in README.md"
    )
    assert int(m.group(2)) == len(Q.ORACLES), (
        f"README says {m.group(2)} oracle-backed; registry has "
        f"{len(Q.ORACLES)} — update the line in README.md"
    )
