"""Dump EXECUTED (AQE-final) SQL plans of one registered query.

Runs the query with the UI enabled and writes every SQL execution's
final plan description (the UI's /sql REST payload — the only place
AQE-final plans and codegen ids are visible; explain() on an
AdaptiveSparkPlan shows the initial plan only).

Usage: python tools/dump_executed_plans.py <query> [sf_dir] [outfile]
Writes plans/<outfile or r13/<query>_executed.txt>.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(repo, "plans", "r13", f"{name}_executed.txt")
    )
    spark = get_spark("xplans", extra_confs={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4099",
    })
    qs = entry_mod.queries()
    spark.sparkContext.setJobDescription(name)
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    ui = spark.sparkContext.uiWebUrl or "http://localhost:4099"
    app_id = spark.sparkContext.applicationId
    execs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?details=true"
        f"&planDescription=true&length=1000"
    ))
    with open(out, "w") as f:
        for e in execs:
            f.write(f"===== execution {e['id']}: {e.get('description','')[:200]}\n")
            f.write(f"duration_ms={e.get('duration')} "
                    f"status={e.get('status')}\n")
            f.write(e.get("planDescription", "") + "\n\n")
    print(f"wrote {out} ({len(execs)} executions)")
    spark.stop()


if __name__ == "__main__":
    main()
