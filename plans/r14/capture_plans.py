#!/usr/bin/env python
"""Capture .explain('formatted') snapshots for the bench-measured
queries into plans/r13/<query>_<tag>.txt (tag = before/after).

Usage: python plans/r13/capture_plans.py <tag> [query ...]
Defaults to the full bench surface (HEADLINE + HEAVY).

Runs under the same session config as bench.py (get_spark), so the
captured plans are the plans the bench actually executes. Capturing a
plan builds the query (fragment pins + boundary probes fire) but does
not execute the full job.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from astarte_data_updater_plant_spark.plans.inspect import formatted_plan  # noqa: E402
from astarte_data_updater_plant_spark.plans.registry import queries_map  # noqa: E402
from astarte_data_updater_plant_spark.session import get_spark  # noqa: E402

from bench import HEADLINE, HEAVY  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE) + list(HEAVY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture")
    qmap = queries_map()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
