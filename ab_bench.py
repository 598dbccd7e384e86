#!/usr/bin/env python
"""Same-session interleaved A/B attribution harness (VERDICT r7, ask #1).

Why this exists: the box drifts +-20%/hour, so two bench numbers pinned
hours (or rounds) apart cannot attribute a delta to CODE. Round 7 left
two such deltas unattributed: batch ingest (BENCH_r06 91,938 msgs/s ->
BENCH_r07 71,479 — while the SAME round's 40-min-warm scaling session
measured 113,662) and q170_zipf_fit (1.318s -> 1.622s median). This
harness runs both trees' code through IDENTICAL fresh-subprocess probes,
strictly interleaved (A,B,A,B,...) within ONE session on one box, so
box drift hits both trees equally and any residual delta is code.

Each probe is a fresh JVM (matching bench.py's isolated-family
methodology) that measures, from the tree under test:
  - batch ingest: events_as_messages(sf0.1) -> run_batch -> noop sink,
    1 warm-up + 5 timed runs (bench.py's exact estimator), and
  - q170_zipf_fit: 1 warm-up + 5 timed runs, noop sink.

It also re-measures ingest a SECOND time inside the same (now warm)
probe process, to quantify how much of the bench.py-vs-bench_scaling
gap is JVM/python-worker warmth rather than code (bench_scaling's
ingest_point runs ~40 min into a session; bench.py's family runs
~90 s into a fresh one).

Usage:
  python ab_bench.py <labelA>=<treeA> <labelB>=<treeB> [reps] [out.json]
  python ab_bench.py --probe <tree>          # internal, one subprocess
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 5


def _measure(run, warmups: int = 1, runs: int = RUNS) -> dict:
    for _ in range(warmups):
        run()
    raw = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        raw.append(time.perf_counter() - t0)
    return {
        "sec": round(statistics.median(raw), 3),
        "best": round(min(raw), 3),
        "raw": [round(t, 3) for t in raw],
    }


def probe(tree: str) -> None:
    sys.path.insert(0, tree)
    from astarte_data_updater_plant_spark.plans.registry import queries_map
    from astarte_data_updater_plant_spark.session import get_spark
    from astarte_data_updater_plant_spark.sources.stream import (
        events_as_messages,
        telemetry_interface,
    )
    from astarte_data_updater_plant_spark.streaming.pipeline import run_batch

    spark = get_spark("ab_probe")
    qmap = queries_map()
    out: dict = {"tree": tree}

    msgs = events_as_messages(spark, SF_DIR).persist()
    n = msgs.count()

    def ingest():
        run_batch(msgs, interfaces=(telemetry_interface(),)).write.format(
            "noop"
        ).mode("overwrite").save()

    m = _measure(ingest)
    out["ingest_msgs"] = n
    out["ingest"] = {**m, "msgs_per_sec": round(n / m["sec"])}
    # second block in the SAME process: quantifies pure warmth uplift
    m2 = _measure(ingest, warmups=0)
    out["ingest_warm"] = {**m2, "msgs_per_sec": round(n / m2["sec"])}
    msgs.unpersist()

    def q170():
        qmap["q170_zipf_fit"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    out["q170"] = _measure(q170)
    print("PROBE_JSON " + json.dumps(out))


def main() -> None:
    specs = [a.split("=", 1) for a in sys.argv[1:3]]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "AB_ATTRIBUTION_r08.json"
    results: dict[str, list[dict]] = {label: [] for label, _ in specs}
    order: list[str] = []
    for rep in range(reps):
        for label, tree in specs:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe", tree],
                capture_output=True, text=True, timeout=1800, check=True,
                cwd=tree,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("PROBE_JSON ")][-1]
            d = json.loads(line[len("PROBE_JSON "):])
            d["rep"] = rep
            d["wall_clock"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            results[label].append(d)
            order.append(label)
            print(label, "rep", rep, "ingest", d["ingest"]["msgs_per_sec"],
                  "warm", d["ingest_warm"]["msgs_per_sec"],
                  "q170", d["q170"]["sec"], flush=True)

    def agg(label: str, fam: str, key: str) -> dict:
        vals = [r[fam][key] for r in results[label]]
        return {
            "median": round(statistics.median(vals), 3),
            "raw": vals,
            "spread": round(max(vals) - min(vals), 3),
        }

    summary = {}
    for label, _ in specs:
        summary[label] = {
            "ingest_msgs_per_sec": agg(label, "ingest", "msgs_per_sec"),
            "ingest_warm_msgs_per_sec": agg(label, "ingest_warm", "msgs_per_sec"),
            "q170_sec": agg(label, "q170", "sec"),
        }
    (la, _), (lb, _) = specs
    summary["ratio_B_over_A"] = {
        "ingest_msgs_per_sec": round(
            summary[lb]["ingest_msgs_per_sec"]["median"]
            / summary[la]["ingest_msgs_per_sec"]["median"], 3),
        "q170_sec": round(
            summary[lb]["q170_sec"]["median"]
            / summary[la]["q170_sec"]["median"], 3),
    }
    artifact = {
        "metric": "ab_attribution",
        "sf_dir": SF_DIR,
        "interleave_order": order,
        "trees": {label: tree for label, tree in specs},
        "summary": summary,
        "probes": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--probe":
        probe(sys.argv[2])
    else:
        main()
