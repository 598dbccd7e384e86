#!/usr/bin/env python
"""One-command round-close cadence (VERDICT r9: round 9 ran out of clock
mid-backlog because each closing step was launched by hand).

Runs, strictly in sequence so no two Spark sessions contend for the box:

  1. ``python bench.py``                        -> BENCH_PREVIEW.json
  2. stamp the preview                          -> BENCH_PREVIEW_r{N}.json
  3. ``python parity_full.py {N}``              -> PARITY_FULL_r{N}.json
                                                   + TYPE_AUDIT_r{N}.json
  4. ``PARITY_CLEAR_EACH=1 python parity_full.py {N}sf01 <sf0.1 dir>``
                                                -> PARITY_FULL_r{N}sf01.json
                                                   + TYPE_AUDIT_r{N}sf01.json

and prints a one-screen summary of the bars BASELINE.md defines over
these artifacts. It does NOT run bench_scaling.py (the decade is a
separate, longer commitment — run it earlier in the round) and does NOT
git-commit (read the summary first; commit the artifacts yourself).

The fresh-process decade sweep is part of the per-round cadence from
r13 on (VERDICT r12 ask #3): run
``python bench_scaling.py --decade3-fresh {N}`` as its own earlier
sitting — it merges the tracked ``decade3_fresh`` series into
``BENCH_SCALING_r{N}.json`` incrementally, with the sub-5s third-raw
estimator BASELINE.md declares.

Usage:  python round_close.py <round_number> [--skip-bench] [--skip-parity]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run(argv: list[str], env: dict | None = None) -> None:
    print(f"\n=== {' '.join(argv)} ===", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    # stream output so long steps show progress; the scripts themselves
    # persist their artifacts, stdout is advisory here
    res = subprocess.run(argv, cwd=REPO, env=e)
    if res.returncode:
        raise SystemExit(f"step failed ({res.returncode}): {' '.join(argv)}")


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        raise SystemExit(__doc__)
    # one padded round string everywhere: a single-digit round used to
    # produce BENCH_PREVIEW_r09.json next to PARITY_FULL_r9.json,
    # breaking the PARITY_FULL_r05..r08 zero-padded convention
    # (ADVICE r10)
    rnd = f"{int(sys.argv[1]):02d}"
    skip_bench = "--skip-bench" in sys.argv
    skip_parity = "--skip-parity" in sys.argv
    # a dedicated env var for the sf0.1 parity dir: SPARK_GRAFT_SF_DIR
    # also selects bench.py's scale, so reusing it here could stamp a
    # PARITY_FULL_r{N}sf01.json artifact measured at some OTHER scale
    # (ADVICE r10)
    sf01_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    if os.path.basename(sf01_dir.rstrip("/")) != "sf0.1":
        print(
            f"WARNING: sf01 parity dir is {sf01_dir} — the "
            "PARITY_FULL_r{N}sf01.json artifact name claims sf0.1",
            flush=True,
        )

    if not skip_bench:
        run([sys.executable, "bench.py"])
        shutil.copy(
            os.path.join(REPO, "BENCH_PREVIEW.json"),
            os.path.join(REPO, f"BENCH_PREVIEW_r{rnd}.json"),
        )

    if not skip_parity:
        run([sys.executable, "parity_full.py", rnd])
        run(
            [sys.executable, "parity_full.py", f"{rnd}sf01", sf01_dir],
            env={"PARITY_CLEAR_EACH": "1"},
        )

    print("\n=== round-close summary ===")
    arts = [
        f"BENCH_PREVIEW_r{rnd}.json",
        f"PARITY_FULL_r{rnd}.json",
        f"PARITY_FULL_r{rnd}sf01.json",
        f"TYPE_AUDIT_r{rnd}.json",
        f"TYPE_AUDIT_r{rnd}sf01.json",
    ]
    for name in arts:
        path = os.path.join(REPO, name)
        if not os.path.exists(path):
            print(f"{name}: MISSING")
            continue
        d = json.load(open(path))
        if name.startswith("BENCH_PREVIEW"):
            print(
                f"{name}: headline {d['value']}s med / {d['value_best']} best"
                f", r1set {d['value_r1set']}, heavy {d['value_heavy']}"
                f", ingest {d.get('ingest_msgs_per_sec')} msgs/s"
                f", stream-tuned {d.get('stream_ingest_msgs_per_sec_tuned')}"
                f" (best {d.get('stream_ingest_msgs_per_sec_tuned_best')})"
                f", corpus best {d.get('corpus_dedup_sec_best')}s"
            )
        elif name.startswith("PARITY_FULL"):
            print(f"{name}: {d['n_ok']}/{d['n_queries']} ok, {d['n_fail']} fail")
        else:
            print(f"{name}: {d['n_skewed']} dtype skews over {d['n_audited']}")
    print(f"\ncommit the artifacts: git add {' '.join(arts)}")


if __name__ == "__main__":
    main()
