#!/usr/bin/env python
"""Arrow-level dtype audit: Spark plan schema vs DuckDB oracle Arrow schema.

The driver's correctness hash is computed over Arrow values, so a column
that is `int32` on the Spark side and `int64` on the oracle side (or
`decimal128` vs `int64`, the q209 round-6 failure) is one driver-side
hash change away from a red row even when every value compares equal in
Python. This audit sweeps EVERY registry entry that has an oracle:

  - oracle side: `SELECT * FROM (oracle) LIMIT 0` → `.arrow()` schema
  - Spark side:  the query's plan schema (`df.schema`, no execution for
    batch plans; streaming scenarios run their availableNow pipeline to
    produce the result frame, same as parity)

and writes TYPE_AUDIT_r{N}.json with per-query canonical-type skews.
Exit code 1 if any skew remains.

Usage:  python type_audit.py [round_number] [sf_dir] [--batch-only]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rnd = args[0] if args else "0"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    batch_only = "--batch-only" in sys.argv

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from oracle_utils import dtype_skews

    qs, osql = entry.queries(), entry.oracle_sql()
    results: dict[str, list[str] | str] = {}
    n_skew = 0
    for name in sorted(qs):
        if name not in osql:
            continue
        if batch_only and name.startswith("s"):
            continue
        try:
            df = qs[name](spark, sf_dir)
            skews = dtype_skews(df.schema, osql[name], sf_dir)
        except Exception as exc:  # noqa: BLE001
            results[name] = f"ERROR: {exc}"[:300]
            n_skew += 1
            print(name, results[name])
            continue
        if skews:
            results[name] = skews
            n_skew += 1
            print(name, skews)
        else:
            print(name, "ok")

    out = {
        "sf_dir": sf_dir,
        "batch_only": batch_only,
        "n_audited": len([n for n in qs if n in osql and not (batch_only and n.startswith("s"))]),
        "n_skewed": n_skew,
        "skews": results,
    }
    path = f"TYPE_AUDIT_r{rnd}.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), path), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {path}: {n_skew} queries with dtype skews")
    sys.exit(1 if n_skew else 0)


if __name__ == "__main__":
    main()
