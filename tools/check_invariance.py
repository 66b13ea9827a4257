"""Battery-wide partition-count invariance sweep.

The correctness half of the north rule's N->4N scaling criterion: moving to
4x the executors changes input splits, shuffle-partition counts, and
partial-aggregation grouping — the answers must not. This tool runs EVERY
driver-facing query twice on the same input, once at 3 shuffle partitions
and once at 31 (coprime, both far from the session default, straddling AQE
coalescing behavior), and compares the fully-sorted row sets for exact
equality — floats included, no tolerance.

Usage:
    python tools/check_invariance.py [sf_dir] [query ...] [--json OUT]

Defaults: sf_dir=/root/testdata/sf0.001, all queries. Exit code 1 on any
mismatch. The per-query pytest tripwire lives in
tests/test_partition_invariance.py; this is the full-battery evidence run
(committed as BENCH/invariance_r*.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHUFFLE_LEVELS = (3, 31)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_path = None
    if "--json" in args:
        i = args.index("--json")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        args = args[1:]

    import __spark_entry__ as entry
    from language_identification_spark.session import get_spark

    spark = get_spark("invariance", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args or sorted(qs)

    results: dict[str, dict] = {}
    n_bad = 0
    t_start = time.time()
    for name in names:
        t0 = time.time()
        try:
            rowsets = []
            for sh in SHUFFLE_LEVELS:
                spark.conf.set("spark.sql.shuffle.partitions", str(sh))
                df = qs[name](spark, sf_dir)
                rowsets.append([tuple(r) for r in df.orderBy(*df.columns).collect()])
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            equal = rowsets[0] == rowsets[1]
            results[name] = {
                "rows": len(rowsets[0]),
                "invariant": equal,
                "sec": round(time.time() - t0, 2),
            }
            if not equal:
                n_bad += 1
                print(f"MISMATCH {name}", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — evidence run records, not hides
            results[name] = {"error": str(ex)[:200]}
            n_bad += 1
            print(f"ERROR {name}: {ex}", file=sys.stderr)
    spark.stop()

    report = {
        "sf_dir": sf_dir,
        "shuffle_levels": list(SHUFFLE_LEVELS),
        "n_queries": len(names),
        "n_failures": n_bad,
        "total_sec": round(time.time() - t_start, 1),
        "queries": results,
    }
    print(json.dumps({k: report[k] for k in ("n_queries", "n_failures", "total_sec")}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
