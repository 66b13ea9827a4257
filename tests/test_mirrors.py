"""Cross-host mirror detection (operators/mirrors.py): planted mirror
pairs are found exactly (brute-force set-Jaccard parity), the
ubiquitous-fingerprint cap excludes boilerplate from pair evidence while
reporting it, and the pair join is fingerprint-bounded (no cartesian)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from language_identification_spark.operators.mirrors import (
    host_mirror_pairs,
    mirror_oversized_fps,
)


def _corpus(spark):
    # hostA/hostB: true mirrors (9 of 10 fps shared); hostC: unrelated;
    # fp 'boiler' appears on EVERY host (boilerplate, must be capped out)
    rows = []
    for i in range(10):
        rows.append(("hostA", f"fp{i}"))
    for i in range(9):
        rows.append(("hostB", f"fp{i}"))
    rows.append(("hostB", "fpB-only"))
    for i in range(10):
        rows.append(("hostC", f"other{i}"))
    for h in ("hostA", "hostB", "hostC", "hostD"):
        rows.append((h, "boiler"))
    # duplicate (host, fp) rows: the operator must distinct() them away
    rows += rows[:5]
    return spark.createDataFrame(rows, "host string, fp string")


def _brute(rows, thr_ppt, cap):
    from collections import defaultdict

    fp_hosts = defaultdict(set)
    for h, fp in rows:
        fp_hosts[fp].add(h)
    keep_fps = {fp for fp, hs in fp_hosts.items() if len(hs) <= cap}
    sets = defaultdict(set)
    for h, fp in rows:
        if fp in keep_fps:
            sets[h].add(fp)
    out = {}
    for a, b in combinations(sorted(sets), 2):
        shared = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and shared * 1000 >= thr_ppt * union:
            out[(a, b)] = (shared, len(sets[a]), len(sets[b]),
                           shared * 1000 // union)
    return out


def test_matches_brute_force(spark):
    df = _corpus(spark)
    rows = [(r["host"], r["fp"]) for r in df.collect()]
    want = _brute(rows, thr_ppt=500, cap=3)
    got = {
        (r["host_a"], r["host_b"]): (
            r["n_shared"], r["n_a"], r["n_b"], r["jaccard_ppt"]
        )
        for r in host_mirror_pairs(
            df, jaccard_thr_ppt=500, max_hosts_per_fp=3
        ).collect()
    }
    assert got == want
    assert ("hostA", "hostB") in got  # the planted mirror survives


def test_boilerplate_fp_is_capped_and_reported(spark):
    df = _corpus(spark)
    audit = mirror_oversized_fps(df, max_hosts_per_fp=3).collect()
    assert {(r["fp"], r["n_hosts"]) for r in audit} == {("boiler", 4)}
    # without the cap, 'boiler' alone would connect hostD to everything;
    # with it, hostD (boiler-only content) appears in no pair
    pairs = host_mirror_pairs(df, jaccard_thr_ppt=1, max_hosts_per_fp=3)
    hosts_in_pairs = {
        h for r in pairs.collect() for h in (r["host_a"], r["host_b"])
    }
    assert "hostD" not in hosts_in_pairs


def test_threshold_boundary_is_integer_exact(spark):
    # two hosts sharing 1 of 2 fps: jaccard = 1/3 exactly -> ppt 333
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "z")],
        "host string, fp string",
    )
    at = host_mirror_pairs(df, jaccard_thr_ppt=333, max_hosts_per_fp=5)
    above = host_mirror_pairs(df, jaccard_thr_ppt=334, max_hosts_per_fp=5)
    assert at.count() == 1 and above.count() == 0
    row = at.collect()[0]
    assert (row["n_shared"], row["jaccard_ppt"]) == (1, 333)


def test_no_cartesian_in_plan(spark):
    df = _corpus(spark)
    plan = host_mirror_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
