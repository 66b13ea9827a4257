"""Per-host cap (operators/hostcap.py): the salted two-phase top-K must
select EXACTLY what the naive single window selects — at any salt count,
any partitioning, with and without a quality ordering — and small hosts
keep everything."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from language_identification_spark.operators.hostcap import host_cap_sample


def _docs(spark, n=200):
    # hot-host skew: 70% of docs on one host, rest spread over 6 hosts
    rows = [
        (i, "hot" if i % 10 < 7 else f"h{i % 6}", f"text {i} " + "w" * (i % 13))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, host string, text string")


def _naive(rows, k, keyfn):
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    out = {}
    for h, rs in by_host.items():
        rs.sort(key=keyfn)
        for rank, r in enumerate(rs[:k], 1):
            out[(h, r["doc_id"])] = rank
    return out


def test_matches_naive_window_any_salt(spark):
    rows = [r.asDict() for r in _docs(spark).collect()]
    want = _naive(
        rows, 5, lambda r: (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"])
    )
    for s in (1, 4, 16, 64):
        got = {
            (r.host, r.doc_id): r.pick_rank
            for r in host_cap_sample(
                _docs(spark).repartition(s % 7 + 2), k=5, salt_buckets=s
            ).collect()
        }
        assert got == want, f"salt_buckets={s}"


def test_order_col_keeps_best(spark):
    # keep the 3 LONGEST texts per host (desc byte length, doc_id tiebreak)
    df = _docs(spark, 60)
    got = host_cap_sample(
        df, k=3, order_col=-F.octet_length("text")
    ).collect()
    rows = [r.asDict() for r in df.collect()]
    want = _naive(rows, 3, lambda r: (-len(r["text"].encode()), r["doc_id"]))
    assert {(r.host, r.doc_id): r.pick_rank for r in got} == want


def test_small_hosts_keep_everything(spark):
    df = spark.createDataFrame(
        [(i, f"h{i}", "t") for i in range(10)],
        "doc_id bigint, host string, text string",
    )
    out = host_cap_sample(df, k=7).collect()
    assert len(out) == 10 and all(r.pick_rank == 1 for r in out)


def test_phase1_window_is_salted(spark):
    plan = (
        host_cap_sample(_docs(spark), k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two row_number windows; the FIRST (deepest) partitions on
    # (host, _salt) — the hot host never sorts on one task — and Spark's
    # WindowGroupLimit kicks in on BOTH (Partial mode = map-side top-K
    # before each exchange, the free half of the two-phase plan)
    assert plan.count("Window [row_number()") == 2
    assert "_salt" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "Python" not in plan
