"""Host link graph + exact-integer PageRank (operators/linkgraph.py):
graph invariants, extraction parity, and the integer recurrence pinned
against an independent pure-Python simulation — including the
leaking-mass case where some hosts have no crawled pages."""

from __future__ import annotations

from language_identification_spark.operators.linkgraph import (
    HOST_LINKS,
    N_HOST_SLOTS,
    OUTDEG,
    extract_host_edges,
    host_pagerank,
    synth_linked_pages,
)


def test_graph_invariants():
    assert len(HOST_LINKS) == N_HOST_SLOTS
    indeg: dict[int, int] = {}
    for h, ts in HOST_LINKS:
        assert len(ts) == OUTDEG
        assert len(set(ts)) == OUTDEG
        assert h not in ts
        assert all(0 <= t < N_HOST_SLOTS for t in ts)
        for t in ts:
            indeg[t] = indeg.get(t, 0) + 1
    # the point of the fixture: a SKEWED indegree (non-trivial ranks)
    assert min(indeg.get(t, 0) for t in range(N_HOST_SLOTS)) == 0
    assert max(indeg.values()) >= 10


def _simulate(present: set[int], k: int = 3) -> dict[int, int]:
    """Independent integer PageRank: S_0 = 1, S_k = 12*80^(k-1) + 17 * sum
    of in-neighbor S_{k-1}, edges restricted to present->present."""
    links = {h: [t for t in ts if t in present] for h, ts in HOST_LINKS}
    s = {h: 1 for h in present}
    for i in range(1, k + 1):
        s = {
            v: 12 * 80 ** (i - 1)
            + 17 * sum(s[u] for u in present if v in links[u])
            for v in present
        }
    return s


def test_extraction_counts_and_edges(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(100)], schema="doc_id bigint"
    )
    edges = extract_host_edges(synth_linked_pages(docs)).collect()
    # 100 docs over 25 hosts -> 4 docs/host, 4 targets each
    assert len(edges) == N_HOST_SLOTS * OUTDEG
    expected = {(h, t) for h, ts in HOST_LINKS for t in ts}
    assert {(r.src, r.dst) for r in edges} == expected
    assert all(r.n_docs == 4 for r in edges)


def test_exact_rank_full_graph(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(250)], schema="doc_id bigint"
    )
    got = {
        int(r.host.removeprefix("site").removesuffix(".example.com")): r
        for r in host_pagerank(docs).collect()
    }
    want = _simulate(set(range(N_HOST_SLOTS)))
    assert len(got) == N_HOST_SLOTS
    for h, s in want.items():
        assert got[h].rank_scaled == s
        assert got[h].n_docs == 10
        assert abs(got[h].rank - s / (25 * 512000.0)) < 1e-8
    # mass conservation bound: total rank <= 1 (leak-free on the full graph
    # since every target host is crawled): sum S_3 == 25 * 512000 exactly
    assert sum(want.values()) == 25 * 512000


def test_exact_rank_with_absent_hosts(spark):
    # only hosts 0..9 crawled: edges to 10..24 leak their mass
    docs = spark.createDataFrame(
        [(i,) for i in range(500) if i % N_HOST_SLOTS < 10],
        schema="doc_id bigint",
    )
    present = set(range(10))
    got = {
        int(r.host.removeprefix("site").removesuffix(".example.com")): r
        for r in host_pagerank(docs).collect()
    }
    want = _simulate(present)
    assert set(got) == present
    for h in present:
        assert got[h].rank_scaled == want[h]
    # leaked mass: strictly less total rank than the leak-free bound
    assert sum(want.values()) < 10 * 512000


def test_anchor_text_profile_counts(spark):
    from language_identification_spark.operators.linkgraph import (
        ANCHOR_WORDS,
        anchor_text_profile,
        synth_anchored_pages,
    )

    # 50 docs -> every host slot has exactly 2 pages (doc_id % 25)
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id bigint")
    pages = synth_anchored_pages(docs)
    prof = anchor_text_profile(pages).collect()

    # independent simulation of the synthesis
    from language_identification_spark.operators.linkgraph import HOST_LINKS

    links = {}  # (dst, term) -> [n_links, set(src)]
    for d in range(50):
        h = d % 25
        for t in dict(HOST_LINKS)[h]:
            for term in (ANCHOR_WORDS[(d + t) % 10], f"site{t}"):
                k = (t, term)
                links.setdefault(k, [0, set()])
                links[k][0] += 1
                links[k][1].add(h)
    got = {
        (int(r.host.removeprefix("site").removesuffix(".example.com")), r.term):
            (r.n_links, r.n_src_hosts)
        for r in prof
    }
    want = {k: (v[0], len(v[1])) for k, v in links.items()}
    assert got == want
    # the spam-resistance distinction is actually exercised: some term has
    # more links than distinct linking hosts
    assert any(nl > ns for nl, ns in got.values())


def test_anchor_profile_plan_shape(spark):
    from language_identification_spark.operators.linkgraph import (
        anchor_text_profile,
        synth_anchored_pages,
    )

    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id bigint")
    plan = (
        anchor_text_profile(synth_anchored_pages(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one corpus exchange (the (dst, term) agg; the distinct-src partial
    # rides it as the expand/partial-agg pair), dim join broadcast, no
    # Python, no sort-merge join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def _simulate_harmonic(present):
    """Independent BFS: (n_d1..n_d4, hc_scaled) per present host."""
    from language_identification_spark.operators.linkgraph import HOST_LINKS

    links = {
        h: [t for t in ts if t in present]
        for h, ts in HOST_LINKS
        if h in present
    }
    out = {}
    for v in links:
        # shortest distance INTO v from every other present host
        nd = {1: 0, 2: 0, 3: 0, 4: 0}
        for u in links:
            if u == v:
                continue
            # BFS from u
            seen, frontier, d = {u}, {u}, 0
            found = None
            while frontier and d < 4:
                d += 1
                frontier = {
                    t for s in frontier for t in links.get(s, [])
                    if t not in seen
                }
                seen |= frontier
                if v in frontier:
                    found = d
                    break
            if found:
                nd[found] += 1
        out[v] = (
            nd[1], nd[2], nd[3], nd[4],
            12 * nd[1] + 6 * nd[2] + 4 * nd[3] + 3 * nd[4],
        )
    return out


def test_harmonic_full_graph(spark):
    from language_identification_spark.operators.linkgraph import host_harmonic

    docs = spark.createDataFrame([(i,) for i in range(250)], "doc_id bigint")
    got = {
        int(r.host.removeprefix("site").removesuffix(".example.com")):
            (r.n_d1, r.n_d2, r.n_d3, r.n_d4, r.hc_scaled)
        for r in host_harmonic(docs).collect()
    }
    want = _simulate_harmonic(set(range(N_HOST_SLOTS)))
    assert got == want
    # the 6-dp-rounded float rides the exact int
    for r in host_harmonic(docs).collect():
        assert r.harmonic == round(r.hc_scaled / 12.0, 6)


def test_harmonic_absent_hosts(spark):
    from language_identification_spark.operators.linkgraph import host_harmonic

    docs = spark.createDataFrame(
        [(i,) for i in range(500) if i % N_HOST_SLOTS < 10],
        "doc_id bigint",
    )
    got = {
        int(r.host.removeprefix("site").removesuffix(".example.com")):
            (r.n_d1, r.n_d2, r.n_d3, r.n_d4, r.hc_scaled)
        for r in host_harmonic(docs).collect()
    }
    want = _simulate_harmonic(set(range(10)))
    assert got == want


def test_exact_operator_caps_raise(spark):
    # VERDICT r4 #3: the documented dim-size envelope is now enforced —
    # exceeding max_hosts / max_dist_pairs errors loudly with the
    # HyperBall pointer instead of silently building a straggler
    import pytest

    from language_identification_spark.operators.linkgraph import (
        extract_host_edges,
        host_harmonic_exact,
        host_pagerank_exact,
        synth_linked_pages,
    )

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    edges = extract_host_edges(synth_linked_pages(docs))
    with pytest.raises(ValueError, match="HyperBall"):
        host_pagerank_exact(edges, max_hosts=10)
    with pytest.raises(ValueError, match="HyperBall"):
        host_harmonic_exact(edges, max_hosts=10)
    with pytest.raises(ValueError, match="HyperBall"):
        host_harmonic_exact(edges, max_dist_pairs=20)


def test_exact_operators_leave_no_cached_blocks(spark):
    # ADVICE r4: repeated invocations must not accumulate executor
    # storage — all intermediate caches are unpersisted before returning
    from language_identification_spark.operators.linkgraph import (
        host_harmonic,
        host_pagerank,
    )

    import gc

    # delta-based: other tests in the shared session legitimately hold
    # bounded caches (e.g. q_doc_perplexity's CacheManager-deduped count
    # table) — assert the link-graph ops add NO blocks, not that the
    # session is globally cache-free
    def rdd_ids() -> set[int]:
        # fresh java map each call — getPersistentRDDs() is a snapshot
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(i) for i in jmap.keySet().toArray()}

    pre = rdd_ids()

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    # two invocations each — the r4 leak grew per invocation (edges +
    # every BFS round stayed cached forever). Hold every result frame:
    # while held, the ONLY legitimately-persistent blocks are the four
    # eager-localCheckpoint results (one per invocation); any intermediate
    # cache (edges, per-round BFS dist) would push the delta past 4. This
    # is deterministic — unlike asserting zero after release, which races
    # the ContextCleaner's weak-ref reclamation of the checkpoint RDDs.
    results = []
    for _ in range(2):
        for op in (host_pagerank, host_harmonic):
            df = op(docs)
            df.collect()
            results.append(df)
    held = rdd_ids() - pre
    assert len(held) <= len(results), (
        f"intermediate caches leaked: {len(held)} new persistent RDDs for "
        f"{len(results)} held results (ids {sorted(held)})"
    )

    # The checkpoint blocks themselves are cleaner-owned: once the caller
    # drops the result frame, Spark's ContextCleaner reclaims the
    # localCheckpoint RDD via weak references (standard lifecycle). We do
    # NOT assert on that here — reclamation latency is a property of the
    # ContextCleaner + py4j finalization, nondeterministic under test
    # (observed 50/50 within a 20 s gc-poll window), and not the regression
    # ADVICE r4 was about. The contract this test pins is the one that
    # matters at scale: intermediates never outlive the call, so repeated
    # invocations hold O(results-held) blocks, not O(invocations x rounds).
    del results, df
    gc.collect()
