"""Sequence packing: stream invariants, boundary cases, plan shape."""

from pyspark.sql import Row

from language_identification_spark.operators.packing import pack_sequences


def _collect(spark, corpus, ctx_len, n_shards=4):
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in corpus])
    return pack_sequences(
        docs, ctx_len=ctx_len, n_shards=n_shards
    ).collect()


def test_stream_is_contiguous_per_shard(spark):
    corpus = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(60)]
    rows = _collect(spark, corpus, ctx_len=10)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in shard_rows:
            # concatenation: each doc starts exactly where the previous ended
            assert r.start_off == off
            off += r.n_tok
            # window span matches the integer arithmetic definition
            assert r.first_pack == r.start_off // 10
            assert r.last_pack == (r.start_off + r.n_tok - 1) // 10
            assert r.packs_spanned == r.last_pack - r.first_pack + 1


def test_boundary_cases(spark):
    # one shard so the stream is a single sequence: 10-token ctx;
    # doc 1 = 10 tok (exactly one window), doc 2 = 1 tok (starts window 1),
    # doc 3 = 25 tok (spans windows 1..3)
    corpus = [
        (1, " ".join(["a"] * 10)),
        (2, "b"),
        (3, " ".join(["c"] * 25)),
        (4, ""),  # empty doc: excluded
        (5, "   "),  # whitespace-only: zero tokens, excluded
    ]
    rows = {r.doc_id: r for r in _collect(spark, corpus, 10, n_shards=1)}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].first_pack, rows[1].last_pack) == (0, 0)
    assert (rows[2].first_pack, rows[2].last_pack) == (1, 1)
    assert (rows[3].first_pack, rows[3].last_pack) == (1, 3)
    assert rows[3].packs_spanned == 3


def test_shard_assignment_is_deterministic_and_spread(spark):
    corpus = [(i, "x y z") for i in range(200)]
    a = {r.doc_id: r.shard for r in _collect(spark, corpus, 8, n_shards=8)}
    b = {r.doc_id: r.shard for r in _collect(spark, corpus, 8, n_shards=8)}
    assert a == b
    assert len(set(a.values())) == 8  # all shards used at n=200


def test_packing_plan_single_exchange(spark):
    """One shuffle (the shard-key window), nothing else — the 100 TB shape."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        pack_sequences(docs, 128, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert n_shuffles == 1, plan
