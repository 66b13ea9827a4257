"""Content-defined chunking: tiling, edit resilience, plan shape."""

from pyspark.sql import Row

from language_identification_spark.operators.winnow import cdc_chunks

TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the window and the birds sing in the garden all afternoon long"
)


def _chunks(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = {}
    for r in cdc_chunks(df, k=5, divisor=16).collect():
        out.setdefault(r.doc_id, []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r.chunk_idx)
    return out


def test_chunks_tile_the_text_exactly(spark):
    chunks = _chunks(spark, [TEXT, "", "ab"])[0]
    assert chunks
    off = 1
    for r in chunks:
        assert r.start == off
        off += r.length
    assert off - 1 == len(TEXT)


def test_short_doc_is_one_chunk(spark):
    got = _chunks(spark, ["ab"])
    [r] = got[0]
    assert (r.start, r.length) == (1, 2)


def test_edit_resilience_chunks_realign(spark):
    """Prepending text must leave the chunks after the first anchor
    boundary IDENTICAL (same md5 set) — the CDC property fixed windows
    lack."""
    edited = "XYZZY-PREFIX " + TEXT
    got = _chunks(spark, [TEXT, edited])
    md5_orig = {r.chunk_md5 for r in got[0]}
    md5_edit = {r.chunk_md5 for r in got[1]}
    shared = md5_orig & md5_edit
    # everything from the second chunk on re-aligns
    assert shared
    assert len(shared) >= len(md5_orig) - 1


def test_plan_zero_exchange_single_map(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        cdc_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
