"""jusText-style block classification (operators/blocks.py): threshold
boundaries as exact integer tests, both context-pass directions, neighbor
transparency of short/neargood/empty blocks, main-text assembly order, and
the zero-extra-exchange plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from language_identification_spark.operators.blocks import (
    JUSTEXT_STOPS,
    LENGTH_HIGH,
    LENGTH_LOW,
    content_blocks,
    extract_main_text,
)

# stopword-saturated filler: every token is a stopword, so the density
# test passes at any length and length alone selects the class
def _dense(n_bytes: int) -> str:
    # 'the ' repeated, trimmed to exactly n_bytes (all-ASCII: bytes==chars)
    s = ("the " * (n_bytes // 4 + 2))[:n_bytes]
    return s.strip() + "x" * (n_bytes - len(s.strip()))  # pad w/o new spaces


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id bigint, html string")


def _cls(spark, html):
    rows = content_blocks(_docs(spark, [(0, html)])).collect()
    return [(r.block_idx, r.cls_ctx, r.cls) for r in sorted(rows, key=lambda r: r.block_idx)]


def test_dense_helper_is_exact():
    for n in (LENGTH_LOW, LENGTH_HIGH, LENGTH_HIGH + 1):
        s = _dense(n)
        assert len(s.encode()) == n
        words = s.split(" ")
        assert 10 * sum(w in JUSTEXT_STOPS for w in words) >= 3 * len(words)


def test_length_boundaries(spark):
    # exactly LENGTH_LOW is NOT short; LENGTH_LOW-1 is; exactly LENGTH_HIGH
    # is neargood (needs > HIGH for good); HIGH+1 is good
    html = (
        f"<p>{_dense(LENGTH_LOW - 1)}</p>"
        f"<p>{_dense(LENGTH_LOW)}</p>"
        f"<p>{_dense(LENGTH_HIGH)}</p>"
        f"<p>{_dense(LENGTH_HIGH + 1)}</p>"
    )
    got = {i: ctx for i, ctx, _ in _cls(spark, html)}
    assert list(got.values()) == ["short", "neargood", "neargood", "good"]


def test_link_density_boundary(spark):
    # density EXACTLY 0.2 is NOT bad (strict 5*link > total); one more link
    # byte tips it. Body filler is stopword-dense so the boundary pair
    # differs ONLY in the link test (the ok case lands neargood, not the
    # final else-bad).
    ok = f'<p>{_dense(79)} <a href="/">{"y" * 20}</a></p>'  # 100B, link 20
    bad = f'<p>{_dense(78)} <a href="/">{"y" * 21}</a></p>'  # 100B, link 21
    assert _cls(spark, ok)[0][1] == "neargood"
    assert _cls(spark, bad)[0][1] == "bad"


def test_context_promotion_from_prev_and_next(spark):
    good = _dense(LENGTH_HIGH + 30)
    # short between two bads -> bad; short with good BEFORE -> good;
    # short with good AFTER -> good
    nav = '<div><a href="/">aaaaaaaaaa</a></div>'
    assert _cls(spark, f"{nav}<h1>tiny</h1>{nav}")[1][2] == "bad"
    assert _cls(spark, f"<p>{good}</p><h1>tiny</h1>{nav}")[1][2] == "good"
    assert _cls(spark, f"{nav}<h1>tiny</h1><p>{good}</p>")[1][2] == "good"


def test_context_skips_unconfident_neighbors(spark):
    # short -> (neargood, short, empty) are transparent; nearest CONFIDENT
    # neighbor is the far good block
    good = _dense(LENGTH_HIGH + 30)
    near = _dense(LENGTH_LOW + 5)
    html = f"<h1>tiny</h1><p>{near}</p><p></p><p>{good}</p>"
    got = _cls(spark, html)
    # all three non-empty blocks resolve good (h1 and neargood promoted)
    assert [c for _, _, c in got] == ["good", "good", "good"]


def test_edge_without_confident_neighbor_is_bad(spark):
    # a lone short block: no confident neighbor on either side -> bad
    assert _cls(spark, "<h1>tiny</h1>")[0][2] == "bad"


def test_main_text_order_and_counts(spark):
    g1 = _dense(LENGTH_HIGH + 10)
    g2 = _dense(LENGTH_HIGH + 50)
    nav = '<div><a href="/">aaaaaaaaaa</a></div>'
    df = _docs(spark, [(7, f"<p>{g1}</p>{nav}<p>{g2}</p>")])
    row = extract_main_text(df).collect()[0]
    assert (row.n_blocks, row.n_good) == (3, 2)
    joined = f"{g1}\n{g2}"
    assert row.main_bytes == len(joined.encode())
    import hashlib

    assert row.main_md5 == hashlib.md5(joined.encode()).hexdigest()


def test_no_operator_exchange(spark):
    # the operator adds NO exchange beyond whatever the input already has
    df = _docs(spark, [(0, "<p>x</p>")])
    for out in (content_blocks(df), extract_main_text(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan
