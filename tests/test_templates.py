"""Host-level template detection + scrubbing (operators/templates.py):
majority boundary, presence-not-occurrence counting, cross-host isolation,
order-preserving scrub, and pass-through for template-free hosts."""

from __future__ import annotations

from language_identification_spark.operators.templates import (
    host_template_lines,
    scrub_template_lines,
)

NAV = "home | about"
FOOT = "(c) example"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, schema="doc_id bigint, host string, text string"
    )


def test_majority_boundary_and_min_pages(spark):
    # host a: 4 docs — NAV on all 4 (100%), FOOT on exactly 2 (50% -> kept:
    # 2*2 >= 4), 'rare' on 1 (25% -> dropped); host b: 1 doc — its line
    # appears on 100% of pages but fails min_pages=2
    docs = _docs(spark, [
        (0, "a", f"{NAV}\nbody zero\n{FOOT}"),
        (1, "a", f"{NAV}\nbody one\n{FOOT}"),
        (2, "a", f"{NAV}\nbody two\nrare"),
        (3, "a", f"{NAV}\nbody three"),
        (4, "b", "lonely line"),
    ])
    tpl = {(r.host, r.line): r for r in host_template_lines(docs).collect()}
    assert set(tpl) == {("a", NAV), ("a", FOOT)}
    assert tpl[("a", NAV)].n_pages == 4 and tpl[("a", NAV)].n_host_docs == 4
    assert tpl[("a", FOOT)].n_pages == 2
    assert abs(tpl[("a", FOOT)].page_frac - 0.5) < 1e-9


def test_presence_not_occurrence(spark):
    # a page repeating the footer 3 times still counts ONCE toward the
    # majority; 1-of-2 pages -> 50% -> kept at the boundary
    docs = _docs(spark, [
        (0, "a", f"{FOOT}\nx\n{FOOT}\ny\n{FOOT}"),
        (1, "a", "plain page"),
    ])
    tpl = host_template_lines(docs, min_pages=1).collect()
    by_line = {r.line: r.n_pages for r in tpl}
    assert by_line[FOOT] == 1


def test_cross_host_isolation(spark):
    # the same line on 100% of host a must not scrub host b's single use
    docs = _docs(spark, [
        (0, "a", f"{NAV}\naaa"),
        (1, "a", f"{NAV}\nbbb"),
        (2, "b", f"{NAV}\nccc"),
        (3, "b", "ddd"),
    ])
    tpl = host_template_lines(docs)
    assert {(r.host, r.line) for r in tpl.collect()} == {("a", NAV)}
    out = {r.doc_id: r for r in scrub_template_lines(docs, tpl).collect()}
    assert out[0].scrubbed_text == "aaa" and out[0].n_lines_removed == 1
    assert out[2].scrubbed_text == f"{NAV}\nccc"
    assert out[2].n_lines_removed == 0


def test_scrub_preserves_order_and_trims(spark):
    docs = _docs(spark, [
        (0, "a", f"  {NAV}  \nfirst\n{FOOT}\nsecond\n"),
        (1, "a", f"{NAV}\nthird\n{FOOT}"),
    ])
    tpl = host_template_lines(docs)  # NAV and FOOT on 2/2 pages
    out = {r.doc_id: r for r in scrub_template_lines(docs, tpl).collect()}
    # leading/trailing space trimmed before matching; survivors keep order
    assert out[0].scrubbed_text == "first\nsecond"
    assert out[0].n_lines_removed == 2


def test_templateless_host_passthrough(spark):
    docs = _docs(spark, [
        (0, "z", "alpha\nbeta"),
        (1, "z", "gamma\ndelta"),
    ])
    tpl = host_template_lines(docs)
    assert tpl.count() == 0
    out = {r.doc_id: r for r in scrub_template_lines(docs, tpl).collect()}
    assert out[0].scrubbed_text == "alpha\nbeta"
    assert out[1].n_lines_removed == 0


def test_output_column_clash_raises(spark):
    # an input already carrying an output column name must fail loudly,
    # not silently shadow (ADVICE r4: collision-safe internal names)
    import pytest

    docs = _docs(spark, [(0, "a", f"{NAV}\nx"), (1, "a", f"{NAV}\ny")])
    tpl = host_template_lines(docs)
    pre_scrubbed = scrub_template_lines(docs, tpl)
    with pytest.raises(ValueError, match="scrubbed_text"):
        scrub_template_lines(pre_scrubbed, tpl)


def test_input_named_tpl_lines_is_safe(spark):
    # a user column named tpl_lines (the OLD internal name) must survive
    # untouched — internal names are now collision-proofed
    from pyspark.sql import functions as F

    docs = _docs(spark, [(0, "a", f"{NAV}\nx"), (1, "a", f"{NAV}\ny")])
    docs2 = docs.withColumn("tpl_lines", F.lit("user-data"))
    tpl = host_template_lines(docs)
    out = {r.doc_id: r for r in scrub_template_lines(docs2, tpl).collect()}
    assert out[0].tpl_lines == "user-data"
    assert out[0].scrubbed_text == "x"
