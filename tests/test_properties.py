"""Property-based tests (hypothesis) for the row-wise oracle semantics.

The reference's own testing style is invariant asserts and fast-vs-slow
cross-checks (emd_1d, dictionary_langid/datatypes.py:337-341); these encode
the same invariants generatively. All driver-side (pure Python oracle) — the
Spark side equals the oracle by the parity suite, so properties proven here
transfer.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from language_identification_spark.oracle.kneser_ney import train_kn
from language_identification_spark.oracle.quality import doc_stats
from language_identification_spark.oracle.scrub import SCRUB_PATTERNS, scrub_text
from language_identification_spark.oracle.tokenize import (
    _unicode_tokenize_regex,
    char_ngrams,
    is_word_char,
    unicode_tokenize,
)

text_strategy = st.text(max_size=300)
# printable-ish multilingual text including spaces/punct/CJK/arabic
mixed_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
    ),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(mixed_text)
def test_tokenize_invariants(text):
    tokens = unicode_tokenize(text)
    joined = "".join(tokens)
    # every token is non-empty and every char of a token exists in the input
    assert all(tokens), tokens
    for ch in joined:
        assert ch in text
    # every word char of the input survives into some token
    n_word_chars = sum(1 for ch in text if is_word_char(ch))
    assert sum(1 for ch in joined if is_word_char(ch)) == n_word_chars
    # determinism
    assert unicode_tokenize(text) == tokens
    # regex alternate == per-char scan (the reference's fast-vs-slow pattern)
    assert tokens == _unicode_tokenize_regex(text)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("ab1'’ʼ .!ß日ク한ग") + ["́", ""]),
        max_size=60,
    )
)
def test_tokenize_fast_equals_scan_adversarial(text):
    """Apostrophe/mark/private-use-dense inputs — the cases where the regex
    and the scan could plausibly disagree."""
    assert unicode_tokenize(text) == _unicode_tokenize_regex(text)


@settings(max_examples=200, deadline=None)
@given(mixed_text, st.integers(min_value=1, max_value=6))
def test_char_ngrams_invariants(text, n):
    grams = char_ngrams(text, n)
    expected = max(len(text) - n + 1, 0)
    assert len(grams) == expected
    assert all(len(g) == n and g in text for g in grams)


@settings(max_examples=150, deadline=None)
@given(mixed_text)
def test_scrub_removes_all_pii(text):
    """After scrubbing, no scrub pattern matches anywhere in the output
    (idempotence: scrubbing twice changes nothing)."""
    out = scrub_text(text)
    for _name, pattern, repl in SCRUB_PATTERNS:
        # placeholder tokens like <URL> must not themselves re-match
        leftovers = [
            m for m in re.findall(pattern, out) if m not in {repl}
        ]
        assert not leftovers, (_name, leftovers)
    assert scrub_text(out) == out


@settings(max_examples=150, deadline=None)
@given(mixed_text)
def test_doc_stats_bounds(text):
    s = doc_stats(text)
    assert s["word_count"] >= 0
    for frac in ("digit_frac", "dup_line_frac", "repeated_char_frac",
                 "bullet_line_frac", "ellipsis_line_frac"):
        assert 0.0 <= s[frac] <= 1.0, (frac, s[frac])
    assert s["mean_word_len"] >= 0.0
    # determinism (rules must be retry-safe)
    assert doc_stats(text) == s


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=1, max_size=40),
        min_size=2,
        max_size=8,
    ),
    st.text(alphabet="abcdefgz ", min_size=1, max_size=20),
    st.integers(min_value=2, max_value=4),
)
def test_kn_model_properties(corpus, probe, order):
    """KN invariants on arbitrary small corpora and orders: probabilities
    normalize over the event space at every context; perplexity is finite
    and positive for ANY probe (incl. OOV chars) — this test found the
    zero-discount/zero-backoff-mass bug (MIN_DISCOUNT)."""
    m = train_kn(corpus, order=order)
    vocab = sorted(m.counts[1])
    for ctx in ["a", "z", "", "ab", "zz"]:
        ctx = ctx[: m.order - 1]
        total = sum(m.prob(ctx, w) for w in vocab) + m.prob(ctx, "\x01")
        assert abs(total - 1.0) < 1e-9, ctx
    p = m.perplexity(probe)
    assert p > 0.0 and p != float("inf")


def test_propagate_min_labels_random_graphs(spark):
    """Connected-components property: on random graphs, the distributed
    min-label propagation (neighbor min + pointer jumping to fixpoint) must
    label every node with the MINIMUM id of its component — checked against
    a plain union-find oracle over many graph shapes including long chains
    (the pointer-jump stress case)."""
    import random

    from language_identification_spark.queries import propagate_min_labels

    def uf_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp: dict = {}
        for n in nodes:
            comp.setdefault(find(n), set()).add(n)
        return {n: min(members) for members in comp.values() for n in members}

    rng = random.Random(11)
    cases = []
    # random sparse graphs
    for trial in range(3):
        n = rng.randint(5, 40)
        edges = {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(1, n))
        }
        cases.append(sorted(edges))
    # a long chain — worst case for plain propagation, exercises jumping
    cases.append([(i, i + 1) for i in range(30)])
    # two chains + an isolated pair
    cases.append([(i, i + 1) for i in range(10)] + [(20 + i, 21 + i) for i in range(8)] + [(50, 51)])

    for edges in cases:
        df = spark.createDataFrame(edges, "x long, y long")
        got = {
            r["doc_id"]: r["lbl"] for r in propagate_min_labels(df).collect()
        }
        nodes = {a for a, _ in edges} | {b for _, b in edges}
        want = uf_components(edges, nodes)
        assert got == want, (edges, got, want)
