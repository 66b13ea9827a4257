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
    _APOSTROPHES,
    CLOSING_PUNCTUATION,
    SENTENCE_PASSTHROUGH,
    UNICODE_SPACES,
    _unicode_tokenize_regex,
    char_ngrams,
    is_word_char,
    sentence_split,
    unicode_tokenize,
)


# ---------------------------------------------------------------------------
# direct transliterations of the reference generators (slow in-test oracles)
# ---------------------------------------------------------------------------


def _ref_tokenize(text):
    """Line-for-line transliteration of tokenizer.py:181-308 (base stream +
    _merge_apostrophes_into_words), words-only — the in-test oracle the
    production scan is checked against."""
    toks = []
    buf = []
    for ch in text:
        if is_word_char(ch):
            buf.append(ch)
        else:
            if buf:
                toks.append(("W", "".join(buf)))
                buf = []
            toks.append(("P", ch))
    if buf:
        toks.append(("W", "".join(buf)))

    out = []
    wait = False
    _1 = _2 = _3 = None
    for cat, tx in toks:
        if wait:
            wait = (cat == "W") or tx in _APOSTROPHES
            if cat == "W":
                out.append(tx)
        elif _1 is None:
            if cat == "W":
                _1 = tx
            else:
                wait = tx in _APOSTROPHES
        elif _2 is None:
            assert cat != "W"
            if tx in _APOSTROPHES:
                _2 = tx
            else:
                out.append(_1)
                _1 = None
        elif _3 is None:
            if cat == "W":
                _3 = tx
            else:
                wait = tx in _APOSTROPHES
                out.append(_1)
                _1 = _2 = None
        else:
            assert cat != "W"
            if tx not in _APOSTROPHES:
                out.append(_1 + _2 + _3)
            else:
                wait = True
                out.append(_1)
                out.append(_3)
            _1 = _2 = _3 = None
    if _3 is not None:
        out.append(_1 + _2 + _3)
    elif _1 is not None:
        out.append(_1)
    return out


def _ref_sentence_split(text):
    """Char-loop transliteration of tokenizer.py:398-466 sentence machine
    (single chars are token-equivalent: a word run and its chars update
    `closed` identically)."""
    out = []
    for para in text.split("\n"):
        para = para.strip()
        buf = []
        closed = False
        for ch in para:
            buf.append(ch)
            if closed and ch in UNICODE_SPACES:
                s = "".join(buf).strip()
                if s:
                    out.append(s)
                buf = []
                closed = False
                continue
            if ch not in SENTENCE_PASSTHROUGH:
                closed = ch in CLOSING_PUNCTUATION
        s = "".join(buf).strip()
        if s:
            out.append(s)
    return out

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
    # scan == reference-transliteration oracle, always
    assert tokens == _ref_tokenize(text)
    # the regex alternate is exact only away from apostrophes (it merges
    # greedily where the reference state machine refuses)
    if not any(ch in _APOSTROPHES for ch in text):
        assert tokens == _unicode_tokenize_regex(text)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("ab1'’ʼ .!ß日ク한ग") + ["́", ""]),
        max_size=60,
    )
)
def test_tokenize_scan_equals_reference_adversarial(text):
    """Apostrophe/mark-dense inputs — the merge machine's wait-state and
    multi-apostrophe branches get hammered here."""
    assert unicode_tokenize(text) == _ref_tokenize(text)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sampled_from(list("ab .!?:)\"]…。1\n\t\xa0日") + ["192.168.1.1", ".) ", '." ']),
        max_size=40,
    ).map("".join)
)
def test_sentence_split_equals_reference(text):
    """The production sentinel-regex splitter == the reference token-machine
    transliteration, on boundary-dense inputs."""
    assert sentence_split(text) == _ref_sentence_split(text)


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


# --------------------------------------------------------------------------
# round-4 link-graph: the exact-integer recurrence equals true rational
# PageRank (Fraction arithmetic), for ANY present-host subset
# --------------------------------------------------------------------------


@given(
    st.sets(st.integers(min_value=0, max_value=24), min_size=1, max_size=25),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_pagerank_integer_recurrence_equals_rational_pagerank(present, k):
    from fractions import Fraction

    from language_identification_spark.operators.linkgraph import HOST_LINKS

    links = {h: [t for t in ts if t in present] for h, ts in HOST_LINKS if h in present}
    n = len(present)
    # the exact-integer recurrence (what the operator and its SQL oracle run)
    s = {h: 1 for h in present}
    for i in range(1, k + 1):
        s = {
            v: 12 * 80 ** (i - 1)
            + 17 * sum(s[u] for u in present if v in links[u])
            for v in present
        }
    # true rational PageRank with per-link mass rank/4 and discarded
    # dangling leak (the documented convention)
    r = {h: Fraction(1, n) for h in present}
    for _ in range(k):
        r = {
            v: Fraction(3, 20) / n
            + Fraction(17, 20)
            * sum((r[u] / 4 for u in present if v in links[u]), Fraction(0))
            for v in present
        }
    scale = n * 80**k
    for h in present:
        assert Fraction(s[h], scale) == r[h], (h, k, sorted(present))


# --------------------------------------------------------------------------
# round-4 langdetect backend: determinism + probability-form invariants +
# corpus-duplication invariance on random corpora
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.sampled_from(["abc ab", "xyz yx zz", "mn mm nn", "pq qq pp"]),
        min_size=2,
        max_size=6,
    ),
    st.text(alphabet="abcxyzmnpq ", min_size=1, max_size=40),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=40, deadline=None)
def test_langdetect_gibbs_invariants(texts, query, seed):
    from language_identification_spark.operators.langdetect_gibbs import (
        PROB_THRESHOLD,
        LangdetectProfiles,
        detect_langs,
    )

    corpus = [(f"l{i % 3}", t) for i, t in enumerate(texts)]
    prof = LangdetectProfiles.train(corpus)
    got = detect_langs(query, prof, seed=seed)
    # bit-deterministic under the same seed
    assert got == detect_langs(query, prof, seed=seed)
    # probability form: filtered at threshold, sorted desc, total <= 1
    assert all(p > PROB_THRESHOLD for _, p in got)
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))
    assert sum(p for _, p in got) <= 1.0 + 1e-9
    # duplicating the whole corpus leaves every P(g|l) — hence the result —
    # unchanged
    prof2 = LangdetectProfiles.train(corpus + corpus)
    assert detect_langs(query, prof2, seed=seed) == got
