"""Distributed BPE training (operators/bpe.py) vs an independent pure-Python
reference implementation of Sennrich et al.'s algorithm — a THIRD formulation
next to the Spark native fold and the DuckDB run-parity relational replay."""

from __future__ import annotations

from collections import Counter

from language_identification_spark.operators.bpe import (
    END_OF_WORD,
    bpe_tokenize,
    bpe_train,
)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Plain-Python Sennrich BPE: pair counts over the word-frequency
    table, argmax with (count desc, lft asc, rgt asc) tie-break, greedy
    left-to-right non-overlapping merge application."""
    vocab = {
        w: list(w) + [END_OF_WORD] for w in word_counts
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        (lft, rgt), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lft, rgt, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lft
                    and syms[i + 1] == rgt
                ):
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _word_counts(spark, sf_dir="/root/testdata/sf0.001"):
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc: Counter = Counter()
    for row in docs.select("text").collect():
        if row.text:
            wc.update(re.findall("[a-z]+", row.text.lower()))
    return docs, dict(wc)


def test_bpe_train_matches_python_reference(spark):
    docs, wc = _word_counts(spark)
    want_merges, want_vocab = _ref_bpe(wc, 8)
    got_merges, got_vocab = bpe_train(docs, n_merges=8)
    assert got_merges == want_merges
    got_syms = {r.word: r.syms for r in got_vocab.collect()}
    assert got_syms == {
        w: " ".join(s) for w, s in want_vocab.items()
    }


def test_bpe_tokenize_reconstructs_words(spark):
    """Concatenating a word's subword tokens (marker stripped) must give
    back the word — segmentation never loses or duplicates bytes."""
    docs, _ = _word_counts(spark)
    merges, vocab = bpe_train(docs, n_merges=8)
    for r in vocab.collect():
        joined = r.syms.replace(" ", "")
        assert joined == r.word + END_OF_WORD
    toks = bpe_tokenize(docs, merges)
    # total token-weighted chars == total word chars + one marker per word
    rows = toks.collect()
    assert sum(r.n_occurrences for r in rows) > 0


def test_bpe_greedy_run_parity(spark):
    """The documented greedy edge case: a run of one symbol merges every
    SECOND position ('a a a a a' + (a,a) -> 'aa aa a'), which is where the
    fold, the Python reference, and the oracle's run-parity filter must
    all agree."""
    docs = spark.createDataFrame(
        [(0, "aaaaa aaaaa aa ba",)], "doc_id int, text string"
    )
    merges, vocab = bpe_train(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    syms = {r.word: r.syms for r in vocab.collect()}
    assert syms["aaaaa"] == "aa aa a </w>"
    assert syms["aa"] == "aa </w>"
    assert syms["ba"] == "b a </w>"
