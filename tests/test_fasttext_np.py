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


def test_word_ngram_sign_extension():
    """Native addWordNgrams stores hashes as int32 and sign-extends to
    uint64; hashes >= 2^31 (e.g. hash('</s>') = 3617362777) must combine
    via their negative int32 reinterpretation — pinned after review found
    the unsigned variant diverges on virtually every line."""
    from language_identification_spark.operators.fasttext_np import (
        word_ngram_ids,
    )

    hashes = [ft_hash("hello"), ft_hash("world"), ft_hash(EOS)]
    assert hashes[2] == 3617362777 >= 2**31
    ids = word_ngram_ids(hashes, 2, 2_000_000)
    # manual native-semantics recompute
    h01 = (
        (hashes[0] - (2**32 if hashes[0] >= 2**31 else 0)) * 116049371
        + (hashes[1] - (2**32 if hashes[1] >= 2**31 else 0))
    ) & 0xFFFFFFFFFFFFFFFF
    h12 = (
        (hashes[1] - (2**32 if hashes[1] >= 2**31 else 0)) * 116049371
        + (hashes[2] - 2**32)
    ) & 0xFFFFFFFFFFFFFFFF
    assert ids == [h01 % 2_000_000, h12 % 2_000_000]
    assert ids[1] == 1298458  # golden: unsigned combine gives 265754


def test_pruneidx_sentinel_is_minus_one(tmp_path):
    """Unpruned dictionaries store pruneidx_size = -1, NOT 0: native
    ``Dictionary::isPruned()`` is ``pruneidx_size_ >= 0``, so 0 means
    pruned-with-an-EMPTY-map — every ngram bucket is dropped by pushHash."""
    import struct as _s

    path, *_ = _build_model(tmp_path)
    raw = open(path, "rb").read()
    # dict header sits right after 8B magic/version + 48B int args + 8B t:
    # 3 int32 (size, nwords, nlabels) then int64 ntokens, int64 pruneidx
    off = 8 + 48 + 8 + 12 + 8
    (pruneidx_size,) = _s.unpack_from("<q", raw, off)
    assert pruneidx_size == -1
    unpruned = load_model(path)
    assert unpruned.pruneidx is None
    # a file claiming pruneidx_size == 0 loads as pruned: in-vocab words
    # keep only their word id, word-ngram/OOV bucket ids all vanish
    patched = bytearray(raw)
    _s.pack_into("<q", patched, off, 0)
    p2 = tmp_path / "pruned.bin"
    p2.write_bytes(bytes(patched))
    m = load_model(str(p2))
    assert m.pruneidx == {}
    wid = m.word_id["hello"]
    eos = m.word_id[EOS]
    assert m.line_ids("hello zzz-oov") == [wid, eos]


def test_version11_supervised_forces_maxn_zero(tmp_path):
    """fasttext.cc loadModel: v11 supervised models stored an unused
    nonzero maxn — the loader must zero it like native does."""
    import struct as _s

    path, *_ = _build_model(tmp_path)  # maxn=4
    raw = bytearray(open(path, "rb").read())
    _s.pack_into("<i", raw, 4, 11)  # version field
    p2 = tmp_path / "v11.bin"
    p2.write_bytes(bytes(raw))
    m = load_model(str(p2))
    assert m.args.maxn == 0
    ids = m.line_ids("hello world")
    # maxn=0: the 3 tokens (incl. EOS) contribute one word id each — no
    # char ngrams; word_ngrams=2 appends exactly 2 bucket ids
    assert len(ids) == 5
    assert all(i < len(m.words) for i in ids[:3])
    assert all(i >= len(m.words) for i in ids[3:])


def test_sigmoid_losses_and_hs_rejected(tmp_path):
    from language_identification_spark.operators.fasttext_np import (
        LOSS_HS,
        LOSS_NS,
        LOSS_OVA,
    )

    path, args, words, inp, out = _build_model(tmp_path)
    m = load_model(path)
    for loss in (LOSS_NS, LOSS_OVA):
        m.args.loss = loss
        r = dict(m.predict("hello world", k=3))
        # per-label sigmoid: unnormalized, each in (0,1), ranking preserved
        assert not abs(sum(r.values()) - 1.0) < 1e-6
        assert all(0.0 < p < 1.0 for p in r.values())
        assert max(r, key=r.get) == "__label__en"
    m.args.loss = LOSS_HS
    with pytest.raises(NotImplementedError, match="hierarchical"):
        m.predict("hello", k=1)
    m.args.loss = args.loss


def test_newline_stops_the_line(tmp_path):
    """Native getLine stops at the first newline (EOS); scoring must not
    leak tokens from subsequent lines."""
    path, *_ = _build_model(tmp_path)
    m = load_model(path)
    assert (
        m.predict("hello world\nbonjour le monde bonjour le monde", k=1)
        == m.predict("hello world", k=1)
    )


def test_literal_eos_stops_the_line(tmp_path):
    """Dictionary::getLine breaks at the first EOS token — a literal
    '</s>' in web text (scraped markup) ends the line exactly like a
    newline does, and everything after it is ignored."""
    path, *_ = _build_model(tmp_path)
    m = load_model(path)
    assert m.line_ids("hello </s> bonjour le monde") == m.line_ids("hello")
    assert (
        m.predict("hello world </s> bonjour le monde bonjour", k=1)
        == m.predict("hello world", k=1)
    )


def test_numpy_engine_supports_header_probe(tmp_path):
    """numpy_engine_supports answers from 64 header bytes: True only for
    supervised non-hs models the engine can actually score — an
    unsupervised .bin (cc.*.300-style) or hs-loss model reports False at
    the driver instead of throwing inside every executor task."""
    import struct

    from language_identification_spark.operators.fasttext_np import (
        LOSS_HS,
        MODEL_CBOW,
        numpy_engine_supports,
    )

    path, *_ = _build_model(tmp_path)
    assert numpy_engine_supports(path) is True
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<i", raw, 8 + 7 * 4, MODEL_CBOW)  # model field
    bad = tmp_path / "cc.300.bin"
    bad.write_bytes(bytes(raw))
    assert numpy_engine_supports(str(bad)) is False
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<i", raw, 8 + 6 * 4, LOSS_HS)  # loss field
    hs = tmp_path / "hs.bin"
    hs.write_bytes(bytes(raw))
    assert numpy_engine_supports(str(hs)) is False
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"\x00" * 10)
    assert numpy_engine_supports(str(junk)) is False
    assert numpy_engine_supports(str(tmp_path / "absent.bin")) is False


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

    # native lib genuinely absent — though the plumbing test's addPyFile'd
    # stand-in may already be importable in suite order; it delegates real
    # model files to this numpy engine, so the known-answer asserts below
    # hold either way
    sys.modules.pop("fasttext", None)
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


# ---------------------------------------------------------------------------
# product-quantized .ftz path
# ---------------------------------------------------------------------------


def test_quantized_roundtrip_exact(tmp_path):
    """dsub=3 with dim=8 exercises the last-subquantizer offset quirk
    (nsubq=3, lastdsub=2, centroid base = (nsubq-1)*256*dsub). The exact
    PQ encoding reconstructs verbatim, so predictions must EQUAL the dense
    model's bit for bit."""
    from language_identification_spark.operators.fasttext_np import (
        save_quantized_model,
    )

    path, args, words, inp, out = _build_model(tmp_path)
    dense = load_model(path)
    qpath = str(tmp_path / "synthetic.ftz")
    save_quantized_model(
        qpath, args, words, [(l, 10) for l in LABELS], inp, out, dsub=3
    )
    m = load_model(qpath)
    assert m.args == args
    assert np.array_equal(m.input, inp)
    assert np.array_equal(m.output, out)
    for text in ["hello world", "bonjour le monde", "hallo welt", "zzz oov"]:
        assert m.predict(text, k=3) == dense.predict(text, k=3)


def test_quantized_qnorm_and_qout(tmp_path):
    """qnorm stores l2-normalized rows + separately-quantized norms
    (reconstruction = norm * unit row, one f32 divide+multiply of rounding);
    qout quantizes the output matrix too."""
    from language_identification_spark.operators.fasttext_np import (
        save_quantized_model,
    )

    path, args, words, inp, out = _build_model(tmp_path)
    dense = load_model(path)
    qpath = str(tmp_path / "qnorm.ftz")
    save_quantized_model(
        qpath, args, words, [(l, 10) for l in LABELS], inp, out,
        dsub=2, qnorm=True, qout=True,
    )
    m = load_model(qpath)
    assert np.allclose(m.input, inp, rtol=1e-5, atol=1e-7)
    assert np.allclose(m.output, out, rtol=1e-5, atol=1e-7)
    for text in ["hello world and", "bonjour le monde", "hallo welt der"]:
        (ql, qp), (dl, dp) = m.predict(text, k=1)[0], dense.predict(text, k=1)[0]
        assert ql == dl
        assert qp == pytest.approx(dp, rel=1e-4)


def test_quantized_zero_norm_row(tmp_path):
    """A zero row survives qnorm quantization (norm centroid 0, unit row 0)
    instead of dividing by zero."""
    from language_identification_spark.operators.fasttext_np import (
        _read_quant,
        _write_quant,
    )
    import io

    mat = np.array(
        [[0.0] * 6, [1.0, -2.0, 3.0, 0.5, 0.25, -0.125]], dtype=np.float32
    )
    buf = io.BytesIO()
    _write_quant(buf, mat, 2, True)
    buf.seek(0)
    got = _read_quant(buf)
    assert np.allclose(got, mat, rtol=1e-6, atol=0.0)
    assert np.array_equal(got[0], np.zeros(6, dtype=np.float32))


def test_pruned_quantized_model(tmp_path):
    """quantize -cutoff semantics: kept ngram buckets are re-indexed into a
    compacted input matrix via pruneidx; everything else is dropped. The
    pruned model's line_ids must be the order-preserving remap-or-drop of
    the dense model's ids, and every surviving id must dereference to the
    SAME embedding row."""
    from language_identification_spark.operators.fasttext_np import (
        save_quantized_model,
    )

    path, args, words, inp, out = _build_model(tmp_path)
    dense = load_model(path)
    nwords = len(words)
    kept = sorted(
        set(compute_subwords("hello", args.minn, args.maxn, BUCKET))
        | set(compute_subwords("bonjour", args.minn, args.maxn, BUCKET))
    )
    assert kept  # fixture sanity
    pruneidx = {h: i for i, h in enumerate(kept)}
    pruned_inp = np.vstack([inp[:nwords], inp[nwords + np.asarray(kept)]])
    qpath = str(tmp_path / "pruned.ftz")
    save_quantized_model(
        qpath, args, words, [(l, 10) for l in LABELS], pruned_inp, out,
        dsub=2, pruneidx=pruneidx,
    )
    m = load_model(qpath)
    assert m.pruneidx == pruneidx

    def remap(ids):
        outl = []
        for i in ids:
            if i < nwords:
                outl.append(i)
            elif (i - nwords) in pruneidx:
                outl.append(nwords + pruneidx[i - nwords])
        return outl

    for text in ["hello wrld-oov bonjour", "hallo welt", "bonjour"]:
        dense_ids = dense.line_ids(text)
        pruned_ids = m.line_ids(text)
        assert pruned_ids == remap(dense_ids)
        # surviving ids point at identical vectors in both matrices
        if pruned_ids:
            assert np.array_equal(
                m.input[np.asarray(pruned_ids)],
                inp[np.asarray([d for d in dense_ids
                                if d < nwords or (d - nwords) in pruneidx])],
            )
    # something was actually dropped (word-ngram buckets of non-kept pairs)
    assert len(m.line_ids("hallo welt")) < len(dense.line_ids("hallo welt"))


def test_ftz_udf_path_without_native_lib(spark, tmp_path, monkeypatch):
    """The executor-side UDF path accepts a .ftz: fasttext_available()
    passes and the numpy engine scores it in real workers."""
    import sys

    from language_identification_spark.operators.fasttext_np import (
        save_quantized_model,
    )

    sys.modules.pop("fasttext", None)  # order-robust: see note above
    path, args, words, inp, out = _build_model(tmp_path)
    qpath = str(tmp_path / "model.ftz")
    save_quantized_model(
        qpath, args, words, [(l, 10) for l in LABELS], inp, out,
        dsub=2, qnorm=True,
    )
    monkeypatch.setenv("FASTTEXT_MODEL_PATH", qpath)
    from language_identification_spark.operators import lid

    monkeypatch.setattr(lid, "_FASTTEXT_SINGLETON", {})
    assert lid.fasttext_available() is True
    df = spark.createDataFrame(
        [("hello world and the",), ("bonjour le monde",)], "text string"
    )
    rows = (
        df.repartition(2)
        .select("text", lid.fasttext_lid_udf()(F.col("text")).alias("r"))
        .collect()
    )
    got = {r["text"]: r["r"]["lang"] for r in rows}
    assert got == {"hello world and the": "en", "bonjour le monde": "fr"}


def test_pq_decode_random_codes_vs_rowwise_reference():
    """_pq_decode with ARBITRARY codes (not the exact-identity encoding)
    against a direct per-row transliteration of ProductQuantizer::addcode +
    get_centroids — catches centroid-offset bugs identity codes can't."""
    from language_identification_spark.operators.fasttext_np import (
        KSUB,
        _pq_decode,
    )

    rng = np.random.default_rng(11)
    for dim, dsub in [(8, 3), (7, 2), (5, 5), (4, 1)]:
        nsubq = (dim + dsub - 1) // dsub
        lastdsub = dim % dsub or dsub
        centroids = rng.normal(size=dim * KSUB).astype(np.float32)
        m = 40
        codes = rng.integers(0, KSUB, size=(m, nsubq), dtype=np.uint8)
        got = _pq_decode(codes, dim, nsubq, dsub, lastdsub, centroids)
        for t in range(m):
            row = np.zeros(dim, dtype=np.float32)
            for sq in range(nsubq):
                i = codes[t, sq]
                if sq == nsubq - 1:
                    c = centroids[sq * KSUB * dsub + i * lastdsub:]
                    d = lastdsub
                else:
                    c = centroids[(sq * KSUB + i) * dsub:]
                    d = dsub
                row[sq * dsub : sq * dsub + d] = c[:d]
            assert np.array_equal(got[t], row), (dim, dsub, t)
