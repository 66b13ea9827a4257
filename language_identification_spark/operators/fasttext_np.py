"""Pure-numpy fastText supervised inference (S6/L1 real path).

The reference wraps the native ``fasttext`` package around ``lid.176.bin``
(fasttext_wrapper.py:17-45). That package is absent in this sandbox, which
round 1/2 left the real model path import-gated and untested. This module
removes the gate: a from-scratch reader of the public fastText binary model
format plus the supervised prediction math, derived ONLY from the published
format/algorithm of facebookresearch/fastText (BSD; format in
``src/fasttext.cc saveModel/loadModel``, ``src/dictionary.cc save/load``,
``src/args.cc save/load``; FNV-1a token hash and char-ngram walk in
``src/dictionary.cc hash/computeSubwords``; word-ngram combine in
``addWordNgrams``). No fastText code is vendored — the format is a public
on-disk contract, like parquet.

Supported: supervised models with softmax loss (what ``lid.176.bin`` is)
and ns/ova loss (scored with the native per-label sigmoid of
``BinaryLogisticLoss::computeOutput``); BOTH dense ``.bin`` matrices and
product-quantized ``.ftz`` matrices (``src/quantmatrix.cc`` /
``src/productquantizer.cc`` load format: uint8 codes + 256-centroid
subquantizer tables + optional separately-quantized row norms), including
the pruned dictionaries ``quantize -cutoff`` produces
(``Dictionary::pushHash`` remap semantics — kept ngram buckets are
re-indexed via pruneidx, dropped ones contribute nothing). Quantized
matrices are decoded to dense float32 once at load: a PQ model is small by
construction (lid.176.ftz reconstructs to ~12 MB), so decode cost is a
one-time per-executor startup step and the hot scoring path stays a dense
mat-vec. NOT supported (loud ``NotImplementedError``):
hierarchical-softmax prediction (needs the Huffman tree).

Inference is vectorized: the hidden vector is a single ``np.mean`` over
input-matrix rows, label scores one mat-vec; per-batch cost is dominated by
tokenization. ``save_supervised_model`` writes the same format so the full
path (file -> dictionary -> subwords -> prediction) is exercisable with a
deterministic synthetic model — and asserts round-trip identity in tests.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = 793712314
VERSION = 12

# args.h enums
LOSS_HS, LOSS_NS, LOSS_SOFTMAX, LOSS_OVA = 1, 2, 3, 4
MODEL_CBOW, MODEL_SG, MODEL_SUP = 1, 2, 3

EOS = "</s>"
BOW, EOW = "<", ">"
_WHITESPACE = " \t\n\v\f\r\0"


def ft_hash(s: str | bytes) -> int:
    """fastText's FNV-1a 32-bit over UTF-8 bytes with the C++ quirk that
    each byte is sign-extended (``uint32_t(int8_t(c))``) before the xor."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = 2166136261
    for c in s:
        if c >= 128:
            c -= 256  # int8_t sign extension
        h = (h ^ (c & 0xFFFFFFFF)) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def compute_subwords(word: str, minn: int, maxn: int, bucket: int) -> list[int]:
    """Char-ngram bucket ids of BOW+word+EOW, walking UTF-8 byte boundaries
    exactly like ``Dictionary::computeSubwords`` (1-char ngrams that are the
    bare BOW/EOW are skipped). Returns bucket-relative ids (no nwords
    offset)."""
    b = (BOW + word + EOW).encode("utf-8")
    out: list[int] = []
    size = len(b)
    for i in range(size):
        if (b[i] & 0xC0) == 0x80:
            continue  # not a char start
        j, n = i, 1
        ngram = bytearray()
        while j < size and n <= maxn:
            ngram.append(b[j])
            j += 1
            while j < size and (b[j] & 0xC0) == 0x80:
                ngram.append(b[j])
                j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == size)):
                out.append(ft_hash(bytes(ngram)) % bucket)
            n += 1
    return out


def _i32(h: int) -> int:
    """Reinterpret a uint32 as int32 — the native dictionary stores token
    hashes in ``vector<int32_t>``, so values >= 2^31 wrap negative."""
    return h - 2**32 if h >= 2**31 else h


def word_ngram_ids(
    word_hashes: list[int], word_ngrams: int, bucket: int
) -> list[int]:
    """``Dictionary::addWordNgrams``: rolling combine h = h*116049371 + h2
    over windows of 2..word_ngrams tokens; bucket-relative ids. Both the
    seed and each addend are int32-SIGN-EXTENDED to uint64 first (native:
    ``uint64_t h = hashes[i]`` where hashes is ``vector<int32_t>``) —
    without this, every window containing a hash >= 2^31 lands in a wrong
    bucket."""
    out: list[int] = []
    n = len(word_hashes)
    for i in range(n):
        h = _i32(word_hashes[i]) & 0xFFFFFFFFFFFFFFFF
        for j in range(i + 1, min(i + word_ngrams, n)):
            h = (h * 116049371 + _i32(word_hashes[j])) & 0xFFFFFFFFFFFFFFFF
            out.append(h % bucket)
    return out


@dataclass
class FastTextArgs:
    dim: int = 16
    ws: int = 5
    epoch: int = 5
    min_count: int = 1
    neg: int = 5
    word_ngrams: int = 1
    loss: int = LOSS_SOFTMAX
    model: int = MODEL_SUP
    bucket: int = 2_000_000
    minn: int = 0
    maxn: int = 0
    lr_update_rate: int = 100
    t: float = 1e-4


class NumpyFastText:
    """Loaded supervised model: dictionary + input/output matrices."""

    def __init__(
        self,
        args: FastTextArgs,
        words: list[str],
        word_counts: list[int],
        labels: list[str],
        label_counts: list[int],
        input_matrix: np.ndarray,
        output_matrix: np.ndarray,
        pruneidx: dict[int, int] | None = None,
    ):
        self.args = args
        self.words = words
        self.labels = labels
        self.word_counts = word_counts
        self.label_counts = label_counts
        self.word_id = {w: i for i, w in enumerate(words)}
        self.input = input_matrix  # (nwords + bucket, dim); pruned: compacted
        self.output = output_matrix  # (nlabels, dim)
        # None = unpruned (every bucket id maps to itself). A dict — even an
        # EMPTY one (``pruneidx_size_ == 0``) — means pruned: bucket ids not
        # in the map are DROPPED, matching ``Dictionary::pushHash``.
        self.pruneidx = pruneidx
        nwords, nlabels = len(words), len(labels)
        if pruneidx is not None and pruneidx:
            need = nwords + max(pruneidx.values()) + 1
            if input_matrix.shape[0] < need:
                raise ValueError(
                    f"pruned input matrix has {input_matrix.shape[0]} rows, "
                    f"pruneidx references row {need - 1}"
                )
        if input_matrix.shape[1] != args.dim or output_matrix.shape != (
            nlabels,
            args.dim,
        ):
            raise ValueError(
                f"matrix shapes {input_matrix.shape}/{output_matrix.shape} "
                f"inconsistent with dim={args.dim} nlabels={nlabels}"
            )
        if input_matrix.shape[0] < nwords:
            raise ValueError("input matrix smaller than vocabulary")
        # per-word subword lists (Dictionary::initNgrams semantics: the word
        # id itself + its char ngrams; EOS gets no char ngrams). Computed
        # LAZILY with a cache — eager precompute over a lid.176-sized vocab
        # (~10^5 words x ~15 pure-Python FNV ngrams) would cost tens of
        # seconds of per-executor startup for rows most batches never touch.
        self._subword_cache: dict[int, list[int]] = {}

    def _bucket_rows(self, hs: list[int]) -> list[int]:
        """Bucket-relative ngram ids -> input-matrix row ids, applying the
        pruned-dictionary remap exactly like ``Dictionary::pushHash``:
        unpruned -> nwords + h; pruned -> nwords + pruneidx[h] when kept,
        dropped otherwise."""
        nwords = len(self.words)
        if self.pruneidx is None:
            return [nwords + h for h in hs]
        idx = self.pruneidx
        return [nwords + idx[h] for h in hs if h in idx]

    def _word_subwords(self, wid: int) -> list[int]:
        ids = self._subword_cache.get(wid)
        if ids is None:
            a = self.args
            w = self.words[wid]
            ids = [wid]
            if a.maxn > 0 and w != EOS:
                ids += self._bucket_rows(
                    compute_subwords(w, a.minn, a.maxn, a.bucket)
                )
            self._subword_cache[wid] = ids
        return ids

    # -- tokenization / id mapping ------------------------------------------

    def line_ids(self, text: str) -> list[int]:
        """Input-matrix row ids for one line: per-token dictionary ids +
        subwords (OOV tokens contribute char ngrams only), then word-ngram
        bucket ids over the token hash sequence (``Dictionary::getLine``).
        A trailing EOS token mirrors the native binding's appended
        newline."""
        a = self.args
        ids: list[int] = []
        hashes: list[int] = []
        for token in _tokenize(text) + [EOS]:
            if token.startswith("__label__"):
                continue  # label-type tokens never contribute input ids
            wid = self.word_id.get(token, -1)
            if wid >= 0:
                if a.maxn <= 0:
                    ids.append(wid)
                else:
                    ids.extend(self._word_subwords(wid))
            elif token != EOS and a.maxn > 0:
                ids.extend(
                    self._bucket_rows(
                        compute_subwords(token, a.minn, a.maxn, a.bucket)
                    )
                )
            # the native getLine pushes the token hash for EVERY word-type
            # token — in-vocab, OOV, and EOS alike
            hashes.append(ft_hash(token))
            if token == EOS:
                # Dictionary::getLine breaks at the first EOS token — a
                # literal "</s>" in web text ends the line for scoring;
                # everything after it is ignored, like the native engine
                break
        if a.word_ngrams > 1:
            ids.extend(
                self._bucket_rows(word_ngram_ids(hashes, a.word_ngrams, a.bucket))
            )
        return ids

    # -- scoring -------------------------------------------------------------

    def predict(self, text: str, k: int = 1) -> list[tuple[str, float]]:
        """Top-k (label, prob) over output scores of the mean input
        embedding. Normalization follows the native predict path per loss:
        softmax loss -> softmax; ns/ova -> per-label sigmoid
        (BinaryLogisticLoss::computeOutput — unnormalized); hierarchical
        softmax needs the Huffman tree and raises. Like native ``getLine``,
        scoring stops at the first newline (the native python binding
        rejects multi-line input outright); empty input -> []."""
        ids = self.line_ids(text.split("\n", 1)[0])
        if not ids:
            return []
        hidden = self.input[np.asarray(ids, dtype=np.int64)].mean(
            axis=0, dtype=np.float32
        )
        scores = (self.output @ hidden).astype(np.float64)
        loss = self.args.loss
        if loss == LOSS_SOFTMAX:
            e = np.exp(scores - scores.max())
            probs = e / e.sum()
        elif loss in (LOSS_NS, LOSS_OVA):
            probs = 1.0 / (1.0 + np.exp(-scores))
        else:
            raise NotImplementedError(
                "hierarchical-softmax prediction not supported — use the "
                "native fasttext package"
            )
        top = np.argsort(-probs, kind="stable")[:k]
        return [(self.labels[i], float(probs[i])) for i in top]


class NativeApiShim:
    """Adapts :class:`NumpyFastText` to the native package's call shape
    (``model.predict(list[str], k) -> (labels, probs)``) so
    ``operators/lid.py`` drives either engine through one code path.
    Labels keep their ``__label__`` prefix exactly like the native API."""

    def __init__(self, model: NumpyFastText):
        self.model = model

    def predict(self, texts: list[str], k: int = 1):
        labels: list[list[str]] = []
        probs: list[np.ndarray] = []
        for t in texts:
            r = self.model.predict(t, k=k)
            labels.append([lab for lab, _ in r])
            probs.append(np.asarray([p for _, p in r]))
        return labels, probs


def _tokenize(text: str) -> list[str]:
    out, cur = [], []
    for ch in text:
        if ch in _WHITESPACE:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


# ---------------------------------------------------------------------------
# binary format (little-endian throughout)
# ---------------------------------------------------------------------------


def numpy_engine_supports(path: str) -> bool:
    """Cheap driver-side probe (64 header bytes): True iff this file is a
    fastText model the numpy engine can actually score — right magic,
    known version, supervised, non-hierarchical loss. Lets callers decide
    availability truthfully instead of by file extension (an unsupervised
    ``cc.*.300.bin`` shares the extension but would throw inside every
    executor task)."""
    try:
        with open(path, "rb") as f:
            head = f.read(64)
        if len(head) < 64:
            return False
        magic, version = struct.unpack_from("<ii", head, 0)
        loss, model_t = struct.unpack_from("<2i", head, 8 + 6 * 4)
        return (
            magic == MAGIC
            and version <= VERSION
            and model_t == MODEL_SUP
            and loss != LOSS_HS
        )
    except OSError:
        return False


def load_model(path: str) -> NumpyFastText:
    """Read a supervised ``.bin`` or product-quantized ``.ftz``
    (fasttext.cc loadModel; the file self-describes which via the quant
    bools, so one loader covers both)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != MAGIC:
            raise ValueError(f"not a fastText model (magic {magic})")
        if version > VERSION:
            raise ValueError(f"unsupported model version {version}")
        (
            dim, ws, epoch, min_count, neg, word_ngrams, loss, model_t,
            bucket, minn, maxn, lr_update_rate,
        ) = struct.unpack("<12i", f.read(48))
        (t,) = struct.unpack("<d", f.read(8))
        args = FastTextArgs(
            dim, ws, epoch, min_count, neg, word_ngrams, loss, model_t,
            bucket, minn, maxn, lr_update_rate, t,
        )
        if model_t != MODEL_SUP:
            raise NotImplementedError("only supervised models supported")
        if version == 11:
            # native backward-compat quirk: v11 supervised models stored a
            # nonzero maxn they never used (fasttext.cc loadModel)
            args.maxn = 0
        size, nwords, nlabels = struct.unpack("<3i", f.read(12))
        _ntokens, pruneidx_size = struct.unpack("<2q", f.read(16))
        words: list[str] = []
        word_counts: list[int] = []
        labels: list[str] = []
        label_counts: list[int] = []
        for _ in range(size):
            chars = bytearray()
            while (c := f.read(1)) != b"\x00":
                if not c:
                    raise ValueError("truncated dictionary entry")
                chars += c
            (count,) = struct.unpack("<q", f.read(8))
            (etype,) = struct.unpack("<b", f.read(1))
            if etype == 0:
                words.append(chars.decode("utf-8"))
                word_counts.append(count)
            else:
                labels.append(chars.decode("utf-8"))
                label_counts.append(count)
        if len(words) != nwords or len(labels) != nlabels:
            raise ValueError("dictionary counts disagree with header")
        # native Dictionary::isPruned() is pruneidx_size_ >= 0 (unpruned
        # dictionaries store -1, NOT 0 — an empty map still means "pruned,
        # drop every ngram"). Pairs follow the entries: (old bucket id ->
        # compacted matrix row - nwords), int32 each.
        pruneidx: dict[int, int] | None = None
        if pruneidx_size >= 0:
            pruneidx = {}
            for _ in range(pruneidx_size):
                old, new = struct.unpack("<2i", f.read(8))
                pruneidx[old] = new
        (quant,) = struct.unpack("<?", f.read(1))
        input_matrix = _read_quant(f) if quant else _read_dense(f)
        (qout,) = struct.unpack("<?", f.read(1))
        # native loadModel only honors qout when the input was quantized
        output_matrix = _read_quant(f) if (quant and qout) else _read_dense(f)
    return NumpyFastText(
        args, words, word_counts, labels, label_counts,
        input_matrix, output_matrix, pruneidx,
    )


def _read_dense(f) -> np.ndarray:
    m, n = struct.unpack("<2q", f.read(16))
    data = np.frombuffer(f.read(m * n * 4), dtype="<f4", count=m * n)
    return data.reshape(m, n).copy()


KSUB = 256  # ProductQuantizer ksub_ = 1 << nbits, nbits = 8


def _read_pq(f) -> tuple[int, int, int, int, np.ndarray]:
    """``ProductQuantizer::load``: dim/nsubq/dsub/lastdsub (int32) then
    dim * 256 float32 centroids."""
    dim, nsubq, dsub, lastdsub = struct.unpack("<4i", f.read(16))
    centroids = np.frombuffer(
        f.read(dim * KSUB * 4), dtype="<f4", count=dim * KSUB
    ).copy()
    return dim, nsubq, dsub, lastdsub, centroids


def _pq_decode(
    codes: np.ndarray, dim: int, nsubq: int, dsub: int, lastdsub: int,
    centroids: np.ndarray,
) -> np.ndarray:
    """Vectorized ``ProductQuantizer::addcode`` over all rows: per
    subquantizer j, centroid c for code i lives at
    ``centroids[(j*256 + i)*dsub]`` — except the LAST subquantizer, offset
    ``(nsubq-1)*256*dsub + i*lastdsub`` (get_centroids)."""
    m = codes.shape[0]
    out = np.empty((m, dim), dtype=np.float32)
    for j in range(nsubq):
        d = lastdsub if j == nsubq - 1 else dsub
        base = j * KSUB * dsub
        table = centroids[base : base + KSUB * d].reshape(KSUB, d)
        out[:, j * dsub : j * dsub + d] = table[codes[:, j]]
    return out


def _read_quant(f) -> np.ndarray:
    """``QuantMatrix::load``, decoded straight to a dense float32 matrix:
    qnorm (bool), m/n (int64), codesize (int32), uint8 codes, the data
    ProductQuantizer, and when qnorm: per-row uint8 norm codes + the
    1-dim norm ProductQuantizer (rows were l2-normalized before
    quantization; reconstruction = norm * decoded_unit_row, matching
    ``QuantMatrix::addRowToVector``)."""
    (qnorm,) = struct.unpack("<?", f.read(1))
    m, n = struct.unpack("<2q", f.read(16))
    (codesize,) = struct.unpack("<i", f.read(4))
    codes = np.frombuffer(f.read(codesize), dtype=np.uint8, count=codesize)
    dim, nsubq, dsub, lastdsub, centroids = _read_pq(f)
    if dim != n:
        raise ValueError(f"quantizer dim {dim} != matrix cols {n}")
    if codesize != m * nsubq:
        raise ValueError(f"codesize {codesize} != m*nsubq {m * nsubq}")
    out = _pq_decode(codes.reshape(m, nsubq), dim, nsubq, dsub, lastdsub, centroids)
    if qnorm:
        norm_codes = np.frombuffer(f.read(m), dtype=np.uint8, count=m)
        ndim, _nsubq, _dsub, _lastdsub, ncent = _read_pq(f)
        if ndim != 1:
            raise ValueError(f"norm quantizer dim {ndim} != 1")
        out *= ncent[norm_codes][:, None]
    return out


def save_supervised_model(
    path: str,
    args: FastTextArgs,
    words: list[tuple[str, int]],
    labels: list[tuple[str, int]],
    input_matrix: np.ndarray,
    output_matrix: np.ndarray,
) -> None:
    """Write the same on-disk format (fixture/export utility; round-trip
    asserted in tests). ``input_matrix`` must have nwords+bucket rows when
    maxn>0 or word_ngrams>1, else >= nwords rows."""
    with open(path, "wb") as f:
        _write_header_and_dict(f, args, words, labels, None)
        f.write(struct.pack("<?", False))
        _write_dense(f, input_matrix)
        f.write(struct.pack("<?", False))
        _write_dense(f, output_matrix)


def save_quantized_model(
    path: str,
    args: FastTextArgs,
    words: list[tuple[str, int]],
    labels: list[tuple[str, int]],
    input_matrix: np.ndarray,
    output_matrix: np.ndarray,
    *,
    dsub: int = 2,
    qnorm: bool = False,
    qout: bool = False,
    pruneidx: dict[int, int] | None = None,
) -> None:
    """Write a ``.ftz``-format model (fixture/export utility). Matrices are
    encoded with an EXACT product quantizer — one centroid per row, code =
    row index — which requires <= 256 rows but reconstructs verbatim, so
    reader tests can assert against the dense source matrices. When
    ``pruneidx`` is given, ``input_matrix`` must already be the compacted
    (nwords + len(pruneidx))-row matrix."""
    with open(path, "wb") as f:
        _write_header_and_dict(f, args, words, labels, pruneidx)
        f.write(struct.pack("<?", True))
        _write_quant(f, input_matrix, dsub, qnorm)
        f.write(struct.pack("<?", qout))
        if qout:
            _write_quant(f, output_matrix, dsub, qnorm)
        else:
            _write_dense(f, output_matrix)


def _write_header_and_dict(
    f,
    args: FastTextArgs,
    words: list[tuple[str, int]],
    labels: list[tuple[str, int]],
    pruneidx: dict[int, int] | None,
) -> None:
    f.write(struct.pack("<ii", MAGIC, VERSION))
    f.write(
        struct.pack(
            "<12i",
            args.dim, args.ws, args.epoch, args.min_count, args.neg,
            args.word_ngrams, args.loss, args.model, args.bucket,
            args.minn, args.maxn, args.lr_update_rate,
        )
    )
    f.write(struct.pack("<d", args.t))
    ntokens = sum(c for _, c in words) + sum(c for _, c in labels)
    f.write(struct.pack("<3i", len(words) + len(labels), len(words), len(labels)))
    # pruneidx_size = -1: the UNPRUNED sentinel. Writing 0 here would
    # make native fastText treat the file as pruned-with-no-kept-ngrams.
    f.write(struct.pack("<2q", ntokens, -1 if pruneidx is None else len(pruneidx)))
    for w, count in words:
        f.write(w.encode("utf-8") + b"\x00" + struct.pack("<qb", count, 0))
    for w, count in labels:
        f.write(w.encode("utf-8") + b"\x00" + struct.pack("<qb", count, 1))
    if pruneidx is not None:
        # native writes std::map order = sorted by old bucket id
        for old in sorted(pruneidx):
            f.write(struct.pack("<2i", old, pruneidx[old]))


def _write_dense(f, m: np.ndarray) -> None:
    f.write(struct.pack("<2q", m.shape[0], m.shape[1]))
    f.write(np.ascontiguousarray(m, dtype="<f4").tobytes())


def _exact_pq(matrix: np.ndarray, dsub: int):
    """Exact PQ encoding (row i -> code i in every subquantizer)."""
    m, dim = matrix.shape
    if m > KSUB:
        raise ValueError(f"exact PQ encoding needs <= {KSUB} rows, got {m}")
    nsubq = (dim + dsub - 1) // dsub
    lastdsub = dim % dsub or dsub
    centroids = np.zeros(dim * KSUB, dtype=np.float32)
    codes = np.zeros((m, nsubq), dtype=np.uint8)
    for j in range(nsubq):
        d = lastdsub if j == nsubq - 1 else dsub
        base = j * KSUB * dsub
        table = np.zeros((KSUB, d), dtype=np.float32)
        table[:m] = matrix[:, j * dsub : j * dsub + d]
        centroids[base : base + KSUB * d] = table.ravel()
        codes[:, j] = np.arange(m, dtype=np.uint8)
    return codes, centroids, nsubq, lastdsub


def _write_pq(f, dim: int, nsubq: int, dsub: int, lastdsub: int,
              centroids: np.ndarray) -> None:
    f.write(struct.pack("<4i", dim, nsubq, dsub, lastdsub))
    f.write(np.ascontiguousarray(centroids, dtype="<f4").tobytes())


def _write_quant(f, matrix: np.ndarray, dsub: int, qnorm: bool) -> None:
    matrix = np.ascontiguousarray(matrix, dtype=np.float32)
    m, dim = matrix.shape
    if qnorm:
        norms = np.linalg.norm(matrix, axis=1).astype(np.float32)
        safe = np.where(norms == 0.0, 1.0, norms)
        body = (matrix / safe[:, None]).astype(np.float32)
    else:
        body = matrix
    codes, centroids, nsubq, lastdsub = _exact_pq(body, dsub)
    f.write(struct.pack("<?", qnorm))
    f.write(struct.pack("<2q", m, dim))
    f.write(struct.pack("<i", codes.size))
    f.write(codes.tobytes())
    _write_pq(f, dim, nsubq, dsub, lastdsub, centroids)
    if qnorm:
        norm_centroids = np.zeros(KSUB, dtype=np.float32)
        norm_centroids[:m] = norms
        f.write(np.arange(m, dtype=np.uint8).tobytes())
        _write_pq(f, 1, 1, 1, 1, norm_centroids)
