"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003).

The local fingerprinting scheme behind MOSS: hash every k-gram, slide a
w-wide window over the hash sequence, and from each window keep the
minimum (RIGHTMOST minimum on ties — the paper's rule, which guarantees
adjacent windows usually re-select the same gram so the fingerprint
density is ~2/(w+1), not 1). Guarantee: any match of length >= w+k-1
between two documents shares at least one selected fingerprint — the
property that makes it a sound local substring-match filter, unlike
"every i-th hash" sampling.

Complements the dedup family: minhash/simhash fingerprint WHOLE
documents; span_dedup removes known duplicated k-grams; winnowing gives
position-anchored fingerprints for partial-overlap detection
(plagiarism-style matches) at a tunable density.

Execution choice — MEASURED, not assumed: the pure-expression form
(transform over sequence with slice/array_min per window) is the
"stay-JVM-side" default, but Catalyst interprets the nested lambdas per
window and it measured ~0.5 s per 500-char document (O(len*w) array
allocations through the interpreter). The Arrow-batched mapInPandas
below does the same selection with a numpy sliding-window argmin in
~1 ms per document — two orders of magnitude — so this operator is one
of the few where the Python path IS the scale path (same verdict the
quality-stats UDF reached). Shape: ZERO exchanges, one narrow map;
output rows ~ 2*len/(w+1) per doc. Downstream cross-doc matching is a
groupBy on fp (exact_dedup's plan on a precomputed key).

Cross-engine: the k-gram hash is the proven md5-first-8-hex idiom
(hashlib here, md5() in the DuckDB oracle); all window arithmetic is
exact integers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

def _id_type(docs: DataFrame, id_col: str) -> str:
    """Output doc_id keeps the CALLER'S id type — a hard-coded bigint
    would crash the executor on string ids (review finding)."""
    return docs.schema[id_col].dataType.simpleString()


def winnow_text(text: str | None, k: int, w: int) -> list[tuple[int, int]]:
    """Distinct (1-based gram position, hash) selections for one text.
    Pure function — unit-testable without Spark, reused by the batches."""
    if not text:
        return []
    n = len(text) - (k - 1)
    if n < w:
        return []
    hs = np.empty(n, dtype=np.int64)
    for i in range(n):
        hs[i] = int(
            hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()[:8], 16
        )
    win = np.lib.stride_tricks.sliding_window_view(hs, w)
    # rightmost argmin: argmin of the reversed window, mapped back
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(n - w + 1) + (w - 1 - rev_arg)  # 0-based gram index
    fp = hs[pos]
    return list({(int(p) + 1, int(f)) for p, f in zip(pos, fp)})


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp) — one row per distinct selected (pos, fp) pair."""
    if k <= 0 or w <= 0:
        raise ValueError("k and w must be positive")

    def _batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            ids, poss, fps = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for p, f in winnow_text(text, k, w):
                    ids.append(doc_id)
                    poss.append(p)
                    fps.append(f)
            out = pd.DataFrame({"doc_id": ids, "pos": poss, "fp": fps})
            # dtype pinned so empty batches keep the schema; doc_id stays
            # whatever the caller's id type maps to through Arrow
            yield out.astype({"pos": "int64", "fp": "int64"})

    schema = f"doc_id {_id_type(docs, id_col)}, pos bigint, fp bigint"
    return docs.select(id_col, text_col).mapInPandas(
        _batches, schema=schema
    )


# chunk_idx/start/length are always bigint; doc_id follows the caller's type
_CDC_TAIL = "chunk_idx bigint, start bigint, length bigint, chunk_md5 string"


def cdc_chunks(
    docs: DataFrame,
    k: int = 5,
    divisor: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking: chunk boundaries where the k-gram hash
    satisfies h % divisor == 0 — so an insertion early in a document only
    moves ONE boundary, and every chunk after the next anchor re-aligns
    (the storage-dedup property fixed-size chunking lacks; Muthitacharoen
    et al., LBFS SOSP 2001). Expected chunk length ~ divisor chars.

    Emits (doc_id, chunk_idx, start, length, chunk_md5) with start
    1-based; the md5 fingerprint makes cross-doc chunk dedup a groupBy on
    an already-computed key (same contract as chunk_documents, but
    edit-resilient). Same measured execution verdict as winnowing: the
    hash loop lives in an Arrow-batched map, zero exchanges.
    """
    if k <= 0 or divisor <= 0:
        raise ValueError("k and divisor must be positive")

    def _chunks_of(text: str | None) -> list[tuple[int, int, str]]:
        if not text:
            return []
        n = len(text) - (k - 1)
        bounds = [0]
        for i in range(max(n, 0)):
            h = int(
                hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()[:8],
                16,
            )
            if h % divisor == 0:
                # boundary AFTER the anchor gram
                bounds.append(i + k)
        if bounds[-1] < len(text):
            bounds.append(len(text))
        out = []
        for ci in range(len(bounds) - 1):
            s, e = bounds[ci], bounds[ci + 1]
            if e > s:
                out.append(
                    (s + 1, e - s, hashlib.md5(text[s:e].encode()).hexdigest())
                )
        return out

    def _batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for ci, (s, ln, h) in enumerate(_chunks_of(text)):
                    rows.append((doc_id, ci, s, ln, h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "chunk_idx", "start", "length", "chunk_md5"],
            ).astype(
                {"chunk_idx": "int64", "start": "int64", "length": "int64"}
            )

    schema = f"doc_id {_id_type(docs, id_col)}, {_CDC_TAIL}"
    return docs.select(id_col, text_col).mapInPandas(
        _batches, schema=schema
    )
