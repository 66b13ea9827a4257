"""Model-based quality filtering (DCLM / FineWeb-Edu architecture).

The modern web-text pipeline pairs the heuristic rule battery
(operators/quality.py — C4/Gopher) with a LEARNED quality classifier: a
small fastText-style supervised model trained offline on a curated labeled
sample, then applied to the full corpus as a second keep/drop signal
(Li et al. 2024 "DataComp-LM", Penedo et al. 2024 "FineWeb-Edu"). The
reference repo has the same two ingredients separately — fastText
supervised scoring (fasttext_wrapper.py) and rule-based filtering — this
operator composes them the way a training-data pipeline does.

Spark-first design, in two strictly separated phases:

1. TRAIN (driver-side, offline): a word-only mean-embedding softmax
   classifier (the fastText supervised architecture with minn=maxn=0,
   wordNgrams=1 — see operators/fasttext_np.py for the full subword
   engine) trained with seeded numpy SGD on a bounded curated sample.
   The trained model is exported QUANTIZED TO INTEGERS (weights scaled by
   ``SCALE`` and rounded): the exported integers ARE the model artifact.
2. SCORE (corpus-scale, zero Python): because argmax over label scores is
   invariant to the mean's 1/n normalization, the keep/drop decision is
   sign(dot(w_keep - w_drop, sum of token embeddings + EOS)) — an exact
   INTEGER dot product. The scoring plan is pure relational algebra:
   explode tokens -> broadcast-join the (tiny) vocab embedding table ->
   one groupBy(doc_id) partial-agg exchange -> literal-coefficient margin
   expression. No UDF, no floats, so the DuckDB oracle replays it
   hash-exactly (the float-summation-order class of gate flakiness is
   structurally impossible here).

Scale shape at 10^12 docs: the model is dimension-shaped (|vocab| x dim
integers) and broadcast; the only exchange is the doc_id partial agg; the
margin is whole-stage-codegen arithmetic. Token explosion is the same
narrow map every word-count query already pays.
"""

from __future__ import annotations

import numpy as np

DIM = 16
SCALE = 1000
EOS = "</s>"


def label_heuristic(text: str | None, min_words: int = 40) -> bool:
    """The curation rule that labels the training sample (stand-in for the
    human/LLM labels DCLM-style classifiers train on): keep = at least
    ``min_words`` whitespace tokens. Deterministic, driver-side only —
    the exported model, not this rule, is what the gate verifies."""
    if not text:
        return False
    return len([w for w in text.split(" ") if w]) >= min_words


def train_quality_classifier(
    sample: list[tuple[bool, str]],
    dim: int = DIM,
    seed: int = 11,
    epochs: int = 40,
    lr: float = 0.5,
) -> dict:
    """Train the word-only mean-embedding softmax classifier (fastText
    supervised ``Model::update`` math, as in fasttext_train.py:82-152 but
    without char-ngram buckets) and export it integer-quantized.

    Returns {"words": [w...], "vecs": int array (V, dim), "eos": int
    vector, "diff": int vector (w_keep - w_drop), "train_acc": float}.
    Deterministic for a fixed (sample, seed).
    """
    rng = np.random.default_rng(seed)
    counts: dict[str, int] = {}
    for _, text in sample:
        for w in (text or "").split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    words = [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))]
    wid = {w: i for i, w in enumerate(words)}
    eos_id = len(words)

    docs = []
    for keep, text in sample:
        ids = [wid[w] for w in (text or "").split(" ") if w] + [eos_id]
        docs.append((1 if keep else 0, np.asarray(ids, dtype=np.int64)))

    inp = rng.uniform(-1.0 / dim, 1.0 / dim, size=(len(words) + 1, dim)).astype(
        np.float32
    )
    out = np.zeros((2, dim), dtype=np.float32)  # row 1 = keep, row 0 = drop

    order = np.arange(len(docs))
    total = epochs * len(docs)
    step = 0
    for _ in range(epochs):
        rng.shuffle(order)
        for di in order:
            lid, ids = docs[di]
            cur_lr = lr * (1.0 - step / total)
            step += 1
            hidden = inp[ids].mean(axis=0)
            scores = out @ hidden
            e = np.exp(scores - scores.max())
            probs = e / e.sum()
            grad = probs.copy()
            grad[lid] -= 1.0
            ginput = (out.T @ grad) * (cur_lr / len(ids))
            out -= cur_lr * np.outer(grad, hidden)
            inp[ids] -= ginput

    vecs = np.rint(inp.astype(np.float64) * SCALE).astype(np.int64)
    diff = np.rint((out[1] - out[0]).astype(np.float64) * SCALE).astype(np.int64)
    # train accuracy measured on the EXPORTED integer model (sum form):
    # what you ship is what you measure
    correct = 0
    for lid, ids in docs:
        margin = int(diff @ vecs[ids].sum(axis=0))
        correct += int((margin > 0) == (lid == 1))
    return {
        "words": words,
        "vecs": vecs[: len(words)],
        "eos": vecs[eos_id],
        "diff": diff,
        "train_acc": correct / max(len(docs), 1),
    }


def score_plan(docs, model: dict):
    """The corpus-scale scoring plan: (doc_id, n_hits, margin, q_label)
    with NULL outputs for NULL text. Pure native expressions — broadcast
    vocab join + integer arithmetic; see module docstring."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    dim = len(model["diff"])
    vocab_rows = [
        (w, *[int(x) for x in model["vecs"][i]])
        for i, w in enumerate(model["words"])
    ]
    schema = "word string, " + ", ".join(f"d{j} long" for j in range(dim))
    vocab = spark.createDataFrame(vocab_rows, schema=schema)
    eos = [int(x) for x in model["eos"]]
    diff = [int(x) for x in model["diff"]]

    present = docs.filter(F.col("text").isNotNull())
    toks = present.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias(
            "word"
        ),
    )
    hits = (
        toks.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            *[F.sum(f"d{j}").alias(f"s{j}") for j in range(dim)],
        )
    )
    margin = None
    for j in range(dim):
        term = F.lit(diff[j]) * (F.coalesce(F.col(f"s{j}"), F.lit(0)) + F.lit(eos[j]))
        margin = term if margin is None else margin + term
    scored = (
        present.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            margin.cast("long").alias("margin"),
        )
        .withColumn(
            "q_label", F.when(F.col("margin") > 0, "keep").otherwise("drop")
        )
    )
    nulls = docs.filter(F.col("text").isNull()).select(
        "doc_id",
        F.lit(None).cast("long").alias("n_hits"),
        F.lit(None).cast("long").alias("margin"),
        F.lit(None).cast("string").alias("q_label"),
    )
    return scored.unionByName(nulls)


def export_sql(model: dict) -> str:
    """The DuckDB replay of score_plan over the pre-registered ``documents``
    view — the same integer arithmetic, so hashes match exactly."""
    dim = len(model["diff"])
    rows = ",\n    ".join(
        "('" + w.replace("'", "''") + "', "
        + ", ".join(str(int(x)) for x in model["vecs"][i])
        + ")"
        for i, w in enumerate(model["words"])
    )
    dcols = ", ".join(f"d{j}" for j in range(dim))
    sums = ",\n         ".join(
        f"sum(d{j}) AS s{j}" for j in range(dim)
    )
    margin = " + ".join(
        f"({int(model['diff'][j])})*(COALESCE(h.s{j},0)+({int(model['eos'][j])}))"
        for j in range(dim)
    )
    return f"""
WITH vocab(word, {dcols}) AS (VALUES
    {rows}
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL
),
hits AS (
  SELECT doc_id, count(*) AS n_hits,
         {sums}
  FROM toks JOIN vocab USING (word)
  WHERE word <> ''
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST({margin} AS BIGINT) AS margin,
       CASE WHEN CAST({margin} AS BIGINT) > 0 THEN 'keep' ELSE 'drop' END AS q_label
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.text IS NOT NULL
UNION ALL
SELECT doc_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
FROM documents WHERE text IS NULL
"""
