"""Multimodal column plumbing: opaque binary media + typed metadata.

A 100 TB training-data pipeline carries images/audio/video alongside text.
The Spark-side contract is settled here and fully tested; only the codec call
itself is stubbed (image/audio libraries are not in this container):

- media rows: ``(doc_id, media_type, media binary, meta map<string,string>)``
- decode/feature-extract runs as ``mapInPandas`` (Arrow-batched, streaming
  iterator — a 10 MB blob never joins a giant materialized batch), grouping-
  free so it stays a narrow map;
- batch shape, output schema, null/error handling, and partitioning are real
  and asserted by tests; ``decode_media`` raises NotImplementedError for real
  codecs and provides a deterministic fake (seeded by content hash) so the
  distributed plumbing is testable end-to-end without native libs.

At scale: blobs live in the table (Iceberg/parquet binary columns) or as
object-store pointers in ``meta['uri']``; either way the decode stage is
embarrassingly parallel and the repartition guidance of the text pipeline
(uniform key re-spread before heavy stages, SURVEY.md §4.2) applies verbatim.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, media binary, meta map<string,string>"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, features array<float>, "
    "decode_error string"
)

_SUPPORTED_FAKE = {"image/png", "image/jpeg", "audio/wav", "video/mp4"}


def decode_media(media_type: str, blob: bytes) -> list[float]:
    """Decode one blob into a FEATURE_DIM feature vector.

    STUB: real codecs (PIL/librosa/ffmpeg) are not available in this
    container. Known media types get a deterministic content-derived fake
    (stable across executors/retries — required for Spark task re-execution
    safety); unknown types raise, and the UDF surfaces that per-row in
    ``decode_error`` instead of failing the task.
    """
    if media_type not in _SUPPORTED_FAKE:
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    digest = hashlib.sha256(media_type.encode() + b"\x00" + blob).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Narrow map (no shuffle); per-row errors become data, not task failures —
    at 10^9 blobs a 1-in-a-million corrupt file must not kill the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["media"].map(
                    lambda b: 0 if b is None else len(b)
                ).astype("int32"),
            }
            feats, errs = [], []
            for mt, blob in zip(pdf["media_type"], pdf["media"]):
                if blob is None:
                    feats.append(None)
                    errs.append("null_media")
                    continue
                try:
                    feats.append(decode_media(mt, bytes(blob)))
                    errs.append(None)
                except NotImplementedError as exc:
                    feats.append(None)
                    errs.append(str(exc))
            out["features"] = feats
            out["decode_error"] = errs
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, features array<float>, decode_error string"
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video rows: one output row PER SAMPLED FRAME — the
    1->N mapInPandas shape (unlike extract_features' 1->1), which is how
    frame-level features land in a training table.

    STUB at the codec layer like decode_media: real frame extraction
    (ffmpeg) is unavailable, so a 'frame' is a deterministic content-derived
    vector over each every_n_bytes-sized blob slice, capped at max_frames.
    The Spark-side contract is real: streaming Arrow batches in, exploded
    frame rows out, per-row error capture, narrow map. Non-video rows pass
    through as a single no-frame row with decode_error set."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                if mt != "video/mp4":
                    rows.append((doc_id, -1, None, f"not_video:{mt}"))
                    continue
                if blob is None:
                    rows.append((doc_id, -1, None, "null_media"))
                    continue
                blob = bytes(blob)
                n_frames = min(max_frames, max(1, len(blob) // every_n_bytes))
                for i in range(n_frames):
                    sl = blob[i * every_n_bytes : (i + 1) * every_n_bytes]
                    digest = hashlib.sha256(b"frame%d" % i + sl).digest()
                    feats = [
                        int.from_bytes(digest[4 * j : 4 * j + 4], "big") / 2**32
                        for j in range(FEATURE_DIM)
                    ]
                    rows.append((doc_id, i, feats, None))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "features", "decode_error"]
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


MEDIA_TYPES = sorted(_SUPPORTED_FAKE) + ["application/x-unknown"]


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from the parquet ``documents``
    table: blob = the UTF-8 bytes of ``text``, media_type round-robin by
    ``doc_id % 5`` (the four supported fakes + one unknown), every 17th row a
    NULL blob (fetch-failure case). Because every column is a pure SQL
    expression over ``documents``, a DuckDB oracle can rebuild the identical
    table and replay the sha256-derived features — which is what makes the
    multimodal gate entries fully hash-checkable rather than rows-only."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    type_arr = F.array(*[F.lit(t) for t in MEDIA_TYPES])
    return docs.select(
        "doc_id",
        F.element_at(
            type_arr, (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int")
        ).alias("media_type"),
        F.when(F.col("doc_id") % 17 == 11, F.lit(None).cast("binary"))
        .otherwise(F.encode(F.col("text"), "UTF-8"))
        .alias("media"),
        F.create_map(
            F.lit("src"),
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")),
        ).alias("meta"),
    )


# DuckDB replay of the derived media table + decode_media's sha256-derived
# features. The documents corpus is ASCII, so VARCHAR concat/substring equals
# the byte-level operations decode_media performs on the blob; chr(0) is the
# same separator byte decode_media inserts. Each feature f_i is the big-endian
# uint32 at digest bytes [4i, 4i+4) (hex chars [8i, 8i+8)) / 2^32, stored as
# float32 by the Arrow schema — hence the FLOAT-then-DOUBLE cast before the
# 6-dp gate rounding.
_SQL_HEX_U32 = (
    "list_sum(list_transform(range(8), j -> "
    "(strpos('0123456789abcdef', substr(sha, i*8 + j + 1, 1)) - 1)"
    " * 16.0**(7-j)))"
)

# printf fixed 6-decimal (not round+::VARCHAR): matches Spark's
# format_number on both sub-1e-3 values (no scientific notation) and
# trailing zeros.
_SQL_FEATURES_STR = (
    "array_to_string(list_transform(range(8), i -> "
    f"printf('%.6f', CAST(CAST({_SQL_HEX_U32} / 4294967296.0 AS FLOAT) AS DOUBLE))"
    "), ',')"
)


def _sql_media_base() -> str:
    types = ", ".join(f"'{t}'" for t in MEDIA_TYPES)
    return f"""
media AS (
  SELECT doc_id,
         [{types}][CAST(doc_id % {len(MEDIA_TYPES)} AS INT) + 1] AS media_type,
         CASE WHEN doc_id % 17 = 11 THEN NULL ELSE text END AS payload
  FROM documents
)"""


SUPPORTED_SQL = ", ".join(f"'{t}'" for t in sorted(_SUPPORTED_FAKE))

SQL_MULTIMODAL_FEATURES = (
    "WITH "
    + _sql_media_base()
    + f""",
hashed AS (
  SELECT doc_id, media_type, payload,
         CASE WHEN payload IS NULL OR media_type NOT IN ({SUPPORTED_SQL})
              THEN NULL
              ELSE sha256(media_type || chr(0) || payload) END AS sha
  FROM media
)
SELECT doc_id, media_type,
       coalesce(octet_length(encode(payload)), 0) AS n_bytes,
       CASE WHEN sha IS NULL THEN NULL ELSE {_SQL_FEATURES_STR} END AS features,
       CASE WHEN payload IS NULL THEN 'null_media'
            WHEN media_type NOT IN ({SUPPORTED_SQL})
            THEN 'no codec for media_type=''' || media_type || ''''
            ELSE NULL END AS decode_error
FROM hashed
"""
)

# sample_frames(every_n_bytes=32, max_frames=8): one row per sampled frame of
# each video blob; frame i hashes 'frame' || i || blob[32i : 32i+32).
SQL_MEDIA_FRAMES = (
    "WITH "
    + _sql_media_base()
    + """,
vids AS (
  SELECT doc_id, payload,
         least(8, greatest(1, octet_length(encode(payload)) // 32)) AS n_frames
  FROM media WHERE media_type = 'video/mp4' AND payload IS NOT NULL
),
frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_idx,
         sha256('frame' || i || substring(payload, i*32 + 1, 32)) AS sha
  FROM vids, unnest(range(n_frames)) AS t(i)
)
SELECT doc_id, frame_idx, """
    + _SQL_FEATURES_STR
    + """ AS features,
       CAST(NULL AS VARCHAR) AS decode_error
FROM frames
UNION ALL
SELECT doc_id, -1 AS frame_idx, NULL AS features,
       CASE WHEN media_type <> 'video/mp4' THEN 'not_video:' || media_type
            ELSE 'null_media' END AS decode_error
FROM media WHERE media_type <> 'video/mp4' OR payload IS NULL
"""
)


def fake_media_df(spark, n: int = 64, seed: int = 13) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    import random

    rng = random.Random(seed)
    types = sorted(_SUPPORTED_FAKE) + ["application/x-unknown"]
    rows = []
    for i in range(n):
        mt = types[i % len(types)]
        blob = None if i % 17 == 11 else rng.randbytes(rng.randint(8, 256))
        rows.append((i, mt, blob, {"src": f"synthetic/{i}"}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
