"""Per-host document caps — domain-diversity curation under hot-host skew.

Web curation pipelines cap how many documents any single host contributes
to the kept corpus (RefinedWeb and FineWeb-class recipes bound per-domain
share so template farms and mega-hosts cannot dominate training data; the
CCNet/C4 lineage applies the same idea at the URL-pattern level). The
selection must be DETERMINISTIC — a hash order, not rand() — so reruns,
resumes, and the two sides of a correctness gate pick identical documents.

The naive Spark shape is ``row_number() OVER (PARTITION BY host ORDER BY
key) <= K``: one exchange, but a hot host's ENTIRE page set lands on one
reducer task to be sorted — the same straggler this repo's host_stats
already defuses for aggregation (operators/hoststats.py). AQE splits
skewed JOIN partitions, not skewed window partitions.

``host_cap_sample`` is the exact, skew-proof version — salted two-phase
top-K, the TakeOrderedAndProject idea applied per key:

- phase 1: rank within ``(host, salt)`` where ``salt =
  pmod(xxhash64(doc_id), S)`` (deterministic, resume-safe, and UNIFORM
  even when doc_id correlates with host assignment — a raw
  ``pmod(doc_id, S)`` would map a hot host whose ids share a parity or
  stride onto a fraction of the S buckets) and keep the local top-K — a
  hot host is cut into S parallel sort partitions, each bounded by
  ~|host|/S rows;
- phase 2: rank within ``host`` over the survivors — AT MOST S*K rows per
  host regardless of corpus size — and keep the global top-K.

Phase 2's window input is bounded by construction (S*K per host, e.g.
16*10k = 160k rows for the hottest host on earth), so the one remaining
per-host sort is trivially small. The result is provably identical to the
naive single window: every global top-K element is top-K within its salt
bucket (rank can only shrink when rows are removed), so phase 1 never
discards a survivor.

Spark >= 3.5 adds ``WindowGroupLimit`` (rank-limit pushdown): each MAP
task pre-trims to its local per-key top-K before the exchange — the free
half of the two-phase plan, and it fires on both windows here (pinned in
tests/test_hostcap.py). It does NOT fix the reduce side on its own: with
M map partitions the hot host still lands K*M rows on ONE reducer task
under the naive window; the salt spreads exactly that across S reducers
(each sees ~K*M/S), then phase 2 touches only S*K survivors.

Selection key: ``md5(doc_id)`` hex (engine-identical, uniformly
scrambling) with doc_id as tiebreaker — a deterministic uniform sample of
K docs per host. Callers with a quality score pass ``order_col`` to keep
the BEST K instead (dedup_keep_best's policy, per-host).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def host_cap_sample(
    df: DataFrame,
    k: int,
    host_col: str = "host",
    id_col: str = "doc_id",
    order_col: Column | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep a deterministic top-``k`` documents per host. Adds
    ``pick_rank`` (1..k within host). Exact — identical output to the
    naive single-window form at any partitioning.

    Precondition: ``id_col`` must be UNIQUE per row — the exactness proof
    (phase 1 never discards a global top-K survivor) and rerun/resume
    determinism both rely on ``(_key, id_col)`` being a total order.
    Non-numeric ids are fine: the salt hashes the id, it never does
    arithmetic on it.
    """
    key = (
        order_col
        if order_col is not None
        else F.md5(F.col(id_col).cast("string"))
    )
    # Salt on a HASH of the id, not the raw value: raw pmod leaves dead
    # buckets whenever ids correlate with hosts (e.g. all-even doc_ids on
    # the hot host → only S/2 live buckets), halving the skew spread.
    ranked = df.withColumn("_key", key).withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets)),
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy("_key", id_col)
    local = (
        ranked.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(host_col).orderBy("_key", id_col)
    return (
        local.withColumn("pick_rank", F.row_number().over(w2))
        .where(F.col("pick_rank") <= k)
        .drop("_key")
    )
