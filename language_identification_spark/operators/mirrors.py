"""Cross-host mirror detection: host pairs sharing much of their content.

Mirror farms — the same site served under many hostnames (region mirrors,
scraper re-hosts, parked-domain duplicates) — are a major duplication
source in web crawls, and host-level dedup catches them far cheaper than
doc-level near-dup: one decision per HOST PAIR instead of one per page
pair. The standard construction (the co-citation/SSJoin shape):

1. distinct (host, fingerprint) pairs — a host's content set, where the
   fingerprint is any exact content key (md5 of extracted text, simhash
   band, or a winnowing fingerprint; the operator is agnostic).
2. per-host set size ``n_fps``.
3. fingerprints shared by MORE than ``max_hosts_per_fp`` hosts are
   excluded from pair generation — ubiquitous content (boilerplate,
   empty-page hashes) is not mirror evidence, and the cap bounds the
   pair-join fan-out exactly like the LSH bucket cap
   (``mirror_oversized_fps`` reports what was excluded, observable
   never silent).
4. self-join the capped (host, fp) list on fp with ``host_a < host_b``:
   per surviving fp at most C(cap, 2) pairs, so candidates are
   fingerprint-bounded, never |hosts|^2.
5. per host pair, ``n_shared`` distinct shared fps; keep pairs with
   set-Jaccard >= threshold. The comparison is INTEGER-exact:
   ``n_shared * denom >= thr_ppt * (n_a + n_b - n_shared)`` — no float
   boundary, both engines agree on every pair.

Scale shape: two exchanges on shrinking keys (fp for the capped-list
build + pair join, (host_a, host_b) for the shared count); everything
below them is map-side combined. Output is host-pair-dimension sized.
At 10^12 docs the (host, fp) distinct step IS the dedup fingerprint
exchange the pipeline already pays; mirrors ride it for free.

Reference anchor: the reference has no host-graph layer (single-node
scripts, language-identification/*.py); this is part of the web-scale
curation surface built Spark-first on top of its content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIRROR_DENOM = 1000  # thresholds in parts-per-thousand (integer-exact)


def _capped_hf(
    df: DataFrame, host_col: str, fp_col: str, max_hosts_per_fp: int
) -> DataFrame:
    """Distinct (host, fp) restricted to fps on <= max_hosts_per_fp hosts."""
    hf = df.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    fp_hosts = hf.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    return hf.join(
        fp_hosts.where(F.col("n_hosts") <= max_hosts_per_fp).select("fp"),
        "fp",
    )


def mirror_oversized_fps(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """The exclusion ledger: fingerprints too ubiquitous to be mirror
    evidence, with their host counts — the never-silent half of the cap
    (same contract as lsh_oversized_buckets)."""
    hf = df.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    return (
        hf.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
        .where(F.col("n_hosts") > max_hosts_per_fp)
    )


def host_mirror_pairs(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    jaccard_thr_ppt: int = 500,
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Host pairs whose capped fingerprint sets overlap at set-Jaccard
    >= jaccard_thr_ppt/1000. Returns (host_a, host_b, n_shared, n_a,
    n_b, jaccard_ppt) with jaccard_ppt = floor(1000 * shared / union) —
    integer division, bit-identical across engines. Set sizes n_a/n_b
    are measured on the CAPPED universe so the ratio is consistent with
    the evidence actually admitted (an excluded boilerplate fp counts
    for neither the numerator nor the denominator).

    The capped (host, fp) list feeds three consumers (sizes, both join
    sides); Catalyst does not reuse its exchange across them (measured:
    0 ReusedExchange, the distinct recomputed per branch), so it is
    localCheckpoint'ed lazily — computed once per action, shared by all
    branches, cleaned by the reference tracker (the linkgraph
    compute-once pattern). At 10^12 docs this materialization IS the
    dedup fingerprint table the pipeline persists anyway."""
    hf = _capped_hf(df, host_col, fp_col, max_hosts_per_fp).localCheckpoint(
        eager=False
    )
    sizes = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n_fps"))
    a = hf.select(F.col("host").alias("host_a"), "fp")
    b = hf.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("n_fps").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("n_fps").alias("n_b")
            ),
            "host_b",
        )
        .withColumn(
            "union_fps", F.col("n_a") + F.col("n_b") - F.col("n_shared")
        )
        .where(
            F.col("n_shared") * MIRROR_DENOM
            >= F.lit(jaccard_thr_ppt) * F.col("union_fps")
        )
        .withColumn(
            "jaccard_ppt",
            # integer division (Spark `div`, DuckDB `//`) — floor-exact
            # for positive ints, no float on the boundary
            F.expr(f"(n_shared * {MIRROR_DENOM}) div union_fps"),
        )
    )
    return out.select(
        "host_a", "host_b", "n_shared", "n_a", "n_b", "jaccard_ppt"
    )
