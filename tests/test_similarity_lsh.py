"""Random-hyperplane LSH candidate generation (the embedding scale path)."""

import numpy as np

from language_identification_spark.operators.similarity import lsh_bucket_pairs


def _planted_df(spark, n_base=60, n_dups=10, dim=16, seed=5):
    """Base vectors plus near-duplicates (tiny perturbations) with known ids:
    dup of vector i gets id 1000+i."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    for i in range(n_dups):
        dup = base[i] + rng.standard_normal(dim) * 1e-3
        rows.append((1000 + i, [float(x) for x in dup]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), n_base, n_dups


def test_lsh_finds_planted_near_dups(spark):
    df, n_base, n_dups = _planted_df(spark)
    pairs = {(r["a"], r["b"]) for r in lsh_bucket_pairs(df).collect()}
    # every planted duplicate pair must be a candidate (cosine ~0.9999 ->
    # identical sign pattern in at least one band for this seed/data,
    # deterministic because data, planes seed, and plan are all fixed)
    missing = [(i, 1000 + i) for i in range(n_dups) if (i, 1000 + i) not in pairs]
    assert not missing, missing


def test_lsh_prunes_the_pair_space(spark):
    df, n_base, n_dups = _planted_df(spark)
    n = n_base + n_dups
    all_pairs = n * (n - 1) // 2
    n_candidates = lsh_bucket_pairs(df).count()
    # the whole point: candidates are a small fraction of all pairs
    assert n_candidates < all_pairs * 0.35, (n_candidates, all_pairs)


def test_lsh_deterministic(spark):
    df, *_ = _planted_df(spark)
    a = sorted((r["a"], r["b"]) for r in lsh_bucket_pairs(df).collect())
    b = sorted((r["a"], r["b"]) for r in lsh_bucket_pairs(df).collect())
    assert a == b
