"""Similarity-search operators: blocked exact near-dup pairs (the
production path) vs the naive all-pairs baseline, LSH near-dup recall
on planted duplicates, and plan assertions (no Cartesian products)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from eaststorm_searchengine_spark.operators import similarity
from eaststorm_searchengine_spark.plans import inspect

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted((r.vec_a, r.vec_b, r.cosine) for r in df.collect())


def test_blocked_near_dup_matches_allpairs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _rows(similarity.cosine_near_dup_pairs(emb, 0.45))
    want = _rows(similarity.cosine_near_dup_pairs_allpairs(emb, 0.45))
    assert len(want) > 0
    assert got == want


def test_blocked_near_dup_odd_block_count(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _rows(similarity.cosine_near_dup_pairs(emb, 0.45, n_blocks=3))
    want = _rows(similarity.cosine_near_dup_pairs_allpairs(emb, 0.45))
    assert got == want


def test_blocked_near_dup_plan_has_no_cartesian(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = similarity.cosine_near_dup_pairs(emb, 0.45)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def _planted_corpus(spark, n=200, dim=16, n_dups=12, seed=3):
    """Random unit vectors plus planted near-duplicates at cosine ≥0.9."""
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    for j in range(n_dups):
        base = vecs[j]
        noise = rng.standard_normal(dim) * 0.12
        v = base + noise
        v /= np.linalg.norm(v)
        rows.append((n + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_near_dup_pairs_recall_and_precision(spark):
    emb = _planted_corpus(spark)
    exact = _rows(similarity.cosine_near_dup_pairs_allpairs(emb, 0.8))
    got = _rows(similarity.lsh_near_dup_pairs(emb, 0.8))
    assert len(exact) >= 10
    # precision is exact by construction (verify step); recall ≥ 0.9
    assert set(got) <= set(exact)
    assert len(got) / len(exact) >= 0.9, (len(got), len(exact))


def test_lsh_near_dup_plan_has_no_cartesian(spark):
    emb = _planted_corpus(spark, n=50, n_dups=4)
    plan = inspect.formatted_plan(similarity.lsh_near_dup_pairs(emb, 0.8))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_multiprobe_lsh_ann_recall(spark):
    """Hamming-1 multi-probe must recover ≥0.9 of the exact top-10."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvecs = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    ]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, qvecs, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_cosine_topk(emb, qvecs, k=10).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.9, len(approx & exact) / len(exact)


def test_ivf_ann_recall(spark):
    """IVF with 32 centroids / 16 probes on the near-isotropic sf0.01
    embeddings (500 vectors → ~16 per list, the quantizer's noisiest
    regime) still recovers ≥0.75 of exact top-10 — 0.967 at sf0.1, see
    BASELINE.md; on the planted-cluster corpus even 4 probes find the
    planted near-dup as rank 1."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvecs = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    ]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, qvecs, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_cosine_topk(emb, qvecs, k=10).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.75

    planted = _planted_corpus(spark)
    pq = [(0, [float(x) for x in planted.filter(F.col("vec_id") == 200).first()["embedding"]])]
    top = similarity.ivf_cosine_topk(planted, pq, k=2, n_centroids=8, n_probe=4).collect()
    # vec 200 is the planted near-dup of vec 0: both must appear first
    assert {r.vec_id for r in top} == {0, 200}


def test_lsh_near_dup_flood_star_bound(spark):
    """1,000 identical vectors collide in every table; the star bound
    emits exactly n-1 cosine-1.0 pairs anchored at the min id instead
    of ~500k (VERDICT r02 #2), and completes fast."""
    import time

    n = 1000
    v = [1.0, 0.5, -0.25, 0.125] * 4
    rows = [(i, v) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    t0 = time.perf_counter()
    got = sorted((r.vec_a, r.vec_b, r.cosine) for r in
                 similarity.lsh_near_dup_pairs(emb, 0.8, max_bucket_docs=64).collect())
    elapsed = time.perf_counter() - t0
    assert got == [(0, i, 1.0) for i in range(1, n)]
    assert elapsed < 120, f"flooded corpus took {elapsed:.1f}s"


def test_lsh_near_dup_bucket_cap_does_not_change_normal_corpora(spark):
    emb = _planted_corpus(spark)
    key = lambda df: sorted((r.vec_a, r.vec_b, r.cosine) for r in df.collect())
    assert key(similarity.lsh_near_dup_pairs(emb, 0.8)) == key(
        similarity.lsh_near_dup_pairs(emb, 0.8, max_bucket_docs=1 << 30)
    )


def test_lsh_near_dup_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.lsh_near_dup_pairs(empty, 0.8).count() == 0


def test_ivf_tolerates_zero_vectors(spark):
    emb = _planted_corpus(spark, n=60, n_dups=4)
    emb = emb.union(
        spark.createDataFrame([(999, [0.0] * 16)], "vec_id long, embedding array<double>")
    )
    q = [(0, [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]])]
    rows = similarity.ivf_cosine_topk(emb, q, k=5, n_centroids=8, n_probe=8).collect()
    assert len(rows) == 5


def test_ivf_index_handle_matches_one_shot(spark):
    """The build-once IVFIndex handle (persisted assignment) must
    return exactly what the one-shot wrapper returns, across repeated
    queries (VERDICT r03 #2)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvecs = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 2).collect()
    ]
    one_shot = sorted(
        (r.query_id, r.rank, r.vec_id, r.cosine)
        for r in similarity.ivf_cosine_topk(emb, qvecs, k=5).collect()
    )
    idx = similarity.IVFIndex(emb)
    try:
        first = sorted(
            (r.query_id, r.rank, r.vec_id, r.cosine)
            for r in idx.topk(qvecs, k=5).collect()
        )
        second = sorted(
            (r.query_id, r.rank, r.vec_id, r.cosine)
            for r in idx.topk(qvecs, k=5).collect()
        )
    finally:
        idx.unpersist()
    assert first == one_shot and second == one_shot and len(first) > 0


def test_nan_cosine_excluded_deterministically(spark):
    """A NaN-component vector yields an undefined cosine; the ANN tails
    EXCLUDE it like the zero-norm NULLs (documented contract) — Spark's
    raw window would rank NaN first, and a NaN score cannot round-trip
    the prune's Arrow boundary (it comes back NULL), so exclusion is
    the only behavior that is both sensible and batch-layout-stable
    (code-review r04b, execution-confirmed)."""
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(20)]
    rows.append((99, [float("nan"), 1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb, [(1, [1.0, 0.0, 0.0])], k=3).collect()
    assert all(r["vec_id"] != 99 for r in out)
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert all(r["cosine"] == 1.0 for r in out)
