"""Dedup-family behavior: minhash LSH banding with the hot-bucket
bound, plus adversarial many-identical-docs completion (VERDICT r01
item 6)."""

import time

from pyspark.sql import functions as F

from eaststorm_searchengine_spark.operators import dedup

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return sorted((r.doc_a, r.doc_b, r.n_shared_bands) for r in df.collect())


def test_bucket_cap_does_not_change_normal_corpora(spark):
    """At sf0.01 no bucket exceeds the cap, so capped == uncapped."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    capped = _pairs(dedup.minhash_candidates(docs))
    uncapped = _pairs(dedup.minhash_candidates(docs, max_bucket_pairs=1 << 30))
    assert capped == uncapped
    assert len(capped) > 0


def test_adversarial_identical_docs_star_not_quadratic(spark):
    """1,000 byte-identical docs land in one bucket per band; the star
    fallback emits exactly n-1 pairs (all anchored at the min id, all
    sharing all 16 bands) instead of ~500k, and completes fast."""
    n = 1000
    docs = spark.createDataFrame(
        [(i, "the same exact document text repeated for everyone") for i in range(n)],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    got = _pairs(dedup.minhash_candidates(docs, max_bucket_pairs=64))
    elapsed = time.perf_counter() - t0
    assert got == [(0, i, dedup.N_BANDS) for i in range(1, n)]
    assert elapsed < 120, f"adversarial corpus took {elapsed:.1f}s"


def test_star_fallback_preserves_components(spark):
    """Mixed corpus: a hot group of identical docs plus unrelated
    singletons — the identical group stays one connected component and
    no cross-group pairs appear."""
    rows = [(i, "identical hot document body shared by the cluster") for i in range(200)]
    rows += [(1000 + i, f"unique document number {i} with its own words entirely") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _pairs(dedup.minhash_candidates(docs, max_bucket_pairs=32))
    hot = [(a, b) for a, b, _ in got if a < 1000 and b < 1000]
    cross = [(a, b) for a, b, _ in got if (a < 1000) != (b < 1000)]
    assert hot == [(0, i) for i in range(1, 200)]
    assert cross == []
