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
    uncapped = _pairs(dedup.minhash_candidates(docs, max_bucket_docs=1 << 30))
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
    got = _pairs(dedup.minhash_candidates(docs, max_bucket_docs=64))
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
    got = _pairs(dedup.minhash_candidates(docs, max_bucket_docs=32))
    hot = [(a, b) for a, b, _ in got if a < 1000 and b < 1000]
    cross = [(a, b) for a, b, _ in got if (a < 1000) != (b < 1000)]
    assert hot == [(0, i) for i in range(1, 200)]
    assert cross == []


def test_ngram_prefix_filtering_complete(spark):
    """Prefix filtering must find EVERY pair with J ≥ t (the theorem it
    implements), verified against a brute-force all-pairs oracle on a
    corpus engineered with near-threshold overlaps."""
    words = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        # sliding windows of 12 words with stride 3: neighbours share
        # 9/15 grams-ish → many pairs straddling t=0.5
        start = (d * 3) % 18
        rows.append((d, " ".join(words[start : start + 12])))
    rows += [(100 + d, f"unique{d} " * 8) for d in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    )

    # brute-force oracle with the same gram definition
    def grams(text, n=3):
        t = text.split(" ")
        return {
            " ".join(t[i : i + n]) for i in range(max(len(t) - n, 0) + 1)
        }

    gmap = {d: grams(t) for d, t in rows}
    want = []
    ids = sorted(gmap)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(gmap[a] & gmap[b])
            union = len(gmap[a] | gmap[b])
            j = round(inter / union, 6)
            if j >= 0.5:
                want.append((a, b, j))
    assert got == sorted(want)
    assert len(want) > 0


def test_simhash_near_dups_complete(spark):
    """Bit-block blocking must find EVERY pair within the hamming
    bound (Manku-Jain-Sarma pigeonhole), vs a brute-force oracle on a
    corpus with planted token-level mutations."""
    base_words = [f"term{i}" for i in range(60)]
    rows = []
    for d in range(25):
        words = list(base_words)
        # mutate a few tokens per doc: nearby docs get similar simhashes
        for j in range(d % 5):
            words[j] = f"mut{d}_{j}"
        rows.append((d, " ".join(words)))
    rows += [(100 + d, f"totally different corpus {d} " * 6) for d in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dups(docs, max_hamming=6).collect()
    )

    sigs = {d: dedup.simhash64(t) for d, t in rows}
    want = []
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 6:
                want.append((a, b, h))
    assert got == sorted(want)
    assert len(want) > 0


def test_simhash_flood_star_bound(spark):
    """1,000 byte-identical docs share one fingerprint; every bit-block
    bucket goes over the cap, so the star fallback emits exactly n-1
    hamming-0 pairs anchored at the min id instead of ~500k
    (VERDICT r02 #1), and completes fast."""
    n = 1000
    rows = [(i, "the same flooded document body for every copy") for i in range(n)]
    rows += [(5000 + i, f"distinct page {i} with entirely different words here") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.perf_counter()
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dups(docs, max_hamming=3, max_block_docs=64).collect()
    )
    elapsed = time.perf_counter() - t0
    flood = [(a, b, h) for a, b, h in got if a < 5000 and b < 5000]
    assert flood == [(0, i, 0) for i in range(1, n)]
    assert elapsed < 120, f"flooded corpus took {elapsed:.1f}s"


def test_simhash_block_cap_does_not_change_normal_corpora(spark):
    """At sf0.01 no bit-block bucket exceeds the cap: capped == uncapped."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = lambda df: sorted((r.doc_a, r.doc_b, r.hamming) for r in df.collect())
    capped = key(dedup.simhash_near_dups(docs, max_hamming=3))
    uncapped = key(dedup.simhash_near_dups(docs, max_hamming=3, max_block_docs=1 << 30))
    assert capped == uncapped


def test_ngram_direct_route_matches_prefix_route(spark):
    """r10: ngram_jaccard_pairs cost-routes between the direct gram
    self-join (small Σdf²) and the prefix-filter fallback (hot-gram
    corpora).  Force each route via direct_rows_budget and require
    identical pairs on the real sf0.01 corpus — including the length
    filter both routes now apply."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = lambda df: sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())
    direct = key(dedup.ngram_jaccard_pairs(docs, threshold=0.5, direct_rows_budget=1 << 60))
    prefix = key(dedup.ngram_jaccard_pairs(docs, threshold=0.5, direct_rows_budget=0))
    assert direct == prefix
    assert len(direct) > 0


def test_ngram_count_verify_matches_array_verify(spark):
    """The production count-based Jaccard verify must equal the
    array-based formulation it replaced (VERDICT r02 #4) on the real
    sf0.01 corpus."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    key = lambda df: sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())
    got = key(dedup.ngram_jaccard_pairs(docs, threshold=0.5))
    want = key(dedup.ngram_jaccard_pairs_arrays(docs, threshold=0.5))
    assert got == want
    assert len(got) > 0


def test_ngram_verify_join_ships_no_arrays(spark):
    """No array column may cross the verify joins: the plan between the
    candidate join and the jaccard filter must carry only scalar
    columns (the point of the count-based rewrite)."""
    from eaststorm_searchengine_spark.plans import inspect

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = inspect.formatted_plan(dedup.ngram_jaccard_pairs(docs, threshold=0.5))
    # the gram-set arrays exist only below the explode; they must not
    # appear in any join output schema (array_intersect/array_union
    # would mark the array formulation)
    assert "array_intersect" not in plan and "array_union" not in plan


def test_connected_components_vs_union_find(spark):
    """Hash-min label propagation == a pure-Python union-find on a
    graph with chains, stars, a cycle, and singleton-free isolation."""
    edges = [(1, 2), (2, 3), (3, 4),          # chain
             (10, 11), (10, 12), (10, 13),    # star
             (20, 21), (21, 22), (22, 20),    # cycle
             (30, 31)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted((r.node, r.comp) for r in dedup.connected_components(pairs).collect())
    # the distributed label-propagation path must agree with the
    # driver-side union-find path (size gate is strategy-only)
    got_dist = sorted(
        (r.node, r.comp)
        for r in dedup.connected_components(pairs, driver_threshold=0).collect()
    )
    assert got == got_dist

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = sorted((n, find(n)) for n in parent)
    assert got == want


def test_connected_components_raises_on_nonconvergence(spark):
    """A chain deeper than max_iters must raise, never return partial
    labels (code-review r03 finding)."""
    import pytest

    chain = [(i, i + 1) for i in range(10)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iters=3, driver_threshold=0)
    # diameter == max_iters exactly must SUCCEED (the convergence check
    # costs one extra confirming round, not one propagation round)
    got = {
        r.comp
        for r in dedup.connected_components(
            pairs, max_iters=10, driver_threshold=0
        ).collect()
    }
    assert got == {0}


def test_near_dup_groups_flood_converges_fast(spark):
    """An identical-docs flood must resolve to ONE group in few rounds
    (the upstream pair generators emit star edges, diameter ≤ 2)."""
    rows = [(i, "same text body for every single copy here") for i in range(300)]
    rows += [(900 + i, f"unique doc {i} " + " ".join(f"w{i}x{j}" for j in range(10)))
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.near_dup_groups(docs, threshold=0.5).collect()
    flood = [(r.doc_id, r.group_id, r.n_docs) for r in got if r.doc_id < 900]
    assert flood == [(i, 0, 300) for i in range(300)]


def test_minhash_dup_groups_flood_one_group(spark):
    """End-to-end scale path: a 1,000-identical-docs flood groups into
    ONE component through O(m) star edges (diameter 2 → 2 CC rounds),
    and the distinct docs stay ungrouped singletons (absent)."""
    import time

    rows = [(i, "flooded identical body of text for the group") for i in range(1000)]
    rows += [(5000 + i, " ".join(f"u{i}w{j}" for j in range(12))) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.perf_counter()
    got = dedup.minhash_dup_groups(docs).collect()
    elapsed = time.perf_counter() - t0
    flood = [(r.doc_id, r.group_id, r.n_docs) for r in got if r.doc_id < 5000]
    assert flood == [(i, 0, 1000) for i in range(1000)]
    assert all(r.doc_id < 5000 for r in got)  # uniques form no pairs
    assert elapsed < 150, f"flood grouping took {elapsed:.1f}s"


def test_ngram_prefix_filtering_complete_t08(spark):
    """t=0.8 with gram counts that make t*n a whole number — the float
    (1-t)*n lands just below the integer and a naive floor would cut
    the prefix one short (code-review r02 finding)."""
    words = [f"v{i}" for i in range(40)]
    rows = []
    for d in range(12):
        # 12 tokens -> exactly 10 distinct 3-grams; neighbours overlap 9/11
        start = d
        rows.append((d, " ".join(words[start : start + 12])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    )

    def grams(text, n=3):
        t = text.split(" ")
        return {" ".join(t[i : i + n]) for i in range(max(len(t) - n, 0) + 1)}

    gmap = {d: grams(t) for d, t in rows}
    want = []
    ids = sorted(gmap)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = round(len(gmap[a] & gmap[b]) / len(gmap[a] | gmap[b]), 6)
            if j >= 0.8:
                want.append((a, b, j))
    assert got == sorted(want)
    assert len(want) > 0


def test_ngram_staged_grams_match_persist_path(spark, tmp_path):
    """stage_dir (the grouping-scale path: exploded grams staged to
    parquet instead of the cluster cache) must produce exactly the
    persist path's pairs and groups."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stage = str(tmp_path / "grams")
    base = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    )
    staged = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, stage_dir=stage).collect()
    )
    assert staged == base and len(base) > 0
    import os

    assert any(f.endswith(".parquet") for f in os.listdir(stage))
    g_base = sorted(
        (r.doc_id, r.group_id, r.n_docs)
        for r in dedup.near_dup_groups(docs, threshold=0.5).collect()
    )
    g_staged = sorted(
        (r.doc_id, r.group_id, r.n_docs)
        for r in dedup.near_dup_groups(
            docs, threshold=0.5, stage_dir=str(tmp_path / "grams2")
        ).collect()
    )
    assert g_staged == g_base


def test_star_cap_metrics_report_engagement(spark):
    """metrics={} fills overcap_buckets: zero on a normal corpus,
    positive under an identical-docs flood (ADVICE r03 #2 — pair
    consumers can now detect when the star bound engaged)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m: dict = {}
    dedup.minhash_candidates(docs, metrics=m).count()
    assert m["overcap_buckets"] == 0
    flood = spark.createDataFrame(
        [(i, "the same exact document text repeated for everyone") for i in range(300)],
        "doc_id long, text string",
    )
    m2: dict = {}
    dedup.minhash_candidates(flood, max_bucket_docs=64, metrics=m2).count()
    assert m2["overcap_buckets"] >= dedup.N_BANDS
