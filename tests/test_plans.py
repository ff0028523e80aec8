"""Physical-plan assertions: the scale-critical plan properties
(pushdown, pruning, broadcast, codegen) hold — not just correct
results, but the plans we'd want at 100 TB."""

import shutil

import pytest
from pyspark.sql import functions as F

from eaststorm_searchengine_spark.functions import sqltok
from eaststorm_searchengine_spark.operators.bm25 import bm25_score_dataframe
from eaststorm_searchengine_spark.operators.index_build import build_index_fast
from eaststorm_searchengine_spark.plans import inspect

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def idx_root(spark):
    root = "/root/repo/_tmp/t_plans_idx"
    shutil.rmtree(root, ignore_errors=True)
    build_index_fast(spark, spark.read.parquet(f"{SF}/documents.parquet"), root)
    return root


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") > 100
    ).select("doc_id")
    pf = inspect.pushed_filters(df)
    assert "GreaterThan(doc_id,100)" in pf, pf


def test_column_pruning_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    rs = inspect.read_schema(df)
    assert "doc_id" in rs and "lang" in rs
    assert "text" not in rs, f"text not pruned: {rs}"


def test_segment_bucket_partition_pruning(spark, idx_root):
    segs = spark.read.parquet(f"{idx_root}/segments").filter(
        F.col("bucket").isin([1, 3])
    )
    pf = inspect.partition_filters(segs)
    assert "bucket" in pf, pf
    # term filter is pushed to the parquet row groups as well
    segs2 = spark.read.parquet(f"{idx_root}/segments").filter(
        (F.col("bucket") == 1) & (F.col("term") == "join")
    )
    assert "term" in inspect.pushed_filters(segs2)


def test_query_term_join_is_broadcast(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = bm25_score_dataframe(spark, docs, [(1, "hash join")], k=5)
    assert inspect.uses_broadcast_join(df)


def test_tokenizer_expression_stays_jvm_side(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select(F.size(sqltok.tokens_col(F.col("text"))).alias("n"))
    plan = inspect.formatted_plan(df)
    # JVM-side expression pipeline: no Python eval nodes anywhere
    # (higher-order array functions run on the JVM even though they
    # fall outside whole-stage codegen)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Scan parquet" in plan


def test_aggregation_has_partial_stage(spark):
    # map-side partial aggregation (the pre-shuffle combine) is planned
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.groupBy("lang").count()
    plan = inspect.formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_search_plan_prunes_and_broadcasts(spark, idx_root):
    import __spark_entry__ as E
    from eaststorm_searchengine_spark.operators.bm25 import BM25Index

    idx = BM25Index(spark, idx_root)
    df = idx.search([(1, "hash join")], k=5)
    plan = inspect.formatted_plan(df)
    # segment scan prunes bucket directories and pushes the term filter
    assert "bucket" in inspect.partition_filters(df)
    assert "term" in inspect.pushed_filters(df)
    # r8: per-term df resolves DRIVER-side (BM25Index._term_dfs — idf
    # ships in the task closure), so the search plan has NO join and
    # no shuffle beyond the per-chunk grouping: the per-query
    # broadcast-build job is gone (serving-floor cut, VERDICT r07 #5)
    assert "Join" not in plan, plan
    assert idx._df_map, "driver-side term->df cache expected at this scale"


def test_systematic_sample_no_global_window(spark):
    """The two-phase rank must not move the whole table through one
    task: no single-partition Exchange anywhere in the plan
    (VERDICT r01 'What's wrong' #3)."""
    from eaststorm_searchengine_spark.operators import analytics

    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = analytics.systematic_sample(ev, "event_id", 50)
    plan = inspect.formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan


def test_systematic_sample_matches_global_window(spark):
    """Two-phase rank == the naive global-window rank (sf0.01)."""
    from pyspark.sql import Window

    from eaststorm_searchengine_spark.operators import analytics

    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "event_type")
    got = sorted(
        (r.event_id, r.event_type)
        for r in analytics.systematic_sample(ev, "event_id", 37).collect()
    )
    w = Window.orderBy(F.asc("event_id"))
    want = sorted(
        (r.event_id, r.event_type)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % 37 == 0)
        .drop("rn")
        .collect()
    )
    assert got == want and len(got) > 0


def test_no_cartesian_in_any_contract_query(spark):
    """Global scale-hygiene gate: NO contract query's final plan may
    contain CartesianProduct or BroadcastNestedLoopJoin — all-pairs
    shapes are banned engine-wide (the pytest-only all-pairs oracle
    baselines are exempt by not being contract queries)."""
    import __spark_entry__ as E

    # exact brute-force ANN scores corpus x query-batch via a broadcast
    # cross against the (tiny, fixed) query set — linear in the corpus,
    # not an all-pairs product; the only sanctioned BNLJ
    exempt = {"ann_cosine_topk"}

    bad = {}
    for name, fn in E.queries().items():
        if name in exempt:
            continue
        df = fn(spark, SF)
        plan = inspect.formatted_plan(df)
        hits = [
            tok for tok in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if tok in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_field_indexes_single_pass_one_shuffle(spark):
    """The combined field-index builder must plan exactly ONE exchange
    (the (field, term) aggregation) over one corpus scan — the whole
    point vs unioning four per-field builders (four scans, four
    shuffles)."""
    from eaststorm_searchengine_spark import corpus as corpus_mod
    from eaststorm_searchengine_spark.operators import indexers

    import re

    pages = corpus_mod.synthesize_pages(spark, SF)
    plan = inspect.formatted_plan(indexers.field_indexes(pages))
    # the corpus synthesis itself carries one RoundRobin repartition
    # (the small-input _spread guard, a no-op at scale) — the gate is
    # on HASH exchanges: exactly one, keyed (field, term)
    hash_ex = sorted(set(re.findall(r"hashpartitioning\([^)]*\)", plan)))
    assert len(hash_ex) == 1, f"hash exchanges {hash_ex}:\n{plan[:2000]}"
    assert "field" in hash_ex[0] and "term" in hash_ex[0]


def test_local_group_topk_equals_window_only_randomized(spark):
    """Randomized equivalence: pruned + window == window-only, across
    seeds with heavy score ties (the boundary case where an
    order-inconsistent prune would diverge)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eaststorm_searchengine_spark.functions.topk import local_group_topk

    for seed in range(5):
        rng = np.random.RandomState(seed)
        n = 500
        rows = [
            (int(rng.randint(0, 4)), int(i),
             float(rng.randint(0, 8)))  # few distinct scores → many ties
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "q int, id long, score double").repartition(7)
        k = int(rng.randint(1, 12))
        w = Window.partitionBy("q").orderBy(F.desc("score"), F.asc("id"))

        def rank(input_df):
            return sorted(
                tuple(r)
                for r in input_df.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= k)
                .collect()
            )

        pruned = local_group_topk(df, "q", ["score", "id"], [False, True], k)
        assert rank(pruned) == rank(df), (seed, k)


def test_single_query_driver_merge_is_one_job(spark, idx_root):
    """r8 serving floor: a warm single-query search with
    final_rank='driver' runs as exactly ONE Spark job — the per-query
    broadcast-join job is gone (driver-side df resolution) and the AQE
    map-stage materialization barrier is gone (dedicated non-AQE
    serving session).  statusTracker-counted."""
    import time

    from eaststorm_searchengine_spark.operators.bm25 import BM25Index

    idx = BM25Index(spark, idx_root)
    # warm: df-map load + serving-session creation + scan caches
    idx.search([(1, "hash join")], k=5, final_rank="driver").collect()
    # Dedicated job group (ADVICE r8): counting default-group IDs
    # context-wide races any concurrent fixture/session job; the group
    # is a thread-local property so only THIS search's jobs land in it.
    sc = spark.sparkContext
    st = sc.statusTracker()
    group = "test-single-query-one-job"
    sc.setJobGroup(group, "1-job serving gate")
    try:
        idx.search([(2, "merge sort")], k=5, final_rank="driver").collect()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # poll until the tracker is quiescent instead of a fixed sleep
    jobs, deadline = [], time.time() + 10.0
    while time.time() < deadline:
        now = st.getJobIdsForGroup(group) or []
        if jobs and list(now) == list(jobs):
            break
        jobs = list(now)
        time.sleep(0.2)
    assert len(jobs) == 1, f"expected 1 job, saw {len(jobs)}"


def test_concurrent_serving_no_crosstalk(spark, idx_root):
    """VERDICT r08 #7: a long-lived query server drives ONE handle from
    many threads.  N concurrent ``search()`` calls (fresh handle, so
    the lazy serving-session + df-map inits race too) must each return
    exactly the sequential result for their own query — no cross-talk,
    no double-created serving session."""
    from pyspark import InheritableThread

    from eaststorm_searchengine_spark.operators.bm25 import BM25Index

    queries = [
        "hash join", "merge sort", "query optimizer", "index scan",
        "data analysis", "research method",
    ]
    seq = BM25Index(spark, idx_root)
    want = {
        q: sorted(
            tuple(r)
            for r in seq.search([(i, q)], k=5, score_round=4,
                                final_rank="driver").collect()
        )
        for i, q in enumerate(queries)
    }
    idx = BM25Index(spark, idx_root)  # fresh: lazy inits race below
    results, errors = {}, []

    def worker(i, q):
        try:
            for _ in range(3):  # repeat: warm-path races too
                got = sorted(
                    tuple(r)
                    for r in idx.search([(i, q)], k=5, score_round=4,
                                        final_rank="driver").collect()
                )
                assert got == want[q], (q, got[:2], want[q][:2])
            results[q] = got
        except Exception as e:  # surface across the thread boundary
            errors.append((q, repr(e)))

    threads = [
        InheritableThread(target=worker, args=(i, q))
        for i, q in enumerate(queries)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert set(results) == set(queries)
    # exactly one serving session was created despite the racing inits
    assert idx._serve_spark is not None
    assert idx._serve_segs_df is not None
