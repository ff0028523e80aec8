"""Benchmark harness — one JSON line for the driver.

Headline workload (BASELINE.json metric):
  * index-build throughput (docs/sec) over the synthetic ``pages``
    corpus — full pipeline: html binary → extraction (byte-identical
    reference semantics) → tokenize → salted shuffle → compressed
    block-max segments
  * query p50 latency over the fixed 12-query set (segment engine,
    exhaustive + WAND)
  * representative operator timings (PageRank, indexers, dedup, ANN,
    analytics)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Scaling evidence (N vs 4N cores) lives in scaling.py → BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
HERE = os.path.dirname(os.path.abspath(__file__))
TMP = os.path.join(HERE, "_tmp")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from eaststorm_searchengine_spark import corpus as corpus_mod
    from eaststorm_searchengine_spark.operators import (
        analytics,
        dedup,
        indexers,
        pagerank,
        similarity,
    )
    from eaststorm_searchengine_spark.operators.bm25 import BM25Index, DECISION_REASONS
    from eaststorm_searchengine_spark.operators.index_build import build_index, build_index_fast
    from eaststorm_searchengine_spark.session import get_spark

    spark = get_spark("eaststorm-bench", cores=CPUS, shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tag = os.path.basename(os.path.normpath(SF_DIR))

    # ---- setup (untimed): materialize the bench corpus once ----------
    # sf0.1 synthetic pages replicated x10 (disjoint doc ids) = 50k pages,
    # the reference's production-crawl scale (AWS_SETUP.md:384); sized so
    # per-core compute dominates fixed job overhead
    replicas = int(os.environ.get("BENCH_REPLICAS", "10"))
    pages_path = os.path.join(TMP, f"bench_pages_{tag}_x{replicas}")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        base = corpus_mod.pages_with_ids(spark, SF_DIR)
        nb = base.count()
        rep = corpus_mod.replicate_with_ids(base, replicas, nb)
        rep.repartition(64).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()
    # JVM + python-worker warm-up (spawn cost out of the timings)
    import pandas as _pd
    spark.range(1000).select(F.sum("id")).collect()
    spark.createDataFrame([(i,) for i in range(CPUS * 4)], "v int").repartition(CPUS).mapInPandas(
        lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int"
    ).count()

    queries: dict[str, float] = {}

    # Steal canary: fixed PURE-PYTHON single-core work whose wall time
    # tracks hypervisor steal and nothing else — the same probe the
    # scaling children use.  The r5 AND the first r6 records both
    # caught the flagship index-build entry in a sustained slow window
    # (17.3 s recorded vs 7.5-7.9 s isolated minutes later) — a burst
    # long enough to swallow every best-of-3 repeat.  Guarded entries
    # re-measure (bounded) while the canary reads >1.5x its session
    # baseline; the per-entry canary ratio is recorded in the output
    # JSON either way, so a still-contaminated number is labeled rather
    # than silently wrong.
    #   Through r9 the canary was a 32-partition Spark range-sum job;
    # an interleaved A/B on an idle VM read the Spark job's SELF-noise
    # at 1.77x max-over-min (scheduler/GC/JIT jitter) in the same
    # minute the python loop spread 1.12x — the old probe labeled calm
    # windows dirty, and its running-min base locked onto turbo-warm
    # readings (0.053 s vs the ~0.18 s norm) that inflated every later
    # ratio.  The python loop is also core-count- and session-state-
    # invariant, so ratios compare across rounds and processes.  Known
    # blind spot, accepted: a single-core probe can't see REDUCED
    # PARALLEL CAPACITY (co-tenant VMs loading some of the 32 cores
    # while per-core speed stays flat) — that weather shows up as
    # uniform drift of the absolute entry values between whole runs,
    # which the round-over-round record already exposes.
    def canary_run() -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            x = 0
            for i in range(3_000_000):
                x += i
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    # running-min base: a slow session START would inflate a fixed base
    # and make every later ratio read ~1 inside the same window; every
    # reading ratchets the base down instead.  Absolute seconds are
    # recorded too — the work is fixed, so they're comparable across
    # rounds (~0.09-0.15 s on an uncontended window).
    canary_state = {"base": min(canary_run() for _ in range(3))}

    def canary() -> float:
        """One canary reading in RAW seconds; ratchets the running-min
        base down.  Ratios are computed at use time against the
        then-current base so the recorded absolute seconds are always
        values that were actually measured (code-review r06: deriving
        abs = ratio x base fabricated a never-measured number whenever
        the base ratcheted between the pre and post readings)."""
        t = canary_run()
        canary_state["base"] = min(canary_state["base"], t)
        return t

    canary_ratios: dict[str, float] = {}
    canary_abs: dict[str, float] = {}

    def with_guard(name: str, run, merge, max_extra: int = 3):
        """ONE canary-bracket policy for every guarded measurement
        (code-review r7: the p50 loop had hand-copied this with a
        drifted retry bound).  Brackets ``run()`` with canaries on BOTH
        sides (a burst spanning the repeats shows on at least one);
        while the window reads slow (>1.5× the running-min base),
        re-runs up to ``max_extra`` times, folding results with
        ``merge(prev, new)``.  ``max_extra=0`` = label-only (ratio
        recorded, no re-measure).  Records the entry's canary ratio +
        absolute worst seconds."""
        worst_t = canary()
        res = run()
        worst_t = max(worst_t, canary())
        extra = 0
        while worst_t / canary_state["base"] > 1.5 and extra < max_extra:
            time.sleep(5.0)  # let the burst pass before re-measuring
            worst_t = canary()
            res = merge(res, run())
            worst_t = max(worst_t, canary())
            extra += 1
        canary_ratios[name] = round(worst_t / canary_state["base"], 2)
        canary_abs[name] = round(worst_t, 3)
        return res

    # best-of-N everywhere: this VM suffers bursty hypervisor steal
    # (same job swings 2-3x run to run — BASELINE.md methodology note);
    # min-of-repeats is the stable statistic
    def timed(name: str, fn, repeats: int = 3, guard: bool = False, label: bool = False):
        """guard=True: bracket with canaries and re-measure (bounded)
        while the window reads slow — for the headline entries.
        label=True: record the canary ratio only (~0.12 s cost), no
        re-measure — for noise-prone heavy entries whose absolute
        numbers swing with the window (fragmented/compaction, the big
        dedup pipelines); a drifted reading in the artifact then
        carries its own weather report."""
        out: dict = {}
        first = [True]

        def run_best() -> float:
            # full best-of-repeats on the first pass; guarded retries
            # add ONE measurement each (the historical retry cost)
            n = repeats if first[0] else 1
            first[0] = False
            best = None
            for _ in range(n):
                t0 = time.time()
                out["v"] = fn()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        if guard or label:
            best = with_guard(name, run_best, min, max_extra=3 if guard else 0)
        else:
            best = run_best()
        queries[name] = round(best, 4)
        return out.get("v")

    # ---- headline: index build from raw html -------------------------
    # pipeline-specific warm-up (VERDICT r05 #2): the r5 record had the
    # two index-build entries +24-36% vs r4 while everything else got
    # faster — the first heavy extraction+shuffle+encode job pays cold
    # JIT / python-worker spawn that the generic warm-up above doesn't
    # cover.  Run the full pipeline untimed on a small slice first.
    warm_dir = os.path.join(TMP, "bench_warm_idx")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index_fast(
        spark, pages.limit(2000), warm_dir,
        id_col="doc_id", text_col="html", from_html=True,
    )
    shutil.rmtree(warm_dir, ignore_errors=True)
    idx_dir = os.path.join(TMP, f"bench_idx_{tag}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    timed(
        "index_build_html",
        lambda: build_index_fast(
            spark, pages, idx_dir, id_col="doc_id", text_col="html", from_html=True
        ),
        repeats=3,
        guard=True,
    )
    docs_per_sec = n_docs / queries["index_build_html"]
    idx_dir2 = os.path.join(TMP, f"bench_idx_term_{tag}")
    shutil.rmtree(idx_dir2, ignore_errors=True)
    timed(
        "index_build_term_partitioned",
        lambda: build_index(
            spark, pages, idx_dir2, id_col="doc_id", text_col="html", from_html=True
        ),
        repeats=3,
        guard=True,
    )
    idx = BM25Index(spark, idx_dir)

    # ---- query latency: batch + per-query p50 ------------------------
    timed("bm25_batch12", lambda: idx.search(E.QUERY_SET, k=10).collect(), label=True)
    timed("bm25_batch12_wand", lambda: idx.search(E.QUERY_SET, k=10, method="wand").collect(), label=True)
    # single-query p50 uses the fused one-job plan (driver-side merge of
    # the ≤ chunks×k candidates into a VALUES LocalRelation — results
    # pytest-gated identical to the distributed window rank that the
    # batch path keeps); best-of-2 per query like every other entry
    # (hypervisor-steal bursts hit single 1 s jobs hardest)
    def p50_loop():
        """Per-query canary brackets (r9, VERDICT r08 #4): the p50
        MEDIAN dodges a single mid-loop burst exactly like the
        per-query mins do, so its label is the MEDIAN of per-query
        brackets — one loop-level worst bracket declared a clean-median
        measurement dirty (the r8 record's 1.51).  The worst bracket is
        recorded alongside, so the record carries both."""
        out, brackets = [], []
        c_prev = canary()
        for qid, q in E.QUERY_SET:
            per = []
            for _ in range(2):
                t0 = time.time()
                idx.search([(qid, q)], k=10, final_rank="driver").collect()
                per.append(time.time() - t0)
            out.append(min(per))
            c_now = canary()
            brackets.append(max(c_prev, c_now))
            c_prev = c_now
        return out, brackets

    lat, p50_brackets = p50_loop()
    canary_abs["bm25_single_p50"] = round(statistics.median(p50_brackets), 3)
    canary_abs["bm25_single_p50_worst"] = round(max(p50_brackets), 3)
    query_p50 = statistics.median(lat)
    queries["bm25_single_p50"] = round(query_p50, 4)

    # ---- serving-scale: the same queries against a 1M-page index -----
    # Builds are proven at 1M by scaling.py; this measures the QUERY
    # side at that scale (VERDICT r04 #2).  The corpus and index are
    # built once and cached in _tmp (untimed setup — build throughput
    # at this scale is scaling.py's number).
    serving_reps = int(os.environ.get("SERVING_REPLICAS", "200"))
    spages_path = os.path.join(TMP, f"scaling_pages_{tag}_x{serving_reps}")
    if not os.path.exists(os.path.join(spages_path, "_SUCCESS")):
        base = corpus_mod.pages_with_ids(spark, SF_DIR)
        rep = corpus_mod.replicate_with_ids(base, serving_reps, base.count())
        rep.repartition(64).write.mode("overwrite").parquet(spages_path)
    # The serving span is chosen by the build itself since r6: the
    # adaptive rule targets ~one chunk per core (query-side
    # parallelism), which lands the cb15-equivalent 32k-doc span at
    # this scale automatically — the manual chunk_bits=15 override and
    # its A/B entry are retired (VERDICT r05 #4).  At 10^12 docs the
    # fixed 2^18 production span gives this shape naturally.
    sidx_dir = os.path.join(TMP, f"serving_idx_{tag}_x{serving_reps}_auto")
    if not os.path.exists(os.path.join(sidx_dir, "stats.json")):
        build_index(
            spark, spark.read.parquet(spages_path), sidx_dir,
            id_col="doc_id", text_col="html", from_html=True,
        )
    serving_chunk_bits = json.load(open(os.path.join(sidx_dir, "stats.json")))["chunk_bits"]
    # self-consistency with the adaptive rule at THIS corpus/core count
    # (code-review r06: a bare >=15 assert hard-coded the default
    # 32-core x200-replica config and crashed the bench under other
    # valid env settings); the >=15 regression check only applies at
    # the configuration the r5 A/B was measured at
    from eaststorm_searchengine_spark.operators.index_build import adaptive_chunk_bits

    n_serving = spark.read.parquet(spages_path).count()
    expected_bits = adaptive_chunk_bits(n_serving, CPUS)
    assert serving_chunk_bits == expected_bits, (
        f"serving index span cb{serving_chunk_bits} != adaptive rule's "
        f"cb{expected_bits} for {n_serving} docs @ {CPUS} cores — stale cache?"
    )
    if CPUS == 32 and n_serving >= 1_000_000:
        assert serving_chunk_bits >= 15, (
            f"adaptive span regressed to cb{serving_chunk_bits} at 1M docs"
        )
    sidx = BM25Index(spark, sidx_dir)
    timed("bm25_batch12_wand_1m", lambda: sidx.search(E.QUERY_SET, k=10, method="wand").collect(), label=True)
    # the product path (auto) as ONE job: batch amortization evidence
    # for VERDICT r06 #3 — per-query cost of a 12-query batch vs the
    # single-query p50 below
    timed("bm25_batch12_auto_1m", lambda: sidx.search(E.QUERY_SET, k=10).collect(), label=True)
    # per-query table (VERDICT r05 #3): the r5 record had a 0.5-2.4 s
    # spread across the 12 queries — dense-vocabulary queries score
    # essentially every document.  Serving routes through the default
    # method="auto" (caps the dense tail at vectorized-exhaustive
    # cost); the table evidences the spread per query.
    lat_1m: dict[str, float] = {}
    matched_1m: dict[str, bool] = {}
    per_q_canary: list[float] = []
    c_prev = canary()
    for qid, q in E.QUERY_SET:
        per = []
        rows = []
        for _ in range(3):
            t0 = time.time()
            rows = sidx.search([(qid, q)], k=10, final_rank="driver").collect()
            per.append(time.time() - t0)
        lat_1m[q] = round(min(per), 4)
        matched_1m[q] = len(rows) > 0
        c_now = canary()
        per_q_canary.append(max(c_prev, c_now))
        c_prev = c_now
    # the spread metric is window-sensitive (a burst inflates one
    # query's min and the max/min ratio with it) — label the whole
    # table with the worst canary reading bracketing it.  The p50
    # MEDIAN, by contrast, dodges a single mid-loop burst the same way
    # the per-query mins do, so its headline label is the MEDIAN of
    # the per-query brackets, not the worst (r8 — the r7-style single
    # worst-of-loop label declared the entry dirty when 0.5 s of one
    # bracket out of 24 was slow)
    canary_ratios["serving_1m_per_query"] = round(
        max(per_q_canary) / canary_state["base"], 2
    )
    canary_abs["serving_1m_per_query"] = round(max(per_q_canary), 3)
    canary_abs["bm25_single_p50_1m"] = round(
        statistics.median(per_q_canary), 3
    )
    canary_abs["bm25_single_p50_1m_worst"] = round(max(per_q_canary), 3)
    queries["bm25_single_p50_1m"] = round(statistics.median(lat_1m.values()), 4)
    # VERDICT r06 #3: serving floor — pin the segment/stats frames
    # (columnar executor cache, the long-lived-server configuration)
    # and re-measure the single-query p50 against the same 1M index
    pidx = BM25Index(spark, sidx_dir, pin=True)
    pidx.search(E.QUERY_SET, k=10).collect()  # untimed: populate the cache
    plat = []
    for qid, q in E.QUERY_SET:
        per = []
        for _ in range(2):
            t0 = time.time()
            pidx.search([(qid, q)], k=10, final_rank="driver").collect()
            per.append(time.time() - t0)
        plat.append(min(per))
    queries["bm25_single_p50_1m_pinned"] = round(statistics.median(plat), 4)
    pidx.unpersist()
    # VERDICT r08 #3 closure: the remaining single-query floor is ONE
    # two-stage job; record its per-stage task breakdown so the record
    # shows what the ~0.35 s buys.  (The r9 coalesce(1) single-task
    # variant was equality-gated and A/B'd: SLOWER at every shape —
    # 32-way scan+decode parallelism is load-bearing; see NOTES.)
    serving_stage_profile = []
    try:
        sc_ = spark.sparkContext
        st_ = sc_.statusTracker()
        grp = "bench-serving-profile"
        sc_.setJobGroup(grp, "serving stage profile")
        sidx.search(E.QUERY_SET[:1], k=10, final_rank="driver").collect()
        sc_.setLocalProperty("spark.jobGroup.id", None)
        time.sleep(0.3)
        for j in sorted(st_.getJobIdsForGroup(grp) or []):
            ji = st_.getJobInfo(j)
            for sid in (ji.stageIds if ji else []):
                si = st_.getStageInfo(sid)
                if si is not None:
                    serving_stage_profile.append(
                        {"job": j, "stage": sid, "tasks": si.numTasks,
                         "name": si.name.split("(")[0].strip()}
                    )
    except Exception:
        pass
    serving_1m_spread = round(max(lat_1m.values()) / max(min(lat_1m.values()), 1e-9), 2)
    # the no-match control query ('zzzmissing') returns in ~0.4 s and
    # would dominate the min — the tail metric that matters is the
    # spread across queries that actually score documents
    m_lats = [v for q, v in lat_1m.items() if matched_1m[q]]
    serving_1m_spread_matching = round(max(m_lats) / max(min(m_lats), 1e-9), 2)
    # the scale property that makes 1M-doc (and 10^12-doc) serving
    # viable: the segment scan is bucket-directory-pruned per query
    from eaststorm_searchengine_spark.plans import inspect as plan_inspect

    serving_plan = sidx.search(E.QUERY_SET[:1], k=10)
    serving_pruned = "bucket" in plan_inspect.partition_filters(serving_plan)

    # ---- compact_index: streaming-fragment read amplification --------
    # A long-running incremental ingest leaves one fragment set per
    # micro-batch (50 here ≈ 42k segment files); compaction re-chunks
    # through the salted shuffle into the canonical layout (~800
    # files).  Fragmented-store build is cached; compaction re-runs
    # each round (VERDICT r04 #4).
    from eaststorm_searchengine_spark.operators import index_build as ib_mod
    from eaststorm_searchengine_spark.streaming import incremental

    frag_dir = os.path.join(TMP, f"bench_frag_idx_{tag}")
    if not os.path.exists(os.path.join(frag_dir, "stats.json")):
        shutil.rmtree(frag_dir, ignore_errors=True)
        per = (n_docs + 49) // 50
        for b in range(50):
            batch = pages.filter(
                (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
            )
            incremental._append_batch(
                batch, b, frag_dir, "doc_id", "html", True, ib_mod.DEFAULT_BUCKETS
            )
        incremental.refresh_metadata(spark, frag_dir)
    fidx = BM25Index(spark, frag_dir)
    timed("bm25_batch12_fragmented", lambda: fidx.search(E.QUERY_SET, k=10).collect(), repeats=2, guard=True)
    comp_dir = os.path.join(TMP, f"bench_compacted_idx_{tag}")

    def compact_run():
        shutil.rmtree(comp_dir, ignore_errors=True)
        ib_mod.compact_index(spark, [frag_dir], comp_dir)

    timed("compact_index_50frags", compact_run, repeats=1, guard=True)
    cidx = BM25Index(spark, comp_dir)

    # ---- auto-compaction policy: serving at the policy's max health --
    # The r9 policy (incremental.auto_compact) compacts past
    # incremental.MAX_FRAGMENTS, so the WORST store a policy-maintained
    # ingest ever serves from has that many fragments.  Gate: serving
    # there stays within ~2x of compacted steady-state (the 50-frag
    # store above is ~7-11x — that's what the policy prevents).  Store
    # build cached; policy check + decline timed implicitly (it's a
    # metadata walk).
    n_frag_max = incremental.MAX_FRAGMENTS
    pol_dir = os.path.join(TMP, f"bench_policy_idx_{tag}_f{n_frag_max}")
    if not os.path.exists(os.path.join(pol_dir, "stats.json")):
        shutil.rmtree(pol_dir, ignore_errors=True)
        per12 = (n_docs + n_frag_max - 1) // n_frag_max
        for b in range(n_frag_max):
            batch = pages.filter(
                (F.col("doc_id") >= b * per12)
                & (F.col("doc_id") < (b + 1) * per12)
            )
            incremental._append_batch(
                batch, b, pol_dir, "doc_id", "html", True,
                ib_mod.DEFAULT_BUCKETS,
            )
        incremental.refresh_metadata(spark, pol_dir)
    assert incremental.auto_compact(spark, pol_dir) is None  # healthy
    pidx = BM25Index(spark, pol_dir)
    # Interleaved round-robin: the ratio's two sides must see the SAME
    # weather — measured minutes apart (the pre-r9 shape), a steal
    # burst on either side fabricates a policy regression (a dirty
    # window read 3.01 where the degradation curve says ~2.0).  The
    # entries keep their per-method min; the RATIO is the median of
    # per-round pairs, each pair seconds apart.
    comp_lat: list[float] = []
    pol_lat: list[float] = []
    pre_ac = canary()
    for _ in range(3):
        t0 = time.time()
        cidx.search(E.QUERY_SET, k=10).collect()
        comp_lat.append(time.time() - t0)
        t0 = time.time()
        pidx.search(E.QUERY_SET, k=10).collect()
        pol_lat.append(time.time() - t0)
    post_ac = max(pre_ac, canary())
    queries["bm25_batch12_compacted"] = round(min(comp_lat), 4)
    queries["bm25_batch12_policy_store"] = round(min(pol_lat), 4)
    for entry in ("bm25_batch12_compacted", "bm25_batch12_policy_store"):
        canary_abs[entry] = round(post_ac, 3)
        canary_ratios[entry] = round(post_ac / canary_state["base"], 2)
    autocompact_serving_ratio = round(
        statistics.median(p / c for p, c in zip(pol_lat, comp_lat)), 2
    )

    # ---- WAND vs exhaustive through the engine on a Zipf corpus ------
    # The contract corpus's 31-term uniform vocabulary is WAND's worst
    # case; real webtext is Zipf (VERDICT r04 #5).  Deterministic Zipf
    # corpus + production-span chunks (chunk_bits=14 at this scale
    # reproduces the long per-chunk posting runs a 10^12-doc corpus has
    # at the fixed 2^18 span); decode counts come from the real
    # applyInPandas executors via accumulators.
    zdocs_path = os.path.join(TMP, "zipf_docs_200000")
    if not os.path.exists(os.path.join(zdocs_path, "_SUCCESS")):
        corpus_mod.synthesize_zipf_docs(spark, 200_000).write.mode("overwrite").parquet(zdocs_path)
    zidx_dir = os.path.join(TMP, "zipf_idx_200000_cb14")
    if not os.path.exists(os.path.join(zidx_dir, "stats.json")):
        build_index(spark, spark.read.parquet(zdocs_path), zidx_dir, chunk_bits=14)
    zidx = BM25Index(spark, zidx_dir)
    # r7 adds the vectorized MaxScore executor — the quartet evidences
    # auto's routing choice (selective→maxscore, dense→exhaustive)
    z_methods = ("exhaustive", "wand", "maxscore", "auto")

    def zipf_quartet(qset, prefix: str):
        """Interleaved round-robin best-of-3 over the four executors
        (VERDICT r05 #1): grouped repeats let one warm-up / steal
        burst land entirely on a single method — the r5 record had
        auto slowest of the trio while a same-day session had it
        fastest.  Round-robin exposes each method to the same noise.
        Returns (per-method decode counters, auto decision counters)
        for THIS query set; one shared shape for the anchored and
        mixed sets so the two records can't drift apart."""
        decode: dict = {}
        decisions: dict = {}
        best: dict = {}
        rows: dict = {}
        for _ in range(3):
            for m in z_methods:
                a = (spark.sparkContext.accumulator(0), spark.sparkContext.accumulator(0),
                     spark.sparkContext.accumulator(0))  # (fresh, total, logical)
                d = (
                    {r: spark.sparkContext.accumulator(0) for r in DECISION_REASONS}
                    if m == "auto"
                    else None
                )
                t0 = time.time()
                out = zidx.search(
                    qset, k=10, method=m, decode_acc=a, decision_acc=d
                ).collect()
                dt = time.time() - t0
                best[m] = min(best.get(m, dt), dt)
                rows[m] = {(r.query_id, r.rank, r.doc_id) for r in out}
                decode[m] = (a[0].value, a[1].value, a[2].value)
                if d is not None:
                    decisions = {r: acc.value for r, acc in d.items()}
        for m in z_methods:
            queries[f"{prefix}{m}"] = round(best[m], 4)
        assert (
            rows["exhaustive"] == rows["wand"] == rows["maxscore"] == rows["auto"]
        ), f"executor results diverge ({prefix})"
        return decode, decisions

    def bracketed_quartet(qset, prefix: str, tag: str):
        """zipf quartets carry their own weather report too (VERDICT
        r06 #2: every entry ≥ ~1 s gets a canary ratio); label-only
        (max_extra=0) — a quartet re-run costs 12 engine searches."""
        return with_guard(tag, lambda: zipf_quartet(qset, prefix),
                          lambda a, b: b, max_extra=0)

    zq = corpus_mod.zipf_queries(corpus_mod.ZIPF_ANCHORED_RANKS)
    z_decode, zipf_decisions_anchored = bracketed_quartet(zq, "zipf_bm25_", "zipf_quartet_anchored")
    # the skip-rate evidence metric is defined on the ANCHORED set
    # (dense controls decode ~everything by design — code-review r06:
    # the mixed run was silently overwriting this before)
    wand_decode_fraction = round(
        z_decode["wand"][0] / max(z_decode["wand"][1], 1), 4
    )
    # auto's home turf: the MIXED set (anchored + dense controls) where
    # neither pure executor is right for every query — auto should beat
    # both here, not just tie the per-set winner
    zq_mixed = corpus_mod.zipf_queries(
        corpus_mod.ZIPF_ANCHORED_RANKS + corpus_mod.ZIPF_DENSE_RANKS
    )
    zm_decode, zipf_decisions_mixed = bracketed_quartet(
        zq_mixed, "zipf_mixed_bm25_", "zipf_quartet_mixed"
    )
    wand_decode_fraction_mixed = round(
        zm_decode["wand"][0] / max(zm_decode["wand"][1], 1), 4
    )
    # maxscore skip rate in LOGICAL (cold-cache, per-query) decodes —
    # batch-size-invariant, comparable to pre-r7 fractions of the same
    # name-family (ADVICE r07: fresh decodes alone conflate cross-query
    # cache sharing with algorithmic skipping); fresh also recorded
    maxscore_decode = {
        "anchored_logical_fraction": round(
            z_decode["maxscore"][2] / max(z_decode["maxscore"][1], 1), 4),
        "anchored_fresh_fraction": round(
            z_decode["maxscore"][0] / max(z_decode["maxscore"][1], 1), 4),
        "mixed_logical_fraction": round(
            zm_decode["maxscore"][2] / max(zm_decode["maxscore"][1], 1), 4),
        "mixed_fresh_fraction": round(
            zm_decode["maxscore"][0] / max(zm_decode["maxscore"][1], 1), 4),
    }

    # ---- skew flood: the salted shuffle under a stopword flood -------
    # (VERDICT r05 #6 — the last unevidenced north-rule clause: "skew
    # handled explicitly").  Two corpora with IDENTICAL token mass: one
    # uniform-vocabulary, one where a single hot term appears in 50% of
    # documents (df=25k vs the uniform corpus's max df≈300 — an ~80×
    # posting-list skew).  The (bucket, chunk) salt bounds the
    # hot term's shuffle groups at 2^chunk_bits postings each, so the
    # skewed build should stay within ~1.3× of the uniform one.
    sk_n = 50_000
    sk_paths = {}
    for label, frac in (("uniform", 0.0), ("hot50", 0.5)):
        p = os.path.join(TMP, f"skew_docs_{sk_n}_{label}")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            corpus_mod.synthesize_skew_docs(
                spark, sk_n, hot_fraction=frac
            ).write.mode("overwrite").parquet(p)
        sk_paths[label] = p
    timed(
        "index_build_uniform",
        lambda: build_index(
            spark, spark.read.parquet(sk_paths["uniform"]),
            os.path.join(TMP, "skew_idx_uniform"),
        ),
        repeats=2,
        guard=True,
    )
    timed(
        "index_build_skewed",
        lambda: build_index(
            spark, spark.read.parquet(sk_paths["hot50"]),
            os.path.join(TMP, "skew_idx_hot50"),
        ),
        repeats=2,
        guard=True,
    )
    skew_ratio = round(
        queries["index_build_skewed"] / queries["index_build_uniform"], 3
    )

    # ---- operator suite ----------------------------------------------
    timed("body_index", lambda: indexers.body_index(pages).count())
    timed("title_index", lambda: indexers.title_index(pages).count())
    timed("url_index", lambda: indexers.url_index(pages).count())
    timed("anchor_index", lambda: indexers.anchor_index(pages).count())
    # one corpus pass for all four url-set indexes vs the three
    # individual scans above (body+title+url; imagealt not timed solo)
    timed("field_indexes_single_pass", lambda: indexers.field_indexes(pages).count())
    timed("pagerank", lambda: pagerank.pagerank_pipeline(pages).count(), label=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("dedup_exact", lambda: dedup.exact_dup_groups(docs).count())
    timed("dedup_prefix", lambda: dedup.prefix_dup_groups(docs).count())
    timed("minhash_pairs", lambda: dedup.minhash_candidates(docs).count())
    timed("simhash_buckets", lambda: dedup.simhash_buckets(docs).count())
    timed("simhash_near_dups", lambda: dedup.simhash_near_dups(docs).count())
    timed("ngram_jaccard", lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.5).count(), repeats=2, guard=True)
    timed("dedup_groups", lambda: dedup.near_dup_groups(docs, threshold=0.5).count(), repeats=2, guard=True)
    timed("minhash_groups", lambda: dedup.minhash_dup_groups(docs).count(), repeats=2, label=True)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvecs = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    timed("ann_cosine_topk", lambda: similarity.cosine_topk(emb, qvecs, k=10).count())
    timed(
        "embedding_near_dups_blocked",
        lambda: similarity.cosine_near_dup_pairs(emb, 0.45).count(),
        label=True,
    )
    # approximate ANN: time it AND measure recall vs the exact top-k
    exact_top = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, qvecs, k=10).collect()
    }
    # best-of-5: r3 measured 1.54 s on a code-identical path vs 0.90 s
    # in r2 — almost certainly hypervisor-steal noise (VERDICT r03 #2
    # asks for a deeper best-of to confirm)
    approx_rows = timed(
        "lsh_ann_multiprobe",
        lambda: similarity.lsh_cosine_topk(emb, qvecs, k=10).collect(),
        repeats=5,
        label=True,
    )
    lsh_recall = len({(r.query_id, r.vec_id) for r in approx_rows} & exact_top) / max(
        len(exact_top), 1
    )
    # IVF is a build-once/query-many index (similarity.IVFIndex):
    # time the fit+assignment chain as ivf_build, the probe-join as
    # ivf_ann (r3 timed the whole chain per query — VERDICT r03 #2)
    ivf_holder: dict = {}

    def ivf_build():
        if "idx" in ivf_holder:
            ivf_holder["idx"].unpersist()
        ivf_holder["idx"] = similarity.IVFIndex(emb)

    timed("ivf_build", ivf_build, repeats=2, label=True)
    ivf_rows = timed(
        "ivf_ann",
        lambda: ivf_holder["idx"].topk(qvecs, k=10).collect(),
    )
    ivf_holder["idx"].unpersist()
    ivf_recall = len({(r.query_id, r.vec_id) for r in ivf_rows} & exact_top) / max(
        len(exact_top), 1
    )
    # multimodal: synthesize → decode → pool features (real stdlib
    # decoders incl. y4m video), plus the video frame-sampling stage
    from eaststorm_searchengine_spark.operators import multimodal

    media = multimodal.synthesize_media(spark, SF_DIR)
    media_path = os.path.join(TMP, f"bench_media_{tag}")
    if not os.path.exists(os.path.join(media_path, "_SUCCESS")):
        media.write.mode("overwrite").parquet(media_path)
    media_df = spark.read.parquet(media_path)
    timed("media_features", lambda: multimodal.media_features(media_df).count())
    timed("video_frame_sample", lambda: multimodal.sample_frames(media_df, every_n=2).count())
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed("event_value_stats", lambda: analytics.event_value_stats(events).count())
    timed("tpch_q1", lambda: E.q_tpch_q1(spark, SF_DIR).count())

    # ratios recorded early in the session were computed against a base
    # that may still have been inflated (the running min only ratchets
    # down); recompute every ratio against the FINAL base so the
    # printed ratios are mutually comparable — the absolute seconds are
    # the measured values either way
    canary_ratios = {
        k: round(v / canary_state["base"], 2) for k, v in canary_abs.items()
    }

    # ---- retry-until-clean for the headline entries (VERDICT r07 #3).
    # Every r7 window was noisy and the official record's headline
    # entries carried canary ratios 1.9-2.5.  Re-measure JUST the
    # headline subset in up to 3 spaced-out attempts while its ratio
    # reads > 1.3; a kept value is always the min seconds, labeled with
    # the canary ratio of the attempt that produced it (a steal window
    # only ever inflates, so min is the noise-free capability).
    def _redo_index_build() -> float:
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        build_index_fast(
            spark, pages, idx_dir, id_col="doc_id", text_col="html",
            from_html=True,
        )
        return time.time() - t0

    def _redo_p50() -> tuple[float, float]:
        out, brackets = p50_loop()
        canary_abs["bm25_single_p50_worst"] = round(max(brackets), 3)
        return statistics.median(out), statistics.median(brackets)

    def _redo_p50_1m() -> tuple[float, float]:
        # per-query canary brackets, median label — the SAME policy the
        # main serving loop applies to this entry (a single worst-of-
        # loop bracket would relabel a clean-median measurement dirty,
        # code-review r8: the exact failure mode the main loop fixed)
        out, brackets = [], []
        c_before = canary()
        for qid, q in E.QUERY_SET:
            per = []
            for _ in range(2):
                t0 = time.time()
                sidx.search([(qid, q)], k=10, final_rank="driver").collect()
                per.append(time.time() - t0)
            out.append(min(per))
            c_now = canary()
            brackets.append(max(c_before, c_now))
            c_before = c_now
        canary_abs["bm25_single_p50_1m_worst"] = round(max(brackets), 3)
        return statistics.median(out), statistics.median(brackets)

    # (entry key, re-measure fn → seconds or (seconds, abs label))
    headline_redo = [
        ("index_build_html", _redo_index_build),
        ("bm25_single_p50", _redo_p50),
        ("bm25_single_p50_1m", _redo_p50_1m),
    ]
    CLEAN_RATIO = 1.3
    for _attempt in range(3):
        dirty = [
            (entry, fn) for entry, fn in headline_redo
            if canary_ratios.get(entry, 0.0) > CLEAN_RATIO
        ]
        if not dirty:
            break
        time.sleep(45.0)  # spaced out — let the steal burst pass
        for entry, fn in dirty:
            pre = canary()
            val = fn()
            val, label_abs = val if isinstance(val, tuple) else (val, None)
            post = max(pre, canary())
            if label_abs is None:
                label_abs = post
            ratio = round(label_abs / canary_state["base"], 2)
            if val < queries[entry]:
                # the ratio labels the attempt whose value is kept
                queries[entry] = round(val, 4)
                canary_abs[entry] = round(label_abs, 3)
                canary_ratios[entry] = ratio
            elif ratio <= CLEAN_RATIO and val <= queries[entry] * 1.10:
                # ADVICE r8: a CLEAN redo within noise of the kept min
                # CONFIRMS the dirty-window value — relabel with the
                # clean attempt's ratio (keeping the min seconds) so
                # the loop stops burning attempts re-measuring it
                canary_abs[entry] = round(label_abs, 3)
                canary_ratios[entry] = ratio
    # final consistency pass: every ratio (including the _worst
    # companions the redo may have refreshed) against the final base
    canary_ratios = {
        k: round(v / canary_state["base"], 2) for k, v in canary_abs.items()
    }
    # VERDICT r08 #4: the headline entries' labels, self-evidently
    # clean or self-evidently labeled — each states its rule and
    # carries BOTH the rule's ratio and the worst bracket observed.
    headline_canary = {
        "index_build_html": {
            "rule": "worst-bracket",
            "ratio": canary_ratios.get("index_build_html"),
        },
        "bm25_single_p50": {
            "rule": "median-of-per-query-brackets",
            "ratio": canary_ratios.get("bm25_single_p50"),
            "worst": canary_ratios.get("bm25_single_p50_worst"),
        },
        "bm25_single_p50_1m": {
            "rule": "median-of-per-query-brackets",
            "ratio": canary_ratios.get("bm25_single_p50_1m"),
            "worst": canary_ratios.get("bm25_single_p50_1m_worst"),
        },
    }
    docs_per_sec = n_docs / queries["index_build_html"]
    query_p50 = queries["bm25_single_p50"]
    total = round(sum(queries.values()), 4)
    full = {
        "metric": "e2e_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "cores": CPUS,
        "n_docs": n_docs,
        "index_docs_per_sec": round(docs_per_sec, 2),
        "query_p50_sec": round(query_p50, 4),
        "serving_1m_scan_bucket_pruned": serving_pruned,
        "serving_single_query_stages": serving_stage_profile,
        "serving_1m_per_query": lat_1m,
        "serving_1m_spread_max_over_min": serving_1m_spread,
        "serving_1m_spread_matching_queries": serving_1m_spread_matching,
        "serving_chunk_bits_auto": serving_chunk_bits,
        "zipf_wand_blocks_decoded_fraction": wand_decode_fraction,
        "zipf_wand_blocks_decoded_fraction_mixed": wand_decode_fraction_mixed,
        "zipf_auto_decisions_anchored": zipf_decisions_anchored,
        "zipf_auto_decisions_mixed": zipf_decisions_mixed,
        "zipf_maxscore_blocks_decoded": maxscore_decode,
        "skew_flood_build_ratio": skew_ratio,
        "autocompact_serving_ratio": autocompact_serving_ratio,
        "serving_1m_batch12_per_query_sec": round(
            queries["bm25_batch12_auto_1m"] / len(E.QUERY_SET), 4
        ),
        "steal_canary_ratios": canary_ratios,
        "steal_canary_sec": canary_abs,
        "headline_canary": headline_canary,
        "steal_canary_base_sec": round(canary_state["base"], 3),
        "lsh_ann_recall_at_10": round(lsh_recall, 4),
        "ivf_ann_recall_at_10": round(ivf_recall, 4),
    }
    # the COMPLETE record, committed per round (VERDICT r06 #1: the r6
    # printed line outgrew the driver's 2000-char stdout-tail window
    # and the official BENCH_r06.json landed front-truncated with
    # parsed=null — per-entry tables/dicts live here, machine-readable)
    with open(os.path.join(HERE, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # the printed line keeps every per-entry timing plus the headline
    # scalars, compact-encoded; if it still exceeds the tail window,
    # entries whose information is carried by a scalar (skew ratio,
    # field-index family) are dropped from the LINE only, least
    # headline first — BENCH_LOCAL.json always has all of them
    worst_entry = max(canary_ratios, key=canary_ratios.get) if canary_ratios else ""
    line = {
        "metric": "e2e_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "cores": CPUS,
        "n_docs": n_docs,
        "index_docs_per_sec": round(docs_per_sec, 2),
        "query_p50_sec": round(query_p50, 4),
        "serving_1m_spread_matching_queries": serving_1m_spread_matching,
        "serving_1m_batch12_per_query_sec": round(
            queries["bm25_batch12_auto_1m"] / len(E.QUERY_SET), 4
        ),
        "serving_chunk_bits_auto": serving_chunk_bits,
        "zipf_wand_blocks_decoded_fraction": wand_decode_fraction,
        "skew_flood_build_ratio": skew_ratio,
        "autocompact_serving_ratio": autocompact_serving_ratio,
        "lsh_ann_recall_at_10": round(lsh_recall, 4),
        "ivf_ann_recall_at_10": round(ivf_recall, 4),
        "canary_worst": {
            "entry": worst_entry,
            "ratio": canary_ratios.get(worst_entry, 0.0),
        },
        # per-headline label ratio by its stated rule (full rule text +
        # worst companions in BENCH_LOCAL.json headline_canary)
        "headline_canary": {
            k: v.get("ratio") for k, v in headline_canary.items()
        },
        "full_record": "BENCH_LOCAL.json",
    }
    drop_order = [
        "index_build_uniform", "index_build_skewed",  # → skew ratio scalar
        "body_index", "title_index", "url_index",     # → field_indexes entry
        "event_value_stats", "video_frame_sample", "media_features",
        "simhash_buckets", "minhash_pairs",
        "zipf_mixed_bm25_exhaustive", "zipf_bm25_exhaustive",
        "ann_cosine_topk", "anchor_index",
    ]
    s = json.dumps(line, separators=(",", ":"))
    dropped = 0
    while len(s) > 1900 and drop_order:
        line["queries"].pop(drop_order.pop(0), None)
        dropped += 1
        line["queries_in_full_record_only"] = dropped
        s = json.dumps(line, separators=(",", ":"))
    print(s)
    spark.stop()


if __name__ == "__main__":
    main()
