"""Serving-floor profile at the 1M index: per-stage task counts and
times for single-query searches (final_rank='driver') via the status
tracker, plus A/B of scan-coalesce variants.  Decides VERDICT r07 #5
(coalesce the scan or commit the profile showing local[k] scheduling
is irreducible)."""
import json, os, statistics, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

import __spark_entry__ as E
from eaststorm_searchengine_spark.operators.bm25 import BM25Index
from eaststorm_searchengine_spark.session import get_spark

spark = get_spark("serving-profile", cores=int(os.environ.get("CPUS", "8")), shuffle_partitions=32)
sc = spark.sparkContext
sc.setLogLevel("ERROR")
spark.range(1000).select(F.sum("id")).collect()

sidx_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_tmp", "serving_idx_sf0.1_x200_auto")
idx = BM25Index(spark, sidx_dir)
idx.search(E.QUERY_SET[:2], k=10).collect()  # warm

st = sc.statusTracker()


def profile_one(qid, q):
    before = set(st.getJobIdsForGroup(None) or [])
    t0 = time.time()
    idx.search([(qid, q)], k=10, final_rank="driver").collect()
    dt = time.time() - t0
    time.sleep(0.2)
    jobs = [j for j in (st.getJobIdsForGroup(None) or []) if j not in before]
    stage_info = []
    for j in sorted(jobs):
        ji = st.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None:
                stage_info.append((j, sid, si.numTasks, si.name.split("(")[0].strip()))
    return dt, stage_info


print("== per-query profile (driver merge) ==")
for qid, q in E.QUERY_SET[:5]:
    dt, stages = profile_one(qid, q)
    print(f"{q!r:30} {dt:.3f}s  jobs={len({s[0] for s in stages})} "
          + "  ".join(f"[j{j} s{sid} {nt}t {nm}]" for j, sid, nt, nm in stages))

# latency distribution for the full set, 3 reps
lats = []
for qid, q in E.QUERY_SET:
    per = []
    for _ in range(3):
        t0 = time.time()
        idx.search([(qid, q)], k=10, final_rank="driver").collect()
        per.append(time.time() - t0)
    lats.append(min(per))
print("p50", round(statistics.median(lats), 4), "min", round(min(lats), 4),
      "max", round(max(lats), 4))
spark.stop()
