"""Per-stage REST-API profile of a batch BM25 search — the diagnostic
that cracked the r9 query-side-scaling gap.

Runs a warm batch search at a given core count with the Spark UI
enabled, then dumps each completed stage's executor metrics from the
local REST endpoint (`/api/v1/applications/<app>/stages`):
``executorRunTime`` (thread-seconds, includes python-worker wait),
``executorCpuTime`` (JVM CPU only), GC time, shuffle/input bytes.

Reading it: compare the SAME stage's ``runTime_s`` across two core
counts — if total thread-seconds are flat, the stage scales and any
wall-clock gap is wave quantization (a stage has exactly
``n_chunks`` scoring tasks; tasks/cores < ~4 means the last wave
idles) or inter-stage overhead.  r9 measurement over a 768-query
batch on the 1M cb15 index (31 chunks): scoring-stage runTime 98.4
core-s @ 2 cores vs 103.3 @ 8 (+5 % — the stage scales at ~0.95)
while the end-to-end ratio read 0.758; the 61-chunk 2M index lifted
the committed artifact to 0.842 (scaling_serving_results.json).

Usage: python tools/stage_profile.py [cores] [index_dir] [batch_reps]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from eaststorm_searchengine_spark.operators.bm25 import BM25Index
from eaststorm_searchengine_spark.session import get_spark

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
index_dir = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(HERE, "_tmp", "serving_idx_sf0.1_x200_auto")
)
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

spark = get_spark(
    f"stage-profile-{cores}", cores=cores, shuffle_partitions=32,
    extra_conf={"spark.sql.adaptive.enabled": "false",
                "spark.ui.enabled": "true"},
)
spark.sparkContext.setLogLevel("ERROR")

# the canonical 12-query set, imported from the driver contract so the
# profiler can never drift from the workload the bench and the serving
# scaling child measure (ADVICE r09)
from __spark_entry__ import QUERY_SET

BASE = [q for _, q in QUERY_SET]
batch = [(i, BASE[i % len(BASE)]) for i in range(len(BASE) * reps)]

idx = BM25Index(spark, index_dir)
idx.search(batch[:12], k=10).collect()  # warm (its stages are listed too)
t0 = time.time()
idx.search(batch, k=10).collect()
wall = time.time() - t0

ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = json.load(
    urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
)
print(json.dumps({"wall_s": round(wall, 2), "cores": cores,
                  "queries": len(batch), "index": index_dir}))
for s in sorted(stages, key=lambda s: -s["executorRunTime"])[:8]:
    print(json.dumps({
        "stage": s["stageId"],
        "name": s["name"][:48],
        "tasks": s["numCompleteTasks"],
        "runTime_s": round(s["executorRunTime"] / 1000, 2),
        "cpuTime_s": round(s["executorCpuTime"] / 1e9, 2),
        "gc_s": round(s["jvmGcTime"] / 1000, 2),
        "shuffleRead_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
    }))
spark.stop()
