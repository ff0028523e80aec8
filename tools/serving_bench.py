"""Standalone serving-scale query bench (1M-page index). Mirrors the
bench.py section so it can be run/iterated independently."""
import os, statistics, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
import __spark_entry__ as E
from eaststorm_searchengine_spark import corpus as corpus_mod
from eaststorm_searchengine_spark.operators.bm25 import BM25Index
from eaststorm_searchengine_spark.operators.index_build import build_index
from eaststorm_searchengine_spark.plans import inspect as plan_inspect
from eaststorm_searchengine_spark.session import get_spark

spark = get_spark("serving-bench", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_tmp")
spages_path = os.path.join(TMP, "scaling_pages_sf0.1_x200")
sidx_dir = os.path.join(TMP, "serving_idx_sf0.1_x200_cb15")
if not os.path.exists(os.path.join(sidx_dir, "stats.json")):
    t0 = time.time()
    build_index(spark, spark.read.parquet(spages_path), sidx_dir,
                id_col="doc_id", text_col="html", from_html=True, chunk_bits=15)
    print(f"build_1m_sec={time.time()-t0:.1f}")
sidx = BM25Index(spark, sidx_dir)
import pandas as _pd
spark.range(1000).select(F.sum("id")).collect()
best = None
for _ in range(3):
    t0 = time.time()
    sidx.search(E.QUERY_SET, k=10, method="wand").collect()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"bm25_batch12_wand_1m={best:.3f}")
lat = []
for qid, q in E.QUERY_SET:
    per = []
    for _ in range(2):
        t0 = time.time()
        sidx.search([(qid, q)], k=10, final_rank="driver").collect()
        per.append(time.time() - t0)
    lat.append(min(per))
print(f"bm25_single_p50_1m={statistics.median(lat):.3f} min={min(lat):.3f} max={max(lat):.3f}")
plan = sidx.search(E.QUERY_SET[:1], k=10)
print("bucket_pruned=", "bucket" in plan_inspect.partition_filters(plan))
spark.stop()
