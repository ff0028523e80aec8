import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from eaststorm_searchengine_spark.session import get_spark
from eaststorm_searchengine_spark.operators import pagerank

spark = get_spark("pagerank-bench3", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet("/root/repo/_tmp/bench_pages_sf0.1_x10")
import pandas as _pd
spark.range(1000).select(F.sum("id")).collect()
spark.createDataFrame([(i,) for i in range(128)], "v int").repartition(32).mapInPandas(
    lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int").count()
best = None
for i in range(3):
    t0 = time.time()
    pagerank.pagerank_pipeline(pages).count()
    dt = time.time() - t0
    print(f"run{i}={dt:.3f}")
    best = dt if best is None else min(best, dt)
print(f"BEST={best:.3f}")
spark.stop()
