"""One fresh-JVM pagerank timing at bench scale (VERDICT r04 #1)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from eaststorm_searchengine_spark.session import get_spark
from eaststorm_searchengine_spark.operators import pagerank

spark = get_spark("pagerank-bench", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet("/root/repo/_tmp/bench_pages_sf0.1_x10")
# warm-up: JVM + python workers
import pandas as _pd
spark.range(1000).select(F.sum("id")).collect()
spark.createDataFrame([(i,) for i in range(128)], "v int").repartition(32).mapInPandas(
    lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int").count()
t0 = time.time()
n = pagerank.pagerank_pipeline(pages).count()
dt = time.time() - t0
print(f"PAGERANK_SEC={dt:.3f} rows={n}")
spark.stop()
