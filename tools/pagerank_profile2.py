import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from eaststorm_searchengine_spark.session import get_spark
from eaststorm_searchengine_spark.operators import pagerank

spark = get_spark("pagerank-prof2", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet("/root/repo/_tmp/bench_pages_sf0.1_x10")
import pandas as _pd
spark.range(1000).select(F.sum("id")).collect()
spark.createDataFrame([(i,) for i in range(128)], "v int").repartition(32).mapInPandas(
    lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int").count()

t0 = time.time()
g = pagerank.build_host_graph(pages)
# time up to checkpoint inside pagerank(): replicate its first steps
t1 = time.time()
gc = g.localCheckpoint()
n = gc.count()
t2 = time.time()
r = pagerank.pagerank(gc)
t3 = time.time()
rep = pagerank.final_report(r)
cnt = rep.count()
t4 = time.time()
print(f"build_lazy={t1-t0:.3f} checkpoint+count={t2-t1:.3f} iterate={t3-t2:.3f} report={t4-t3:.3f} hosts={n} rows={cnt}")
# second run, warm
t0 = time.time()
cnt2 = pagerank.pagerank_pipeline(pages).count()
print(f"warm_full={time.time()-t0:.3f}")
spark.stop()
