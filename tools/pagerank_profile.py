import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from eaststorm_searchengine_spark.session import get_spark
from eaststorm_searchengine_spark.operators import pagerank
from eaststorm_searchengine_spark.functions.udfs import host_udf, pagerank_links_udf, link_hosts_udf

spark = get_spark("pagerank-prof", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet("/root/repo/_tmp/bench_pages_sf0.1_x10")
import pandas as _pd
spark.range(1000).select(F.sum("id")).collect()
spark.createDataFrame([(i,) for i in range(128)], "v int").repartition(32).mapInPandas(
    lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int").count()

# stage A: link extraction only
t0 = time.time()
per_page = pages.select(host_udf("url").alias("host"),
                        pagerank_links_udf("html", "url").alias("links")).filter(F.col("host").isNotNull())
n1 = per_page.select(F.sum(F.size("links"))).collect()
tA = time.time() - t0
print(f"A_links_extract={tA:.3f} total_links={n1[0][0]}")

# stage B: full graph build (extract + link_hosts + groupBy)
t0 = time.time()
g = pagerank.build_host_graph(pages)
g.localCheckpoint().count()
tB = time.time() - t0
print(f"B_graph_build={tB:.3f}")

# stage C: iterations from a prebuilt graph
g2 = pagerank.build_host_graph(pages).localCheckpoint()
g2.count()
t0 = time.time()
r = pagerank.pagerank(g2)
r.count()
tC = time.time() - t0
print(f"C_iterations={tC:.3f}")
spark.stop()
