"""compact_index read-amplification bench (VERDICT r04 #4): a 50-
fragment streaming-shaped store vs its compacted form, same queries."""
import json, os, shutil, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from eaststorm_searchengine_spark.operators.bm25 import BM25Index
from eaststorm_searchengine_spark.operators import index_build as ib
from eaststorm_searchengine_spark.streaming import incremental
from eaststorm_searchengine_spark.session import get_spark

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_tmp")
N_BATCHES = 50


def main() -> None:
    spark = get_spark("compact-bench", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(os.path.join(TMP, "bench_pages_sf0.1_x10"))
    n = pages.count()
    per = (n + N_BATCHES - 1) // N_BATCHES

    frag_dir = os.path.join(TMP, "bench_frag_idx")
    if not os.path.exists(os.path.join(frag_dir, "stats.json")):
        shutil.rmtree(frag_dir, ignore_errors=True)
        for b in range(N_BATCHES):
            batch = pages.filter(
                (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
            )
            incremental._append_batch(batch, b, frag_dir, "doc_id", "html", True,
                                      ib.DEFAULT_BUCKETS)
        incremental.refresh_metadata(spark, frag_dir)

    import pandas as _pd
    spark.range(1000).select(F.sum("id")).collect()
    spark.createDataFrame([(i,) for i in range(128)], "v int").repartition(32).mapInPandas(
        lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int").count()

    out = {"n_docs": n, "n_fragment_sets": N_BATCHES}

    def best3(fn):
        best = None
        for _ in range(3):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    fidx = BM25Index(spark, frag_dir)
    out["bm25_batch12_fragmented_sec"] = best3(
        lambda: fidx.search(E.QUERY_SET, k=10).collect())
    frag_files = sum(len(files) for _, _, files in os.walk(os.path.join(frag_dir, "segments")))
    out["fragmented_segment_files"] = frag_files

    comp_dir = os.path.join(TMP, "bench_compacted_idx")
    shutil.rmtree(comp_dir, ignore_errors=True)
    t0 = time.time()
    ib.compact_index(spark, [frag_dir], comp_dir)
    out["compact_sec"] = round(time.time() - t0, 4)
    cidx = BM25Index(spark, comp_dir)
    out["bm25_batch12_compacted_sec"] = best3(
        lambda: cidx.search(E.QUERY_SET, k=10).collect())
    comp_files = sum(len(files) for _, _, files in os.walk(os.path.join(comp_dir, "segments")))
    out["compacted_segment_files"] = comp_files
    a = {(r.query_id, r.rank, r.doc_id) for r in fidx.search(E.QUERY_SET, k=10).collect()}
    b = {(r.query_id, r.rank, r.doc_id) for r in cidx.search(E.QUERY_SET, k=10).collect()}
    out["results_identical"] = a == b
    out["read_amplification_speedup"] = round(
        out["bm25_batch12_fragmented_sec"] / out["bm25_batch12_compacted_sec"], 3)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
