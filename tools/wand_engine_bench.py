"""Engine-path WAND vs exhaustive on a Zipf-vocabulary corpus
(VERDICT r04 #5): both executors run through the real segment store
(BM25Index.search), results asserted identical, wall time + blocks
decoded (Spark accumulators fed from the applyInPandas workers)
reported as one JSON line for BASELINE.md."""
import json, os, shutil, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eaststorm_searchengine_spark import corpus as corpus_mod
from eaststorm_searchengine_spark.operators.bm25 import BM25Index
from eaststorm_searchengine_spark.operators.index_build import build_index
from eaststorm_searchengine_spark.session import get_spark

N_DOCS = int(os.environ.get("ZIPF_DOCS", "200000"))
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_tmp")

# shared with bench.py via corpus.py (code-review r05: the two copies
# had drifted); queries 1-10 anchored, 11-12 dense controls
QUERIES = corpus_mod.zipf_queries(
    corpus_mod.ZIPF_ANCHORED_RANKS + corpus_mod.ZIPF_DENSE_RANKS)


def main() -> None:
    spark = get_spark("wand-engine-bench", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = os.path.join(TMP, f"zipf_docs_{N_DOCS}")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        corpus_mod.synthesize_zipf_docs(spark, N_DOCS).write.mode("overwrite").parquet(docs_path)
    idx_dir = os.path.join(TMP, f"zipf_idx_{N_DOCS}_cb14")
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        build_index(spark, spark.read.parquet(docs_path), idx_dir, chunk_bits=14)
    idx = BM25Index(spark, idx_dir)

    from pyspark.sql import functions as F
    import pandas as _pd
    spark.range(1000).select(F.sum("id")).collect()
    spark.createDataFrame([(i,) for i in range(128)], "v int").repartition(32).mapInPandas(
        lambda bs: (_pd.DataFrame({"v": [len(b)]}) for b in bs), "v int").count()

    out = {"n_docs": N_DOCS, "queries": len(QUERIES)}
    anchored = QUERIES[:10]  # queries 11-12 are the dense-only controls
    sets = {"all12": QUERIES, "anchored10": anchored}
    results = {}
    for sname, qset in sets.items():
        for method in ("exhaustive", "wand", "auto"):
            acc = (spark.sparkContext.accumulator(0), spark.sparkContext.accumulator(0))
            best = None
            rows = None
            for _ in range(3):
                a = (spark.sparkContext.accumulator(0), spark.sparkContext.accumulator(0))
                t0 = time.time()
                rows = idx.search(qset, k=10, method=method, decode_acc=a).collect()
                dt = time.time() - t0
                if best is None or dt < best:
                    best, acc = dt, a
            results[(sname, method)] = rows
            out[f"{sname}_{method}_sec"] = round(best, 4)
            out[f"{sname}_{method}_blocks_decoded"] = acc[0].value
            out[f"{sname}_{method}_blocks_total"] = acc[1].value
    for sname in sets:
        ref = {(r.query_id, r.rank, r.doc_id) for r in results[(sname, "exhaustive")]}
        for method in ("wand", "auto"):
            got = {(r.query_id, r.rank, r.doc_id) for r in results[(sname, method)]}
            assert got == ref, f"{sname}/{method}: {len(got ^ ref)} rows differ"
    out["results_identical"] = True
    out["anchored10_wand_decode_fraction"] = round(
        out["anchored10_wand_blocks_decoded"] / max(out["anchored10_wand_blocks_total"], 1), 4)
    out["anchored10_wand_speedup"] = round(
        out["anchored10_exhaustive_sec"] / out["anchored10_wand_sec"], 3)
    out["all12_auto_speedup_vs_exhaustive"] = round(
        out["all12_exhaustive_sec"] / out["all12_auto_sec"], 3)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
