"""A/B the span-aware dense routing on REAL indexes: the 200k zipf
corpus at cb14 (bench shape, short runs) and cb17 (long-run production
shape).  For each, run the dense-control and mixed query sets through
exhaustive / maxscore / auto (interleaved best-of-3), record decision
counters, and assert result equality.  VERDICT r07 #4 done-criteria."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from eaststorm_searchengine_spark import corpus as corpus_mod
from eaststorm_searchengine_spark.operators.bm25 import BM25Index, DECISION_REASONS
from eaststorm_searchengine_spark.operators.index_build import build_index
from eaststorm_searchengine_spark.session import get_spark

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_tmp")
spark = get_spark("dense-ab", cores=int(os.environ.get("CPUS", "8")), shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).select(F.sum("id")).collect()

zdocs_path = os.path.join(TMP, "zipf_docs_200000")
assert os.path.exists(os.path.join(zdocs_path, "_SUCCESS"))

for cb in (14, 17):
    zidx_dir = os.path.join(TMP, f"zipf_idx_200000_cb{cb}")
    if not os.path.exists(os.path.join(zidx_dir, "stats.json")):
        build_index(spark, spark.read.parquet(zdocs_path), zidx_dir, chunk_bits=cb)
    zidx = BM25Index(spark, zidx_dir)
    for set_name, ranks in (
        ("dense", corpus_mod.ZIPF_DENSE_RANKS),
        ("mixed", corpus_mod.ZIPF_ANCHORED_RANKS + corpus_mod.ZIPF_DENSE_RANKS),
    ):
        qset = corpus_mod.zipf_queries(ranks)
        best, rows, decisions = {}, {}, {}
        for _ in range(3):
            for m in ("exhaustive", "maxscore", "auto"):
                d = (
                    {r: spark.sparkContext.accumulator(0) for r in DECISION_REASONS}
                    if m == "auto" else None
                )
                t0 = time.time()
                out = zidx.search(qset, k=10, method=m, decision_acc=d).collect()
                dt = time.time() - t0
                best[m] = min(best.get(m, dt), dt)
                rows[m] = {(r.query_id, r.rank, r.doc_id) for r in out}
                if d is not None:
                    decisions = {r: a.value for r, a in d.items() if a.value}
        assert rows["exhaustive"] == rows["maxscore"] == rows["auto"], (
            f"divergence cb{cb} {set_name}"
        )
        print(
            f"cb{cb} {set_name:>5}: exh {best['exhaustive']:.3f}s  "
            f"max {best['maxscore']:.3f}s  auto {best['auto']:.3f}s  "
            f"decisions {decisions}"
        )
spark.stop()
