"""spark-submit entry point: batch BM25 top-k over a built index.

    spark-submit --py-files engine.zip jobs/search_job.py \
        --index /indexes/run1 --k 10 [--method wand] \
        --queries "hash join" "data pipeline" ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--method", choices=["exhaustive", "wand"], default="exhaustive")
    p.add_argument("--queries", nargs="+", required=True)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from eaststorm_searchengine_spark.operators.bm25 import BM25Index

    spark = SparkSession.builder.appName("eaststorm-search").getOrCreate()
    idx = BM25Index(spark, args.index)
    qs = list(enumerate(args.queries, 1))
    for row in idx.search(qs, k=args.k, method=args.method, score_round=4).collect():
        print(f"q{row['query_id']}\t#{row['rank']}\tdoc={row['doc_id']}\tscore={row['score']}")
    spark.stop()


if __name__ == "__main__":
    main()
