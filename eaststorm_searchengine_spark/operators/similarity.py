"""Similarity search over embedding columns (``array<float>``).

Beyond-reference capability (build brief): brute-force cosine top-k as
the exact baseline, and an LSH-bucketed approximate variant as the
scale path (random-hyperplane LSH per Charikar 2002).

Scale notes: brute force is a broadcast join of the (tiny) query-vector
set against the corpus — embarrassingly parallel, no shuffle except the
final top-k.  The LSH variant buckets the corpus once (a narrow
groupBy key) so each query probes only its bucket — the 10^12-row
path.  Dot products run in whole-stage codegen via ``aggregate`` /
``zip_with`` — no Python in the hot loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _cosine(vec_col, qcol):
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(vec_col, qcol, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(qcol, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (norm_a * norm_b)


def cosine_topk(
    embeddings: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k → (query_id, rank, vec_id, cosine).
    Tie-break: cosine desc, vec_id asc."""
    spark = embeddings.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            [(qid, [float(x) for x in v]) for qid, v in query_vectors],
            "query_id int, qvec array<double>",
        )
    )
    scored = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        )
        .crossJoin(qdf)
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("vec"), F.col("qvec")), score_round).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Random-hyperplane signature as an int column (JVM-side: one
    sign-bit per plane via aggregate dot products)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
) -> DataFrame:
    """Approximate cosine top-k: corpus bucketed by hyperplane
    signature; each query scans only its bucket.  Recall < 1 by design;
    the exact variant is the oracle."""
    spark = embeddings.sparkSession
    dim = len(query_vectors[0][1])
    planes = _hyperplanes(dim, n_planes)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    ).withColumn("bucket", lsh_bucket_col(F.col("vec"), planes))

    qrows = []
    for qid, v in query_vectors:
        arr = np.asarray(v, dtype=np.float64)
        sig = 0
        for i, p in enumerate(planes):
            if float(arr @ p) > 0:
                sig |= 1 << i
        qrows.append((qid, [float(x) for x in v], sig))
    qdf = F.broadcast(
        spark.createDataFrame(qrows, "query_id int, qvec array<double>, bucket long")
    )
    scored = corpus.join(qdf, "bucket").select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("vec"), F.col("qvec")), score_round).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cosine ≥ threshold).  Exact all-pairs is the correctness baseline
    (oracle-checkable); the LSH-bucketed variants are the 10^12-row
    path (bucket first, verify within buckets)."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(_cosine(F.col("va"), F.col("vb")), score_round))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )
