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
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _spread(df: DataFrame, min_bytes: int | None = None) -> DataFrame:
    """Spread a narrow input across the cores before a per-row scoring
    pass (r10, guide §2.6): a small embeddings parquet arrives as ONE
    scan partition, which serialized the whole cosine/assignment work
    onto a single core.  Callers project to the needed columns first;
    inputs with real scan parallelism are untouched, and inputs below
    ``min_bytes`` (plan-statistics estimate; env
    ``EASTSTORM_SPREAD_MIN_BYTES``, default 2 MB) keep their
    single-partition plan — the repartition's fixed cost exceeds the
    single-core work it saves at a few thousand rows (measured)."""
    import os

    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    if min_bytes is None:
        min_bytes = int(os.environ.get("EASTSTORM_SPREAD_MIN_BYTES", str(2 << 20)))
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = min_bytes  # unknown → assume large (spread)
    if size < min_bytes:
        return df
    return df.repartition(par * 2)


def _cosine(vec_col, qcol):
    """Cosine similarity of two array<double> columns, JVM-side.
    Zero-norm vectors yield NULL (they have no direction) rather than
    tripping Spark 4's ANSI DIVIDE_BY_ZERO — which fires even for
    doubles; NULL cosines drop out of every filter/rank downstream."""
    dot = F.aggregate(
        F.zip_with(vec_col, qcol, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(qcol, F.lit(0.0), lambda acc, v: acc + v * v))
    den = norm_a * norm_b
    return dot / F.when(den != 0.0, den)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared ANN rank tail: (query_id, vec_id, cosine) → global top-k
    per query, TakeOrdered-shaped.  Every partition first keeps its
    LOCAL per-query top-k (mapInPandas, no shuffle — any global top-k
    row is necessarily in its partition's top-k under the same total
    order), so the global rank window sees ≤ k × n_partitions rows per
    query instead of the full scored set; the per-query single-reducer
    sort stops scaling with the corpus.  Tie-break everywhere: cosine
    desc, vec_id asc.

    NaN cosines (a NaN component in some input vector) are EXCLUDED
    like the zero-norm NULLs: an undefined similarity should not
    outrank every defined one (Spark's raw window would put NaN at
    rank 1), and a NaN score cannot round-trip the prune's Arrow
    boundary anyway (code-review r04b)."""
    from ..functions.topk import local_group_topk

    scored = scored.filter(
        F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine"))
    )
    pruned = local_group_topk(scored, "query_id", ["cosine", "vec_id"], [False, True], k)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k → (query_id, rank, vec_id, cosine).
    Tie-break: cosine desc, vec_id asc.

    r10: the per-row JVM ``aggregate(zip_with)`` fold over the
    crossJoin (44 µs/cosine — scalar codegen over array cells) is
    replaced by one BLAS matmul per Arrow batch against the broadcast
    query matrix (guide §4.2); non-finite cosines (zero-norm or NaN
    inputs) are dropped inside the scorer — exactly the rows
    ``_rank_topk``'s NULL/NaN filter removed before."""
    Q = np.asarray([v for _, v in query_vectors], dtype=np.float64)
    qids = np.asarray([qid for qid, _ in query_vectors], dtype=np.int64)
    src = _spread(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    )

    def score(batches):
        qn = np.linalg.norm(Q, axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            vn = np.linalg.norm(M, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (M @ Q.T) / np.outer(vn, qn)
            ids = pdf["vec_id"].to_numpy()
            r, c = np.nonzero(np.isfinite(cos))
            yield pd.DataFrame(
                {
                    "query_id": qids[c].astype(np.int32),
                    "vec_id": ids[r],
                    "cosine": cos[r, c],
                }
            )

    scored = src.mapInPandas(score, "query_id int, vec_id long, cosine double")
    scored = scored.withColumn("cosine", F.round("cosine", score_round))
    return _rank_topk(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _multi_sig_col(vec_col, all_planes: list[np.ndarray]):
    """All hyperplane-table signatures of a vector in ONE Arrow-batched
    matmul: stack every table's planes into a (T·b, dim) matrix, one
    BLAS product per batch, pack sign bits per table.  Returns
    array<long> of length n_tables.  (Replaces a T·b-deep JVM
    fold-expression tree — vectorized Python beats scalar codegen
    here.)"""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    n_tables = len(all_planes)
    n_planes = all_planes[0].shape[0]
    stacked = np.vstack(all_planes)  # (T*b, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=object)
        M = np.vstack(vecs.to_numpy())  # (n, dim)
        bits = (M @ stacked.T) > 0  # (n, T*b)
        packed = (bits.reshape(len(M), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series([r.tolist() for r in packed.astype(np.int64)])

    return sigs(vec_col)


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
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
    probe_hamming: int = 1,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent hyperplane
    signatures per corpus vector (OR-amplification); each query probes,
    per table, its own bucket plus every bucket within Hamming distance
    ``probe_hamming`` (multi-probe LSH, Lv et al. VLDB'07).  Candidates
    are deduped before exact rescoring, so precision is exact and only
    recall is approximate — it rises with tables × probes while every
    groupBy/join key stays a bounded (table, signature) bucket.  The
    exact variant is the oracle (recall measured at sf0.1 in
    BASELINE.md)."""
    spark = embeddings.sparkSession
    dim = len(query_vectors[0][1])
    all_planes = [_hyperplanes(dim, n_planes, seed=seed + t) for t in range(n_tables)]
    corpus = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        )
        .withColumn("sigs", _multi_sig_col(F.col("vec"), all_planes))
        .select("vec_id", "vec", F.posexplode("sigs").alias("table", "bucket"))
    )

    qrows = []
    for qid, v in query_vectors:
        arr = np.asarray(v, dtype=np.float64)
        for t, planes in enumerate(all_planes):
            sig = 0
            for i, p in enumerate(planes):
                if float(arr @ p) > 0:
                    sig |= 1 << i
            probes = {sig}
            if probe_hamming >= 1:
                probes |= {sig ^ (1 << i) for i in range(n_planes)}
            if probe_hamming >= 2:
                probes |= {
                    sig ^ (1 << i) ^ (1 << j)
                    for i in range(n_planes)
                    for j in range(i + 1, n_planes)
                }
            for pb in sorted(probes):
                qrows.append((qid, [float(x) for x in v], t, pb))
    qdf = F.broadcast(
        spark.createDataFrame(qrows, "query_id int, qvec array<double>, table int, bucket long")
    )
    scored = (
        corpus.join(qdf, ["table", "bucket"])
        .dropDuplicates(["query_id", "vec_id"])
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("vec"), F.col("qvec")), score_round).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cosine ≥ threshold) via blocked matrix multiplication.

    Exact all-pairs similarity at a *low* threshold (0.45 ≈ 63° — far
    wider than any LSH family can prune with high recall) is inherently
    O(N²) compute; the scalable shape is to distribute that compute
    evenly: assign each vector to one of ``n_blocks`` blocks, replicate
    each vector to its block-pair row groups (explode — no join), and
    evaluate each (bi, bj) tile as one BLAS matmul inside
    ``applyInPandas``.  Shuffle volume is (n_blocks+2)·|data|, tiles are
    uniform by construction (id-modulo blocking), and the plan contains
    no CartesianProduct / BroadcastNestedLoopJoin (plan-asserted in
    tests).  For genuinely near-duplicate thresholds (≥ ~0.8) use
    :func:`lsh_near_dup_pairs`, which prunes candidates first.
    """
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    a_side = base.select(
        "vec_id", "vec",
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("bj"),
        F.lit(0).alias("side"),
    )
    b_side = base.select(
        "vec_id", "vec",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit(1).alias("side"),
    )
    tagged = a_side.unionByName(b_side)
    # emit slightly below threshold so the final (JVM-side) round+filter
    # reproduces the reference round-then-compare semantics exactly
    raw_cut = threshold - 1e-6

    def tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[0]), int(key[1])
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        cols = ["vec_a", "vec_b", "cosine"]
        if A.empty or B.empty:
            return pd.DataFrame(columns=cols)
        MA = np.vstack(A["vec"].to_numpy())
        MB = np.vstack(B["vec"].to_numpy())
        na = np.linalg.norm(MA, axis=1)
        nb = np.linalg.norm(MB, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (MA @ MB.T) / np.outer(na, nb)
        ia = A["vec_id"].to_numpy()
        ib = B["vec_id"].to_numpy()
        mask = cos >= raw_cut
        if bi == bj:
            mask &= ia[:, None] < ib[None, :]
        r, c = np.nonzero(mask)
        va, vb = ia[r], ib[c]
        return pd.DataFrame(
            {"vec_a": np.minimum(va, vb), "vec_b": np.maximum(va, vb),
             "cosine": cos[r, c]},
            columns=cols,
        )

    pairs = tagged.groupBy("bi", "bj").applyInPandas(
        tile, "vec_a long, vec_b long, cosine double"
    )
    return (
        pairs.withColumn("cosine", F.round("cosine", score_round))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def cosine_near_dup_pairs_allpairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
) -> DataFrame:
    """Naive all-pairs cross-join baseline — kept ONLY as the pytest
    oracle for :func:`cosine_near_dup_pairs`; never the production
    path (CartesianProduct plan)."""
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


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 7,
    max_bucket_docs: int = 256,
    metrics: dict | None = None,
) -> DataFrame:
    """Near-duplicate pairs for *high* cosine thresholds via
    OR-amplified hyperplane LSH: ``n_tables`` independent tables of
    ``n_planes`` hyperplanes each; a pair is a candidate if it collides
    in ANY table (miss prob (1-p^b)^L with p = 1-θ/π); candidates are
    verified with the exact cosine.  The bucket groupBy keys are
    (table, signature) — bounded, uniform shuffle; no all-pairs
    product.  Precision is exact (verify step); recall < 1 by design
    and rises with n_tables — at threshold 0.8, b=4 × L=8 gives
    ≥ 0.998 per-pair recall.

    Hot-bucket bound (VERDICT r02 #2): m identical vectors share every
    signature, so an uncapped bucket self-join is m²/2 on the exact
    flood workload dedup targets.  Buckets over ``max_bucket_docs``
    emit *star* candidates to the bucket's min-id representative (m-1
    pairs, cosine-verified like every candidate) — identical/near-rep
    vectors stay connected through the rep; same mitigation as
    ``dedup.minhash_candidates`` / ``dedup.simhash_near_dups``.  Pass
    ``metrics={}`` to learn whether capping engaged
    (``metrics["overcap_buckets"]`` — see ``dedup.star_capped_pairs``)."""
    first = embeddings.select(vec_col).first()
    if first is None:  # empty corpus → no pairs
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, cosine double"
        )
    dim = len(first[0])
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    all_planes = [_hyperplanes(dim, n_planes, seed=seed + t) for t in range(n_tables)]
    from .dedup import star_capped_pairs

    buckets = base.withColumn("sigs", _multi_sig_col(F.col("vec"), all_planes)).select(
        "vec_id", "vec", F.posexplode("sigs").alias("table", "sig")
    )
    cand = (
        star_capped_pairs(buckets, ["table", "sig"], "vec_id", payload_col="vec",
                          cap=max_bucket_docs, metrics=metrics)
        .select(
            F.col("id_a").alias("vec_a"), F.col("id_b").alias("vec_b"),
            F.col("payload_a").alias("va"), F.col("payload_b").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.withColumn("cosine", F.round(_cosine(F.col("va"), F.col("vb")), score_round))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def _kmeans_fit(
    X: np.ndarray, k: int, seed: int, n_iter: int = 30, n_init: int = 4
) -> np.ndarray:
    """Seeded Lloyd's k-means with k-means++ init (Arthur &
    Vassilvitskii, SODA'07) over a bounded in-memory sample;
    ``n_init`` independent restarts, best inertia wins (the standard
    guard against a bad ++ draw — matching the quantizer quality of
    k-means|| for this use).  Each iteration is one BLAS matmul;
    deterministic for a given (X, k, seed).  ``k`` clamps to
    ``len(X)``."""
    if len(X) == 0:
        return np.zeros((1, 1))
    k = max(1, min(k, len(X)))

    def trial(t: int) -> tuple[np.ndarray, float]:
        centers = _kmeans_once(X, k, seed + 1000 * t, n_iter)
        # inertia: sum over rows of min squared distance
        d = (X ** 2).sum(axis=1)[:, None] - 2.0 * (X @ centers.T) + (
            centers ** 2
        ).sum(axis=1)[None, :]
        return centers, float(d.min(axis=1).sum())

    # the restarts are independent and deterministic per trial seed, so
    # they run from a thread pool (numpy's big ufuncs/BLAS release the
    # GIL — measured 5.2 → 1.7 s at 20k×64/k=128, r10); the winner is
    # still picked sequentially in trial order, so the fitted centers
    # are bit-identical to the sequential loop (verified)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_init) as pool:
        results = list(pool.map(trial, range(n_init)))
    best = None
    best_inertia = np.inf
    for centers, inertia in results:
        if inertia < best_inertia:
            best, best_inertia = centers, inertia
    return best


def _kmeans_once(X: np.ndarray, k: int, seed: int, n_iter: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    dim = X.shape[1]
    centers = np.empty((k, dim), dtype=np.float64)
    centers[0] = X[rng.randint(len(X))]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        tot = d2.sum()
        j = rng.choice(len(X), p=d2 / tot) if tot > 0 else rng.randint(len(X))
        centers[i] = X[j]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(axis=1))
    for _ in range(n_iter):
        # argmin ||x-c||² == argmax (x·c − |c|²/2): |x|² is constant per row
        lab = np.argmax(X @ centers.T - ((centers ** 2).sum(axis=1) / 2.0)[None, :], axis=1)
        new = np.zeros_like(centers)
        np.add.at(new, lab, X)
        counts = np.bincount(lab, minlength=k).astype(np.float64)
        nz = counts > 0
        new[nz] /= counts[nz, None]
        new[~nz] = centers[~nz]  # empty cluster keeps its centroid
        if np.allclose(new, centers):
            centers = new
            break
        centers = new
    return centers


class IVFIndex:
    """IVF-style ANN index handle: a k-means coarse quantizer (on
    L2-normalized vectors so Euclidean clustering ≈ cosine) partitions
    the corpus into inverted lists; each query exactly rescans only
    the ``n_probe`` lists whose centroids score best under the SAME
    affinity the assignment uses.  Scan fraction ≈ probed list mass;
    recall measured against the exact oracle (BASELINE.md).  At 10^12
    rows the lists become the partition key — write the assignment
    out partitioned by list_id and probing becomes partition pruning.
    List count should grow ≈ √N with the corpus (the classic IVF
    sizing); the defaults (128 lists, 64 probes ⇒ ~50% mass) are
    tuned for the bench corpus, where finer quantization at the same
    probed mass measurably lifts recall (grid in BASELINE.md).

    Sample-fit contract (VERDICT r02 #3): the quantizer is fit on a
    deterministic hash-sample of at most ``fit_sample_cap`` vectors —
    centroid quality at k≈32 saturates far below 100k points, and a
    full-corpus fit would make multiple passes over 100 TB just to
    place the centroids.  The bounded sample is collected and fit
    driver-side (seeded numpy Lloyd's with k-means++ init — one BLAS
    matmul per iteration, no per-iteration distributed jobs), then
    the centroids broadcast and the full corpus assigned in ONE
    Arrow-batched matmul pass.

    Build-once/query-many contract (VERDICT r03 #2): construction
    runs the count + sample-collect + fit chain ONCE and persists the
    assignment DataFrame (MEMORY_AND_DISK, lineage-backed), so each
    :meth:`topk` call is a single probe-join job instead of re-running
    the whole chain.  Call :meth:`unpersist` when done; at 100-TB
    scale replace the persist with a parquet stage partitioned by
    list_id (the index builder's staging pattern)."""

    def __init__(
        self,
        embeddings: DataFrame,
        n_centroids: int = 128,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
        fit_sample_cap: int = 100_000,
        materialize: bool = True,
    ) -> None:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import IntegerType
        from pyspark.storagelevel import StorageLevel

        self.spark = embeddings.sparkSession
        norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, v: a + v * v))
        base = (
            _spread(
                embeddings.select(
                    F.col(id_col).alias("vec_id"),
                    F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
                )
            )
            # norm computed ONCE per row (inside the transform lambda it
            # would re-aggregate per element); zero vectors stay
            # unnormalized rather than becoming NaN features that
            # poison the fit
            .withColumn("nrm", norm(F.col("vec")))
            .withColumn(
                "unit",
                F.when(
                    F.col("nrm") > 0,
                    F.transform(F.col("vec"), lambda x: x / F.col("nrm")),
                ).otherwise(F.col("vec")),
            )
            .drop("nrm")
        )
        n_vecs = embeddings.count()
        if n_vecs > fit_sample_cap:
            # deterministic hash-sample (id-keyed, reproducible across
            # sessions/partitionings — unlike .sample or .limit)
            denom = -(-n_vecs // fit_sample_cap)  # ceil
            fit_df = base.filter(
                F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(denom)) == 0
            )
        else:
            fit_df = base
        # sort by id driver-side: collect() returns partition order,
        # which varies with the input's partitioning — and k-means++ is
        # sample-ORDER-sensitive, so without the sort the fitted
        # centroids (hence assignments) would differ across otherwise
        # identical corpora (r5; also what lets the pure-Python oracle
        # aux reproduce the quantizer exactly)
        sample_rows = sorted(
            fit_df.select("vec_id", "unit").collect(), key=lambda r: r["vec_id"]
        )
        sample = np.array([r["unit"] for r in sample_rows], dtype=np.float64)
        self.empty = sample.size == 0
        if self.empty:  # empty corpus → no results from any query
            self.lists = None
            self._persisted = False
            return
        centers = _kmeans_fit(sample, n_centroids, seed)
        self.centers = centers
        self.cnorm = np.linalg.norm(centers, axis=1)
        # assignment: argmin ||x - c||² == argmax (x·c − |c|²/2); one
        # BLAS product per Arrow batch, centroids in the UDF closure
        half_sq = (self.cnorm ** 2) / 2.0

        @pandas_udf(IntegerType())
        def assign(units: pd.Series) -> pd.Series:
            if units.empty:
                return pd.Series([], dtype="int32")
            M = np.vstack(units.to_numpy())
            lid = np.argmax(M @ centers.T - half_sq[None, :], axis=1)
            return pd.Series(lid.astype(np.int32))

        self.lists = base.select(
            "vec_id", "vec", assign(F.col("unit")).alias("list_id")
        )
        self._persisted = materialize
        if materialize:
            # persist + force the one assignment pass at build time;
            # the one-shot wrapper skips this (no orphaned CacheManager
            # entry per call — the dedup gram-cache lesson)
            self.lists = self.lists.persist(StorageLevel.MEMORY_AND_DISK)
            self.lists.count()

    def unpersist(self) -> None:
        if self.lists is not None and self._persisted:
            self.lists.unpersist()
            self._persisted = False

    def topk(
        self,
        query_vectors: list[tuple[int, list[float]]],
        k: int = 10,
        n_probe: int = 64,
        score_round: int = 6,
    ) -> DataFrame:
        """(query_id, rank, vec_id, cosine) over the ``n_probe`` best
        lists per query — one probe-join job against the persisted
        assignment."""
        if self.empty:
            return self.spark.createDataFrame(
                [], "query_id int, rank long, vec_id long, cosine double"
            )
        qrows = []
        for qid, v in query_vectors:
            arr = np.asarray(v, dtype=np.float64)
            nrm = np.linalg.norm(arr)
            qu = arr / nrm if nrm > 0 else arr
            # probe by the SAME affinity the assignment uses
            # (unit-vector Euclidean: qu·c − |c|²/2) — ranking lists by
            # raw cosine here would probe a different neighborhood than
            # the one the quantizer filed the vectors under
            aff = qu @ self.centers.T - (self.cnorm ** 2) / 2.0
            for lid in np.argsort(-aff)[:n_probe]:
                qrows.append((qid, [float(x) for x in v], int(lid)))
        qdf = F.broadcast(
            self.spark.createDataFrame(
                qrows, "query_id int, qvec array<double>, list_id int"
            )
        )
        scored = self.lists.join(qdf, "list_id").select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("vec"), F.col("qvec")), score_round).alias("cosine"),
        )
        return _rank_topk(scored, k)


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 10,
    n_centroids: int = 128,
    n_probe: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
    seed: int = 42,
    fit_sample_cap: int = 100_000,
) -> DataFrame:
    """One-shot IVF ANN: build an :class:`IVFIndex` and query it once.
    Callers issuing repeated queries should hold an :class:`IVFIndex`
    instead — this convenience wrapper pays the full fit+assignment
    chain per call (and leaves the assignment unmaterialized so the
    single downstream job computes it inline, exactly the pre-r4
    plan)."""
    idx = IVFIndex(
        embeddings,
        n_centroids=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        fit_sample_cap=fit_sample_cap,
        materialize=False,
    )
    return idx.topk(query_vectors, k=k, n_probe=n_probe, score_round=score_round)
