"""Inverted-index construction — the engine's core batch pipeline.

Implements BASELINE.json north_star: vectorized tokenization →
per-(term, doc) postings with tf + positions → salted
repartition-by-term shuffle → per-partition sorted posting runs →
delta-gap + varbyte block encoding with block-max metadata, written as
term-bucketed segment files.  Replaces the reference's eager
string-fold index build (``jobs/Indexer.java:36-75``) with a
shuffle-conscious DataFrame plan.

Scale design (the 10^12-doc story):

* **Doc-range chunking is the salt.**  ``chunk = doc_id >> CHUNK_BITS``
  bounds every ``(term, chunk)`` group at 2^CHUNK_BITS postings, so even
  a stopword that appears in *every* document never forms a single
  giant shuffle group — its postings land in one bounded group per doc
  range.  Because chunks partition the doc-id space into ordered
  disjoint ranges, the "external merge" of per-partition sorted runs is
  free: reading a term's blocks ordered by ``first_doc`` *is* the merged
  list (same trick as Lucene segment ordering).
* **Term buckets give query-side pruning.**  Segments are written
  partitioned by ``bucket = xxhash64(term) % n_buckets``; a query reads
  only its terms' buckets (directory-level partition pruning).
* **Single tokenize pass.**  Tokenization (the expensive pandas-UDF
  stage) runs once; the aggregated postings are staged to parquet, and
  doc lengths, corpus stats, segments, term stats and lineage all derive
  from the staged postings — no recomputation of lineage per action.
  The staging directory doubles as the build checkpoint.
* **Block-max metadata.**  Each 128-posting block stores
  ``(max_tf, min_dl)``; the query computes the WAND upper bound
  ``idf · tfnorm(max_tf, min_dl, avgdl)`` with broadcast stats, so the
  build needs no stats pre-pass.

Two build paths share this file (both serve the identical query
engine, equality-tested):

* ``build_index`` — the north-star shape: doc-postings UDF → staged
  parquet (checkpoint) → salted repartition-by-term-bucket shuffle
  keyed on (bucket, chunk) → per-group sorted encode.  Term-clustered
  segment layout; resumable variant ``build_index_resumable``.
* ``build_index_fast`` — zero-shuffle MapReduce-indexer shape: each
  Arrow batch emits finished compressed block rows (plus per-batch
  doclen rows); measured 0.94 scaling efficiency 2→8 cores at 1M docs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sqltok
from ..functions.udfs import (
    doc_postings_from_html_udf,
    doc_postings_stem_udf,
    doc_postings_udf,
    extract_and_tokenize_udf,
    tokenize_stem_udf,
    tokenize_udf,
)
from . import codec
from ..sources import fsio

CHUNK_BITS = 18  # 262,144 docs per chunk → bounded (term, chunk) groups
MIN_CHUNK_BITS = 10


def adaptive_chunk_bits(n_docs: int, parallelism: int) -> int:
    """Chunk span sized to the corpus: at 10^12 docs the fixed 2^18
    span bounds every (term, chunk) shuffle group; below that, shrink
    only as far as needed for the corpus to yield roughly one chunk
    per core.  The chunk count drives QUERY-side parallelism (the
    scorer is one applyInPandas group per chunk), not build
    parallelism — the build fans out over (bucket, chunk) groups
    and has the whole bucket space to parallelize on.  The r4 rule
    targeted 4×cores chunks and over-sharded the serving path: at 1M
    docs it picked 4096-doc chunks whose scoring runs are
    overhead-bound (the r5 cb12→cb15 A/B measured +13% build, −29%
    single-query p50, −40% batch with the longer span — BASELINE.md).
    This rule lands the cb15-equivalent span at the 1M bench scale
    automatically (VERDICT r05 #4); chunk counts quantize in ×2 steps,
    so [cores/2, cores) is the closest reachable band to "≈ cores".
    Monotone in n_docs; recorded in stats.json for reproducibility."""
    bits = CHUNK_BITS
    while bits > MIN_CHUNK_BITS and (n_docs >> bits) < max(parallelism // 2, 1):
        bits -= 1
    return bits
BLOCK = 128  # postings per block (classic block-max WAND block size)
DEFAULT_BUCKETS = 16

# Upper bound on postings materialized in one encode group (ADVICE r06):
# at the production 2^18 chunk span with a realistic web avgdl, a plain
# (bucket, chunk) group holds ~chunk_docs×unique_terms/n_buckets postings
# *including position lists* in a single pandas frame — millions of rows
# per task.  Groups expected to exceed this are re-split on a term-hash
# sub-key (term runs stay whole, so output bytes are identical).
MAX_GROUP_POSTINGS = 1 << 21  # ~2M postings ≈ low hundreds of MB w/ positions


def group_subsplits(
    n_docs: int, avgdl: float, chunk_bits: int, n_buckets: int,
    max_group: int = MAX_GROUP_POSTINGS,
) -> int:
    """Number of term-hash sub-splits per (bucket, chunk) encode group
    so the expected per-group posting mass stays under ``max_group``.
    ``avgdl`` (tokens/doc) upper-bounds unique-terms/doc, so this is a
    safe overestimate of postings/doc.  Returns 1 (no extra salt) at
    sandbox scales; ~3 at the production 2^18 span with web avgdl."""
    chunk_docs = min(max(n_docs, 1), 1 << chunk_bits)
    expected = chunk_docs * max(avgdl, 1.0) / max(n_buckets, 1)
    return max(1, -(-int(expected) // max_group))

# Block metadata stores (max_tf, min_dl) rather than a precomputed
# tf-norm: tfnorm(tf, dl) is monotone ↑ in tf and ↓ in dl, so
# tfnorm(max_tf, min_dl) is a valid block-max WAND upper bound computed
# query-side with the broadcast avgdl — which frees the build from any
# stats pre-pass (single-pass builds).
SEGMENT_SCHEMA = (
    "bucket int, term string, chunk long, first_doc long, last_doc long, "
    "n int, max_tf int, min_dl int, bytes int, "
    "docs binary, tfs binary, dls binary, pos binary"
)

SEGMENT_COLS = [
    "bucket", "term", "chunk", "first_doc", "last_doc", "n",
    "max_tf", "min_dl", "bytes", "docs", "tfs", "dls", "pos",
]

# reserved pseudo-term carrying per-batch (doc_id, dl) pairs in the
# fast path; can never collide with real tokens (tokens are [a-z]+)
DOCLEN_TERM = "#doclens#"


def ensure_parallelism(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Small-input guard: a compact parquet corpus coalesces to a
    handful of scan splits (maxPartitionBytes), which would run the
    expensive tokenize+partial-agg map stage on 1-2 cores.  Repartition
    up to cores×factor when the scan gives fewer — the raw-input shuffle
    is cheap at this size.  At production scale (thousands of splits)
    this is a no-op, so no 100-TB reshuffle ever happens."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


class IndexPaths:
    def __init__(self, root: str):
        self.root = root
        self.postings = os.path.join(root, "postings")  # staged, also checkpoint
        self.segments = os.path.join(root, "segments")
        self.term_stats = os.path.join(root, "term_stats")
        self.doclens = os.path.join(root, "doclens")
        self.stats = os.path.join(root, "stats.json")
        self.lineage = os.path.join(root, "lineage")
        self.commits = os.path.join(root, "_commits")


def tokenize_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = False,
    from_html: bool = False,
) -> DataFrame:
    """(doc_id, tokens, dl). Tokens per ``jobs/Indexer.java:129-140``;
    optional Porter stemming (north-star analyzer).  With
    ``from_html=True`` the column is raw HTML and the full
    returnCleanedupPage pipeline (extraction + tokenize,
    ``Indexer.java:83-141``) runs in one vectorized UDF — the true
    webtext workload."""
    if from_html:
        udf = extract_and_tokenize_udf
    else:
        udf = tokenize_stem_udf if stem else tokenize_udf
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        udf(F.col(text_col)).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = False,
    from_html: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    chunk_bits: int = CHUNK_BITS,
) -> DataFrame:
    """(term, doc_id, tf, positions, dl, bucket, chunk) in ONE vectorized
    pass: tf and 1-based positions are per-document facts, so the UDF
    emits finished posting fragments and the only JVM work is an explode
    — no distributed groupBy(term, doc) ever happens.  (The first
    implementation aggregated exploded tokens with collect_list; the
    millions of per-group buffers thrashed GC and anti-scaled with
    cores.)  Positions convention per ``AnchorTextIndexer.java:57-66``;
    postings carry tf+positions per the north_star."""
    if from_html:
        udf = doc_postings_from_html_udf
    else:
        udf = doc_postings_stem_udf if stem else doc_postings_udf
    # explode_outer keeps token-less documents as a null-term row, so
    # doclens / n_docs / avgdl still count them (the DuckDB oracle and
    # the reference's corpus stats do); the segment builder filters the
    # null rows out.
    frag = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        udf(F.col(text_col)).alias("dp"),
    ).select(
        "doc_id", F.col("dp.dl").alias("dl"), F.explode_outer("dp.postings").alias("p")
    )
    # bucket = term_hash63 % n_buckets — the hash comes from the UDF
    # (functions/hashing.py), so query-side pruning predicates are
    # computable in plain Python with no JVM hash round-trip
    return frag.select(
        F.col("p.term").alias("term"),
        "doc_id",
        F.col("p.tf").alias("tf"),
        F.col("p.positions").alias("positions"),
        "dl",
        F.coalesce(
            F.pmod(F.col("p.th"), F.lit(n_buckets)).cast("int"), F.lit(0)
        ).alias("bucket"),
        F.floor(F.col("doc_id") / F.lit(1 << chunk_bits)).cast("long").alias("chunk"),
    )


def _encode_blocks(
    bucket: int, term: str, chunk: int,
    docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
    positions: list, rows: list,
) -> None:
    """Append ≤ ceil(n/128) block rows for one (term, chunk) run."""
    for s in range(0, len(docs), BLOCK):
        e = min(s + BLOCK, len(docs))
        b_docs = codec.delta_encode(docs[s:e].astype(np.uint64))
        b_tfs = codec.vb_encode(tfs[s:e].astype(np.uint64))
        b_dls = codec.vb_encode(dls[s:e].astype(np.uint64))
        b_pos = codec.encode_positions(positions[s:e]) if positions else b""
        rows.append(
            {
                "bucket": bucket,
                "term": term,
                "chunk": chunk,
                "first_doc": int(docs[s]),
                "last_doc": int(docs[e - 1]),
                "n": e - s,
                "max_tf": int(tfs[s:e].max()) if len(tfs) else 0,
                "min_dl": int(dls[s:e].min()) if len(dls) else 0,
                "bytes": len(b_docs) + len(b_tfs) + len(b_dls) + len(b_pos),
                "docs": b_docs,
                "tfs": b_tfs,
                "dls": b_dls,
                "pos": b_pos,
            }
        )


def _encode_bucket_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
    """REFERENCE encoder (readable, per-run loop) — kept as the
    byte-identity oracle for the production `_encode_bucket_chunk_vec`
    (test_vectorized_encoder_matches_loopy_reference).

    One (bucket, chunk) shuffle group → block rows for EVERY term run
    inside it.  History of the two r6 steps this shape encodes: (a)
    grouping used to be one applyInPandas group per (bucket, term,
    chunk) — with a realistic vocabulary that is hundreds of thousands
    of tiny groups and the ~0.3 ms per-group Arrow/pandas overhead
    dominated (10k-vocab corpus: 80 s vs 8 s small-vocab); grouping by
    (bucket, chunk) caps the group COUNT at n_buckets × chunks while
    term-hash bucketing bounds group SIZE at ~chunk_tokens/n_buckets.
    (b) The per-run codec calls inside the group were then the next
    floor (~1.6 ms per tiny run × |vocab|×chunks runs) — the _vec twin
    removes them with the segmented codec (same-session A/B on the
    10k-vocab corpus: 14.9 → 10.6 s end-to-end)."""
    rows: list = []
    if not len(pdf):
        return pd.DataFrame(rows, columns=SEGMENT_COLS)
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    bucket = int(pdf["bucket"].iloc[0])
    chunk = int(pdf["chunk"].iloc[0])
    docs_all = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs_all = pdf["tf"].to_numpy(dtype=np.int64)
    dls_all = pdf["dl"].to_numpy(dtype=np.int64)
    pos_all = pdf["positions"].tolist()
    terms = pdf["term"].to_numpy()
    starts = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
    bounds = np.r_[starts, len(terms)]
    for i in range(len(starts)):
        s, e = int(bounds[i]), int(bounds[i + 1])
        _encode_blocks(
            bucket, str(terms[s]), chunk,
            docs_all[s:e], tfs_all[s:e], dls_all[s:e], pos_all[s:e], rows,
        )
    return pd.DataFrame(rows, columns=SEGMENT_COLS)


def _encode_bucket_chunk_vec(pdf: pd.DataFrame) -> pd.DataFrame:
    """Fully vectorized twin of :func:`_encode_bucket_chunk` — the
    production encoder (byte-identical output, equality pytest-gated
    on randomized corpora).

    The loopy path costs ~1.6 ms per TINY (term, chunk) run (four
    fixed-overhead codec calls + a pure-Python position flatten), and
    a realistic vocabulary means hundreds of thousands of such runs —
    ~85 % of the whole 10k-vocab build was encoder overhead.  Here the
    whole (bucket, chunk) group is encoded in ONE pass per stream:
    block boundaries are computed vectorized (every run start is a
    block start, so per-block delta resets land exactly where the
    per-run path puts them), the segmented codec
    (:func:`codec.vb_encode_segmented`) emits one buffer + per-block
    byte offsets, and per-block rows are cheap buffer slices.  The
    only remaining per-element Python work is ``len()`` over the
    position lists."""
    if not len(pdf):
        return pd.DataFrame([], columns=SEGMENT_COLS)
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    n = len(pdf)
    return _encode_sorted_runs(
        pdf["term"].to_numpy(),
        np.full(n, int(pdf["bucket"].iloc[0]), dtype=np.int64),
        np.full(n, int(pdf["chunk"].iloc[0]), dtype=np.int64),
        pdf["doc_id"].to_numpy(dtype=np.int64),
        pdf["tf"].to_numpy(dtype=np.int64),
        pdf["dl"].to_numpy(dtype=np.int64),
        pdf["positions"].tolist(),
    )


def _encode_sorted_runs(
    terms: np.ndarray,
    buckets: np.ndarray,
    chunks: np.ndarray,
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos_all: list,
) -> pd.DataFrame:
    """Shared vectorized core: posting streams already grouped into
    contiguous (term, chunk) runs (equal terms adjacent, doc ids
    ascending within a run; ``buckets``/``chunks`` constant within a
    run) → block rows.  Every run start is a block start, so per-block
    delta resets land exactly where the per-run loopy path puts them;
    block boundaries, metadata (reduceat) and all four byte streams
    (segmented codec) are computed without a per-run Python loop.

    ``pos_all``: either a list of per-posting position arrays, or a
    tuple ``(flat_positions, per_posting_counts)`` when the caller
    already holds the flattened token-position stream (the fast path's
    factorize aggregation, r7) — identical bytes, no per-posting list
    round-trip."""
    n = len(docs)
    if n == 0:
        return pd.DataFrame([], columns=SEGMENT_COLS)
    new_run = np.r_[True, (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])]
    run_starts = np.flatnonzero(new_run)
    run_of = np.cumsum(new_run) - 1  # run index per element
    idx_in_run = np.arange(n) - run_starts[run_of]
    block_starts = np.flatnonzero(idx_in_run % BLOCK == 0)
    nb = block_starts.size
    block_ends = np.empty(nb, dtype=np.int64)
    block_ends[:-1] = block_starts[1:]
    block_ends[-1] = n
    docs_buf, docs_off = codec.delta_encode_segmented(docs, block_starts)
    tfs_buf, tfs_off = codec.vb_encode_segmented(tfs, block_starts)
    dls_buf, dls_off = codec.vb_encode_segmented(dls, block_starts)
    if isinstance(pos_all, tuple):
        flat_src, counts = pos_all
        counts = np.asarray(counts, dtype=np.int64)
    else:
        flat_src = None
        counts = np.fromiter((len(p) for p in pos_all), dtype=np.int64, count=n)
    pcum = np.empty(n + 1, dtype=np.int64)
    pcum[0] = 0
    np.cumsum(counts, out=pcum[1:])
    if pcum[-1]:
        flat = (
            flat_src.astype(np.uint64)
            if flat_src is not None
            else np.concatenate(pos_all).astype(np.uint64)
        )
        d = np.empty_like(flat)
        d[0] = flat[0]
        d[1:] = flat[1:] - flat[:-1]
        post_starts = pcum[:-1][counts > 0]
        d[post_starts] = flat[post_starts]  # prev resets to 0 per posting
        pos_buf, pos_off = codec.vb_encode_segmented(d, pcum[block_starts])
    else:
        pos_buf, pos_off = b"", np.zeros(nb + 1, dtype=np.int64)
    mvd, mvt, mvl, mvp = map(memoryview, (docs_buf, tfs_buf, dls_buf, pos_buf))
    return pd.DataFrame(
        {
            "bucket": buckets[block_starts],
            "term": terms[block_starts],
            "chunk": chunks[block_starts],
            "first_doc": docs[block_starts],
            "last_doc": docs[block_ends - 1],
            "n": block_ends - block_starts,
            "max_tf": np.maximum.reduceat(tfs, block_starts),
            "min_dl": np.minimum.reduceat(dls, block_starts),
            "bytes": (
                np.diff(docs_off) + np.diff(tfs_off)
                + np.diff(dls_off) + np.diff(pos_off)
            ),
            "docs": [bytes(mvd[docs_off[i]:docs_off[i + 1]]) for i in range(nb)],
            "tfs": [bytes(mvt[tfs_off[i]:tfs_off[i + 1]]) for i in range(nb)],
            "dls": [bytes(mvl[dls_off[i]:dls_off[i + 1]]) for i in range(nb)],
            "pos": [bytes(mvp[pos_off[i]:pos_off[i + 1]]) for i in range(nb)],
        },
        columns=SEGMENT_COLS,
    )


def build_segments(postings: DataFrame, n_sub: int = 1) -> DataFrame:
    """Salted repartition-by-term-bucket → sorted, compressed block
    rows.

    The shuffle key is (bucket, chunk): bucket = term-hash (locality —
    all of a term's postings for a doc range land together), chunk
    (doc range) as the skew salt.  A single hot term is bounded at
    2^chunk_bits postings per group exactly as before — the salt is
    unchanged — while the group COUNT stays at n_buckets × chunks
    instead of |vocab| × chunks.  applyInPandas sorts each bounded
    group by (term, doc_id) and emits ≤ ceil(run/128) block rows per
    term run (vectorized encoder; the loopy twin remains as the
    equality-test reference).

    ``n_sub`` (ADVICE r06, see :func:`group_subsplits`): when the
    expected per-group posting mass exceeds ``MAX_GROUP_POSTINGS``, the
    group is further salted on a term-hash sub-key (murmur3 ``F.hash``
    — independent of the blake2b bucket hash, so terms inside one
    bucket spread across sub-keys).  A term's run for a chunk still
    lands entirely in one group, so the emitted block rows — and the
    stored bytes — are identical for any ``n_sub`` (equality
    pytest-gated); only the shuffle-group size changes."""
    filtered = postings.filter(F.col("term").isNotNull())  # token-less-doc sentinels
    if n_sub > 1:
        grouped = filtered.withColumn(
            "_sub", F.pmod(F.hash("term"), F.lit(n_sub))
        ).groupBy("bucket", "chunk", "_sub")
    else:
        grouped = filtered.groupBy("bucket", "chunk")
    return grouped.applyInPandas(_encode_bucket_chunk_vec, SEGMENT_SCHEMA)


def _run_concurrently(*fns) -> None:
    """Submit independent Spark jobs from concurrent driver threads and
    wait for all; first exception (if any) re-raises.  Used to collapse
    the finalize tail's sequential small-job latency — each job's fixed
    scheduling cost overlaps instead of summing (the build's Amdahl
    floor, profiled at ~3.6 s of sequential tail @ 8 cores)."""
    # InheritableThread, not threading.Thread (code-review r8): under
    # PySpark's default pinned-thread mode each plain Python thread
    # maps to a dedicated JVM thread that is NOT reclaimed on exit —
    # repeated builds in a long-lived driver would accumulate pinned
    # JVM threads; InheritableThread also propagates job group / local
    # properties into the concurrent jobs.
    from pyspark import InheritableThread

    errs: list[BaseException] = []

    def _wrap(fn):
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errs.append(e)

    threads = [InheritableThread(target=_wrap, args=(fn,)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def _decode_doclen_rows(batches):
    """mapInPandas generator: reserved #doclens# sentinel block rows →
    (doc_id, dl) rows (shared by the fast and term-partitioned builds)."""
    for pdf in batches:
        outs = []
        for r in pdf.itertuples():
            ids = codec.delta_decode(r.docs).astype(np.int64)
            dls = codec.vb_decode(r.dls).astype(np.int64)
            outs.append(pd.DataFrame({"doc_id": ids, "dl": dls}))
        if outs:
            yield pd.concat(outs)


def _doclens_from_postings(staged: DataFrame) -> DataFrame:
    # (doc_id, dl) appears identically on every posting of a doc;
    # max aggregation is partial-agg friendly (no distinct shuffle blowup).
    return staged.groupBy("doc_id").agg(F.max("dl").alias("dl"))


def _finalize(spark: SparkSession, paths: IndexPaths, *extra_pipelines) -> int:
    """Write term_stats/ and lineage/ from the segment metadata and
    return n_terms.  Metadata-only scans (ints + term; posting blobs
    never read thanks to column pruning + the precomputed bytes
    column).  The two writes are independent, so they run from
    concurrent driver threads, and n_terms rides the term_stats write
    via Observation — the tail costs one job-latency, not three
    (r8 floor cut; result-identical).  ``extra_pipelines``: additional
    independent callables to overlap with the two writes (the fast
    path passes its doclens pipeline — ONE definition of the
    term_stats/lineage aggregations serves every build path)."""
    from pyspark.sql import Observation

    meta = (
        spark.read.parquet(paths.segments)
        .filter(F.col("term") != DOCLEN_TERM)
        .select("term", "bucket", "chunk", "n", "bytes")
    )
    ts_obs = Observation()

    def _term_stats_pipeline():
        # bucket rides along so the query path resolves term→bucket
        # with the same lookup that fetches df (one fewer job/query)
        meta.groupBy("term").agg(
            F.sum("n").cast("long").alias("df"),
            F.first("bucket").cast("int").alias("bucket"),
        ).observe(ts_obs, F.count("*").alias("n_terms")).write.mode(
            "overwrite"
        ).parquet(paths.term_stats)

    def _lineage_pipeline():
        # per-chunk (shuffle-partition) lineage + metrics — north_rule
        meta.groupBy("chunk").agg(
            F.sum("n").cast("long").alias("postings"),
            F.countDistinct("term").alias("terms"),
            F.sum("bytes").cast("long").alias("bytes"),
        ).withColumn("status", F.lit("complete")).write.mode(
            "overwrite"
        ).parquet(paths.lineage)

    _run_concurrently(_term_stats_pipeline, _lineage_pipeline, *extra_pipelines)
    return int(ts_obs.get["n_terms"])


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    stem: bool = False,
    from_html: bool = False,
    chunk_bits: int | None = None,
) -> dict:
    """Full index build → ``out_dir``.  Returns build stats/metrics.

    ``chunk_bits``: doc-range span per (term, chunk) group.  Default
    ``None`` sizes it adaptively for build parallelism at sandbox
    corpus sizes; pass an explicit value (e.g. the production
    ``CHUNK_BITS`` = 18) to reproduce at small scale the long per-chunk
    posting runs a 10^12-doc corpus has naturally — block-max WAND's
    skippable shape.

    Layout:
      segments/   parquet, partitioned by bucket (term-hash pruning)
      term_stats/ parquet (term, df)
      doclens/    parquet (doc_id, dl)
      lineage/    parquet per-chunk metrics (postings, terms, bytes)
      stats.json  {n_docs, avgdl, total_tokens, n_terms, ...}

    Shape (r10): the heavy bytes move ONCE.  The raw docs are
    range-partitioned by doc_id (one shuffle of the corpus), the fast
    path's single tokenize+aggregate+encode pass turns each sorted
    batch into finished compressed fragment blocks, and the canonical
    term-clustered (bucket, chunk) layout comes from re-chunking those
    COMPRESSED blocks through :func:`_compact_segments` — the second
    exchange carries index bytes, not exploded postings.  The previous
    shape staged the fully exploded posting rows (term, doc_id, tf,
    positions-list, …) to parquet and shuffled them (measured 11.5 s of
    a 20.7 s isolated build at 500k docs just tokenizing+writing the
    staged form); output is byte-identical (segments/doclens/term_stats
    exceptAll-verified at sf1.0, plus the pure-Python posting oracle
    gates).  The checkpointed/resumable variant keeps the staged-
    posting shape (build_index_resumable)."""
    t0 = time.time()
    paths = IndexPaths(out_dir)
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    docs = ensure_parallelism(docs)
    n_docs_est = docs.count()  # parquet metadata read — cheap
    par = docs.sparkSession.sparkContext.defaultParallelism
    if chunk_bits is None:
        chunk_bits = adaptive_chunk_bits(n_docs_est, par)
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    # range order makes every fragment block's doc span tight, so the
    # block re-chunk below replicates each block to ~1 target chunk
    # (hash-partitioned batches would span the whole id range and
    # replicate to every chunk)
    parts = max(par * 2, n_docs_est // (1 << chunk_bits) + 1)
    src = src.repartitionByRange(parts, "doc_id").sortWithinPartitions("doc_id")
    frags = src.mapInPandas(
        _make_fragment_gen(text_col, from_html, stem, n_buckets), SEGMENT_SCHEMA
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        dl_obs = Observation()
        dl_rows = frags.filter(
            (F.col("bucket") == 0) & (F.col("term") == DOCLEN_TERM)
        ).select("docs", "dls")
        dl_rows.mapInPandas(_decode_doclen_rows, "doc_id long, dl long").observe(
            dl_obs,
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total_tokens"),
        ).write.mode("overwrite").parquet(paths.doclens)
        agg = dl_obs.get  # corpus stats ride the write job (r8 floor cut)
        n_docs = int(agg["n_docs"])
        avgdl = float(agg["avgdl"] or 0.0)

        _compact_segments(
            frags, chunk_bits,
            n_sub=group_subsplits(n_docs, avgdl, chunk_bits, n_buckets),
        ).write.mode("overwrite").partitionBy("bucket").parquet(paths.segments)
    finally:
        frags.unpersist()
    n_terms = _finalize(spark, paths)

    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_terms": n_terms,
        "n_buckets": n_buckets,
        "block": BLOCK,
        "chunk_bits": chunk_bits,
        "stem": stem,
        "k1": sqltok.K1,
        "b": sqltok.B,
        "build_sec": time.time() - t0,
    }
    fsio.write_text(spark, paths.stats, json.dumps(stats, indent=2))
    return stats


def build_index_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    n_jobs: int = 4,
    fail_after: int | None = None,
) -> dict:
    """Checkpointed build: docs are processed in ``n_jobs`` doc-id-range
    jobs; each job writes its segments under ``part=<j>`` and commits a
    marker.  A re-run skips committed parts, so resume-after-kill equals
    from-scratch (FIXTURES.md §5).

    ``fail_after`` (tests only): raise after that many parts commit,
    simulating a mid-build crash."""
    paths = IndexPaths(out_dir)
    # all metadata IO goes through the Hadoop FileSystem API so the
    # whole index root (segments + stats + commit markers) lives on one
    # filesystem — hdfs://, s3a://, or file: alike (resume survives a
    # driver replacement)
    fsio.mkdirs(spark, paths.commits)

    # stats pass (cheap relative to the build; itself checkpointed)
    if not fsio.exists(spark, os.path.join(paths.commits, "doclens.done")):
        tokens_all = tokenize_docs(docs, id_col, text_col)
        tokens_all.select("doc_id", "dl").write.mode("overwrite").parquet(paths.doclens)
        fsio.write_text(spark, os.path.join(paths.commits, "doclens.done"), "")
    doclens = spark.read.parquet(paths.doclens)
    agg = doclens.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(agg["n_docs"]), float(agg["avgdl"] or 0.0)

    chunk_bits = adaptive_chunk_bits(
        n_docs, docs.sparkSession.sparkContext.defaultParallelism
    )
    bounds = docs.agg(
        F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
    ).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = (hi - lo + 1 + n_jobs - 1) // n_jobs

    done = 0
    for j in range(n_jobs):
        marker = os.path.join(paths.commits, f"part-{j}.done")
        if fsio.exists(spark, marker):
            continue
        part_docs = docs.filter(
            (F.col(id_col) >= lo + j * span) & (F.col(id_col) < lo + (j + 1) * span)
        )
        part_postings = doc_postings(
            ensure_parallelism(part_docs), id_col, text_col,
            n_buckets=n_buckets, chunk_bits=chunk_bits,
        )
        build_segments(
            part_postings,
            n_sub=group_subsplits(n_docs, avgdl, chunk_bits, n_buckets),
        ).write.mode("overwrite").parquet(
            os.path.join(paths.segments, f"part={j}")
        )
        fsio.write_text(
            spark, marker,
            json.dumps({"part": j, "lo": lo + j * span, "hi": lo + (j + 1) * span}),
        )
        done += 1
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"simulated crash after {done} parts")

    n_terms = _finalize(spark, paths)
    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": n_terms,
        "n_buckets": n_buckets,
        "resumable": True,
        "n_jobs": n_jobs,
    }
    fsio.write_text(spark, paths.stats, json.dumps(stats, indent=2))
    return stats


# ---------------------------------------------------------------------------
# Fast path: map-side fragment build (the MapReduce-indexer shape)
# ---------------------------------------------------------------------------

from ..functions.hashing import term_bucket as _bucket_of  # noqa: E402


def _make_fragment_gen(text_col: str, from_html: bool, stem: bool, n_buckets: int):
    """mapInPandas generator: one Arrow batch of (doc_id, text|html) →
    finished segment block rows + one reserved #doclens# row per batch.

    Each batch is sorted by doc_id in-python, so every (term, batch) run
    is a sorted doc-id run, and runs across batches are disjoint (a doc
    lives in exactly one batch).  chunk = the batch's first doc_id —
    necessarily unique across batches.  That is everything the query
    engine needs (per-chunk independent scoring, within-chunk blocks
    ordered by first_doc); no global ordering, and therefore no input
    shuffle, is required."""
    from .. import textproc
    from ..stemmer import porter_stem

    def tokenizer(v):
        if from_html:
            if isinstance(v, (bytes, bytearray)):
                v = v.decode("utf-8", errors="replace")
            toks = textproc.extract_and_tokenize(v)
        else:
            toks = textproc.tokenize(v)
        if stem:
            toks = [porter_stem(t) for t in toks]
        return toks

    def gen(batches):
        from itertools import chain

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("doc_id")
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            chunk = int(ids[0])
            # tokenize (python — parity-bound), then aggregate postings
            # fully vectorized (r7: the per-token dict/setdefault
            # machinery was ~35 % of generator time at 1M scale —
            # profiled; factorize + one stable int argsort replaces it)
            tok_lists = []
            dls = np.empty(ids.size, dtype=np.int64)
            for i, raw in enumerate(pdf[text_col]):
                toks = tokenizer(raw)
                tok_lists.append(toks)
                dls[i] = len(toks)
            total_toks = int(dls.sum())
            if total_toks:
                flat = np.fromiter(
                    chain.from_iterable(tok_lists), dtype=object, count=total_toks
                )
                codes, uniq = pd.factorize(flat)  # C-level string hash
                # factorize maps None/NaN to code -1, which would
                # silently attribute that posting to the LAST unique
                # term below; textproc tokenizers never yield None
                # today — keep that a loud invariant, not an assumption
                if codes.size and codes.min() < 0:
                    raise ValueError(
                        "tokenizer yielded a null token; factorize "
                        "aggregation requires non-null tokens"
                    )
                tok_doc = np.repeat(ids, dls)
                tok_dl = np.repeat(dls, dls)
                doc_start = np.repeat(np.cumsum(dls) - dls, dls)
                tok_pos = np.arange(total_toks, dtype=np.int64) - doc_start + 1
                # stable sort by term code: tokens were emitted in
                # (doc asc, position asc) order, so within each code
                # run docs stay ascending and positions ascending
                # within each (term, doc) posting — exactly the run
                # shape _encode_sorted_runs requires
                order = np.argsort(codes, kind="stable")
                s_codes = codes[order]
                s_docs = tok_doc[order]
                s_pos = tok_pos[order]
                new_post = np.r_[
                    True, (s_codes[1:] != s_codes[:-1]) | (s_docs[1:] != s_docs[:-1])
                ]
                p_start = np.flatnonzero(new_post)
                p_tfs = np.diff(np.r_[p_start, total_toks])
                uniq_arr = np.asarray(uniq, dtype=object)
                uniq_buckets = np.fromiter(
                    (_bucket_of(t, n_buckets) for t in uniq_arr),
                    dtype=np.int64, count=uniq_arr.size,
                )
                start_codes = s_codes[p_start]
                frame = _encode_sorted_runs(
                    uniq_arr[start_codes],
                    uniq_buckets[start_codes],
                    np.full(p_start.size, chunk, dtype=np.int64),
                    s_docs[p_start],
                    p_tfs,
                    tok_dl[order][p_start],
                    (s_pos, p_tfs),
                )
            else:
                frame = pd.DataFrame([], columns=SEGMENT_COLS)
            # reserved doclens row for this batch
            doclen_row = pd.DataFrame(
                [
                    {
                        "bucket": 0,
                        "term": DOCLEN_TERM,
                        "chunk": chunk,
                        "first_doc": int(ids[0]),
                        "last_doc": int(ids[-1]),
                        "n": int(ids.size),
                        "max_tf": 0,
                        "min_dl": 0,
                        "bytes": 0,
                        "docs": codec.delta_encode(ids.astype(np.uint64)),
                        "tfs": b"",
                        "dls": codec.vb_encode(dls.astype(np.uint64)),
                        "pos": b"",
                    }
                ],
                columns=SEGMENT_COLS,
            )
            yield pd.concat([frame, doclen_row], ignore_index=True)

    return gen


def build_index_fast(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    stem: bool = False,
    from_html: bool = False,
    partitions: int | None = None,
    order: str = "none",
) -> dict:
    """Single-pass, ZERO-shuffle index build (fast path).

    Shape: scan → mapInPandas emits *finished compressed block rows*
    (plus per-batch doclen rows) → one parquet write partitioned by
    bucket.  Neither postings nor raw documents are ever shuffled: each
    Arrow batch is sorted by doc_id in-python, which preserves every
    invariant the query engine needs (disjoint per-chunk doc sets,
    within-chunk blocks as sorted runs).  Term skew is structurally
    impossible at build time: work is partitioned by document, and a
    stopword's postings are just more block rows spread across all
    batches — the classic MapReduce/Lucene per-segment indexing shape.

    ``order="range"`` adds a repartitionByRange(doc_id) +
    sortWithinPartitions pre-step for globally doc-ordered segments
    (tighter delta gaps, range-prunable chunks) at the cost of shuffling
    the raw corpus once — worth it when the index is long-lived and the
    corpus arrives unordered.

    The term-partitioned path (``build_index``) remains as the
    checkpointed/resumable variant with term-clustered segment layout;
    both serve the identical query engine (equality tested).
    """
    t0 = time.time()
    paths = IndexPaths(out_dir)

    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    if order == "range":
        n_docs_est = docs.count()
        if partitions is None:
            par = docs.sparkSession.sparkContext.defaultParallelism
            partitions = max(par * 2, n_docs_est // (1 << CHUNK_BITS) + 1)
        src = src.repartitionByRange(partitions, "doc_id").sortWithinPartitions("doc_id")
    else:
        src = ensure_parallelism(src)
    frags = src.mapInPandas(
        _make_fragment_gen(text_col, from_html, stem, n_buckets), SEGMENT_SCHEMA
    )
    frags.write.mode("overwrite").partitionBy("bucket").parquet(paths.segments)

    # doclens/stats from the reserved rows; bucket=0 filter gives
    # directory-level partition pruning (doclen rows all land there).
    #
    # r8 floor cut: the finalize tail used to be ~6 SEQUENTIAL small
    # jobs (doclens write → corpus agg → term_stats write → lineage
    # write → n_terms count) whose fixed scheduling cost dominated the
    # build's Amdahl floor (~3.6 s of a ~6.9 s floor at 8 cores,
    # profiled).  Two structural fixes, no result change:
    #   * corpus stats and n_terms ride their writes via Observation
    #     (metrics computed inside the same job — two jobs disappear);
    #   * the three remaining pipelines (doclens, term_stats, lineage)
    #     are independent given segments/, so they are submitted from
    #     concurrent driver threads — Spark schedules concurrent jobs
    #     fine, and on a busy cluster they pack into idle executors.
    seg = spark.read.parquet(paths.segments)
    dl_rows = seg.filter(
        (F.col("bucket") == 0) & (F.col("term") == DOCLEN_TERM)
    ).select("docs", "dls")

    from pyspark.sql import Observation

    dl_obs = Observation()

    def _doclens_pipeline():
        dl_rows.mapInPandas(_decode_doclen_rows, "doc_id long, dl long").observe(
            dl_obs,
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total_tokens"),
        ).write.mode("overwrite").parquet(paths.doclens)

    # term_stats + lineage come from _finalize (one definition for all
    # build paths — code-review r8); the doclens pipeline overlaps them
    n_terms = _finalize(spark, paths, _doclens_pipeline)
    agg = dl_obs.get
    stats = {
        "n_docs": int(agg["n_docs"]),
        "avgdl": float(agg["avgdl"] or 0.0),
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_terms": n_terms,
        "n_buckets": n_buckets,
        "block": BLOCK,
        "layout": "fragment",
        "order": order,
        "stem": stem,
        "k1": sqltok.K1,
        "b": sqltok.B,
        "build_sec": time.time() - t0,
    }
    fsio.write_text(spark, paths.stats, json.dumps(stats, indent=2))
    return stats


# ---- segment compaction / index merge -----------------------------------

_POSTING_SCHEMA = (
    "term string, doc_id long, tf int, positions array<int>, dl int, bucket int"
)


def segment_postings(seg: DataFrame) -> DataFrame:
    """Decode segment block rows back into posting rows (term, doc_id,
    tf, positions, dl, bucket) — the inverse of the encoders, used by
    compaction.  Vectorized per block; doclen sentinel rows are
    excluded (they are re-derived from the merged doclens table)."""
    src = seg.filter(F.col("term") != DOCLEN_TERM).select(
        "bucket", "term", "docs", "tfs", "dls", "pos"
    )

    def decode(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                d = codec.delta_decode(r.docs).astype(np.int64)
                tf = codec.vb_decode(r.tfs).astype(np.int64)
                dl = codec.vb_decode(r.dls).astype(np.int64)
                pos = codec.decode_positions(r.pos, tf)
                outs.append(
                    pd.DataFrame(
                        {
                            "term": r.term,
                            "doc_id": d,
                            "tf": tf.astype(np.int32),
                            "positions": [list(map(int, p)) for p in pos],
                            "dl": dl.astype(np.int32),
                            "bucket": np.int32(r.bucket),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    return src.mapInPandas(decode, _POSTING_SCHEMA)


def _compact_segments(
    seg: DataFrame, chunk_bits: int, n_sub: int = 1
) -> DataFrame:
    """Block-level re-chunk (r10): shuffle the already-COMPRESSED block
    rows keyed by the target (bucket, chunk) and decode + re-encode
    inside each group.

    The previous shape (``segment_postings`` → ``build_segments``)
    exploded every block back into posting rows before the shuffle —
    each posting carrying a Python ``list[int]`` positions cell — so
    the exchange moved the fully-decoded corpus (~15× the stored
    bytes) and the Arrow boundary paid a per-posting list round-trip
    both ways.  Guide §8's rule: the shuffle only needs to decide
    where bytes GO — key on (bucket, target-chunk), ship the
    compressed blocks, and do the decode→trim→sort→re-encode
    vectorized inside the group.  A source block whose doc range spans
    several target chunks is replicated to each (``explode`` over its
    chunk span — fragment blocks span 1-2 chunks) and trimmed after
    decode, so emitted block rows are identical to the posting-level
    path (equality pytest-gated via the compact-vs-rebuild gates)."""
    src = seg.filter(F.col("term") != DOCLEN_TERM).select(
        "bucket", "term", "n", "docs", "tfs", "dls", "pos",
        F.explode(
            F.sequence(
                F.floor(F.col("first_doc") / F.lit(1 << chunk_bits)),
                F.floor(F.col("last_doc") / F.lit(1 << chunk_bits)),
            )
        ).alias("chunk"),
    )

    def recode(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame([], columns=SEGMENT_COLS)
        bucket = int(pdf["bucket"].iloc[0])
        chunk = int(pdf["chunk"].iloc[0])
        lo = chunk << chunk_bits
        hi = lo + (1 << chunk_bits)
        n_arr = pdf["n"].to_numpy(dtype=np.int64)
        docs = codec.delta_decode_concat(pdf["docs"].tolist(), n_arr).astype(np.int64)
        tfs = codec.vb_decode_concat(pdf["tfs"].tolist()).astype(np.int64)
        dls = codec.vb_decode_concat(pdf["dls"].tolist()).astype(np.int64)
        terms = np.repeat(pdf["term"].to_numpy(), n_arr)
        # flat positions with per-posting delta resets (the wire format
        # stores gaps per posting; counts == tf for blocks that carry
        # positions, 0 for those that don't)
        pos_bufs = pdf["pos"].tolist()
        has_pos = np.fromiter((len(p) > 0 for p in pos_bufs), dtype=bool, count=len(pos_bufs))
        counts = np.where(np.repeat(has_pos, n_arr), tfs, 0)
        gaps = codec.vb_decode(b"".join(pos_bufs))
        if gaps.size != counts.sum():
            raise ValueError(
                f"compact recode: position count {gaps.size} != expected {counts.sum()}"
            )
        if gaps.size:
            p_off = np.cumsum(counts) - counts
            nz = counts > 0
            c = np.cumsum(gaps, dtype=np.uint64)
            st = p_off[nz]
            carry = c[st] - gaps[st]
            flat_pos = (c - np.repeat(carry, counts[nz])).astype(np.int64)
        else:
            flat_pos = np.empty(0, dtype=np.int64)
        # trim to the target chunk's doc range (replicated boundary
        # blocks carry out-of-range postings)
        keep = (docs >= lo) & (docs < hi)
        if not keep.all():
            # gather the kept postings' variable-length position runs
            kc = counts[keep]
            if flat_pos.size:
                src_off = (np.cumsum(counts) - counts)[keep]
                tot = int(kc.sum())
                out_start = np.cumsum(kc) - kc
                idx = (
                    np.repeat(src_off, kc)
                    + np.arange(tot, dtype=np.int64)
                    - np.repeat(out_start, kc)
                )
                flat_pos = flat_pos[idx]
            terms, docs, tfs, dls, counts = (
                terms[keep], docs[keep], tfs[keep], dls[keep], kc,
            )
        if docs.size == 0:
            return pd.DataFrame([], columns=SEGMENT_COLS)
        # (term lexicographic, doc asc) — the posting-level path's sort
        codes, uniq = pd.factorize(terms)
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[np.argsort(uniq)] = np.arange(len(uniq))
        order = np.lexsort((docs, rank[codes]))
        if flat_pos.size:
            oc = counts[order]
            src_off = (np.cumsum(counts) - counts)[order]
            tot = int(oc.sum())
            out_start = np.cumsum(oc) - oc
            idx = (
                np.repeat(src_off, oc)
                + np.arange(tot, dtype=np.int64)
                - np.repeat(out_start, oc)
            )
            flat_sorted = flat_pos[idx]
        else:
            oc = counts[order]
            flat_sorted = flat_pos
        n = docs.size
        return _encode_sorted_runs(
            terms[order],
            np.full(n, bucket, dtype=np.int64),
            np.full(n, chunk, dtype=np.int64),
            docs[order],
            tfs[order],
            dls[order],
            (flat_sorted, oc),
        )

    if n_sub > 1:
        grouped = src.withColumn(
            "_sub", F.pmod(F.hash("term"), F.lit(n_sub))
        ).groupBy("bucket", "chunk", "_sub")
    else:
        grouped = src.groupBy("bucket", "chunk")
    return grouped.applyInPandas(recode, SEGMENT_SCHEMA)


def compact_index(
    spark: SparkSession,
    src_roots: list[str],
    out_dir: str,
    chunk_bits: int | None = None,
) -> dict:
    """Merge one or more segment stores into ONE canonical compacted
    index — the north-star's "externally merged" step, Spark-first:
    instead of a driver-side k-way file merge, the fragment rows are
    decoded back to postings, re-chunked on the canonical doc-range key
    (``chunk = doc_id >> chunk_bits``), and re-encoded through the SAME
    salted (bucket, chunk) shuffle the term-partitioned builder
    uses — one shuffle, term skew bounded by the chunk salt, arbitrary
    input layout (streaming ``stream_batch=*`` appends, fast-path
    per-batch fragments, or other compacted stores).

    Use cases: collapsing a long-running incremental-ingest segment
    store's accumulated micro-batch fragments (streaming/incremental.py
    appends one fragment set per trigger — reads slow down as fragment
    counts grow), and merging indexes built over disjoint corpus
    partitions.  Sources MUST cover disjoint doc-id sets (the
    incremental contract); overlapping ids would produce duplicate
    postings.

    Returns the new stats dict; the output serves the unchanged query
    engine (equality with a from-scratch single build is pytest-gated,
    tests/test_index.py)."""
    t0 = time.time()
    paths = IndexPaths(out_dir)
    # per-root reads unioned: multiple partitioned roots in one
    # read.parquet trip CONFLICTING_DIRECTORY_STRUCTURES.  Project to
    # SEGMENT_COLS per root BEFORE the union — a streaming store
    # carries an extra stream_batch partition column that would
    # otherwise fail unionByName against a plain store (code-review
    # r04: 'arbitrary input layout' must include mixing them)
    seg = None
    for r in src_roots:
        part = spark.read.parquet(IndexPaths(r).segments).select(*SEGMENT_COLS)
        seg = part if seg is None else seg.unionByName(part)
    n_docs_est = 0
    tokens_est = 0.0
    stems: set[bool] = set()
    bucket_counts: set[int] = set()
    for r in src_roots:
        st = json.loads(fsio.read_text(spark, IndexPaths(r).stats))
        n_docs_est += int(st["n_docs"])
        tokens_est += float(st.get("avgdl", 0.0)) * int(st["n_docs"])
        stems.add(bool(st.get("stem", False)))
        bucket_counts.add(int(st.get("n_buckets", DEFAULT_BUCKETS)))
    # merging indexes with different analyzers or bucket layouts would
    # silently mix incompatible vocabularies / break query-side bucket
    # pruning — refuse loudly
    if len(stems) > 1:
        raise ValueError(
            f"compact_index: sources mix stemmed and unstemmed analyzers: {src_roots}"
        )
    if len(bucket_counts) > 1:
        raise ValueError(
            f"compact_index: sources have different n_buckets {sorted(bucket_counts)}: "
            f"{src_roots}"
        )
    stem = stems.pop()
    n_buckets = bucket_counts.pop()
    if chunk_bits is None:
        chunk_bits = adaptive_chunk_bits(
            n_docs_est, spark.sparkContext.defaultParallelism
        )
    _compact_segments(
        seg,
        chunk_bits,
        n_sub=group_subsplits(
            n_docs_est, tokens_est / max(n_docs_est, 1), chunk_bits, n_buckets
        ),
    ).write.mode("overwrite").partitionBy("bucket").parquet(paths.segments)
    dls = None
    for r in src_roots:
        part = spark.read.parquet(IndexPaths(r).doclens)
        dls = part if dls is None else dls.unionByName(part)
    from pyspark.sql import Observation

    dl_obs = Observation()
    dls.observe(
        dl_obs,
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).write.mode("overwrite").parquet(paths.doclens)
    agg = dl_obs.get  # corpus stats ride the write job (r8 floor cut)
    n_terms = _finalize(spark, paths)
    stats = {
        "n_docs": int(agg["n_docs"]),
        "avgdl": float(agg["avgdl"] or 0.0),
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_terms": n_terms,
        "n_buckets": n_buckets,
        "block": BLOCK,
        "layout": "compacted",
        "stem": stem,
        "k1": sqltok.K1,
        "b": sqltok.B,
        "build_sec": time.time() - t0,
        "sources": len(src_roots),
    }
    fsio.write_text(spark, paths.stats, json.dumps(stats, indent=2))
    return stats
