"""Text-analysis operators for training-data pipelines (build brief):
language ID (stopword/n-gram heuristic), quality scoring, token
counting, and rolling-hash document fingerprinting.  All JVM-side
column expressions except the fingerprint (vectorized pandas UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..functions import sqltok

# tiny per-language ASCII stopword lists for the heuristic scorer
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "las", "que", "es", "por", "con", "una"],
    "fr": ["le", "la", "les", "des", "est", "que", "dans", "pour", "une"],
}

ENGLISH_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "are", "was"]


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars_text) via the shared SQL tokenizer —
    whitespace tokens after reference normalization."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(sqltok.tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_text"),
    ).orderBy("doc_id")


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features per doc: token count, mean token
    length, stopword ratio, alnum ratio — the standard cheap filters of
    webtext pipelines (e.g. C4/Gopher rules; public literature)."""
    toks = sqltok.tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alnum_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, v: a + v) / n_tok)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("mean_token_len"),
        F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)), 6).alias("stopword_ratio"),
        F.round(
            F.when(F.length(F.col(text_col)) > 0, alnum_chars / F.length(F.col(text_col)))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("alnum_ratio"),
    ).orderBy("doc_id")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts; 'und' (undetermined) when nothing matches.  Deterministic
    tie-break: language code ascending."""
    toks = sqltok.tokens_col(F.col(text_col))
    scores = []
    for lang in sorted(_LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                (-F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_min(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
    ).orderBy("doc_id")


_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def _tok_hashes32(tokens: list[str]) -> "object":
    """Vectorized 32-bit FNV-1a per token (unique tokens hashed once
    via a padded byte matrix; bit-identical to the scalar loop)."""
    import numpy as np

    uniq_arr, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    enc = [t.encode() for t in uniq_arr]
    lens = np.fromiter((len(b) for b in enc), count=len(enc), dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    h = np.full(len(enc), 2166136261, dtype=np.uint64)
    if maxlen:
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(maxlen)
        idx = offs[:, None] + pos[None, :]
        valid = pos[None, :] < lens[:, None]
        mat = np.zeros((len(enc), maxlen), dtype=np.uint64)
        mat[valid] = flat[idx[valid]]
        prime = np.uint64(16777619)
        mask = np.uint64(0xFFFFFFFF)
        for j in range(maxlen):
            h = np.where(valid[:, j], ((h ^ mat[:, j]) * prime) & mask, h)
    return h[inv]


@pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    """Rolling polynomial hash fingerprint: min over 8-token windows
    (winnowing-lite; Schleimer et al. 2003, public literature).  Token
    hash is FNV-1a (seed-independent, unlike Python's hash()),
    vectorized across tokens."""

    def fp(s: str) -> int:
        toks = (s or "").split()
        if not toks:
            return 0
        hs = [int(x) for x in _tok_hashes32(toks)]
        window = 8
        if len(hs) < window:
            acc = 0
            for h in hs:
                acc = (acc * _FP_BASE + h) % _FP_MOD
            return acc
        best = None
        acc = 0
        power = pow(_FP_BASE, window - 1, _FP_MOD)
        for i, h in enumerate(hs):
            acc = (acc * _FP_BASE + h) % _FP_MOD
            if i >= window:
                acc = (acc - hs[i - window] * power) % _FP_MOD
            if i >= window - 1:
                best = acc if best is None else min(best, acc)
        return best

    return text.map(fp)


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), fingerprint_udf(F.col(text_col)).alias("fingerprint")
    ).orderBy("doc_id")
