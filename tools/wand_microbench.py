"""Block-max WAND microbenchmark — decode-avoidance evidence.

The driver's synthetic documents have a 31-term vocabulary where every
term matches most documents (worst case for WAND: uniform idf, nothing
to skip).  Real webtext is Zipf-distributed, which is where block-max
skipping pays.  This microbench builds an in-memory Zipf corpus
(deterministic, numpy-generated posting lists — no external data),
runs both executors on identical inputs, verifies identical results,
and reports wall time plus the fraction of blocks each executor
decoded.

Run: python tools/wand_microbench.py  → one JSON line (recorded in
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eaststorm_searchengine_spark.operators import codec, wand
from eaststorm_searchengine_spark.operators.bm25 import _exhaustive_topk, bm25_idf
from eaststorm_searchengine_spark.operators.maxscore import maxscore_topk
from eaststorm_searchengine_spark.operators.index_build import BLOCK

N_DOCS = 500_000
AVG_DL = 100.0


def zipf_postings(rank: int, n_docs: int, rng: np.random.RandomState):
    """Posting list for the rank-th most frequent term (Zipf df)."""
    df = max(int(n_docs / (rank + 1)), 50)
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = rng.zipf(2.0, size=df).clip(1, 50).astype(np.int64)
    dls = rng.randint(20, 300, size=df).astype(np.int64)
    return docs, tfs, dls


def to_blocks(docs, tfs, dls) -> pd.DataFrame:
    rows = []
    for s in range(0, len(docs), BLOCK):
        e = min(s + BLOCK, len(docs))
        rows.append(
            {
                "first_doc": int(docs[s]),
                "last_doc": int(docs[e - 1]),
                "n": e - s,
                "max_tf": int(tfs[s:e].max()),
                "min_dl": int(dls[s:e].min()),
                "docs": codec.delta_encode(docs[s:e].astype(np.uint64)),
                "tfs": codec.vb_encode(tfs[s:e].astype(np.uint64)),
                "dls": codec.vb_encode(dls[s:e].astype(np.uint64)),
            }
        )
    return pd.DataFrame(rows)


def main() -> None:
    rng = np.random.RandomState(42)
    # query mixes: one frequent term + selective terms (the WAND sweet
    # spot), plus an all-frequent query (the worst case)
    term_ranks = {
        "freq0": 0, "freq1": 1, "mid50": 50, "mid100": 100,
        "rare500": 500, "rare1000": 1000,
    }
    blocks = {}
    dfs = {}
    for name, r in term_ranks.items():
        d, t, l = zipf_postings(r, N_DOCS, rng)
        blocks[name] = to_blocks(d, t, l)
        dfs[name] = len(d)

    queries = [
        ["freq0", "rare500"],
        ["freq0", "rare1000"],
        ["freq1", "mid100", "rare500"],
        ["mid50", "rare1000"],
        ["freq0", "freq1"],  # worst case: nothing selective
    ]

    # instrument decode counts
    decode_calls = {"n": 0}
    orig = wand._Cursor._decode

    def counting_decode(self):
        if self.bi < len(self.docs_b):
            decode_calls["n"] += 1
        return orig(self)

    results = []
    k = 10
    for q in queries:
        frames = [blocks[t] for t in q]
        idfs = [bm25_idf(dfs[t], N_DOCS) for t in q]
        total_blocks = sum(len(f) for f in frames)

        t0 = time.time()
        d1, s1 = _exhaustive_topk(frames, idfs, k, AVG_DL)
        t_ex = time.time() - t0

        wand._Cursor._decode = counting_decode
        decode_calls["n"] = 0
        t0 = time.time()
        d2, s2 = wand.wand_topk(frames, idfs, k, AVG_DL)
        t_wand = time.time() - t0
        wand._Cursor._decode = orig

        cms: dict = {}
        t0 = time.time()
        d3, s3 = maxscore_topk(frames, idfs, k, AVG_DL, counters=cms)
        t_ms = time.time() - t0

        assert d1.tolist() == d2.tolist() == d3.tolist(), q
        assert s1.tolist() == s2.tolist() == s3.tolist(), q
        results.append(
            {
                "query": "+".join(q),
                "total_blocks": total_blocks,
                "wand_blocks_decoded": decode_calls["n"],
                "decode_fraction": round(decode_calls["n"] / total_blocks, 4),
                "maxscore_decode_fraction": round(
                    cms["blocks_decoded"] / cms["blocks_total"], 4
                ),
                "exhaustive_sec": round(t_ex, 4),
                "wand_sec": round(t_wand, 4),
                "maxscore_sec": round(t_ms, 4),
            }
        )

    print(json.dumps({"n_docs": N_DOCS, "k": k, "identical_results": True,
                      "queries": results}))


if __name__ == "__main__":
    main()
