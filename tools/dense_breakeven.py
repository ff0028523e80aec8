"""Microbench: measure the dense-query break-even run length between the exhaustive
scorer and MaxScore (pure numpy/pandas — no Spark).  Synthesizes block
rows shaped like a real chunk: T dense terms, each with R postings in
the chunk (R = run length), doc ids interleaved across the chunk span,
tf zipf-ish.  Times _exhaustive_topk vs maxscore_topk at several R.
Diagnostic for DENSE_LONG_RUN_POSTINGS (bm25.py)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pandas as pd

from eaststorm_searchengine_spark.operators import codec
from eaststorm_searchengine_spark.operators.bm25 import _exhaustive_topk
from eaststorm_searchengine_spark.operators.maxscore import maxscore_topk, _TermPostings

BLOCK = 128
rng = np.random.default_rng(42)


def make_term_blocks(R: int, span: int, seed: int) -> pd.DataFrame:
    r = np.random.default_rng(seed)
    docs = np.sort(r.choice(span, size=R, replace=False)).astype(np.int64)
    tfs = (r.zipf(1.5, size=R).clip(1, 50)).astype(np.int64)
    dls = r.integers(20, 400, size=R).astype(np.int64)
    rows = []
    for s in range(0, R, BLOCK):
        d = docs[s:s + BLOCK]
        t = tfs[s:s + BLOCK]
        l = dls[s:s + BLOCK]
        rows.append({
            "first_doc": int(d[0]), "last_doc": int(d[-1]), "n": int(d.size),
            "max_tf": int(t.max()), "min_dl": int(l.min()),
            "docs": codec.delta_encode(d.astype(np.uint64)),
            "tfs": codec.vb_encode(t.astype(np.uint64)),
            "dls": codec.vb_encode(l.astype(np.uint64)),
        })
    return pd.DataFrame(rows)


def bench_once(R: int, n_terms: int, k: int = 10, reps: int = 5):
    span = max(R * 2, 1 << 18)
    frames = [make_term_blocks(R, span, 100 + i) for i in range(n_terms)]
    # dense terms: all idfs low-ish and similar
    idfs = [0.4 + 0.05 * i for i in range(n_terms)]
    avgdl = 200.0

    def run(fn, shared):
        best = None
        out = None
        for _ in range(reps):
            tb = (
                [_TermPostings(f, w, avgdl) for f, w in zip(frames, idfs)]
                if shared else [f.copy() for f in frames]
            )
            t0 = time.time()
            out = fn(tb, idfs, k, avgdl)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    te, re_ = run(_exhaustive_topk, shared=True)
    tm, rm = run(maxscore_topk, shared=True)
    same = (np.array_equal(re_[0], rm[0]) and np.allclose(re_[1], rm[1], rtol=0, atol=0))
    return te, tm, same


if __name__ == "__main__":
    print(f"{'R':>8} {'terms':>5} {'exh_ms':>8} {'max_ms':>8} {'max/exh':>8} equal")
    for n_terms in (2, 3, 5):
        for R in (4096, 16384, 32768, 65536, 131072, 262144):
            te, tm, same = bench_once(R, n_terms)
            print(f"{R:>8} {n_terms:>5} {te*1000:>8.2f} {tm*1000:>8.2f} {tm/te:>8.2f} {same}")
