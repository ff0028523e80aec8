"""Block-max WAND top-k — document-at-a-time with lazy block decode.

Algorithm per Broder et al., "Efficient query evaluation using a
two-level retrieval process" (CIKM 2003) and Ding & Suel, "Faster
top-k document retrieval using block-max indexes" (SIGIR 2011), both
public literature.  Operates on the block rows produced by
``index_build`` (128-posting blocks with ``max_tfnorm`` metadata and
``first_doc``/``last_doc`` fences): blocks whose upper bound
``idf · max_tfnorm`` cannot lift a document past the running top-k
threshold are *skipped without decoding* — the varbyte decode only runs
for blocks that might matter.

Determinism contract (tested): returns bitwise-identical scores to the
exhaustive executor — contributions for a scored document are summed in
the same sorted-term order, and the ≤-threshold prune combined with
doc-ascending traversal preserves the (score desc, doc_id asc)
tie-break.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from ..functions import sqltok
from . import codec

_INF = np.iinfo(np.int64).max


class _Cursor:
    """Posting cursor over one term's block rows (sorted by first_doc)."""

    def __init__(
        self,
        blocks: pd.DataFrame,
        idf: float,
        avgdl: float,
        order: int,
        counters: dict | None = None,
    ):
        self.idf = idf
        self.order = order  # original sorted-term index (determinism)
        self.avgdl = avgdl
        self.counters = counters
        if counters is not None:
            counters["blocks_total"] = counters.get("blocks_total", 0) + len(blocks)
        self.first = blocks["first_doc"].to_numpy(dtype=np.int64)
        self.last = blocks["last_doc"].to_numpy(dtype=np.int64)
        # block upper bound from (max_tf, min_dl): tfnorm is monotone
        # ↑tf / ↓dl, so tfnorm(max_tf, min_dl) ≥ any tfnorm in the block
        max_tf = blocks["max_tf"].to_numpy(dtype=np.float64)
        min_dl = blocks["min_dl"].to_numpy(dtype=np.float64)
        self.block_ubs = idf * (max_tf * (sqltok.K1 + 1.0)) / (
            max_tf + sqltok.K1 * (1.0 - sqltok.B + sqltok.B * min_dl / avgdl)
        )
        self.docs_b = blocks["docs"].tolist()
        self.tfs_b = blocks["tfs"].tolist()
        self.dls_b = blocks["dls"].tolist()
        self.bi = 0
        self.docs: np.ndarray | None = None
        self.tfn: np.ndarray | None = None
        self.pi = 0
        self.global_ub = float(self.block_ubs.max())
        self._decode()
        self.cur = int(self.docs[0]) if self.docs is not None and self.docs.size else _INF

    def _decode(self) -> None:
        if self.bi >= len(self.docs_b):
            self.docs = None
            self.tfn = None
            return
        if self.counters is not None:
            self.counters["blocks_decoded"] = self.counters.get("blocks_decoded", 0) + 1
            # no cross-query sharing on this path: logical == fresh
            self.counters["blocks_logical"] = self.counters.get("blocks_logical", 0) + 1
        d = codec.delta_decode(self.docs_b[self.bi]).astype(np.int64)
        tf = codec.vb_decode(self.tfs_b[self.bi]).astype(np.float64)
        dl = codec.vb_decode(self.dls_b[self.bi]).astype(np.float64)
        self.docs = d
        self.tfn = (tf * (sqltok.K1 + 1.0)) / (
            tf + sqltok.K1 * (1.0 - sqltok.B + sqltok.B * dl / self.avgdl)
        )
        self.pi = 0

    def block_ub(self) -> float:
        """Upper bound of the current block's contribution."""
        if self.bi >= len(self.first):
            return 0.0
        return float(self.block_ubs[self.bi])

    def block_last(self) -> int:
        if self.bi >= len(self.last):
            return _INF
        return int(self.last[self.bi])

    def contribution(self) -> float:
        assert self.docs is not None and int(self.docs[self.pi]) == self.cur
        return float(self.idf * self.tfn[self.pi])

    def advance(self) -> None:
        """Move to the next posting."""
        if self.docs is None:
            self.cur = _INF
            return
        self.pi += 1
        if self.pi >= self.docs.size:
            self.bi += 1
            self._decode()
            if self.docs is None:
                self.cur = _INF
                return
        self.cur = int(self.docs[self.pi])

    def next_geq(self, target: int) -> None:
        """Skip to the first posting with doc >= target.  Whole blocks
        whose last_doc < target are passed over by metadata alone."""
        if self.cur >= target:
            return
        # metadata-only block skip
        nb = len(self.last)
        new_bi = self.bi
        while new_bi < nb and self.last[new_bi] < target:
            new_bi += 1
        if new_bi >= nb:
            self.docs = None
            self.cur = _INF
            self.bi = new_bi
            return
        if new_bi != self.bi or self.docs is None:
            self.bi = new_bi
            self._decode()
        self.pi += int(np.searchsorted(self.docs[self.pi:], target, side="left"))
        if self.pi >= self.docs.size:  # defensive; last >= target ensures not
            self.bi += 1
            self._decode()
            if self.docs is None:
                self.cur = _INF
                return
        self.cur = int(self.docs[self.pi])


def wand_topk(
    term_blocks: list[pd.DataFrame],
    idfs: list[float],
    k: int,
    avgdl: float,
    counters: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND over one doc-range chunk → (docs, scores) sorted
    by (score desc, doc asc), at most k entries.  ``counters`` (optional
    dict) accumulates ``blocks_total`` / ``blocks_decoded`` — the
    decode-avoidance evidence, zero cost when None."""
    cursors = [
        _Cursor(b, w, avgdl, i, counters)
        for i, (b, w) in enumerate(zip(term_blocks, idfs))
    ]
    cursors = [c for c in cursors if c.cur != _INF]
    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    theta = -np.inf

    while cursors:
        cursors.sort(key=lambda c: c.cur)
        # pivot: first prefix whose summed global UBs can beat theta
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(cursors):
            acc += c.global_ub
            if acc > theta or len(heap) < k:
                pivot_i = i
                break
        if pivot_i == -1:
            break
        pivot_doc = cursors[pivot_i].cur
        if pivot_doc == _INF:
            break

        if cursors[0].cur == pivot_doc:
            # all cursors in [0..pivot_i] (and possibly more) aligned
            aligned = [c for c in cursors if c.cur == pivot_doc]
            # block-max refinement: current blocks' UBs
            ub_block = sum(c.block_ub() for c in aligned)
            if len(heap) >= k and ub_block <= theta:
                # skip past the shortest aligned block, but never past
                # the next non-aligned cursor (it could add new mass)
                d = min(c.block_last() for c in aligned) + 1
                others = [c.cur for c in cursors if c.cur > pivot_doc]
                if others:
                    d = min(d, min(others))
                for c in aligned:
                    c.next_geq(d)
            else:
                # score the pivot; sum in sorted-term order (determinism)
                score = 0.0
                for c in sorted(aligned, key=lambda c: c.order):
                    score += c.contribution()
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        theta = heap[0][0]
                elif score > theta:
                    heapq.heapreplace(heap, (score, -pivot_doc))
                    theta = heap[0][0]
                for c in aligned:
                    c.advance()
        else:
            # advance the laggard to the pivot
            cursors[0].next_geq(pivot_doc)
        cursors = [c for c in cursors if c.cur != _INF]

    if not heap:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.array([-nd for _, nd in heap], dtype=np.int64)
    scores = np.array([s for s, _ in heap], dtype=np.float64)
    order = np.lexsort((docs, -scores))
    return docs[order], scores[order]
