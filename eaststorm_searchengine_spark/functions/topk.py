"""Shared TakeOrdered-shaped local prune.

Every per-query top-k tail in the engine (BM25 DataFrame scorer, the
three ANN paths, the composite ranker) ends in a global rank window
partitioned by query — a single-reducer sort per query that would scale
with the corpus.  The cure is the same everywhere: each partition first
keeps its LOCAL per-group top-k under the exact total order the global
window uses.  Correctness: any row in the global top-k is necessarily
within its own partition's top-k under the same total order, so the
prune is a superset of the final result; the tie-break order being
defined in ONE place is the point of this module (code-review r04 —
three hand-copied variants had to stay in sync by discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_group_topk(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    ascending: list[bool],
    k: int,
) -> DataFrame:
    """Per-partition, per-``group_col`` top-``k`` under
    (``order_cols``, ``ascending``) — mapInPandas, no shuffle, schema
    preserved.  Feed the result to the global rank window with the
    SAME ordering."""
    schema = df.schema

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values([group_col, *order_cols],
                                    ascending=[True, *ascending])
                    .groupby(group_col, sort=False)
                    .head(k)
                )
            else:
                yield pdf

    return df.mapInPandas(gen, schema)
