"""Deterministic term hashing shared by build and query paths.

The bucket of a term must be computable from plain Python (the query
planner derives directory-pruning predicates without running a Spark
job), so both build paths and the query use this blake2b-based 63-bit
hash rather than Spark's JVM-only xxhash64.
"""

from __future__ import annotations

import hashlib

_MASK63 = (1 << 63) - 1


def term_hash63(term: str) -> int:
    d = hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & _MASK63


def term_bucket(term: str, n_buckets: int) -> int:
    return term_hash63(term) % n_buckets
