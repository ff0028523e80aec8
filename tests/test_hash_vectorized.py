"""Bit-identity of the vectorized FNV-1a token hashers against the
scalar per-character reference loops they replaced (VERDICT r01
'What's wrong' #5 — vectorize without changing any output)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eaststorm_searchengine_spark.operators.dedup import _token_hashes
from eaststorm_searchengine_spark.operators.quality import _tok_hashes32


def _fnv64_scalar(t: str) -> int:
    h = 0xCBF29CE484222325
    for ch in t.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _fnv32_scalar(t: str) -> int:
    h = 2166136261
    for ch in t.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


TOKENS = st.lists(
    st.text(
        alphabet=st.characters(max_codepoint=0x2FFFF, exclude_categories=["Cs"]),
        max_size=40,
    ),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(TOKENS)
def test_fnv64_matches_scalar(tokens):
    got = _token_hashes(tokens)
    want = np.array([_fnv64_scalar(t) for t in tokens], dtype=np.uint64)
    assert got.dtype == np.uint64
    assert np.array_equal(got, want)


@settings(max_examples=200, deadline=None)
@given(TOKENS)
def test_fnv32_matches_scalar(tokens):
    if not tokens:
        return
    got = _tok_hashes32(tokens)
    want = np.array([_fnv32_scalar(t) for t in tokens], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_fnv64_fixed_vectors():
    # empty token = FNV offset basis; ordering preserved across dupes
    toks = ["", "a", "join", "a", "ünïcode"]
    got = [int(x) for x in _token_hashes(toks)]
    assert got[0] == 0xCBF29CE484222325
    assert got == [_fnv64_scalar(t) for t in toks]
