"""Property tests for the segmented pair-construction kernel (pure
numpy — no Ray session needed)."""

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from timezonemap_ray.stages.graph import _segmented_pairs


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9), max_size=12))
def test_segmented_pairs_matches_itertools(seg_lens):
    seg = np.asarray(seg_lens, dtype=np.int64)
    pi, pj, ps = _segmented_pairs(seg)
    got = sorted(zip(ps.tolist(), pi.tolist(), pj.tolist()))
    want = sorted(
        (s, i, j)
        for s, n in enumerate(seg_lens)
        for i, j in itertools.combinations(range(n), 2))
    assert got == want


def test_segmented_pairs_empty_and_singletons():
    for seg in ([], [0], [1], [1, 1, 1], [0, 1, 0]):
        pi, pj, ps = _segmented_pairs(np.asarray(seg, dtype=np.int64))
        assert len(pi) == len(pj) == len(ps) == 0


def test_segmented_pairs_counts():
    seg = np.asarray([5, 0, 2, 7, 1], dtype=np.int64)
    pi, pj, ps = _segmented_pairs(seg)
    want_total = sum(n * (n - 1) // 2 for n in seg)
    assert len(pi) == want_total
    # every pair respects i < j and stays within its segment
    assert (pi < pj).all()
    assert (pj < seg[ps]).all()
