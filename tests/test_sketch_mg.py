"""Misra-Gries shrink kernel properties (Ray-free).

The registered heavy_hitter_words query is SQL-checked end-to-end in
test_queries_oracle.py; these pin the kernel guarantees the two-pass
plan relies on.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from consult_ray.functions.sketch import misra_gries_shrink


def _exact(items):
    vals, counts = np.unique(np.asarray(items), return_counts=True)
    return dict(zip(vals.tolist(), counts.astype(int).tolist()))


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=500),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_mg_shrink_bounds(stream, k):
    truth = _exact(stream) if stream else {}
    items = np.array(list(truth.keys()), dtype=np.int64)
    weights = np.array(list(truth.values()), dtype=np.int64)
    out_i, out_w = misra_gries_shrink(items, weights, k)
    assert len(out_i) <= max(k, len(items) if len(items) <= k else 0)
    got = dict(zip(out_i.tolist(), out_w.tolist()))
    n = len(stream)
    # every kept weight underestimates by the same offset, bounded by
    # n/(k+1) (the k+1 largest weights each >= offset)
    offsets = {truth[i] - w for i, w in got.items()}
    assert len(offsets) <= 1
    off = offsets.pop() if offsets else 0
    assert 0 <= off <= n // (k + 1)
    # the core guarantee: any item with true count > n/(k+1) survives
    for item, c in truth.items():
        if c > n // (k + 1):
            assert item in got, (item, c, n, k)
    # weights stay positive
    assert (out_w > 0).all() if len(out_w) else True


def test_mg_shrink_small_passthrough():
    items = np.array([1, 2, 3], dtype=np.int64)
    weights = np.array([5, 1, 9], dtype=np.int64)
    out_i, out_w = misra_gries_shrink(items, weights, 3)
    assert out_i.tolist() == [1, 2, 3] and out_w.tolist() == [5, 1, 9]
