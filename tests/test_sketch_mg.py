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


def test_qsketch_rank_error_bounded():
    """Kernel-level: a 3-level merge tree (64 blocks, fan-in 16+4) over
    50k skewed values keeps every queried quantile within 1% rank of the
    true CDF at budget 4096, and an unpruned summary is exact."""
    from consult_ray.functions.sketch import (
        qsketch_merge, qsketch_prune, qsketch_quantile,
    )

    rng = np.random.default_rng(17)
    data = np.concatenate([
        rng.integers(0, 500, 30_000),
        (rng.pareto(1.5, 20_000) * 1000).astype(np.int64),
    ]).astype(np.int64)
    B = 4096
    blocks = np.array_split(data, 64)
    l1 = [qsketch_prune(b, np.ones(len(b)), B) for b in blocks]
    l2 = [qsketch_merge(l1[i:i + 16], B) for i in range(0, 64, 16)]
    v, w = qsketch_merge(l2, B)

    srt = np.sort(data)
    n = len(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        got = qsketch_quantile(v, w, q)
        rank = np.searchsorted(srt, got, side="right") / n
        assert abs(rank - q) <= 0.01, (q, got, rank)

    # unpruned summary reproduces exact inverse-CDF semantics
    sv, sw = qsketch_prune(data, np.ones(n), n + 1)
    assert qsketch_quantile(sv, sw, 0.5) == srt[int(np.ceil(0.5 * n)) - 1]


def test_approx_length_quantiles_close_to_exact(ray_session):
    """Query-level: every approximate per-lang quantile lands within 1%
    rank of the exact CDF of the sf0.01 documents table."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    approx = entrymod.queries()["approx_length_quantiles"](sf).to_pandas()
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "n_chars"])
    df = tbl.to_pandas()
    for _, row in approx.iterrows():
        vals = np.sort(df[df.lang == row.lang].n_chars.to_numpy())
        n = len(vals)
        for tag, q in [("p25", .25), ("p50", .5), ("p75", .75), ("p95", .95)]:
            # a discrete value covers a rank INTERVAL (ties); q must fall
            # within it, padded by the sketch's 1% rank tolerance
            lo = np.searchsorted(vals, row[tag], side="left") / n
            hi = np.searchsorted(vals, row[tag], side="right") / n
            assert lo - 0.01 <= q <= hi + 0.01, (row.lang, tag, row[tag], lo, hi)
