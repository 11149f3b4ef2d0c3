"""Unit tests for the vectorized hashing kernels (no Ray needed)."""

import numpy as np
import pytest

from consult_ray.functions.hashing import (
    ROLL_BASE,
    popcount64,
    rolling_shingle_hashes,
    segment_offsets,
    splitmix64,
)


def _naive_window_hashes(data: bytes, k: int) -> list[int]:
    """Reference polynomial hash: h = sum(byte_j * BASE^(k-1-j)) mod 2^64,
    SplitMix64-finalized — what rolling_shingle_hashes must reproduce."""
    base = int(ROLL_BASE)
    out = []
    for p in range(len(data) - k + 1):
        h = 0
        for j in range(k):
            h = (h * base + data[p + j]) % 2**64
        out.append(int(splitmix64(np.uint64(h))[()]))
    return out


def _pack(docs: list[bytes]):
    concat = np.frombuffer(b"".join(docs), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(d) for d in docs]).astype(np.int64)
    return concat, offsets


def test_rolling_matches_naive():
    docs = [b"the quick brown fox jumps over the lazy dog", b"hello world, hashing!"]
    k = 8
    concat, offsets = _pack(docs)
    hashes, doc_ids = rolling_shingle_hashes(concat, offsets, k)
    for i, d in enumerate(docs):
        got = hashes[doc_ids == i].tolist()
        assert got == _naive_window_hashes(d, k)


def test_no_cross_doc_windows():
    docs = [b"aaaaaaaaaa", b"bbbbbbbbbb"]
    k = 4
    concat, offsets = _pack(docs)
    hashes, doc_ids = rolling_shingle_hashes(concat, offsets, k)
    # each doc yields len-k+1 windows, none spanning the boundary
    assert (doc_ids == 0).sum() == 7
    assert (doc_ids == 1).sum() == 7
    # all windows within one run of a single char hash identically
    assert len(set(hashes[doc_ids == 0].tolist())) == 1


def test_short_and_empty_docs():
    docs = [b"tiny", b"", b"exactly8", b"this one is long enough for k=8"]
    k = 8
    concat, offsets = _pack(docs)
    hashes, doc_ids = rolling_shingle_hashes(concat, offsets, k)
    # every doc contributes >= 1 shingle (whole-doc fallback)
    assert set(doc_ids.tolist()) == {0, 1, 2, 3}
    starts = segment_offsets(doc_ids, len(docs))
    assert starts.tolist() == [0, 1, 2, 3]
    # identical short docs hash identically across batches
    h2, _ = rolling_shingle_hashes(*_pack([b"tiny"]), k)
    assert hashes[0] == h2[0]


def test_exact_k_doc_uses_rolling_path():
    # len == k: exactly one window; must match the naive hash
    d = b"exactlyk"
    concat, offsets = _pack([d])
    hashes, doc_ids = rolling_shingle_hashes(concat, offsets, 8)
    assert hashes.tolist() == _naive_window_hashes(d, 8)


def test_popcount64():
    x = np.array([0, 1, 3, 2**64 - 1, 2**63], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 64, 1]


def test_splitmix_deterministic_and_mixing():
    a = splitmix64(np.arange(1000, dtype=np.uint64))
    b = splitmix64(np.arange(1000, dtype=np.uint64))
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == 1000


# --- property tests (hypothesis) -------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=50, deadline=None)
@given(
    docs=st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=6),
    k=st.integers(min_value=2, max_value=40),
)
def test_rolling_matches_naive_property(docs, k):
    """For arbitrary byte docs and widths, the vectorized prefix-sum
    rolling hash must equal the naive per-window polynomial hash; docs
    shorter than k get exactly one whole-doc fallback hash."""
    concat, offsets = _pack(docs)
    hashes, doc_ids = rolling_shingle_hashes(concat, offsets, k)
    for i, d in enumerate(docs):
        got = hashes[doc_ids == i].tolist()
        if len(d) >= k:
            assert got == _naive_window_hashes(d, k), (i, d, k)
        else:
            assert len(got) == 1


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=200))
def test_splitmix64_bijective_property(vals):
    """SplitMix64 is a bijection on uint64: distinct inputs give
    distinct outputs."""
    x = np.array(vals, dtype=np.uint64)
    assert len(np.unique(splitmix64(np.unique(x)))) == len(np.unique(x))


def test_batch_doc_hash_matches_scalar():
    """hash_bytes_batch_u64 (the vectorized exact-dedup content key) must
    be bit-identical to hash_bytes_u64 per doc, across chunk boundaries,
    empty and short docs."""
    from consult_ray.functions.hashing import hash_bytes_batch_u64, hash_bytes_u64

    rng = np.random.default_rng(3)
    docs = [
        b"", b"a", b"hello world",
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),   # exactly one chunk
        bytes(rng.integers(0, 256, 65537, dtype=np.uint8)),   # crosses chunks
        bytes(rng.integers(0, 256, 200_001, dtype=np.uint8)),
        b"", b"tail",
    ]
    concat, offsets = _pack(docs)
    got = hash_bytes_batch_u64(concat, offsets)
    want = np.array([hash_bytes_u64(d) for d in docs], dtype=np.uint64)
    assert (got == want).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=70), min_size=0, max_size=40),
    cap=st.integers(min_value=1, max_value=32),
)
def test_capped_gather_idx_property(sizes, cap):
    """_capped_gather_idx must select exactly the first min(size, cap)
    elements of each run, in order."""
    from consult_ray.state.lookup import _capped_gather_idx

    sizes_arr = np.array(sizes, dtype=np.int64)
    starts = np.zeros(len(sizes_arr), dtype=np.int64)
    if len(sizes_arr):
        np.cumsum(sizes_arr[:-1], out=starts[1:])
    idx, keep = _capped_gather_idx(starts, sizes_arr, cap)
    want = []
    for s, n in zip(starts, sizes_arr):
        want.extend(range(int(s), int(s) + min(int(n), cap)))
    assert idx.tolist() == want
    assert keep.tolist() == [min(int(n), cap) for n in sizes_arr]


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                  min_size=0, max_size=200),
    log_p=st.integers(min_value=0, max_value=8),
)
def test_partition_of_property(keys, log_p):
    """Key-range routing: every key maps into [0, P); the mapping is the
    top bits of the unsigned key, so partition boundaries are contiguous
    key ranges (sorting by unsigned key sorts by partition)."""
    from consult_ray.state.library import partition_of

    P = 1 << log_p
    arr = np.array(keys, dtype=np.int64)
    parts = partition_of(arr, P)
    assert ((parts >= 0) & (parts < P)).all()
    u = arr.view(np.uint64)
    order = np.argsort(u)
    assert (np.diff(parts[order]) >= 0).all(), "routing must be range-contiguous"
