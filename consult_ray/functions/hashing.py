"""64-bit hashing kernels (vectorized, deterministic).

Replaces CONSULT's 2-bit DNA packing + bit-sampled signature machinery
(encodekmer /root/reference/main_map.cpp:1221-1256, encodekmer_bits
main_map.cpp:1319-1338) with generic text-oriented 64-bit hashes:
a polynomial rolling hash over byte shingles plus a SplitMix64 finalizer
(Vigna 2015, public domain constants).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

# SplitMix64 constants (public domain; Vigna, "Further scramblings of
# Marsaglia's xorshift generators").
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)

# Polynomial rolling-hash base: odd => invertible mod 2^64.
ROLL_BASE = U64(0x100000001B3)  # FNV-ish odd constant
# modular inverse of ROLL_BASE mod 2^64 (pow(base, -1, 2**64))
ROLL_BASE_INV = U64(pow(0x100000001B3, -1, 2**64))


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized SplitMix64 finalizer over uint64 (wraparound intended)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64)
        x = (x + _SM_GAMMA)
        x = (x ^ (x >> U64(30))) * _SM_M1
        x = (x ^ (x >> U64(27))) * _SM_M2
        return x ^ (x >> U64(31))


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Scalar 64-bit hash of a whole byte string (docs shorter than the
    shingle width fall back to this — the analog of CONSULT skipping
    tokens < SL at /root/reference/main_search.cpp:777, except we keep
    one whole-doc shingle so short docs still dedup)."""
    a = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = ROLL_BASE
    with np.errstate(over="ignore"):
        h = U64(seed) + U64(len(data))
        for chunk_start in range(0, len(a), 65536):
            chunk = a[chunk_start : chunk_start + 65536]
            powers = _powers_cached(base, len(chunk))[::-1]
            h = h * _pow_mod64(base, len(chunk)) + U64(
                np.sum(chunk * powers, dtype=np.uint64)
            )
    return int(splitmix64(h)[()])


def hash_bytes_batch_u64(
    concat: np.ndarray, offsets: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Whole-string hash for every doc in a batch, fully vectorized —
    bit-identical to hash_bytes_u64 per doc (same prefix-sum formulation
    as rolling_shingle_hashes with the window = the whole doc). This is
    the exact-dedup content key; the per-row Python-loop form it
    replaces was the hottest non-vectorized stage in the repo.

    Args:
        concat: uint8 array, concatenated UTF-8 bytes of all docs.
        offsets: int64 array of length n_docs+1.
    Returns:
        uint64 array of per-doc hashes.
    """
    lens = np.diff(offsets).astype(np.int64)
    total = int(offsets[-1])
    with np.errstate(over="ignore"):
        inv_pows = _powers_cached(ROLL_BASE_INV, total)
        S = np.empty(total + 1, dtype=np.uint64)
        S[0] = U64(0)
        np.cumsum(concat[:total].astype(np.uint64) * inv_pows, out=S[1:])
        pows = _powers_cached(ROLL_BASE, total + 1)
        lo = offsets[:-1].astype(np.int64)
        hi = offsets[1:].astype(np.int64)
        # sum_j data[j] * BASE^{len-1-(j-lo)} = BASE^{hi-1} * (S[hi]-S[lo])
        body = np.where(
            lens > 0, pows[np.maximum(hi - 1, 0)] * (S[hi] - S[lo]), U64(0)
        )
        header = (U64(seed) + lens.astype(np.uint64)) * pows[lens]
        return splitmix64(header + body)


def _pow_mod64(base: np.uint64, n: int) -> np.uint64:
    return U64(pow(int(base), n, 2**64))


def _powers(base: np.uint64, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod 2^64.

    Prefix doubling (out[m:2m] = out[:m] * base^m): log2(n) SIMD
    multiplies instead of multiply.accumulate's scalar dependency chain
    — ~20x faster to fill the 2^21-entry per-process cache, which is
    the dominant cold-start cost of a fresh fingerprint worker."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    out[0] = U64(1)
    m = 1
    while m < n:
        step = min(m, n - m)
        np.multiply(out[:step], out[m - 1] * base, out=out[m : m + step])
        m += step
    return out


# Per-process cache of power tables for the two fixed bases: the
# sequential multiply.accumulate is the single most expensive part of a
# batch hash pass (measured ~45% of rolling_shingle_hashes), and the
# bases never change — compute once per worker, slice forever.
_POW_CACHE: dict[int, np.ndarray] = {}


def _powers_cached(base: np.uint64, n: int) -> np.ndarray:
    arr = _POW_CACHE.get(int(base))
    if arr is None or len(arr) < n:
        size = max(n, 1 << 21, 0 if arr is None else 2 * len(arr))
        with np.errstate(over="ignore"):
            _POW_CACHE[int(base)] = _powers(base, size)
        arr = _POW_CACHE[int(base)]
    return arr[:n]


def rolling_shingle_hashes(
    concat: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte shingle hashes for a batch of documents, fully vectorized.

    The analog of CONSULT's O(1) rolling k-mer update (update_kmer,
    /root/reference/main_search.cpp:1169-1200) — but vectorized across the
    entire batch using a prefix-sum formulation: with S[i] = sum_{j<i}
    data[j] * BASE^{-j} (mod 2^64), the polynomial hash of window [p, p+k)
    equals BASE^{p+k-1} * (S[p+k] - S[p]).

    Args:
        concat: uint8 array, the concatenated UTF-8 bytes of all docs.
        offsets: int64 array of length n_docs+1; doc i spans
            concat[offsets[i]:offsets[i+1]].
        k: shingle width in bytes.

    Returns:
        (hashes, doc_ids): uint64 shingle hashes (SplitMix64-finalized) and
        the int64 doc index (position within the batch) of each shingle.
        Docs shorter than k contribute one whole-doc shingle.
        Empty docs contribute one hash of the empty string.
    """
    n_docs = len(offsets) - 1
    total = int(offsets[-1])
    lens = np.diff(offsets)

    out_hashes: list[np.ndarray] = []
    out_docs: list[np.ndarray] = []

    long_mask = lens >= k
    if total >= k and long_mask.any():
        with np.errstate(over="ignore"):
            # S[i] = sum_{j<i} data[j] * BASE^{-j}  (mod 2^64)
            inv_pows = _powers_cached(ROLL_BASE_INV, total)
            # explicit cast first: numpy's mixed uint8 x uint64 loop is
            # ~40x slower than astype + same-dtype SIMD multiply
            weighted = concat[:total].astype(np.uint64) * inv_pows
            S = np.empty(total + 1, dtype=np.uint64)
            S[0] = U64(0)
            np.cumsum(weighted, out=S[1:])

            n_windows = total - k + 1
            # a window starting at byte p is valid iff it stays inside
            # p's doc: invalid starts are the last min(k-1, len_i) byte
            # positions of each doc. Build the mask by writing only
            # those ~(k-1)*n_docs boundary positions (the previous
            # full-width doc-of/pos-in-doc repeats moved 2 int64 arrays
            # of EVERY byte position — measured ~30% of this kernel)
            n_docs_l = len(offsets) - 1
            cnt = np.minimum(lens, k - 1)
            tot_inv = int(cnt.sum())
            grp_off = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            inv_idx = (
                np.repeat(offsets[1:] - cnt, cnt)
                + np.arange(tot_inv, dtype=np.int64)
                - np.repeat(grp_off, cnt)
            )
            valid = np.ones(n_windows, dtype=bool)
            valid[inv_idx[inv_idx < n_windows]] = False

            # h = BASE^{p+k-1} * (S[p+k] - S[p]) — contiguous slices over
            # ALL window positions then one boolean compress (gathers over
            # strided index arrays measured ~2x slower)
            pows = _powers_cached(ROLL_BASE, total + k)
            h_all = pows[k - 1: k - 1 + n_windows] * (S[k: k + n_windows] - S[:n_windows])
            out_hashes.append(splitmix64(h_all[valid]))
            # valid windows are position-ordered, so their doc ids are
            # the nondecreasing per-doc repeat of max(len-k+1, 0)
            out_docs.append(np.repeat(
                np.arange(n_docs_l, dtype=np.int64),
                np.maximum(lens - (k - 1), 0),
            ))

    short_idx = np.nonzero(~long_mask)[0]
    if len(short_idx):
        sh = np.empty(len(short_idx), dtype=np.uint64)
        for j, i in enumerate(short_idx):
            lo, hi = int(offsets[i]), int(offsets[i + 1])
            sh[j] = hash_bytes_u64(concat[lo:hi].tobytes(), seed=k)
        out_hashes.append(sh)
        out_docs.append(short_idx.astype(np.int64))

    if not out_hashes:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    if len(out_hashes) == 1:
        # single source (all-long or all-short docs): already grouped by
        # doc in ascending order — skip the merge sort entirely
        return out_hashes[0], out_docs[0]

    hashes = np.concatenate(out_hashes)
    doc_ids = np.concatenate(out_docs)
    # group shingles by doc (stable) so downstream reduceat segments work
    order = np.argsort(doc_ids, kind="stable")
    return hashes[order], doc_ids[order]


def segment_offsets(doc_ids: np.ndarray, n_docs: int) -> np.ndarray:
    """Start offset of each doc's shingle run in a doc-sorted shingle array.

    Returns int64 array of length n_docs; every doc is guaranteed >=1
    shingle by rolling_shingle_hashes, so segments are non-empty.
    """
    counts = np.bincount(doc_ids, minlength=n_docs)
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return starts


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount — the verify predicate core, analog of
    CONSULT's hd() XOR+popcount (/root/reference/main_search.cpp:1238-1259).
    Byte-LUT: 8 table lookups + sum per word."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if x.ndim == 0:
        return int(bin(int(x)).count("1"))
    return _POP8[x.view(np.uint8)].reshape(x.shape + (8,)).sum(axis=-1, dtype=np.int64)
