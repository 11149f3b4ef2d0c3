"""MinHash / SimHash fingerprints and LSH band keys — vectorized kernels.

This is the web-text recast of CONSULT's signature machinery:
  * SimHash uint64    <- the dual encoding `b`/`b_sig`
                         (/root/reference/main_map.cpp:1221-1256)
  * bit-sampled bands <- encodekmer_bits K-of-32 sampling
                         (/root/reference/main_map.cpp:1319-1338, fixed
                         positions map_fixed_pos/main_map_fixed_pos.cpp:423-424)
  * MinHash P x u64   <- the minimizer "min over a sliding family"
                         (/root/reference/minimization.cpp:158-180) taken to
                         its modern conclusion (min over P hash permutations)
  * band_key          <- the tag + big_sig_hash row split
                         (/root/reference/main_map.cpp:578-584)

All functions take a flat shingle-hash array plus per-doc segment offsets
(see functions.hashing.rolling_shingle_hashes) and return per-doc arrays.
"""

from __future__ import annotations

import numpy as np

from consult_ray.config import PipelineConfig
from consult_ray.functions.hashing import splitmix64

U64 = np.uint64

_SIMHASH_CHUNK = 1 << 18  # shingles per unpack chunk: 256k * 64 * 1B = 16 MiB


_OPH_VALUE_BITS = 40
_OPH_EMPTY = U64(0xFFFFFFFFFFFFFFFF)


def minhash_signatures(
    hashes: np.ndarray, starts: np.ndarray, cfg: PipelineConfig
) -> np.ndarray:
    """(n_docs, P) uint64 MinHash signature matrix via ONE-PERMUTATION
    HASHING (Li/Owen/Zhang 2012): shingle hashes are binned by their low
    log2(P) bits and the minimum 40-bit value per (doc, bin) is the
    signature entry; empty bins are filled by deterministic rotation
    densification (borrow from the next filled bin, distance-doubling).

    One indexed scatter-min over the batch instead of P full-array
    permutation passes — P=128 classic MinHash moves ~P x 8 bytes per
    shingle through RAM and saturates memory bandwidth long before CPUs
    saturate; OPH is the web-scale form of the same estimator. (The
    previous form packed (doc, bin) keys above the 40-bit value and
    np.sort-ed; np.minimum.at over the flat (doc, bin) grid computes
    the identical minima 4.5x faster on the bench corpus — the indexed
    ufunc loop beats an O(n log n) sort for this shape.) A signature is
    a pure function of the shingle SET (identical sets => identical
    signatures; Jaccard-similar sets agree on ~J of the bins).
    """
    n_docs = len(starts)
    P = cfg.num_perm
    assert P & (P - 1) == 0, "num_perm must be a power of two for OPH"
    out = np.full((n_docs, P), _OPH_EMPTY, dtype=np.uint64)
    if n_docs == 0 or len(hashes) == 0:
        return out
    n = len(hashes)
    seg_lens = np.diff(np.append(starts, n)).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), seg_lens)

    # 40-bit value (high hash bits), (doc, bin) scatter index; the value
    # width is part of the signature format (persisted libraries carry
    # these values) — do not change it
    key = doc_of * P + (hashes & U64(P - 1)).astype(np.int64)
    np.minimum.at(out.reshape(-1), key, hashes >> U64(64 - _OPH_VALUE_BITS))

    # rotation densification with distance doubling: deterministic, and a
    # pure function of the bin contents (docs with identical sets stay
    # identical); borrowed values are mixed with the distance so a bin
    # filled from afar differs from one filled nearby
    shift = 1
    while shift < 2 * P:
        empty = out == _OPH_EMPTY
        if not empty.any():
            break
        donor = np.roll(out, -shift, axis=1)
        ok = empty & (donor != _OPH_EMPTY)
        if ok.any():
            out[ok] = splitmix64(donor[ok] ^ U64(0xD00D + shift))
        shift *= 2
    return out


# shingles per chunk: just under 64k so a 16-bit lane (max 65535) can
# never overflow a within-chunk segment sum; ~512 KiB, L2-resident
_SIMHASH_CACHE_CHUNK = (1 << 16) - 64


def simhash_signatures(hashes: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """(n_docs,) uint64 SimHash: bit j set iff >= half the doc's shingle
    hashes have bit j set (ties round up, deterministically).

    16 one-dimensional segmented reductions, each counting FOUR bits at
    once in packed 16-bit lanes (mask 0x0001000100010001 picks bits j,
    j+16, j+32, j+48; a within-chunk segment sum is <= chunk < 2^16 so
    lanes never carry) — measured 3.1x over the previous one-bit-per-
    pass form on the bench corpus, value-identical integers. Passes are
    CACHE-BLOCKED: the shingle array is processed in L2-sized chunks so
    the bit passes re-read cache, not RAM (the unblocked form moves the
    array through memory per pass and starves parallel workers of
    bandwidth). Per-doc counts accumulate across chunks in int64.
    (Measured alternatives — byte-LUT gather or np.unpackbits into an
    (m, 64) bit matrix + one axis-0 reduceat / cumsum — are 2.5-20x
    SLOWER than contiguous 1-D passes; keep this form.)"""
    n_docs = len(starts)
    if n_docs == 0 or len(hashes) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    n = len(hashes)
    seg_lens = np.diff(np.append(starts, n)).astype(np.int64)
    counts = np.zeros((64, n_docs), dtype=np.int64)
    lane_mask = U64(0x0001000100010001)
    m16 = U64(0xFFFF)
    for lo in range(0, n, _SIMHASH_CACHE_CHUNK):
        hi = min(lo + _SIMHASH_CACHE_CHUNK, n)
        sub = np.ascontiguousarray(hashes[lo:hi])
        d0 = int(np.searchsorted(starts, lo, side="right")) - 1
        d1 = int(np.searchsorted(starts, hi, side="left"))
        local_starts = (starts[d0:d1] - lo).clip(min=0)
        for j in range(16):
            lanes = (sub >> U64(j)) & lane_mask
            s = np.add.reduceat(lanes, local_starts)
            counts[j, d0:d1] += (s & m16).astype(np.int64)
            counts[j + 16, d0:d1] += ((s >> U64(16)) & m16).astype(np.int64)
            counts[j + 32, d0:d1] += ((s >> U64(32)) & m16).astype(np.int64)
            counts[j + 48, d0:d1] += ((s >> U64(48)) & m16).astype(np.int64)
    out = np.zeros(n_docs, dtype=np.uint64)
    for j in range(64):
        majority = (counts[j] * 2) >= seg_lens
        out |= majority.astype(np.uint64) << U64(j)
    return out


def simhash_band_keys(simhash: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """(n_docs, L) uint64 bit-sampled band keys from the SimHash.

    Band l gathers cfg.band_positions[l] (K fixed bit positions) into a
    K-bit integer — the analog of encodekmer_bits + the tag/row split
    (/root/reference/main_map.cpp:1319-1338, 578-584). The key is then
    mixed with the band index so different bands never collide in a
    single hash-keyed shuffle.
    """
    pos = cfg.band_positions  # (L, K)
    L, K = pos.shape
    n = len(simhash)
    out = np.empty((n, L), dtype=np.uint64)
    weights = (U64(1) << np.arange(K, dtype=np.uint64))
    for l in range(L):
        bits = (simhash[:, None] >> pos[l].astype(np.uint64)) & U64(1)  # (n, K)
        raw = (bits * weights).sum(axis=1, dtype=np.uint64)
        out[:, l] = splitmix64(raw ^ splitmix64(np.uint64(l + 0x5B00)))
    return out


def minhash_band_keys(minhash: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """(n_docs, b) uint64 banded MinHash keys: band j hashes rows
    [j*r, (j+1)*r) of the signature together (classic b x r LSH)."""
    n, P = minhash.shape
    b, r = cfg.minhash_bands, cfg.minhash_rows
    bands = minhash.reshape(n, b, r)
    acc = np.zeros((n, b), dtype=np.uint64)
    for j in range(r):
        acc = splitmix64(acc ^ bands[:, :, j])
    band_seed = splitmix64(np.arange(b, dtype=np.uint64) + U64(0xA11CE))
    return splitmix64(acc ^ band_seed[None, :])


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard similarity from two (n, P) signature matrices."""
    return (sig_a == sig_b).mean(axis=1)
