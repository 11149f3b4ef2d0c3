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


def minhash_signatures(
    hashes: np.ndarray, starts: np.ndarray, cfg: PipelineConfig
) -> np.ndarray:
    """(n_docs, P) uint64 MinHash signature matrix.

    Permutation i is the multiply-shift universal hash a_i*h + b_i over the
    doc's shingle-hash set; min taken per doc via segmented reduction.
    Segments must be non-empty (guaranteed by rolling_shingle_hashes).
    """
    n_docs = len(starts)
    P = cfg.num_perm
    out = np.empty((n_docs, P), dtype=np.uint64)
    if n_docs == 0:
        return out
    a, b = cfg.minhash_a, cfg.minhash_b
    for i in range(P):
        perm = hashes * a[i] + b[i]
        out[:, i] = np.minimum.reduceat(perm, starts)
    return out


def simhash_signatures(hashes: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """(n_docs,) uint64 SimHash: bit j set iff >= half the doc's shingle
    hashes have bit j set (ties round up, deterministically).

    64 one-dimensional segmented reductions (shift+mask+reduceat per bit)
    — an order of magnitude faster than unpacking to a (m, 64) bit matrix
    and reducing along axis 0, which hits numpy's slow strided reduceat."""
    n_docs = len(starts)
    if n_docs == 0 or len(hashes) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    n = len(hashes)
    seg_lens = np.diff(np.append(starts, n)).astype(np.int64)
    out = np.zeros(n_docs, dtype=np.uint64)
    one = U64(1)
    for j in range(64):
        bitj = (hashes >> U64(j)) & one          # uint64 0/1 per shingle
        cnt = np.add.reduceat(bitj, starts)       # per-doc popcount of bit j
        majority = (cnt.astype(np.int64) * 2) >= seg_lens
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
