"""Count-min sketch (Cormode & Muthukrishnan 2005) for distributed
heavy-hitter (hot band key) detection.

The exact bucket-occupancy census (A3 analog,
/root/reference/main_map.cpp:1167-1197) is a full groupby over every
distinct band key — at web scale that shuffle is as expensive as the
candidate join itself, and all the pipeline needs from it is the tiny
set of keys OVER the bucket cap. A count-min sketch gets that set with
two cheap vectorized passes and no shuffle:

  pass 1: each block folds its band keys into a (depth x width) count
          grid (bincount per depth row); one small row per block.
  pass 2: blocks are summed driver-side (exact, associative, partition-
          independent), the merged sketch is ray.put once, and a filter
          task recovers per-key upper-bound estimates with D gathers.

CMS estimates only ever OVERcount, so thresholding at cap+1 yields a
candidate set that is a deterministic SUPERSET of the true hot keys:
no false negatives, and false positives are harmless to semantics —
capping a bucket that is already under the cap keeps every row.
"""

from __future__ import annotations

import numpy as np

from consult_ray.functions.hashing import splitmix64

U64 = np.uint64


def _cms_indices(keys: np.ndarray, width: int, depth: int, seed: int) -> np.ndarray:
    """(depth, n) bucket indices; width must be a power of two."""
    keys = np.ascontiguousarray(keys).view(np.uint64)
    mask = U64(width - 1)
    out = np.empty((depth, len(keys)), dtype=np.int64)
    for d in range(depth):
        out[d] = (splitmix64(keys ^ U64(seed + 0x9E37 * (d + 1))) & mask).astype(np.int64)
    return out


def cms_block_counts(
    keys: np.ndarray, width: int, depth: int, seed: int,
    saturate: int | None = None,
) -> np.ndarray:
    """(depth, width) count grid for one block of keys.

    saturate=S clips every cell at S and emits uint8 (S <= 255) — valid
    ONLY when the merged grid is used for THRESHOLDING at thr <= S:
    sum_blocks(min(cell_b, S)) >= min(sum_blocks(cell_b), S) >= min(true
    key count, S), so any key with true count >= thr still estimates
    >= thr (the superset guarantee survives), while per-block transit
    drops 4x vs uint32. Never use a saturated grid where the MAGNITUDE
    matters (e.g. salt-group sizing)."""
    idx = _cms_indices(keys, width, depth, seed)
    if saturate is not None:
        assert saturate <= 255
        out = np.empty((depth, width), dtype=np.uint8)
        for d in range(depth):
            np.minimum(
                np.bincount(idx[d], minlength=width), saturate, out=out[d],
                casting="unsafe",
            )
        return out
    out = np.empty((depth, width), dtype=np.uint32)
    for d in range(depth):
        out[d] = np.bincount(idx[d], minlength=width).astype(np.uint32)
    return out


def cms_merge(sketches: list[np.ndarray]) -> np.ndarray:
    """Sum of block grids -> exact global grid (int64)."""
    acc = np.zeros(sketches[0].shape, dtype=np.int64)
    for s in sketches:
        acc += s
    return acc


def cms_estimate(
    sketch: np.ndarray, keys: np.ndarray, width: int, depth: int, seed: int
) -> np.ndarray:
    """Per-key count upper bound: min over depth rows."""
    idx = _cms_indices(keys, width, depth, seed)
    est = sketch[0][idx[0]]
    for d in range(1, depth):
        est = np.minimum(est, sketch[d][idx[d]])
    return est


# ---------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — approximate distinct counting.
# Registers merge by MAX, which a plain groupby-max distributes, so the
# shuffle carries at most 2^p rows per group key regardless of input
# size (the exact COUNT(DISTINCT) path shuffles every distinct pair).
# ---------------------------------------------------------------------

def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros via bit smearing + popcount."""
    x = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    from consult_ray.functions.hashing import popcount64

    return 64 - popcount64(x)


def hll_register_updates(keys: np.ndarray, p: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(register_idx, rho) per key: idx = top p hash bits, rho = 1 +
    leading zeros of the remaining 64-p bits (capped at 64-p+1)."""
    h = splitmix64(np.ascontiguousarray(keys).view(np.uint64) ^ U64(seed))
    idx = (h >> U64(64 - p)).astype(np.int64)
    w = h << U64(p)
    rho = np.where(
        w == 0, np.int64(64 - p + 1), (_clz64(w) + 1).astype(np.int64)
    )
    return idx, np.minimum(rho, 64 - p + 1)


def hll_estimate(registers: np.ndarray, p: int) -> float:
    """Distinct-count estimate from a dense 2^p register array (missing
    registers = 0), with the standard small-range linear counting
    correction."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------
# Misra-Gries heavy-hitter summary (Misra & Gries 1982; mergeable form
# per Agarwal et al., "Mergeable Summaries", PODS 2012)
# ---------------------------------------------------------------------

def _bloom_positions(keys: np.ndarray, m_bits: int, k: int, seed: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch-Mitzenmacher double hashing
    (h1 + i*h2 mod m; Kirsch & Mitzenmacher 2006 — k independent hashes
    are unnecessary). m_bits must be a power of two."""
    x = np.ascontiguousarray(keys).view(np.uint64)
    h1 = splitmix64(x ^ U64(seed))
    h2 = splitmix64(x ^ U64(seed + 0x51_7C_C1)) | U64(1)
    mask = U64(m_bits - 1)
    out = np.empty((k, len(x)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i in range(k):
            out[i] = ((h1 + U64(i) * h2) & mask).astype(np.int64)
    return out


def bloom_block_bits(keys: np.ndarray, m_bits: int, k: int, seed: int) -> np.ndarray:
    """Packed uint64 Bloom bit array (m_bits/64 words) for one block of
    keys. Blocks OR-merge (bloom_merge), so the build distributes as
    per-block partials + one small tree reduce — same plan shape as the
    CMS census above."""
    pos = _bloom_positions(keys, m_bits, k, seed)
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    w = (pos >> 6).reshape(-1)
    b = (pos & 63).reshape(-1)
    np.bitwise_or.at(words, w, U64(1) << b.astype(np.uint64))
    return words


def bloom_merge(blocks: list[np.ndarray]) -> np.ndarray:
    acc = np.zeros_like(blocks[0])
    for s in blocks:
        acc |= s
    return acc


def bloom_contains(words: np.ndarray, keys: np.ndarray, m_bits: int, k: int,
                   seed: int) -> np.ndarray:
    """Membership test, vectorized: True may be a false positive, False
    is NEVER wrong — which is exactly the contract a dedup pre-filter
    needs (a filtered-out probe is guaranteed novel; survivors go to the
    exact path)."""
    pos = _bloom_positions(keys, m_bits, k, seed)
    hit = np.ones(pos.shape[1], dtype=bool)
    for i in range(k):
        hit &= (words[pos[i] >> 6] >> (pos[i] & 63).astype(np.uint64)) & U64(1) != 0
    return hit


def bloom_size_for(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits power of two, k) for a target false-positive rate."""
    import math

    n = max(1, n_keys)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m_bits = 1 << (m - 1).bit_length()
    k = max(1, round(m_bits / n * math.log(2)))
    return m_bits, min(k, 16)


def misra_gries_shrink(
    items: np.ndarray, weights: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Shrink an exact (item, weight) frequency table to at most k
    entries the Misra-Gries way: subtract the (k+1)-th largest weight
    from every entry and drop the non-positive ones.

    Every surviving weight UNDERestimates its true count by at most the
    subtracted offset, and any item whose true count exceeds the sum of
    offsets across all shrinks is guaranteed to survive — which is what
    makes a sum-merge of per-block summaries a sound candidate
    generator for a two-pass exact heavy-hitter query (no false
    negatives above the error bound, false positives removed by the
    exact second pass)."""
    if len(items) <= k:
        return items, weights
    # offset = (k+1)-th largest weight (0-indexed kth)
    offset = np.partition(weights, len(weights) - k - 1)[len(weights) - k - 1]
    keep = weights > offset
    return items[keep], weights[keep] - offset


# --- mergeable quantile summary (equi-rank downsample) -------------------
#
# The scale-path twin of the exact distributed-value-count quantiles
# (extra_queries.q_length_quantiles): when the value domain is NOT
# bounded (floats, high-cardinality lengths), the exact count table can
# approach the row count and the plan degrades to a full sort. A
# bounded mergeable summary — the Manku–Rajagopalan–Lindsay merge-and-
# prune family (SIGMOD 1998), the same lineage as KLL — keeps a fixed
# budget of weighted points per summary regardless of input size:
#
#   prune: sort points by value, walk the weighted CDF, keep the point
#   covering each of `budget` evenly spaced rank targets, re-weight
#   uniformly. Each prune perturbs any rank by <= W_level / budget, so
#   a fan-in-16 merge tree of depth d costs <= d * W / budget total
#   rank error (budget 4096, d <= 3 at 10^12 rows => < 0.1%).
#
# Deterministic: points sort by (value, weight) so the result is a pure
# function of the input MULTISET (merge order never matters), and the
# block->batch composition is Ray's deterministic block order.

def qsketch_prune(
    vals: np.ndarray, wts: np.ndarray, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """Downsample a weighted point set to <= budget equi-rank points."""
    if len(vals) <= budget:
        o = np.lexsort((wts, vals))
        return vals[o], wts[o]
    o = np.lexsort((wts, vals))
    v, w = vals[o], wts[o].astype(np.float64)
    cw = np.cumsum(w)
    total = cw[-1]
    targets = (np.arange(budget, dtype=np.float64) + 0.5) * (total / budget)
    idx = np.clip(np.searchsorted(cw, targets, side="left"), 0, len(v) - 1)
    return v[idx], np.full(budget, total / budget)


def qsketch_merge(
    summaries: list[tuple[np.ndarray, np.ndarray]], budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge = concat + prune (order-free: prune sorts by value)."""
    vals = np.concatenate([s[0] for s in summaries])
    wts = np.concatenate([s[1] for s in summaries])
    return qsketch_prune(vals, wts, budget)


def qsketch_quantile(vals: np.ndarray, wts: np.ndarray, q: float):
    """Inverse-CDF lookup: the summary point covering rank q * W —
    exact inverse-CDF (percentile_disc) semantics on an unpruned
    summary, the same definition as the exact quantile query."""
    cw = np.cumsum(wts.astype(np.float64))
    i = int(np.clip(np.searchsorted(cw, q * cw[-1], side="left"),
                    0, len(vals) - 1))
    return vals[i]
