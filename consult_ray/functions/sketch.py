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
    keys: np.ndarray, width: int, depth: int, seed: int
) -> np.ndarray:
    """(depth, width) uint32 count grid for one block of keys."""
    idx = _cms_indices(keys, width, depth, seed)
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
