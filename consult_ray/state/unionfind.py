"""Union-find (disjoint set) with path compression — the small-scale exact
clustering core, and the per-partition building block of the distributed
connected-components pass (BTS-style: local union-find inside partitions,
min-label exchange across them — see PAPERS.md, ICDE 2024).

The reference stops at membership queries and never forms components
(/root/reference/main_search.cpp:1021-1045 only classifies reads); the
clustering stage is a north_rule addition.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Int-keyed union-find; representative is always the MIN member so
    cluster ids are deterministic and order-free (SURVEY §2.9)."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        root = x
        while p != root:
            root, p = p, self.parent.setdefault(p, p)
        # path compression
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo

    def add(self, x: int) -> None:
        self.parent.setdefault(x, x)

    def components(self) -> dict[int, int]:
        """node -> min-member cluster id."""
        return {x: self.find(x) for x in list(self.parent)}


def unionfind_labels(edges_a: np.ndarray, edges_b: np.ndarray) -> dict[int, int]:
    """Exact node->cluster labels from edge arrays (driver-side path,
    used when the verified edge set is provably small, and as the test
    oracle for the distributed label-propagation pass)."""
    uf = UnionFind()
    for a, b in zip(edges_a.tolist(), edges_b.tolist()):
        uf.union(int(a), int(b))
    return uf.components()


def vectorized_labels(
    edges_a: np.ndarray, edges_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact (nodes, min-member labels) fully vectorized in numpy:
    per-round one min-hop over all edges (np.minimum.at) followed by
    pointer-jumping to full compression. O(E) per round, rounds ~
    log(diameter) — handles tens of millions of edges in seconds on the
    driver, where the dict-based UnionFind's Python loop cannot."""
    if len(edges_a) == 0:
        empty = np.array([], dtype=np.int64)
        return empty, empty
    nodes = np.unique(np.concatenate([edges_a, edges_b]))
    ai = np.searchsorted(nodes, edges_a)
    bi = np.searchsorted(nodes, edges_b)
    lab = np.arange(len(nodes), dtype=np.int64)

    # one-time sort of each endpoint column so every round's grouped min
    # is a reduceat over contiguous runs (np.minimum.at is ~50x slower)
    def _grouping(idx: np.ndarray):
        order = np.argsort(idx, kind="stable")
        s = idx[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return order, starts, s[starts]

    order_a, starts_a, uniq_a = _grouping(ai)
    order_b, starts_b, uniq_b = _grouping(bi)

    while True:
        old = lab.copy()
        m = np.minimum(lab[ai], lab[bi])
        lab[uniq_a] = np.minimum(lab[uniq_a], np.minimum.reduceat(m[order_a], starts_a))
        lab[uniq_b] = np.minimum(lab[uniq_b], np.minimum.reduceat(m[order_b], starts_b))
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    return nodes, nodes[lab]
