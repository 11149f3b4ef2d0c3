"""Suffix-array construction + substring containment kernels.

The substring-dedup stage (north_rule addition; the reference has no
analog — CONSULT's k-mers are fixed-width so containment is vacuous).

suffix_array: prefix-doubling (Manber–Myers) with numpy argsort — O(n
log^2 n), fully vectorized, no per-character Python loops.

contained_docs: which docs occur as an exact substring of another doc.
Uses the generalized suffix array of the concatenation: all occurrences
of doc A are found by binary search (O(|A| log n) slice compares at C
speed), and A is contained iff an occurrence starts outside A's own span.
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: bytes | np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling. Returns int64 positions sorting
    all suffixes of `data` lexicographically."""
    s = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = s.astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n:
        # sort key: (rank[i], rank[i+k]), -1 past the end
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        sa = order.astype(np.int64)
        # recompute ranks: equal (rank, rank2) pairs share a rank
        r_sorted = rank[sa]
        r2_sorted = rank2[sa]
        new_group = np.empty(n, dtype=np.int64)
        new_group[0] = 0
        diff = (r_sorted[1:] != r_sorted[:-1]) | (r2_sorted[1:] != r2_sorted[:-1])
        np.cumsum(diff, out=new_group[1:])
        rank = np.empty(n, dtype=np.int64)
        rank[sa] = new_group
        if new_group[-1] == n - 1:
            break
        k *= 2
    return sa


def _cmp_at(concat: bytes, pos: int, pattern: bytes) -> int:
    """Compare concat[pos:pos+len(pattern)] with pattern: -1/0/1."""
    seg = concat[pos : pos + len(pattern)]
    if seg == pattern:
        return 0
    return -1 if seg < pattern else 1


def sa_find_occurrences(concat: bytes, sa: np.ndarray, pattern: bytes) -> np.ndarray:
    """All start positions of `pattern` in `concat` via SA binary search."""
    lo, hi = 0, len(sa)
    # lower bound
    while lo < hi:
        mid = (lo + hi) // 2
        if _cmp_at(concat, int(sa[mid]), pattern) < 0:
            lo = mid + 1
        else:
            hi = mid
    start = lo
    hi = len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        if _cmp_at(concat, int(sa[mid]), pattern) <= 0:
            lo = mid + 1
        else:
            hi = mid
    return np.sort(sa[start:lo])


def contained_docs(texts: list[bytes]) -> list[tuple[int, int]]:
    """(inner, outer) pairs: texts[inner] is a substring of texts[outer],
    inner != outer. Equal texts produce both orderings (matching the SQL
    `position(a.text in b.text) > 0 AND a.doc_id <> b.doc_id` oracle).

    Builds one generalized suffix array over the 0xFF-separated
    concatenation (0xFF never starts a UTF-8 character, so it cannot
    appear inside any text) and binary-searches each doc.
    """
    n = len(texts)
    if n < 2:
        return []
    sep = b"\xff"
    parts: list[bytes] = []
    doc_start = np.empty(n, dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):
        doc_start[i] = pos
        parts.append(t)
        parts.append(sep)
        pos += len(t) + 1
    concat = b"".join(parts)
    doc_end = doc_start + np.array([len(t) for t in texts], dtype=np.int64)
    sa = suffix_array(concat)

    # doc owning each concat position (separator positions belong to the
    # preceding doc but can never match a pattern, since patterns lack 0xFF)
    boundaries = np.append(doc_start[1:], len(concat))

    out: list[tuple[int, int]] = []
    for i, t in enumerate(texts):
        if len(t) == 0:
            continue
        occ = sa_find_occurrences(concat, sa, t)
        for p in occ.tolist():
            owner = int(np.searchsorted(boundaries, p, side="right"))
            if owner != i and p + len(t) <= int(doc_end[owner]):
                out.append((i, owner))
    return sorted(set(out))


def contained_docs_bruteforce(texts: list[bytes]) -> list[tuple[int, int]]:
    """O(n^2) reference implementation (C-speed bytes.find) — the test
    oracle for contained_docs."""
    out = []
    for i, a in enumerate(texts):
        if len(a) == 0:
            continue
        for j, b in enumerate(texts):
            if i != j and a in b:
                out.append((i, j))
    return sorted(out)
