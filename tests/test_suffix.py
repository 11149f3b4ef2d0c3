"""Suffix array + containment kernels (no Ray needed)."""

import numpy as np

from consult_ray.functions.suffix import (
    contained_docs,
    contained_docs_bruteforce,
    sa_find_occurrences,
    suffix_array,
)


def test_suffix_array_banana():
    sa = suffix_array(b"banana")
    # suffixes sorted: a, ana, anana, banana, na, nana -> [5,3,1,0,4,2]
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]


def test_suffix_array_matches_naive_random():
    rng = np.random.default_rng(3)
    for _ in range(5):
        data = bytes(rng.integers(97, 100, size=int(rng.integers(1, 200))).tolist())
        sa = suffix_array(data)
        naive = sorted(range(len(data)), key=lambda i: data[i:])
        assert sa.tolist() == naive


def test_find_occurrences():
    concat = b"abracadabra"
    sa = suffix_array(concat)
    assert sa_find_occurrences(concat, sa, b"abra").tolist() == [0, 7]
    assert sa_find_occurrences(concat, sa, b"zzz").tolist() == []


def test_contained_docs_vs_bruteforce():
    rng = np.random.default_rng(5)
    texts = []
    for _ in range(30):
        texts.append(bytes(rng.integers(97, 102, size=int(rng.integers(3, 60))).tolist()))
    # guaranteed containment cases
    texts.append(texts[0] + b"suffix")
    texts.append(b"prefix" + texts[1])
    texts.append(texts[2])  # exact duplicate: both orderings
    assert contained_docs(texts) == contained_docs_bruteforce(texts)


def test_contained_docs_empty_and_single():
    assert contained_docs([]) == []
    assert contained_docs([b"abc"]) == []
    assert contained_docs([b"", b"abc"]) == []
