"""Hashed bigram LM filter (stages/lm.py): batch kernel == per-row
reference, cross-doc bigram exclusion, and the discriminating property
(in-distribution text outscores out-of-distribution text)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from consult_ray.stages.lm import (
    BigramLMScorer,
    _gram_indices,
    _token_hashes,
    score_rows_reference,
    train_bigram_lm,
)

W, SEED, K = 1 << 12, 99, 0.1


def _corpus(n=80, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    # markov-ish: always follow vocab[i] by vocab[(i+1)%5] -> strong bigrams
    texts = []
    for _ in range(n):
        start = int(rng.integers(5))
        texts.append(" ".join(vocab[(start + j) % 5] for j in range(30)))
    return texts


def test_no_cross_doc_bigrams():
    t = pa.array(["a b", "c d"])
    h, n_per = _token_hashes(t, SEED)
    uni, big, doc = _gram_indices(h, n_per, W)
    assert len(big) == 2  # (a,b) and (c,d); never (b,c)
    assert doc.tolist() == [0, 1]


def test_scorer_matches_reference(ray_session):
    texts = _corpus()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    ds = rd.from_arrow(tbl)
    c1, c2 = train_bigram_lm(ds, W, SEED)
    import ray

    s = BigramLMScorer(ray.put(c1), ray.put(c2), W, SEED, add_k=K)
    got = s(tbl)["lm_logprob"].to_pylist()
    ref = score_rows_reference(texts[:10], W, SEED, K, c1, c2)
    assert got[:10] == ref  # bit-exact

    # split-invariance: scoring in two slices matches whole-batch
    parts = s(tbl.slice(0, 33))["lm_logprob"].to_pylist() + \
        s(tbl.slice(33))["lm_logprob"].to_pylist()
    assert got == parts


def test_lm_discriminates_in_distribution(ray_session):
    texts = _corpus()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    c1, c2 = train_bigram_lm(rd.from_arrow(tbl), W, SEED)
    import ray

    s = BigramLMScorer(ray.put(c1), ray.put(c2), W, SEED, add_k=K)
    rng = np.random.default_rng(0)
    shuffled = " ".join(rng.permutation(texts[0].split(" ")).tolist())
    probe = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([texts[0], shuffled]),
    })
    out = s(probe)["lm_logprob"].to_pylist()
    assert out[0] > out[1] + 0.5  # in-distribution scores clearly higher

    # degenerate docs: <2 tokens -> score 0.0
    tiny = s(pa.table({"doc_id": pa.array([9], pa.int64()),
                       "text": pa.array(["one"])}))
    assert tiny["lm_logprob"].to_pylist() == [0.0]
