"""CCNet-style n-gram language-model quality filter: train a hashed
bigram LM on the corpus (pass 1), score every doc by mean token
log-probability (pass 2). Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data" (2020) runs exactly
this shape with KenLM; the hashed fixed-width variant here keeps the
model a dense array so training is a per-block bincount partial + one
merge (the CMS census plan shape, functions/sketch.py) and scoring is
a gather + scatter-add per batch — no vocabulary shuffle, no per-row
Python.

Model: add-k smoothed P(w_i | w_{i-1}) over hash buckets:
    logp = log( (C2[h2(prev,cur)] + k) / (C1[h1(prev)] + k * W) )
with W the bucket width standing in for |V| (hash collisions merge
counts for rare grams — acceptable for a FILTER, whose consumers rank
docs, not decode text). Doc score = mean logp over its bigrams; docs
with < 2 tokens score 0.0 (no bigrams).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.functions.hashing import hash_bytes_batch_u64, splitmix64
from consult_ray.functions.textnorm import binary_view

U64 = np.uint64


def _token_hashes(text: pa.Array, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 hash per token, tokens-per-doc) — single-space split,
    whole-token batch hash (same kernel as the classifier stage)."""
    if text.null_count:
        text = pc.fill_null(text, "")
    toks = pc.split_pattern(text, " ")
    n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).cast(pa.large_binary())
    buf, offsets = binary_view(flat)
    return hash_bytes_batch_u64(buf, offsets, seed=seed), n_per


def _gram_indices(
    h: np.ndarray, n_per: np.ndarray, width: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(prev-unigram bucket, bigram bucket, doc id) for every WITHIN-doc
    adjacent token pair; width must be a power of two."""
    n_docs = len(n_per)
    total = len(h)
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_per)
    # position i pairs with i+1 when both belong to the same doc
    ok = np.zeros(total, dtype=bool)
    ok[:-1] = doc_of[:-1] == doc_of[1:]
    prev = h[:-1][ok[:-1]]
    cur = h[1:][ok[:-1]]
    mask = U64(width - 1)
    with np.errstate(over="ignore"):
        uni = (splitmix64(prev) & mask).astype(np.int64)
        big = (splitmix64(prev * U64(0x9E3779B97F4A7C15) ^ cur) & mask).astype(np.int64)
    return uni, big, doc_of[:-1][ok[:-1]]


def lm_count_partial(
    batch: pa.Table, width: int, seed: int, text_col: str = "text"
) -> pa.Table:
    """One block's (unigram, bigram) count grids, packed as two binary
    cells — the mergeable pass-1 partial (sum-merge, associative)."""
    h, n_per = _token_hashes(batch[text_col].combine_chunks(), seed)
    uni, big, _ = _gram_indices(h, n_per, width)
    c1 = np.bincount(uni, minlength=width).astype(np.int64)
    c2 = np.bincount(big, minlength=width).astype(np.int64)
    return pa.table({
        "c1": pa.array([c1.tobytes()], pa.large_binary()),
        "c2": pa.array([c2.tobytes()], pa.large_binary()),
    })


_LM_COMBINE_FANIN = 16


def train_bigram_lm(docs, width: int, seed: int, text_col: str = "text"):
    """Pass 1: per-block partials -> merged (C1, C2) arrays. Block
    partials are pre-summed in worker tasks of fan-in
    _LM_COMBINE_FANIN before take_all, so the driver folds
    ~n_blocks/16 width-sized rows instead of one per block (the same
    bounded-intake shape as the CMS census driver merge,
    pipelines/dedup.py::_merged_cms_grid); above ~50M-row corpora reuse
    its chunked tree reduce — same associative merge."""

    def combine(batch: pa.Table) -> pa.Table:
        c1 = np.zeros(width, dtype=np.int64)
        c2 = np.zeros(width, dtype=np.int64)
        for b1, b2 in zip(batch["c1"], batch["c2"]):
            c1 += np.frombuffer(b1.as_py(), dtype=np.int64)
            c2 += np.frombuffer(b2.as_py(), dtype=np.int64)
        return pa.table({
            "c1": pa.array([c1.tobytes()], pa.large_binary()),
            "c2": pa.array([c2.tobytes()], pa.large_binary()),
        })

    parts = (
        docs.map_batches(
            lambda b: lm_count_partial(b, width, seed, text_col),
            batch_format="pyarrow",
        )
        .map_batches(combine, batch_format="pyarrow",
                     batch_size=_LM_COMBINE_FANIN)
        .take_all()
    )
    c1 = np.zeros(width, dtype=np.int64)
    c2 = np.zeros(width, dtype=np.int64)
    for r in parts:
        c1 += np.frombuffer(r["c1"], dtype=np.int64)
        c2 += np.frombuffer(r["c2"], dtype=np.int64)
    return c1, c2


class BigramLMScorer:
    """Actor-pool pass 2: mean bigram log-prob per doc. The trained
    count arrays arrive as ray.put refs, fetched ONCE per actor."""

    def __init__(self, c1_ref, c2_ref, width: int, seed: int,
                 add_k: float = 0.1, text_col: str = "text"):
        import ray

        self.c1 = ray.get(c1_ref)
        self.c2 = ray.get(c2_ref)
        self.width = width
        self.seed = seed
        self.add_k = float(add_k)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h, n_per = _token_hashes(batch[self.text_col].combine_chunks(), self.seed)
        uni, big, doc = _gram_indices(h, n_per, self.width)
        logp = np.log(
            (self.c2[big] + self.add_k)
            / (self.c1[uni] + self.add_k * self.width)
        )
        sums = np.bincount(doc, weights=logp, minlength=n)
        counts = np.bincount(doc, minlength=n)
        score = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
        return batch.append_column("lm_logprob", pa.array(score, pa.float64()))


def score_rows_reference(texts: list[str], width: int, seed: int,
                         add_k: float, c1: np.ndarray, c2: np.ndarray) -> list[float]:
    """Per-row scalar reference (pytest oracle for the batch kernel).
    The log runs through np.log on a vector, same as the batch kernel —
    scalar math.log can differ from numpy's SIMD log by 1 ulp."""
    from consult_ray.functions.hashing import hash_bytes_u64

    out = []
    for t in texts:
        toks = t.split(" ")
        hs = [hash_bytes_u64(x.encode(), seed=seed) for x in toks]
        ratios = []
        for a, b in zip(hs, hs[1:]):
            u = int(splitmix64(np.uint64(a)) & U64(width - 1))
            with np.errstate(over="ignore"):
                g = int(
                    splitmix64(np.uint64(a) * U64(0x9E3779B97F4A7C15) ^ np.uint64(b))
                    & U64(width - 1)
                )
            ratios.append((c2[g] + add_k) / (c1[u] + add_k * width))
        if not ratios:
            out.append(0.0)
            continue
        lps = np.log(np.asarray(ratios, dtype=np.float64))
        # sequential accumulation, matching np.bincount's C loop (numpy's
        # add.reduce is PAIRWISE and differs by 1 ulp)
        acc = 0.0
        for v in lps:
            acc += float(v)
        out.append(acc / len(lps))
    return out
