"""Quality-classifier inference: a hashed bag-of-words linear model
scored over batches — the fastText-style quality gate (CCNet/DCLM run
exactly this shape between extraction and dedup), and the repo's
template for ANY batched model inference: weights built ONCE per actor
(or ray.put once and read per actor), scoring is one tokenize + one
scatter-add per batch, no per-row Python.

The model here is deterministic (seeded hashed weights, no training
deps in this sandbox) so results are reproducible and pytest can check
the batch kernel against a per-row reference; swapping in real learned
weights is a constructor argument, not a code change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.functions.hashing import hash_bytes_batch_u64, splitmix64
from consult_ray.functions.textnorm import binary_view


def make_weights(dim: int, seed: int) -> np.ndarray:
    """Seeded float32 weights in [-0.5, 0.5): splitmix64 of the feature
    index — the stand-in for a trained model's embedding row."""
    u = splitmix64(np.arange(dim, dtype=np.uint64) + np.uint64(seed))
    return (u.astype(np.float64) / 2**64 - 0.5).astype(np.float32)


def _token_feature_idx(
    text: pa.Array, dim: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """(feature index per token, row id per token), vectorized: split on
    single space, hash every token with the batch bytes kernel, mod dim."""
    if text.null_count:
        text = pc.fill_null(text, "")
    toks = pc.split_pattern(text, " ")
    n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).cast(pa.large_binary())
    buf, offsets = binary_view(flat)
    h = hash_bytes_batch_u64(buf, offsets, seed=seed)
    row_ids = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
    return (h % np.uint64(dim)).astype(np.int64), row_ids


class HashedLinearScorer:
    """Actor-pool stage: text -> (score, label). Weights are built once
    in __init__ (per actor), the model-load analog; pass weights_ref
    (a ray.put ObjectRef of a float32 vector) to share real weights
    across the pool without re-shipping them per batch."""

    def __init__(self, dim: int = 1 << 16, seed: int = 2024,
                 threshold: float = 0.0, weights_ref=None,
                 text_col: str = "text"):
        if weights_ref is not None:
            import ray

            self.w = ray.get(weights_ref)
            self.dim = len(self.w)
        else:
            self.dim = dim
            self.w = make_weights(dim, seed)
        self.seed = seed
        self.threshold = threshold
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx, row_ids = _token_feature_idx(
            batch[self.text_col].combine_chunks(), self.dim, self.seed
        )
        # one scatter-add scores the whole batch; float64 accumulate for
        # run-to-run determinism, then mean over tokens
        sums = np.bincount(
            row_ids, weights=self.w[idx].astype(np.float64), minlength=n
        )
        n_tok = np.maximum(np.bincount(row_ids, minlength=n), 1)
        score = sums / n_tok
        return batch.append_column(
            "quality_score", pa.array(score, pa.float64())
        ).append_column(
            "quality_keep", pa.array(score > self.threshold)
        )


def score_rows_reference(texts: list[str], dim: int, seed: int,
                         threshold: float) -> list[tuple[float, bool]]:
    """Per-row reference implementation (pytest oracle for the batch
    kernel — same hash, scalar loop)."""
    from consult_ray.functions.hashing import hash_bytes_u64

    w = make_weights(dim, seed)
    out = []
    for t in texts:
        toks = t.split(" ")
        s = 0.0
        for tok in toks:
            s += float(w[hash_bytes_u64(tok.encode(), seed=seed) % dim])
        s /= max(1, len(toks))
        out.append((s, s > threshold))
    return out
