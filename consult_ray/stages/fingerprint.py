"""Fingerprint stage: text -> (simhash, minhash, n_shingles).

The web-text recast of CONSULT's dual k-mer encoding pass
(/root/reference/main_map.cpp:540-648: per-k-mer encodekmer -> per-l
bit-sample): one zero-copy Arrow map_batches producing a 64-bit SimHash
plus a P x uint64 MinHash signature per document, from 32-byte rolling
char shingles of the canonicalized text.

Stateless (a pure function of config + batch) so it runs as elastic Ray
tasks; all heavy work is numpy-vectorized across the whole batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from consult_ray.config import PipelineConfig
from consult_ray.functions.fingerprint import (
    minhash_signatures,
    simhash_signatures,
)
from consult_ray.functions.hashing import rolling_shingle_hashes, segment_offsets
from consult_ray.functions.textnorm import canonicalize_column


def _utf8_concat_and_offsets(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a string column's bytes + per-doc byte offsets."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_string())
    # large_string buffers: [validity, offsets(int64), data]
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64, count=len(col) + 1 + col.offset)
    offsets = offsets[col.offset : col.offset + len(col) + 1]
    data_buf = col.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    base = offsets[0]
    return data[int(base) : int(offsets[-1])], (offsets - base).astype(np.int64)


def fingerprint_batch(
    batch: pa.Table,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> pa.Table:
    """pyarrow batch -> fingerprints table.

    Output schema: doc_id:int64, simhash:int64 (bit-pattern of the uint64),
    minhash:fixed_size_list<uint64, P>, n_shingles:int64.
    Nulls in text are treated as empty strings (they still fingerprint,
    deterministically, and dedup together).
    """
    n = batch.num_rows
    text = canonicalize_column(batch[text_col].combine_chunks())
    if text.null_count:
        text = text.fill_null("")
    concat, offsets = _utf8_concat_and_offsets(text)
    hashes, doc_of = rolling_shingle_hashes(concat, offsets, cfg.shingle_k)
    starts = segment_offsets(doc_of, n)

    mh = minhash_signatures(hashes, starts, cfg)
    sh = simhash_signatures(hashes, starts)
    n_shingles = np.diff(np.append(starts, len(hashes))).astype(np.int64)

    cols = {
        id_col: batch[id_col].cast(pa.int64()),
        "simhash": pa.array(sh.view(np.int64)),
        "minhash": pa.FixedSizeListArray.from_arrays(
            pa.array(mh.reshape(-1)), cfg.num_perm
        ),
        "n_shingles": pa.array(n_shingles),
    }
    if keep_text:
        cols[text_col] = batch[text_col]
    return pa.table(cols)


def make_fingerprint_fn(cfg: PipelineConfig, text_col: str = "text", id_col: str = "doc_id",
                        keep_text: bool = False):
    """Bind config for ds.map_batches(fn, batch_format='pyarrow')."""

    def fn(batch: pa.Table) -> pa.Table:
        return fingerprint_batch(batch, cfg, text_col=text_col, id_col=id_col,
                                 keep_text=keep_text)

    return fn
