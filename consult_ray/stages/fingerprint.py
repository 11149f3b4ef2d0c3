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


def _segment_column(
    text: pa.Array, min_bytes: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """M5 N-split analog (/root/reference/main_search.cpp:770-777): split
    each RAW text on blank-line boundaries, keep segments whose
    CANONICALIZED UTF-8 byte length >= min_bytes (the token >= SL rule;
    shingle_k is byte-based on canonical text, so the filter uses the
    same unit — a kept segment can never shrink below k after
    canonicalization). Returns (canonical segments, seg_doc: doc index
    per kept segment, fallback_idx: docs with NO surviving segment — the
    caller hashes those as one whole-doc shingle so no window ever
    spans a boundary)."""
    import pyarrow.compute as pc

    n = len(text)
    segs = pc.split_pattern_regex(text, pattern=r"\n[ \t\r]*\n")
    flat = pc.list_flatten(segs)
    n_per = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
    seg_doc = np.repeat(np.arange(n, dtype=np.int64), n_per)
    canon = canonicalize_column(flat)
    if isinstance(canon, pa.ChunkedArray):
        canon = canon.combine_chunks()
    keep = pc.greater_equal(
        pc.binary_length(canon), pa.scalar(min_bytes)
    ).to_numpy(zero_copy_only=False)
    kept = canon.filter(pa.array(keep))
    if isinstance(kept, pa.ChunkedArray):
        kept = kept.combine_chunks()
    kept_doc = seg_doc[keep]
    covered = np.bincount(kept_doc, minlength=n) > 0
    fb_idx = np.nonzero(~covered)[0]
    return kept, kept_doc, fb_idx


def fingerprint_batch(
    batch: pa.Table,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> pa.Table:
    """pyarrow batch -> fingerprints table.

    Output schema: doc_id:int64, simhash:int64 (bit-pattern of the uint64),
    minhash:fixed_size_list<uint64, P>, n_shingles:int64. The id column
    is ALWAYS emitted as "doc_id" (the engine-internal canonical name)
    whatever `id_col` names it in the input — every downstream stage
    (band expansion, joins, CC) keys on "doc_id".
    Nulls in text are treated as empty strings (they still fingerprint,
    deterministically, and dedup together). With cfg.segment_split the
    doc splits on blank lines first and shingles never span a segment
    boundary (M5; see _segment_column).
    """
    n = batch.num_rows
    raw = batch[text_col].combine_chunks()
    if raw.null_count:
        raw = raw.fill_null("")
    if cfg.segment_split:
        from consult_ray.functions.hashing import hash_bytes_batch_u64

        seg_arr, seg_doc, fb_idx = _segment_column(
            raw, cfg.segment_min_chars or cfg.shingle_k
        )
        if len(seg_arr):
            # segments come back already canonicalized (the min-length
            # filter is applied on canonical byte length)
            concat, offsets = _utf8_concat_and_offsets(seg_arr)
            h, seg_of = rolling_shingle_hashes(concat, offsets, cfg.shingle_k)
            doc_of = seg_doc[seg_of]
        else:
            h = np.empty(0, dtype=np.uint64)
            doc_of = np.empty(0, dtype=np.int64)
        if len(fb_idx):
            # fallback docs (no segment >= min): ONE whole-doc canonical
            # hash — never rolling shingles across the dropped boundaries
            # (same seed=k semantics as the short-doc path of
            # rolling_shingle_hashes, so identical short docs dedup)
            fb_canon = canonicalize_column(raw.take(pa.array(fb_idx)))
            fb_concat, fb_offs = _utf8_concat_and_offsets(fb_canon)
            fb_h = hash_bytes_batch_u64(fb_concat, fb_offs, seed=cfg.shingle_k)
            h = np.concatenate([h, fb_h])
            doc_of = np.concatenate([doc_of, fb_idx])
        order = np.argsort(doc_of, kind="stable")
        hashes, doc_of = h[order], doc_of[order]
    else:
        text = canonicalize_column(raw)
        concat, offsets = _utf8_concat_and_offsets(text)
        hashes, doc_of = rolling_shingle_hashes(concat, offsets, cfg.shingle_k)
    starts = segment_offsets(doc_of, n)

    mh = minhash_signatures(hashes, starts, cfg)
    sh = simhash_signatures(hashes, starts)
    n_shingles = np.diff(np.append(starts, len(hashes))).astype(np.int64)

    if not pa.types.is_integer(batch.schema.field(id_col).type):
        raise TypeError(
            f"id column {id_col!r} has type {batch.schema.field(id_col).type}; "
            "string/url-keyed tables must first pass through "
            "consult_ray.stages.ids.add_hashed_doc_ids (deterministic "
            "key->int64 assignment with collision audit)"
        )
    cols = {
        "doc_id": batch[id_col].cast(pa.int64()),
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
