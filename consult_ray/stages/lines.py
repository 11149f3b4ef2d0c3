"""Line-structure derivation for line-level dedup and repetition stats.

Web corpora are deduplicated at LINE granularity (boilerplate cookie
banners / footers repeat across a site's pages) as well as document
granularity; the reference's analog is its N-split tokenizer that cuts
reads at boundary markers before hashing
(/root/reference/main_map.cpp:376-392 — shingles never span splits).
The sf documents table is flat single-spaced word soup, so lines are
DERIVED deterministically: a per-source boilerplate header line, the
body split into fixed word-count chunks, and a per-source footer line.
The exact same derivation is expressible in ANSI SQL (zipped unnest +
string_agg), which is what makes the downstream dedup queries
SQL-oracle-checkable bit-exactly.

All kernels are numpy over the batch's concatenated utf-8 buffer —
chunk boundaries are space bytes (0x20 never occurs inside a utf-8
multi-byte sequence), and each output line is a byte-slice of the
original text gathered with one fancy index. No per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.functions.textnorm import binary_view

WORDS_PER_LINE = 10
HEADER_PREFIX = "cookie notice from "
FOOTER_PREFIX = "copyright "
FOOTER_SUFFIX = " all rights reserved"
# packed (doc_id, line_no) composite for keep-first winners: line_no
# occupies the low 20 bits, so doc ids must stay below 2^43 (the id
# assignment stage emits 63-bit hashes — pack those flows with a
# dense-id remap first; the sf tables are dense already).
LINE_NO_BITS = 20


def lines_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    words_per_line: int = WORDS_PER_LINE,
) -> pa.Table:
    """(doc_id, line_no:int64, line:string) rows for one batch.

    line_no 0 is the header boilerplate, 1..m the body chunks of
    `words_per_line` words (m = ceil(n_words / words_per_line), with
    empty text counting as one empty word, matching SQL string_split),
    m+1 the footer boilerplate.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "line_no": pa.array([], pa.int64()),
            "line": pa.array([], pa.string()),
        })
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch[text_col].combine_chunks()
    if text.null_count:
        text = text.fill_null("")
    buf, offsets = binary_view(text.cast(pa.binary()))

    # per-row word starts: [row_start, each space position + 1]
    sp = np.flatnonzero(buf == 0x20)
    c = (
        np.diff(np.searchsorted(sp, offsets))
        if sp.size
        else np.zeros(n, np.int64)
    )  # spaces per row
    nw = c + 1
    total_ws = int(nw.sum())
    head_idx = np.concatenate(([0], np.cumsum(nw)[:-1]))
    ws = np.empty(total_ws, np.int64)
    ws[head_idx] = offsets[:-1]
    mask = np.ones(total_ws, bool)
    mask[head_idx] = False
    ws[mask] = sp + 1

    # body chunks: doc i has m_i = ceil(nw_i / wpl) chunks
    wpl = words_per_line
    m = -(-nw // wpl)
    M = int(m.sum())
    doc_of = np.repeat(np.arange(n, dtype=np.int64), m)
    chunk_head = np.concatenate(([0], np.cumsum(m)[:-1]))
    j = np.arange(M, dtype=np.int64) - chunk_head[doc_of]
    cs = ws[head_idx[doc_of] + wpl * j]
    # chunk ends: char before the next chunk's first word's preceding
    # space, or the row end for the last chunk
    e_word = wpl * (j + 1)
    last = e_word >= nw[doc_of]
    ce = np.where(
        last,
        offsets[1:][doc_of],
        ws[np.minimum(head_idx[doc_of] + e_word, total_ws - 1)] - 1,
    )

    # gather the M byte-slices into one contiguous string buffer
    lengths = ce - cs
    out_off = np.concatenate(([0], np.cumsum(lengths)))
    idx = np.arange(int(out_off[-1]), dtype=np.int64) + np.repeat(
        cs - out_off[:-1], lengths
    )
    vals = np.ascontiguousarray(buf[idx])
    body_lines = pa.Array.from_buffers(
        pa.large_string(),
        M,
        [None, pa.py_buffer(np.ascontiguousarray(out_off)), pa.py_buffer(vals)],
    ).cast(pa.string())

    src = batch[source_col].combine_chunks().cast(pa.string())

    def lit(s: str) -> pa.Array:
        return pa.array([s] * n)

    header = pc.binary_join_element_wise(lit(HEADER_PREFIX), src, "")
    footer = pc.binary_join_element_wise(
        lit(FOOTER_PREFIX), src, lit(FOOTER_SUFFIX), ""
    )

    out_ids = pa.array(np.concatenate([ids, ids[doc_of], ids]))
    out_no = pa.array(
        np.concatenate([np.zeros(n, np.int64), 1 + j, m + 1])
    )
    def _arr(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    out_line = pa.concat_arrays(
        [_arr(header).cast(pa.string()), _arr(body_lines),
         _arr(footer).cast(pa.string())]
    )
    return pa.table({"doc_id": out_ids, "line_no": out_no, "line": out_line})


def pack_line_key(tbl: pa.Table) -> pa.Table:
    """Append the packed (doc_id << LINE_NO_BITS | line_no) winner key
    plus the 64-bit line content hash (doc_fingerprint_batch's kernel
    on the line column)."""
    from consult_ray.stages.text import doc_fingerprint_batch

    hashed = doc_fingerprint_batch(tbl, text_col="line")
    pack = pc.add(
        pc.shift_left(tbl["doc_id"], pa.scalar(LINE_NO_BITS, pa.int64())),
        tbl["line_no"],
    )
    return pa.table({
        "doc_id": tbl["doc_id"],
        "pack": pack,
        "line_hash": hashed["content_hash"],
    })
