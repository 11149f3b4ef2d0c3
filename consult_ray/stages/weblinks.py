"""Outlink extraction over html pages — the web-graph operator a crawl
pipeline runs next to extraction (link census feeds URL frontier
prioritization and domain-level dedup). Fully vectorized: the per-batch
kernel is two Arrow split kernels + one offsets mask; no per-row Python
and no regex backtracking (the reference's analog is its linear one-pass
record scanner, /root/reference/main_search.cpp:741-766).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_hrefs(html: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """All `href="..."` targets per page, semantics identical to the RE2
    `href="([^"]*)"` global extract DuckDB's regexp_extract_all runs.

    Returns (flat links array, row index of each link). Method: split on
    the literal `href="`; scanning the fragments after a row's first one
    replays the regex exactly —

      * a fragment containing `"` closes the pending capture at that
        quote, and the NEXT fragment starts a new capture;
      * a fragment with NO quote is closed by the trailing quote of the
        next `href="` separator itself, so the regex emits
        `fragment + 'href='` and resumes scanning AFTER that quote —
        which skips the following fragment entirely;
      * a trailing unquoted fragment is an unterminated match: dropped.

    In well-formed HTML every fragment carries a closing quote, so the
    whole batch takes the vectorized prefix path; only rows holding an
    unclosed href value (the rule-2/3 cases) replay the automaton in
    Python, bounded by the malformed-row volume.
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.string()) if not pa.types.is_string(html.type) else html
    segs = pc.split_pattern(s, 'href="')
    valid = pc.is_valid(segs).to_numpy(zero_copy_only=False).astype(bool)
    raw = pc.fill_null(pc.list_value_length(segs), 0).to_numpy(
        zero_copy_only=False
    )
    # fragments each row contributes to the FLAT array (null lists
    # contribute nothing to list_flatten)
    n_flat = np.where(valid, raw, 0).astype(np.int64)
    flat = pc.list_flatten(segs)
    # drop each row's first fragment (the text before the first href)
    total = int(n_flat.sum())
    keep = np.ones(total, dtype=bool)
    row_start = np.concatenate(([0], np.cumsum(n_flat)[:-1]))
    keep[row_start[n_flat > 0]] = False
    frags = flat.filter(pa.array(keep))
    if isinstance(frags, pa.ChunkedArray):
        frags = frags.combine_chunks()
    counts = np.maximum(n_flat - 1, 0)
    row_ids = np.repeat(np.arange(len(n_flat), dtype=np.int64), counts)
    m = len(frags)
    if m == 0:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    closer = pc.match_substring(frags, '"').to_numpy(
        zero_copy_only=False
    ).astype(bool)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nz = np.flatnonzero(counts)
    all_closed = np.ones(len(counts), dtype=bool)
    all_closed[nz] = np.minimum.reduceat(
        closer.view(np.uint8), starts[nz]
    ).astype(bool)
    # prefix up to the first quote (the whole fragment when unquoted)
    trunc = pc.list_element(pc.split_pattern(frags, '"', max_splits=1), 0)
    fast_frag = all_closed[row_ids]
    if fast_frag.all():  # every fragment closes: each emits its prefix
        return trunc, row_ids
    idx = np.arange(m, dtype=np.int64)
    fast_idx = idx[fast_frag]
    # slow rows: replay the automaton per row (order key = the emitting
    # fragment's global index, so the merged output keeps scan order)
    gpos = np.cumsum(~fast_frag) - 1
    slow_vals = trunc.filter(pa.array(~fast_frag)).to_pylist()
    slow_closer = closer[~fast_frag]
    sl_links: list[str] = []
    sl_keys: list[int] = []
    for r in np.flatnonzero(~all_closed & (counts > 0)):
        i = int(starts[r])
        end = i + int(counts[r])
        while i < end:
            v = slow_vals[gpos[i]]
            if slow_closer[gpos[i]]:
                sl_links.append(v)  # trunc already cut at the quote
                sl_keys.append(i)
                i += 1
            else:
                if i + 1 < end:  # closed by the next separator's quote
                    sl_links.append(v + "href=")
                    sl_keys.append(i)
                i += 2
    order = np.argsort(
        np.concatenate([fast_idx, np.asarray(sl_keys, dtype=np.int64)]),
        kind="stable",
    )
    merged = pa.concat_arrays([
        trunc.filter(pa.array(fast_frag)).combine_chunks()
        if isinstance(trunc, pa.ChunkedArray)
        else trunc.filter(pa.array(fast_frag)),
        pa.array(sl_links, pa.string()),
    ]).take(pa.array(order))
    rows = np.concatenate([
        row_ids[fast_frag],
        row_ids[np.asarray(sl_keys, dtype=np.int64)]
        if sl_keys
        else np.empty(0, dtype=np.int64),
    ])[order]
    return merged, rows


def link_host(links: pa.Array) -> pa.Array:
    """scheme://HOST[/...] -> host (empty string when no scheme —
    relative links), mirroring regexp_extract(l, '^[a-z]+://([^/]*)', 1)."""
    ex = pc.extract_regex(links, r"^[a-z]+://(?P<host>[^/]*)")
    host = pc.struct_field(ex, "host")
    return pc.fill_null(host, "")


def links_batch(batch: pa.Table, html_col: str = "html",
                id_col: str = "doc_id") -> pa.Table:
    """(doc_id, link, host) exploded rows for one batch."""
    links, row_ids = extract_hrefs(batch[html_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False)[row_ids]
    return pa.table({
        "doc_id": pa.array(ids),
        "link": links,
        "host": link_host(links),
    })
