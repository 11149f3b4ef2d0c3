"""Web-corpus scrubbing operators: PII redaction, canonical-URL
normalization, and benchmark decontamination.

These are the hygiene passes a training-data pipeline runs right after
extraction (the reference's analog is its per-read normalization sweep,
/root/reference/main_search.cpp:741-758 — a fixed per-record rewrite
applied before fingerprinting). All three are batch-vectorized Arrow
kernels with no per-row Python in the hot path:

- PII redaction: ordered global RE2 rewrites via
  ``pc.replace_substring_regex`` (Arrow's regex engine is RE2, the same
  engine DuckDB uses, so the SQL oracle can mirror the exact pattern
  sequence).
- Canonical URL: scheme+host lowercase, ``www.`` strip, tracking-param
  removal, trailing-slash strip — one ``pc.extract_regex`` plus ordered
  global rewrites.
- Decontamination: membership of any benchmark snippet (fixed byte
  width) inside each document, found by the batch rolling-hash kernel
  (functions/hashing.rolling_shingle_hashes) against a broadcast hash
  set, then exact substring verification on the flagged docs only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------

# Ordered (pattern, replacement) rewrites. Order matters (emails eat
# their digits before the phone pass runs) and every pattern sticks to
# the RE2 subset that Arrow and DuckDB share, so the SQL oracle is the
# literal same sequence with regexp_replace(..., 'g').
PII_REWRITES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d[\d ]{7,}\d", "<PHONE>"),
)


def redact_pii(text: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Apply the ordered PII rewrites to a string column (global, RE2)."""
    out = text
    for pattern, repl in PII_REWRITES:
        out = pc.replace_substring_regex(out, pattern=pattern, replacement=repl)
    return out


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    red = redact_pii(batch[text_col])
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_redacted": red,
        "had_pii": pc.not_equal(red, batch[text_col]),
    })


# ---------------------------------------------------------------------
# Canonical URL
# ---------------------------------------------------------------------

_URL_SPLIT = r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?]*)(?P<rest>.*)$"

# Applied to the recomposed lowercase-host url, in order, global. Each
# rule strips RUNS so one pass reaches a fixed point on its own output
# (pytest-asserted idempotence). Caveat shared with any single-pass RE2
# remover: the param rule matches the name suffix anywhere (no
# lookbehind in RE2), so e.g. `href=` loses its `ref=` tail, and a
# removal seam can in principle expose a new `utm_`/`ref=` token — the
# oracle mirrors the identical semantics, so both sides agree exactly.
URL_REWRITES: tuple[tuple[str, str], ...] = (
    (r"^([a-z][a-z0-9+.-]*://)(www\.)+", r"\1"),    # strip leading www. run
    (r"(utm_[a-z]+|ref)=[^&]*&?", ""),              # drop tracking params
    (r"[?&/]+$", ""),                                # trailing junk run
)


def canonicalize_url(url: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Lowercase scheme+host (path/query case preserved), then the
    ordered URL_REWRITES. Urls without a ``scheme://host`` prefix pass
    through the rewrites unchanged (extract misses -> null -> original).
    """
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    parts = pc.extract_regex(url, _URL_SPLIT)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    rest = pc.struct_field(parts, "rest")
    lowered = pc.binary_join_element_wise(head, rest, "")
    out = pc.if_else(pc.is_valid(lowered), lowered, url)
    for pattern, repl in URL_REWRITES:
        out = pc.replace_substring_regex(out, pattern=pattern, replacement=repl)
    return out


# ---------------------------------------------------------------------
# Decontamination (benchmark snippet containment)
# ---------------------------------------------------------------------


def snippet_window_hashes(snippets: list[bytes], k: int) -> np.ndarray:
    """Rolling-window hashes of fixed-width snippets, sorted — the
    broadcast side of the decontamination scan. Each snippet must be
    exactly k bytes (one window) so its hash is comparable with any
    in-document window hash from rolling_shingle_hashes."""
    from consult_ray.functions.hashing import rolling_shingle_hashes

    assert all(len(s) == k for s in snippets), "snippets must be k bytes"
    if not snippets:
        return np.empty(0, dtype=np.uint64)
    concat = np.frombuffer(b"".join(snippets), dtype=np.uint8)
    offsets = np.arange(0, (len(snippets) + 1) * k, k, dtype=np.int64)
    h, _docs = rolling_shingle_hashes(concat, offsets, k)
    return np.sort(h)


# ---------------------------------------------------------------------
# Boilerplate line removal (C4/CCNet pass)
# ---------------------------------------------------------------------


def remove_frequent_lines_batch(
    batch: pa.Table, frequent: pa.Array | pa.ChunkedArray | None = None,
    text_col: str = "text", id_col: str = "doc_id",
    frequent_hashes: np.ndarray | None = None,
) -> pa.Table:
    """Drop every derived line present in the frequent set and
    reassemble each doc from its surviving lines in line_no order.
    Fully vectorized: one membership test, one lexsort gather, one list
    binary_join. Returns (doc_id, n_kept, text_clean).

    Membership side (exactly one of the two):
    - `frequent`: exact string is_in — unbounded broadcast (the set's
      STRINGS ship to every task); small-corpus / verification use.
    - `frequent_hashes`: SORTED uint64 line-content hashes
      (doc_fingerprint_batch's kernel on the line column) — the scale
      path: driver intake and broadcast are 8 B per frequent line
      regardless of line length, at the repo-standard 64-bit collision
      contract (~3e-5 odds at 2^40 lines, same as exact_dedup_groups).
    """
    from consult_ray.stages.lines import lines_batch

    lt = lines_batch(batch, text_col=text_col, id_col=id_col)
    if frequent_hashes is not None:
        from consult_ray.stages.text import doc_fingerprint_batch

        h = doc_fingerprint_batch(lt, text_col="line")[
            "content_hash"
        ].to_numpy(zero_copy_only=False).view(np.uint64)
        fh = np.asarray(frequent_hashes).view(np.uint64)
        if fh.size:
            pos = np.searchsorted(fh, h)
            pos[pos == fh.size] = 0
            hit = fh[pos] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        kept = lt.filter(pa.array(~hit))
    else:
        kept = lt.filter(pc.invert(pc.is_in(lt["line"], value_set=frequent)))
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    kd = kept["doc_id"].to_numpy(zero_copy_only=False)
    row = order[np.searchsorted(ids[order], kd)]
    ln = kept["line_no"].to_numpy(zero_copy_only=False)
    srt = np.lexsort((ln, row))
    lines_sorted = kept["line"].combine_chunks().take(pa.array(srt, pa.int64()))
    counts = np.bincount(row, minlength=batch.num_rows)
    offs = np.zeros(batch.num_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offs[1:])
    lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), lines_sorted)
    return pa.table({
        "doc_id": batch[id_col],
        "n_kept": pa.array(counts.astype(np.int64)),
        "text_clean": pc.binary_join(lst, " "),
    })


class ContaminationScanner:
    """Actor-pool stage: flag docs containing any benchmark snippet.

    Scale shape (the 100 TB story): only the SORTED uint64 hash array —
    8 bytes per snippet — rides the broadcast for the scan; the snippet
    strings are broadcast too but touched only for the exact
    verification of flagged docs (collision disambiguation), whose
    volume is bounded by the true contamination rate. For benchmark
    sets too big to broadcast, shard the hash set and union the flags
    (same kernel per shard).
    """

    def __init__(self, snippets_ref, k: int, text_col: str = "text"):
        if isinstance(snippets_ref, (list, tuple)):
            snippets = list(snippets_ref)  # direct use (unit tests)
        else:
            import ray

            snippets = ray.get(snippets_ref)
        self.k = k
        self.text_col = text_col
        self.snippets = snippets
        self.hash_set = snippet_window_hashes(
            [s.encode() if isinstance(s, str) else s for s in snippets], k
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from consult_ray.functions.hashing import rolling_shingle_hashes
        from consult_ray.functions.textnorm import binary_view

        text = batch[self.text_col].combine_chunks()
        buf, offsets = binary_view(text)
        n = batch.num_rows
        flagged = np.zeros(n, dtype=bool)
        if len(self.hash_set) and int(offsets[-1]) >= self.k:
            h, doc_of = rolling_shingle_hashes(buf, offsets, self.k)
            # membership: searchsorted into the sorted hash set
            pos = np.searchsorted(self.hash_set, h)
            pos_c = np.clip(pos, 0, len(self.hash_set) - 1)
            cand_docs = np.unique(doc_of[self.hash_set[pos_c] == h])
            if len(cand_docs):
                # exact verify (hash-collision disambiguation): substring
                # match per snippet over the candidate rows only
                cand_text = text.take(pa.array(cand_docs))
                ok = np.zeros(len(cand_docs), dtype=bool)
                for s in self.snippets:
                    pat = s if isinstance(s, str) else s.decode()
                    m = pc.match_substring(cand_text, pattern=pat)
                    ok |= m.to_numpy(zero_copy_only=False)
                flagged[cand_docs[ok]] = True
        return pa.table({
            "doc_id": batch["doc_id"],
            "contaminated": pa.array(flagged),
        })
