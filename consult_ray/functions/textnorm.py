"""Text canonicalization + the pinned HTML->text extraction function.

Canonicalization is the web-text analog of CONSULT's reverse-complement
canonical form (/root/reference/main_search.cpp:899-909, 1130-1165): a
single canonical view of the text so trivially-different renderings hash
identically.

Extraction is the per-row invariant from BASELINE.json's input_hint:
"byte-identical extracted text per url". It is a PURE, VERSIONED function
of the html bytes — no state, no randomness — so retries and re-runs are
value-identical (the property map_fixed_pos exists to give the reference,
map_fixed_pos/main_map_fixed_pos.cpp:423-424).
"""

from __future__ import annotations

import html as _htmlmod
import re
from bisect import bisect_left

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTION_VERSION = 1

# tags whose content is dropped entirely
_DROP_RE = re.compile(
    rb"<(script|style|head|header|footer|nav)\b.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Pinned html->text extraction, version EXTRACTION_VERSION.

    Rules (fixed forever for a given version):
      1. drop <script>/<style>/<head>/<header>/<footer>/<nav> subtrees
      2. strip all remaining tags
      3. unescape HTML entities
      4. collapse whitespace runs to single spaces, trim

    This scalar form is the SPEC; extract_text_column is the vectorized
    batch kernel, byte-identical by pytest contract
    (tests/test_textnorm_vectorized.py).
    """
    body = _DROP_RE.sub(b" ", html_bytes)
    body = _TAG_RE.sub(b" ", body)
    text = body.decode("utf-8", errors="replace")
    text = _htmlmod.unescape(text)
    return _WS_RE.sub(" ", text).strip()


def _extract_text_column_rows(html_col: pa.Array) -> pa.Array:
    """Reference per-row implementation (the v1 loop); kept for the
    byte-equality contract tests of the vectorized kernel."""
    return pa.array(
        [extract_text(v) if v is not None else None for v in html_col.to_pylist()],
        type=pa.string(),
    )


# --- vectorized batch kernel -------------------------------------------
#
# The whole column is processed as ONE concatenated byte buffer with
# per-row offsets (zero-copy from the Arrow binary array). Each v1 pass
# becomes a buffer-level transform whose matches are forced row-local,
# so the result is byte-identical to running extract_text per row:
#
#   drop pass    one C regex scan for open/close tokens + a short loop
#                over the (rare) drop-tag sites replicating leftmost
#                non-greedy `<name\b.*?</name\s*>` semantics
#   tag strip    pure numpy: '<' and '>' positions + searchsorted; the
#                winners of the non-overlapping `<[^>]*>` scan are the
#                first '<' per distinct next-'>' (group-min), a
#                consequence of the regex consuming through nested '<'
#   entities     one C regex scan of html._charref at the BYTES level;
#                only matches needing replacement are touched (ascii
#                entities delegate to html.unescape on the snippet, so
#                numeric/invalid-charref rules stay stdlib-exact)
#   whitespace   bytes-level run collapse + edge trim: ascii \s LUT +
#                explicit multi-byte utf-8 whitespace sequences (utf-8
#                self-synchronization makes the byte view exact)
#   decode       Arrow binary->string cast (validates utf-8 per value);
#                per-row errors="replace" decode only on invalid rows
#
# Entity-unescape runs BEFORE decode here (v1 decodes first); outputs
# are identical because charref syntax chars are pure ascii, utf-8
# errors="replace" never produces ascii, and non-key tails pass through
# verbatim either way — the contract test covers the adversarial cases.

_OPEN_RE = re.compile(rb"<(script|style|head|header|footer|nav)\b", re.IGNORECASE)
_CLOSE_RE = re.compile(rb"</(script|style|head|header|footer|nav)\s*>", re.IGNORECASE)
# html._charref, bytes-compiled (ascii pattern; the {1,32} counts bytes
# not chars — extent differences land only in verbatim tail regions)
_CHARREF_RE = re.compile(rb"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)")

_MISSING = object()
_ENTITY_CACHE: dict[bytes, bytes | None] = {}


def _entity_replacement(snippet: bytes) -> bytes | None:
    """utf-8 replacement bytes for one charref match (b'&...'), or None
    when the unescape is the identity. Stdlib-exact: ascii snippets run
    through html.unescape itself; non-ascii named refs replicate its
    longest-ascii-prefix lookup with the tail passed through verbatim."""
    cached = _ENTITY_CACHE.get(snippet, _MISSING)
    if cached is not _MISSING:
        return cached
    body = snippet[1:]
    if body.isascii():
        out = _htmlmod.unescape(snippet.decode("ascii")).encode("utf-8")
    else:
        # named ref with non-ascii bytes: full string is never an
        # entity key (keys are ascii); try ascii byte-prefixes longest
        # first, exactly html._replace_charref's range(len-1, 1, -1)
        from html.entities import html5 as _html5

        out = snippet
        for x in range(len(body) - 1, 1, -1):
            p = body[:x]
            if not p.isascii():
                continue
            ps = p.decode("ascii")
            if ps in _html5:
                out = _html5[ps].encode("utf-8") + body[x:]
                break
    res = None if out == snippet else out
    if len(_ENTITY_CACHE) < (1 << 16):
        _ENTITY_CACHE[snippet] = res
    return res


def binary_view(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a binary column's bytes + per-row int64
    offsets (normalized to start at 0). Shared by the extraction
    kernel and the multimodal stages."""
    col = col.cast(pa.large_binary())
    offsets = np.frombuffer(
        col.buffers()[1], dtype=np.int64, count=len(col) + 1 + col.offset
    )[col.offset : col.offset + len(col) + 1]
    data_buf = col.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    base = offsets[0]
    view = data[int(base) : int(offsets[-1])]
    # the Arrow buffer may be mutable; freeze the view so the first
    # mutating pass copy-on-writes instead of corrupting caller data
    view.flags.writeable = False
    return view, (offsets - base).astype(np.int64)


def _apply_span_deletions(
    buf: np.ndarray,
    offsets: np.ndarray,
    ss: np.ndarray,
    ee: np.ndarray,
    keep_first: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Delete row-local spans [s, e). Where keep_first (default: all),
    the span's first byte survives and is overwritten with b' '; else
    the whole span is removed (the trim case). Spans must be sorted,
    non-overlapping and within one row each.

    Perf note (measured on this host): every temp here is at most
    buffer-sized int8/bool and the offset math is O(spans + rows), NOT
    an int64 cumsum over the buffer — 8x-buffer-size int64 temps pay a
    catastrophic first-touch page-fault cost on this sandbox (~10 s per
    100 MB on a cold allocation) and 8x the memory traffic when warm."""
    n = buf.shape[0]
    if keep_first is None:
        ks = ss + 1
    else:
        ks = ss + keep_first.astype(np.int64)
    # depth is only ever 0 or 1 (spans don't overlap), so the
    # difference array and its running sum fit in int8; ufunc.at
    # because a ks can equal a neighbouring span's ee (or its own, for
    # zero-length deletions)
    d = np.zeros(n + 1, np.int8)
    np.add.at(d, ks, 1)
    np.subtract.at(d, ee, 1)
    keep = np.cumsum(d[:-1], dtype=np.int8) == 0
    out = buf[keep]
    # deleted bytes strictly before input position p: spans lie within
    # rows, so a row-boundary p never splits a span
    cum_del = np.concatenate(([0], np.cumsum(ee - ks)))
    new_offsets = offsets - cum_del[np.searchsorted(ee, offsets, "right")]
    if keep_first is None:
        out[ss - cum_del[:-1]] = 0x20
    elif keep_first.any():
        out[ss[keep_first] - cum_del[:-1][keep_first]] = 0x20
    return out, new_offsets


# kept name for the space-replacement form used by drop/strip passes
_delete_spans_to_space = _apply_span_deletions


def _drop_subtrees(buf: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """v1 pass 1 over the concatenated buffer: leftmost, non-greedy,
    case-insensitive `<name\\b ... </name\\s*>` spans -> b' ', scanning
    resuming after each match, matches never crossing a row."""
    view = memoryview(buf)
    opens = [
        (m.start(), m.end(), bytes(m.group(1)).lower())
        for m in _OPEN_RE.finditer(view)
    ]
    if not opens:
        return buf, offsets
    closes: dict[bytes, tuple[list[int], list[int]]] = {}
    for m in _CLOSE_RE.finditer(view):
        cs, ce = closes.setdefault(bytes(m.group(1)).lower(), ([], []))
        cs.append(m.start())
        ce.append(m.end())
    if not closes:
        return buf, offsets
    row_ends = offsets[
        np.searchsorted(offsets, np.array([s for s, _, _ in opens]), "right")
    ]
    ss_list: list[int] = []
    ee_list: list[int] = []
    pos = 0
    for (s, e, name), row_end in zip(opens, row_ends):
        if s < pos:
            continue  # inside an already-dropped span
        pair = closes.get(name)
        if pair is None:
            continue
        cs, ce = pair
        j = bisect_left(cs, e)
        if j >= len(cs) or ce[j] > row_end:
            continue  # no close in this row -> v1 regex fails at s
        ss_list.append(s)
        ee_list.append(ce[j])
        pos = ce[j]
    if not ss_list:
        return buf, offsets
    return _delete_spans_to_space(
        buf, offsets, np.array(ss_list, np.int64), np.array(ee_list, np.int64)
    )


def _strip_tags(buf: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """v1 pass 2, pure numpy. `<[^>]*>` consumes through nested '<', so
    the non-overlapping matches are exactly: for each '<', the next '>'
    (same row); winners are the first '<' per distinct '>'."""
    lt = np.flatnonzero(buf == 0x3C)
    if lt.size == 0:
        return buf, offsets
    gt = np.flatnonzero(buf == 0x3E)
    j = np.searchsorted(gt, lt)
    ok = j < gt.size
    lt, j = lt[ok], j[ok]
    if lt.size == 0:
        return buf, offsets
    g = gt[j]
    row_end = offsets[np.searchsorted(offsets, lt, "right")]
    ok = g < row_end  # match end g+1 <= row_end
    lt, g = lt[ok], g[ok]
    if lt.size == 0:
        return buf, offsets
    # g is nondecreasing (lt ascending, searchsorted into sorted gt);
    # first occurrence per distinct '>' without np.unique's argsort
    first = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
    return _delete_spans_to_space(buf, offsets, lt[first], g[first] + 1)


def _unescape_entities(
    buf: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """v1 pass 4 at the bytes level: one C scan of html._charref; only
    non-identity matches are rewritten (variable-length splice)."""
    if not (buf == 0x26).any():  # no '&' anywhere
        return buf, offsets
    view = memoryview(buf)
    parts: list = []
    deltas = np.zeros(len(offsets), np.int64)
    last = 0
    for m in _CHARREF_RE.finditer(view):
        s, e = m.start(), m.end()
        row = int(np.searchsorted(offsets, s, "right")) - 1
        row_end = int(offsets[row + 1])
        if e > row_end:
            # match ran past the row; re-anchor row-locally (the
            # consumed next-row bytes contain no '&', so nothing there
            # can begin another entity)
            m2 = _CHARREF_RE.match(view, s, row_end)
            if m2 is None:
                continue
            e = m2.end()
        repl = _entity_replacement(bytes(view[s:e]))
        if repl is None:
            continue
        parts.append(view[last:s])
        parts.append(repl)
        deltas[row + 1] += len(repl) - (e - s)
        last = e
    if not parts:
        return buf, offsets
    parts.append(view[last:])
    out = np.frombuffer(b"".join(parts), np.uint8)
    return out, offsets + np.cumsum(deltas)


# single-byte Python-\s whitespace (always self-delimiting in utf-8)
_ASCII_WS_LUT = np.zeros(256, bool)
_ASCII_WS_LUT[[0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20]] = True
# multi-byte utf-8 encodings of Python-\s whitespace, grouped by lead
# byte: U+0085 U+00A0 / U+1680 / U+2000-200A U+2028 U+2029 U+202F
# U+205F / U+3000. Continuation bytes are >= 0x80, lead bytes >= 0xC2,
# so sequences can never overlap each other; utf-8 self-synchronization
# means they decode to the whitespace char in ANY surrounding context.
_MB_WS = {
    0xC2: [(0x85,), (0xA0,)],
    0xE1: [(0x9A, 0x80)],
    0xE2: [(0x80, t) for t in list(range(0x80, 0x8B)) + [0xA8, 0xA9, 0xAF]]
    + [(0x81, 0x9F)],
    0xE3: [(0x80, 0x80)],
}


def _collapse_ws_runs(
    buf: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """v1 pass 5 at the bytes level: collapse each row-local run of
    Python-\\s whitespace (ascii + multi-byte utf-8 forms) to a single
    b' ', deleting runs that touch a row edge entirely (the trim).
    Byte-equal to `\\s+`->' ' then strip() on the decoded rows: a raw
    0x85/0xA0 byte outside a valid sequence decodes to U+FFFD (not
    whitespace), which the sequence checks below respect."""
    n = buf.shape[0]
    if n == 0:
        return buf, offsets
    hist = np.bincount(buf, minlength=256)
    ws = _ASCII_WS_LUT[buf]
    for lead, tails in _MB_WS.items():
        if not hist[lead]:
            continue
        pos = np.flatnonzero(buf == lead)
        m = len(tails[0]) + 1  # sequence length for this lead byte
        pos = pos[pos + m <= n]
        if pos.size == 0:
            continue
        hit = np.zeros(pos.shape, bool)
        for tail in tails:
            t = buf[pos + 1] == tail[0]
            if len(tail) == 2:
                t &= buf[pos + 2] == tail[1]
            hit |= t
        pos = pos[hit]
        if pos.size == 0:
            continue
        # a sequence must not straddle a row boundary (per-row decode
        # would then see invalid fragments, not whitespace)
        same_row = np.searchsorted(offsets, pos, "right") == np.searchsorted(
            offsets, pos + (m - 1), "right"
        )
        pos = pos[same_row]
        for k in range(m):
            ws[pos + k] = True
    if not ws.any():
        return buf, offsets
    # row-local run starts/ends: neighbour comparisons with the
    # neighbour forced non-ws across row boundaries
    prev = np.empty_like(ws)
    prev[0] = False
    prev[1:] = ws[:-1]
    starts = offsets[:-1]
    prev[starts[starts < n]] = False
    nxt = np.empty_like(ws)
    nxt[-1] = False
    nxt[:-1] = ws[1:]
    ends = offsets[1:] - 1
    nxt[ends[ends >= 0]] = False
    rs = np.flatnonzero(ws & ~prev)
    re_ = np.flatnonzero(ws & ~nxt) + 1
    # trim: a run touching its row's start or end is deleted outright
    row = np.searchsorted(offsets, rs, "right") - 1
    keep_first = ~((rs == offsets[row]) | (re_ == offsets[row + 1]))
    # the overwhelmingly common run is a single mid-row b' ' between
    # words — already in final form; dropping those no-op spans up
    # front keeps the ufunc.at scatter small
    need = (re_ - rs > 1) | ~keep_first | (buf[rs] != 0x20)
    if not need.any():
        return buf, offsets
    return _apply_span_deletions(buf, offsets, rs[need], re_[need], keep_first[need])


def _decode_rows(buf: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """utf-8 decode to a large_string array: Arrow cast (per-value
    validation) on the fast path, per-row errors='replace' otherwise."""
    n = len(offsets) - 1
    arr = pa.Array.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(buf)]
    )
    try:
        return arr.cast(pa.large_string())
    except pa.lib.ArrowInvalid:
        view = memoryview(buf)
        return pa.array(
            [
                str(view[int(offsets[i]) : int(offsets[i + 1])], "utf-8", "replace")
                for i in range(n)
            ],
            pa.large_string(),
        )


def _invalid_utf8_rows(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Row indices whose bytes are NOT valid utf-8. Fast path is one
    SIMD-validating Arrow cast over the whole buffer (catches invalid
    sequences AND row boundaries splitting a multi-byte char); the
    per-row strict-decode loop runs only when that cast fails."""
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, np.int64)
    arr = pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(np.ascontiguousarray(offsets)),
         pa.py_buffer(np.ascontiguousarray(buf))],
    )
    try:
        arr.cast(pa.large_string())
        return np.empty(0, np.int64)
    except pa.lib.ArrowInvalid:
        pass
    view = memoryview(buf)
    bad = []
    for i in range(n):
        try:
            str(view[int(offsets[i]) : int(offsets[i + 1])], "utf-8", "strict")
        except UnicodeDecodeError:
            bad.append(i)
    return np.array(bad, np.int64)


def extract_text_column(html_col: pa.Array) -> pa.Array:
    """Vectorized batch extraction over a binary column; byte-identical
    to mapping extract_text over the rows (pytest contract). The hot
    work is C regex scans and numpy gathers over ONE concatenated
    buffer — no per-row Python on the main path (the only per-row loop
    left is the errors='replace' decode fallback for invalid utf-8)."""
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    n = len(html_col)
    if n == 0:
        return pa.array([], pa.string())
    valid = None
    if html_col.null_count:
        valid = html_col.is_valid()
    buf, offsets = binary_view(html_col)
    buf, offsets = _drop_subtrees(buf, offsets)
    buf, offsets = _strip_tags(buf, offsets)
    # The bytes-level entity pass commutes with utf-8 decode ONLY on
    # valid utf-8: on invalid rows an entity splice can fuse stray
    # bytes into a valid sequence (b'\xc2&#6\xa9' -> b'\xc2\xa9')
    # where v1's decode-first sees two U+FFFDs. Such rows take the v1
    # scalar tail; everything else stays on the vectorized path.
    bad = _invalid_utf8_rows(buf, offsets)
    fallback = None
    if bad.size:
        view = memoryview(buf)
        fallback = [
            _WS_RE.sub(
                " ",
                _htmlmod.unescape(
                    str(view[int(offsets[i]) : int(offsets[i + 1])],
                        "utf-8", "replace")
                ),
            ).strip()
            for i in bad
        ]
    buf, offsets = _unescape_entities(buf, offsets)
    buf, offsets = _collapse_ws_runs(buf, offsets)
    if not buf.flags.c_contiguous:
        buf = np.ascontiguousarray(buf)
    offsets = np.ascontiguousarray(offsets)
    text = _decode_rows(buf, offsets)
    text = text.cast(pa.string())
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if fallback is not None:
        mask = np.zeros(n, bool)
        mask[bad] = True
        text = pc.replace_with_mask(
            text, pa.array(mask), pa.array(fallback, pa.string())
        )
    if valid is not None:
        text = pc.if_else(valid, text, pa.scalar(None, pa.string()))
    return text


def canonicalize_column(text_col: pa.Array) -> pa.Array:
    """Canonical text view: NFKD-normalize, lowercase, collapse whitespace.
    Fully vectorized in pyarrow.compute.

    NFKD (not NFC) is the pinned form: this pyarrow build's utf8_normalize
    decomposes but never composes, and a canonical form only needs to be
    deterministic, not composed."""
    x = pc.utf8_normalize(text_col, form="NFKD")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)
