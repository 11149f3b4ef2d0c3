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
    """
    body = _DROP_RE.sub(b" ", html_bytes)
    body = _TAG_RE.sub(b" ", body)
    text = body.decode("utf-8", errors="replace")
    text = _htmlmod.unescape(text)
    return _WS_RE.sub(" ", text).strip()


def extract_text_column(html_col: pa.Array) -> pa.Array:
    """Batch extraction over a binary column. Regex work is per-value
    (CPython regex over bytes, C speed); this stage runs in stateless
    map_batches tasks so it scales out with input blocks."""
    return pa.array(
        [extract_text(v) if v is not None else None for v in html_col.to_pylist()],
        type=pa.string(),
    )


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
