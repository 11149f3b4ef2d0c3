"""Single source of truth for the synthetic Common-Crawl pages view
(the BASELINE.json input_hint shape) derived from the documents table.

Every query that builds the crawl view — and every oracle SQL string
that mirrors it — must use these constants/helpers: the Ray expression
and the SQL expression are hand-mirrored twins, and a change to one
copy silently decouples a query from its oracle if the derivation is
inlined per call site.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# fixed crawl epoch (us); matches sources/synth.py's warc_ts base
PAGES_EPOCH_US = 1_500_000_000_000_000

# url = https://<source>/doc/<doc_id> — the SQL twin of pages_url()
PAGES_URL_SQL = "'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR)"


def pages_url(batch: pa.Table) -> pa.Array:
    """Ray-side url derivation, byte-identical to PAGES_URL_SQL."""
    return pc.binary_join_element_wise(
        "https://", batch["source"].cast(pa.string()), "/doc/",
        pc.cast(batch["doc_id"], pa.string()), "",
    )
