"""The COMPLETE BASELINE.json input_hint flow: a pages table of
(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string) -> pinned extraction -> url-keyed near-dup dedup.

Asserts the two promises the registered queries make:
  1. extraction byte-identity — extract_text(html) per url equals the
     ws-normalized source text (the input_hint per-row invariant), and
     the vectorized column kernel equals the scalar spec;
  2. cluster-partition equality — the pages flow induces the same
     partition of the corpus into clusters as the int64-keyed
     documents flow (whitespace collapse is absorbed by the canonical
     form, so shingles are identical).
"""

import re

import pyarrow as pa

from consult_ray.functions.textnorm import (
    extract_text,
    extract_text_column,
)
from consult_ray.pipelines.queries import (
    QUERIES,
    _pages_table,
)

SF_DIR = "/root/testdata/sf0.001"

_WS = re.compile(r"\s+")


def test_pages_table_is_input_hint_shape(ray_session):
    tbl = pa.concat_tables(
        _pages_table(SF_DIR).iter_batches(batch_format="pyarrow")
    )
    schema = {f.name: f.type for f in tbl.schema}
    assert schema["url"] == pa.string()
    assert schema["warc_ts"] == pa.timestamp("us")
    assert schema["html"] == pa.binary()
    assert schema["text"] == pa.string()
    assert schema["lang"] == pa.string()
    # urls are unique keys; warc_ts is deterministic in doc_id
    assert tbl.column("url").null_count == 0
    assert len(set(tbl.column("url").to_pylist())) == tbl.num_rows


def test_extraction_byte_identity_per_url(ray_session):
    """input_hint invariant: byte-identical extracted text per url —
    extract_text(html) == ws-normalized text, and the vectorized
    kernel matches the scalar spec on the same rows."""
    tbl = pa.concat_tables(
        _pages_table(SF_DIR).iter_batches(batch_format="pyarrow")
    )
    html = tbl.column("html").combine_chunks()
    want = [_WS.sub(" ", t).strip() for t in tbl.column("text").to_pylist()]
    spec = [extract_text(h) for h in html.to_pylist()]
    assert spec == want
    vec = extract_text_column(html).to_pylist()
    assert vec == want


def test_pages_clusters_match_int64_path(ray_session):
    """The registered dedup_clusters_pages query (html -> extraction ->
    url-keyed dedup) partitions the corpus exactly as the int64-keyed
    dedup_clusters query over raw documents text."""
    got = QUERIES["dedup_clusters_pages"](SF_DIR).to_pandas()
    want = QUERIES["dedup_clusters"](SF_DIR).to_pandas()

    import pyarrow.parquet as pq
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
    )
    url_of = {
        d: f"https://{s}/doc/{d}"
        for d, s in zip(docs["doc_id"].to_pylist(), docs["source"].to_pylist())
    }

    def partition(frame, key, cluster):
        groups = {}
        for k, cl in zip(frame[key], frame[cluster]):
            groups.setdefault(cl, set()).add(k)
        return {frozenset(g) for g in groups.values()}

    want_parts = {
        frozenset(url_of[d] for d in g)
        for g in partition(want, "doc_id", "cluster_id")
    }
    got_parts = partition(got, "url", "cluster_url")
    assert got_parts == want_parts
    assert len(got) == len(want)
