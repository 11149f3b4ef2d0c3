"""Training-data assembly queries: sequence packing, web-graph outlink
census, and model-inference quality gating — the operators that sit
between a deduped corpus and a training run. Same decoration discipline
as scrub_queries.py: anything synthetic is derived deterministically
from doc_id with the identical expression mirrored in the oracle SQL,
so the check exercises the engine kernels, not the decoration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.config import PipelineConfig
from consult_ray.util import read_parquet_clean

CFG = PipelineConfig()


def _read(sf_dir: str, table: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# --- sequence packing --------------------------------------------------

_PACK_SHARDS = 8        # sf-scale stream count; at 10^12 docs use 2^16+
_PACK_BUDGET = 2048     # tokens per training sequence


def q_pack_sequences(sf_dir: str):
    """Contiguous-with-straddle sequence packing (docs -> fixed 2048-
    token training sequences) in independent hash-sharded streams; only
    24 B (doc_id, shard, n_tok) rows shuffle. SQL-checked bit-exact
    against a windowed prefix sum."""
    from consult_ray.stages.pack import pack_sequences

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(docs, _PACK_SHARDS, _PACK_BUDGET)


_SQL_PACK = (
    f"WITH t AS (SELECT doc_id, ((doc_id % {_PACK_SHARDS}) + {_PACK_SHARDS}) "
    f"% {_PACK_SHARDS} AS shard, "
    "len(string_split(text, ' '))::BIGINT AS n_tok FROM documents), "
    "c AS (SELECT doc_id, shard, n_tok, "
    # CAST: the window SUM is HUGEINT, which pandas renders as float and
    # the driver's value hash then mismatches the engine's int64
    "CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
    "AS bef FROM t) "
    f"SELECT doc_id, shard, n_tok, bef // {_PACK_BUDGET} AS seq_id, "
    f"bef % {_PACK_BUDGET} AS seq_offset FROM c"
)


# --- global total-order statistics (curriculum / budget head) ----------

_TOKEN_BUDGET = 12_000  # ~45% of the sf0.01 corpus's 27k tokens


def _ordered_token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_chars) plus exact global rank and running
    token sum in (n_chars DESC, doc_id ASC) order — one pass of
    stages/order.global_order_stats over a negated-length sort key."""
    from consult_ray.stages.order import global_order_stats
    from consult_ray.stages.text import token_count_batch

    def stats(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch)
        neg = pc.negate_checked(t["n_chars2"])
        return pa.table({
            "neg_chars": neg,
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
        })

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    narrow = docs.map_batches(stats, batch_format="pyarrow")
    return global_order_stats(
        narrow, "neg_chars", "doc_id", "n_tokens", cfg=CFG
    )


def q_curriculum_rank(sf_dir: str):
    """Exact 1-based curriculum rank per doc (longest first, doc_id
    tiebreak) — the deterministic data-ordering step before a training
    run. Distributed sample-sort rank assignment: no task ever holds
    the corpus, ranks are boundary-independent (stages/order.py)."""
    ordered = _ordered_token_stats(sf_dir)

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pc.negate_checked(batch["neg_chars"]),
            "rank": batch["rank"],
        })

    return ordered.map_batches(out, batch_format="pyarrow")


def q_token_budget_head(sf_dir: str):
    """Token-budget head selection: keep the longest docs whose
    inclusive running token sum stays within a fixed training budget —
    exact distributed prefix sum over the curriculum order, int64
    arithmetic end to end (the SQL twin is a window SUM)."""
    ordered = _ordered_token_stats(sf_dir)

    def head(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch["running"], _TOKEN_BUDGET)
        kept = batch.filter(keep)
        return pa.table({
            "doc_id": kept["doc_id"],
            "n_tokens": kept["n_tokens"],
            "running": kept["running"],
        })

    return ordered.map_batches(head, batch_format="pyarrow")


_SQL_CURRICULUM = (
    "SELECT doc_id, length(text)::BIGINT AS n_chars, "
    "(row_number() OVER (ORDER BY length(text) DESC, doc_id))::BIGINT "
    "AS rank FROM documents"
)

_SQL_BUDGET_HEAD = (
    "WITH t AS (SELECT doc_id, "
    "len(string_split(text, ' '))::BIGINT AS n_tokens, "
    "length(text) AS n_chars FROM documents), "
    "c AS (SELECT doc_id, n_tokens, "
    # CAST: the window SUM is HUGEINT -> pandas float -> hash mismatch
    "CAST(SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running FROM t) "
    f"SELECT doc_id, n_tokens, running FROM c WHERE running <= {_TOKEN_BUDGET}"
)


# --- outlink census ----------------------------------------------------

def _decorate_link_html(batch: pa.Table) -> pa.Table:
    """Deterministic html with 1 nav link + 0-3 outlinks + an optional
    relative link per doc. Mirrored verbatim in _SQL_LINK_HTML."""
    i = batch["doc_id"]
    ids = i.to_numpy(zero_copy_only=False)
    src = batch["source"].cast(pa.string())

    def out_link_vec(j: int) -> pa.Array:
        site = pa.array(((ids * 7 + j) % 50).astype("U"))
        page = pa.array((ids % 997).astype("U"))
        full = pc.binary_join_element_wise(
            '<a href="https://site', site, ".com/doc/", page, '">l</a>', ""
        )
        return pc.if_else(pa.array(ids % 4 > j), full, pa.scalar(""))

    nav = pc.binary_join_element_wise(
        '<nav><a href="https://', src, '/home">home</a></nav>', ""
    )
    rel = pc.if_else(
        pa.array(ids % 5 == 0),
        pa.scalar('<a href="/rel/about">a</a>'),
        pa.scalar(""),
    )
    html = pc.binary_join_element_wise(
        nav, out_link_vec(0), out_link_vec(1), out_link_vec(2), rel, ""
    )
    return pa.table({"doc_id": i, "html": html})


def q_pages_links(sf_dir: str):
    """Web-graph outlink census: vectorized href extraction (two Arrow
    split kernels, stages/weblinks.py) -> explode -> per-batch partial
    counts -> one groupby(host). SQL-checked against DuckDB
    regexp_extract_all + unnest."""
    from ray.data.aggregate import Sum

    from consult_ray.stages.weblinks import links_batch
    from consult_ray.util import grouped

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def pre(batch: pa.Table) -> pa.Table:
        links = links_batch(_decorate_link_html(batch))
        # a doc's links all live in this batch, so per-batch distinct-doc
        # partials sum exactly across batches
        return grouped(
            links, ["host"], [("link", "count"), ("doc_id", "count_distinct")],
            ["n_links", "n_pages"],
        )

    # host cardinality scales with the web corpus (~10^8 at crawl
    # scale): merge the per-batch partials with a partition kernel, not
    # the native per-distinct-key aggregate (58x, commit 4fb6a54)
    from consult_ray.util import partitioned_group_agg, resolve_join_partitions

    return partitioned_group_agg(
        docs.map_batches(pre, batch_format="pyarrow"),
        "host",
        [("n_links", "sum", "n_links"), ("n_pages", "sum", "n_pages")],
        resolve_join_partitions(CFG),
    )


_SQL_LINK_HTML = (
    "'<nav><a href=\"https://' || source || '/home\">home</a></nav>' || "
    "CASE WHEN doc_id % 4 > 0 THEN '<a href=\"https://site' || "
    "((doc_id * 7) % 50) || '.com/doc/' || (doc_id % 997) || '\">l</a>' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 4 > 1 THEN '<a href=\"https://site' || "
    "((doc_id * 7 + 1) % 50) || '.com/doc/' || (doc_id % 997) || '\">l</a>' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 4 > 2 THEN '<a href=\"https://site' || "
    "((doc_id * 7 + 2) % 50) || '.com/doc/' || (doc_id % 997) || '\">l</a>' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '<a href=\"/rel/about\">a</a>' "
    "ELSE '' END"
)

_SQL_LINKS = (
    f"WITH m AS (SELECT doc_id, {_SQL_LINK_HTML} AS html FROM documents), "
    "l AS (SELECT doc_id, unnest(regexp_extract_all(html, "
    "'href=\"([^\"]*)\"', 1)) AS link FROM m), "
    "h AS (SELECT doc_id, COALESCE(regexp_extract(link, "
    "'^[a-z]+://([^/]*)', 1), '') AS host FROM l) "
    "SELECT host, count(*)::BIGINT AS n_links, "
    "count(DISTINCT doc_id)::BIGINT AS n_pages FROM h GROUP BY host"
)


# --- seeded shuffle-to-shards export -------------------------------------

_SHUF_SHARDS = 8


def q_shuffle_shards(sf_dir: str):
    """Seeded deterministic global shuffle into training shards (epoch-0
    data order): key = splitmix64(doc_id + seed), shard = key % S,
    pos = rank within shard. Bit-exact vs a DuckDB oracle replaying
    SplitMix64 in HUGEINT split-multiplication arithmetic."""
    from consult_ray.stages.pack import shuffle_shards

    docs = _read(sf_dir, "documents", ["doc_id"])
    return shuffle_shards(docs, _SHUF_SHARDS, seed=CFG.seed)


def _shuffle_sql() -> str:
    gamma = 0x9E3779B97F4A7C15
    m1 = 0xBF58476D1CE4E5B9
    m2 = 0x94D049BB133111EB
    m64, m32 = 1 << 64, 1 << 32

    def mulmod(e: str, c: int) -> str:
        # (e * c) mod 2^64 without HUGEINT overflow: split e at 2^32
        return (
            f"((({e}) % {m32}) * {c} + "
            f"(((({e}) // {m32}) * {c}) % {m32}) * {m32}) % {m64}"
        )

    x0 = f"((CAST(doc_id AS HUGEINT) + {CFG.seed} + {gamma}) % {m64})"
    x1 = mulmod(f"xor(CAST({x0} AS HUGEINT), CAST({x0} AS HUGEINT) >> 30)", m1)
    x2 = mulmod(f"xor(CAST({x1} AS HUGEINT), CAST({x1} AS HUGEINT) >> 27)", m2)
    key = f"xor(CAST(({x2}) AS HUGEINT), CAST(({x2}) AS HUGEINT) >> 31)"
    return (
        f"WITH k AS (SELECT doc_id, {key} AS key FROM documents) "
        f"SELECT doc_id, CAST(key % {_SHUF_SHARDS} AS BIGINT) AS shard, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY key % "
        f"{_SHUF_SHARDS} ORDER BY key) - 1 AS BIGINT) AS pos FROM k"
    )


_SQL_SHUFFLE = _shuffle_sql()


# --- domain-graph PageRank ----------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 10


def q_host_pagerank(sf_dir: str):
    """Domain-authority PageRank over the outlink host graph (source
    host -> linked host, distinct pairs): 10 rounds of the
    integer-arithmetic power iteration in pipelines/cluster.pagerank —
    bit-exact vs the oracle's 10 unrolled CTE rounds. Edge derivation
    reuses the pages_links href kernel and is mirrored in SQL."""
    from ray.data.aggregate import Sum

    from consult_ray.pipelines.cluster import pagerank
    from consult_ray.stages.weblinks import extract_hrefs, link_host

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def edge_partial(batch: pa.Table) -> pa.Table:
        html = _decorate_link_html(batch)["html"]
        links, row_ids = extract_hrefs(html)
        src = batch["source"].cast(pa.string()).combine_chunks().take(
            pa.array(row_ids)
        )
        t = pa.table({"src": src, "dst": link_host(links)})
        t = t.filter(pc.not_equal(t["dst"], ""))
        # per-batch distinct so the dedup shuffle moves unique pairs
        t = t.group_by(["src", "dst"]).aggregate([]).select(["src", "dst"])
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    # edge-pair cardinality scales with the corpus: dedupe distinct
    # (src, dst) pairs with a partition kernel, not the native
    # per-distinct-key aggregate (58x, commit 4fb6a54)
    from consult_ray.util import partitioned_group_agg, resolve_join_partitions

    e = partitioned_group_agg(
        docs.map_batches(edge_partial, batch_format="pyarrow"),
        ["src", "dst"], [("one", "min", "one")],
        resolve_join_partitions(CFG),
    ).select_columns(["src", "dst"])
    return pagerank(e, CFG, iters=_PR_ITERS, scale=_PR_SCALE)


def _pagerank_sql() -> str:
    base = (
        f"WITH m AS (SELECT doc_id, source, {_SQL_LINK_HTML} AS html "
        "FROM documents), "
        "l AS (SELECT source, unnest(regexp_extract_all(html, "
        "'href=\"([^\"]*)\"', 1)) AS link FROM m), "
        "hh AS (SELECT CAST(source AS VARCHAR) AS src, "
        "COALESCE(regexp_extract(link, '^[a-z]+://([^/]*)', 1), '') AS dst "
        "FROM l), "
        "e AS (SELECT DISTINCT src, dst FROM hh WHERE dst <> ''), "
        "nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e), "
        "nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes), "
        "deg AS (SELECT src, COUNT(*)::BIGINT AS outdeg FROM e GROUP BY src), "
        f"r0 AS (SELECT host, CAST({_PR_SCALE} // (SELECT n FROM nn) "
        "AS BIGINT) AS rank FROM nodes)"
    )
    step = (
        ", r{K} AS (SELECT nd.host, CAST("
        f"(15 * {_PR_SCALE}) // (100 * (SELECT n FROM nn))"
        " + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank "
        "FROM nodes nd LEFT JOIN ("
        "SELECT e.dst AS host, SUM(p.rank // d.outdeg) AS c "
        "FROM e JOIN r{P} p ON p.host = e.src "
        "JOIN deg d ON d.src = e.src GROUP BY e.dst) s USING (host))"
    )
    parts = [base]
    for k in range(1, _PR_ITERS + 1):
        parts.append(step.format(K=k, P=k - 1))
    parts.append(f" SELECT host, rank AS pr FROM r{_PR_ITERS}")
    return "".join(parts)


_SQL_PAGERANK = _pagerank_sql()


def q_authority_top_docs(sf_dir: str):
    """Authority-weighted curation: rank docs by their host's PageRank
    (ties: n_chars desc, then doc_id) and keep the global top-20 — the
    crawl-frontier-priority composition, a graph metric feeding a
    curation decision. The pr table is one row per HOST (bounded by the
    domain count, ~10^7-10^8 at web scale, not doc count), so it ships
    once via ray.put as a sorted lookup array (the assign_clusters
    broadcast shape) and the doc table never shuffles; the tail is a
    sort + limit on 24 B rows. Inner-join semantics mirror the SQL
    oracle: docs whose host is absent from the link graph drop."""
    import ray

    pr = q_host_pagerank(sf_dir).to_pandas().sort_values("host")
    hosts = pr["host"].to_numpy(dtype=object).astype(str)
    ranks = pr["pr"].to_numpy().astype(np.int64)
    ref = ray.put((hosts, ranks))

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def attach(batch: pa.Table) -> pa.Table:
        h, v = ray.get(ref)
        src = np.asarray(
            batch["source"].cast(pa.string()).to_pylist(), dtype=object
        ).astype(str)
        idx = np.searchsorted(h, src)
        idx_c = np.minimum(idx, len(h) - 1)
        ok = (idx < len(h)) & (h[idx_c] == src)
        out = batch.filter(pa.array(ok))
        return out.append_column("pr", pa.array(v[idx_c[ok]]))

    return (
        docs.map_batches(attach, batch_format="pyarrow")
        .sort(["pr", "n_chars", "doc_id"], descending=[True, True, False])
        .limit(20)
    )


_SQL_AUTHORITY_TOP = (
    f"SELECT d.doc_id, d.source, d.n_chars, p.pr FROM documents d "
    f"JOIN ({_SQL_PAGERANK}) p ON CAST(d.source AS VARCHAR) = p.host "
    "ORDER BY p.pr DESC, d.n_chars DESC, d.doc_id LIMIT 20"
)


# --- model-inference quality gate ---------------------------------------

def q_quality_classifier(sf_dir: str):
    """Batched model inference: hashed bag-of-words linear scorer as an
    actor pool (weights built once per actor). Rows-only driver check;
    tests/test_classifier.py pins the batch kernel to a per-row
    reference implementation bit-for-bit."""
    from consult_ray.stages.classifier import HashedLinearScorer

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(
        HashedLinearScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).select_columns(["doc_id", "quality_score", "quality_keep"])


# --- FASTA / FASTQ source formats (S1/S3, the reference's native IO) ----

def _roundtrip_dir(sf_dir: str, kind: str, writer) -> str:
    """Deterministic one-time export of documents to /tmp in the given
    record format (same cache discipline as scrub_queries.docs_from_jsonl:
    keyed by sf_dir+rows, _SUCCESS marker, atomic dir swap)."""
    import hashlib
    import os
    import shutil

    src = _read(sf_dir, "documents", ["doc_id", "text"])
    n = src.count()
    key = hashlib.md5(f"{sf_dir}:{n}:{kind}:v1".encode()).hexdigest()[:12]
    out_dir = f"/tmp/consult_ray_{kind}/{key}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import tempfile

        # unique tmp per process (concurrent builders never share a dir)
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f"{key}.tmp",
                               dir=os.path.dirname(out_dir))
        writer(src, tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.replace(tmp, out_dir)
        except OSError:  # lost the swap race; the winner's copy is live
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _record_stats(ds, with_qual: bool):
    def stats(batch: pa.Table) -> pa.Table:
        cols = {
            "doc_id": pc.cast(batch["rec_id"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch["seq"]), pa.int64()),
            "head": pc.utf8_slice_codeunits(batch["seq"], 0, 16),
        }
        if with_qual:
            cols["qual_len"] = pc.cast(
                pc.utf8_length(batch["qual"]), pa.int64()
            )
        return pa.table(cols)

    return ds.map_batches(stats, batch_format="pyarrow")


def q_docs_from_fasta(sf_dir: str):
    """REAL FASTA reader (S1, /root/reference/main_map.cpp:540-542):
    documents exported once as .fa shards, read back with
    read_binary_files + Arrow record parsing (file = unit of
    parallelism), per-record id/length/head checked against the parquet
    truth by the SQL oracle."""
    import os

    from consult_ray.sources.fasta import read_fasta, write_fasta_shards

    d = _roundtrip_dir(sf_dir, "fasta", write_fasta_shards)
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".fa")]
    return _record_stats(read_fasta(files), with_qual=False)


def q_docs_from_fastq(sf_dir: str):
    """REAL FASTQ reader (S3 4-line framing,
    /root/reference/main_search.cpp:755-766), same round-trip contract
    as docs_from_fasta plus the quality line (constant 'I' x len)."""
    import os

    from consult_ray.sources.fasta import read_fastq, write_fastq_shards

    d = _roundtrip_dir(sf_dir, "fastq", write_fastq_shards)
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".fq")]
    return _record_stats(read_fastq(files), with_qual=True)


# newline->space at export is length-preserving, so length(text) is the
# oracle's n_chars either way
_SQL_FASTA = (
    "SELECT doc_id, length(text)::BIGINT AS n_chars, "
    "substring(replace(text, chr(10), ' '), 1, 16) AS head FROM documents"
)
_SQL_FASTQ = (
    "SELECT doc_id, length(text)::BIGINT AS n_chars, "
    "substring(replace(text, chr(10), ' '), 1, 16) AS head, "
    "length(text)::BIGINT AS qual_len FROM documents"
)


# --- quality features (integer inputs of the quality score) --------------

_STOPLIST = (
    "the a an and or of to in is was for it with as on be at by that this "
    "he she they we you i not are were had has have from but"
).split()


def q_docs_from_warc(sf_dir: str):
    """WARC source round-trip (the container format Common-Crawl pages
    ship in; sources/warc.py): the documents table is exported once as
    Content-Length-framed .warc shards over the input_hint pages view
    (url from pagesview.pages_url, WARC-Date from the fixed crawl
    epoch), read back with read_binary_files + per-file framing hops,
    and reduced to per-record (url, warc_date, n_bytes). Payloads are
    length-framed, never escaped, so any byte sequence round-trips —
    tests/test_warc.py proves a payload containing the record separator
    AND a fake header survives byte-exact. Oracle = the same derivation
    on parquet."""
    import hashlib
    import os
    import shutil

    from consult_ray.pipelines.pagesview import PAGES_EPOCH_US, pages_url
    from consult_ray.sources.warc import read_warc, write_warc_shards

    src = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    n = src.count()
    key = hashlib.md5(f"{sf_dir}:{n}:warc:v2".encode()).hexdigest()[:12]
    out_dir = f"/tmp/consult_ray_warc/{key}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import tempfile

        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f"{key}.tmp",
                               dir=os.path.dirname(out_dir))

        def to_pages(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "url": pages_url(batch),
                "ts_us": pa.array(PAGES_EPOCH_US + ids * 1_000_000),
                "payload": batch["text"].cast(pa.large_binary()),
            })

        write_warc_shards(src.map_batches(to_pages, batch_format="pyarrow"),
                          tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.replace(tmp, out_dir)
        except OSError:  # lost the swap race; the winner's copy is live
            shutil.rmtree(tmp, ignore_errors=True)

    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".warc")
    ]
    ds = read_warc(files)

    def stats(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "warc_date": batch["warc_date"],
            "n_bytes": pc.cast(pc.binary_length(batch["payload"]),
                               pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def _sql_warc() -> str:
    from consult_ray.pipelines.pagesview import (
        PAGES_EPOCH_US,
        PAGES_URL_SQL,
    )

    return (
        f"SELECT {PAGES_URL_SQL} AS url, "
        f"strftime(make_timestamp({PAGES_EPOCH_US} + doc_id * 1000000), "
        "'%Y-%m-%dT%H:%M:%SZ') AS warc_date, "
        "CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents"
    )


def q_quality_features(sf_dir: str):
    """The INTEGER inputs of stages/text.py's quality score — char,
    token, stopword, punctuation, alpha counts per doc — SQL-checked
    bit-exact (both engines run RE2; the derived float ratios stay in
    the rows-only `quality_scores` query because cross-engine float
    rounding is not bit-stable)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    stopset = pa.array(_STOPLIST)

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        text = batch["text"]
        toks = pc.split_pattern(text, " ")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        tok_doc = np.repeat(np.arange(batch.num_rows), n_per)
        is_stop = pc.is_in(flat, value_set=stopset).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            tok_doc, weights=is_stop.astype(np.float64), minlength=batch.num_rows
        ).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_stop": pa.array(n_stop),
            "n_punct": pc.cast(
                pc.count_substring_regex(text, r"[^\w\s]"), pa.int64()
            ),
            "n_alpha": pc.cast(
                pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64()
            ),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


_SQL_QUALITY_FEATURES = (
    "SELECT doc_id, length(text)::BIGINT AS n_chars, "
    "len(string_split(text, ' '))::BIGINT AS n_tokens, "
    "len(list_filter(string_split(text, ' '), x -> x IN ("
    + ",".join(f"'{s}'" for s in _STOPLIST)
    + ")))::BIGINT AS n_stop, "
    "len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct, "
    "len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS n_alpha "
    "FROM documents"
)


def q_ttr_stats(sf_dir: str):
    """Per-doc type-token statistics — n_tokens (non-empty words),
    n_types (distinct words), n_hapax (words occurring once in the doc)
    — the integer inputs of type-token-ratio / vocabulary-growth
    quality heuristics (the float ratio stays derived, like
    quality_scores). The distinct fold runs INSIDE the batch with one
    Arrow group_by over (row, word): doc-bounded, zero shuffle."""
    from consult_ray.util import grouped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        n_per = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        tok_doc = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), n_per
        )[keep]
        pairs = pa.table({
            "d": pa.array(tok_doc),
            "w": pa.chunked_array([flat]).combine_chunks().filter(
                pa.array(keep)
            ),
            "one": pa.array(np.ones(len(tok_doc), dtype=np.int64)),
        })
        per = grouped(pairs, ["d", "w"], [("one", "sum")], ["c"])
        d = per["d"].to_numpy(zero_copy_only=False)
        c = per["c"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(
                np.bincount(tok_doc, minlength=n).astype(np.int64)
            ),
            "n_types": pa.array(
                np.bincount(d, minlength=n).astype(np.int64)
            ),
            "n_hapax": pa.array(
                np.bincount(d[c == 1], minlength=n).astype(np.int64)
            ),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


_SQL_TTR = (
    "WITH nz AS ("
    "SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents"
    "), g AS ("
    "SELECT doc_id, w, count(*) AS c FROM nz WHERE w <> '' GROUP BY 1, 2"
    "), agg AS ("
    "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS n_types, "
    "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax "
    "FROM g GROUP BY doc_id) "
    "SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens, "
    "COALESCE(a.n_types, 0) AS n_types, "
    "COALESCE(a.n_hapax, 0) AS n_hapax "
    "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
)


# --- context-window chunking ---------------------------------------------

_CHUNK_W = 128   # window tokens
_CHUNK_S = 96    # stride (32-token overlap)


def q_doc_chunks(sf_dir: str):
    """Context-window chunking: each doc explodes into overlapping
    128-token windows at stride 96 (the RAG/embedding-prep operator).
    Row-local and shuffle-free — pure window arithmetic over each
    batch's flattened token array; emits per chunk (doc_id, chunk_no,
    n_tok, first/last token) so the SQL oracle can check boundary
    placement exactly without rebuilding chunk text."""
    import numpy as np

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    W, S = _CHUNK_W, _CHUNK_S

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch["text"], " ")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        tok_start = np.concatenate(([0], np.cumsum(n_per)[:-1]))
        m = 1 + np.maximum(0, -(-(n_per - W) // S))
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), m)
        cm = np.concatenate(([0], np.cumsum(m)))
        k = np.arange(int(cm[-1]), dtype=np.int64) - cm[doc_of]
        start = k * S
        end = np.minimum(start + W, n_per[doc_of])
        first = flat.take(pa.array(tok_start[doc_of] + start))
        last = flat.take(pa.array(tok_start[doc_of] + end - 1))
        return pa.table({
            "doc_id": pa.array(ids[doc_of]),
            "chunk_no": pa.array(k),
            "n_tok": pa.array(end - start),
            "first_tok": first,
            "last_tok": last,
        })

    return docs.map_batches(fn, batch_format="pyarrow")


_SQL_CHUNKS = (
    "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws, "
    "len(string_split(text, ' '))::BIGINT AS n FROM documents), "
    f"c AS (SELECT doc_id, ws, n, 1 + GREATEST(0, "
    f"CAST(ceil((n - {_CHUNK_W}) / {_CHUNK_S}.0) AS BIGINT)) AS m FROM d), "
    "nums AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 65536)) "
    f"SELECT doc_id, k AS chunk_no, "
    f"LEAST(k * {_CHUNK_S} + {_CHUNK_W}, n) - k * {_CHUNK_S} AS n_tok, "
    f"ws[k * {_CHUNK_S} + 1] AS first_tok, "
    f"ws[LEAST(k * {_CHUNK_S} + {_CHUNK_W}, n)] AS last_tok "
    "FROM c JOIN nums ON nums.k < c.m"
)


# --- ANN self-evaluation ---------------------------------------------------

def q_knn_recall(sf_dir: str):
    """Eval harness for the approximate similarity paths: overlap@10 of
    the hyperplane-LSH, IVF and product-quantization top-k against the
    exact brute-force top-k for the same query vector. Deterministic
    (seeded planes / k-means / codebooks); rows-only. The flagship LSH
    near-dup path has its own recall>=0.99 pytest — this surfaces ANN
    quality as data."""
    import pandas as pd

    from consult_ray.pipelines.queries import (
        q_knn_cosine,
        q_knn_ivf,
        q_knn_lsh,
        q_knn_pq,
    )

    brute = set(q_knn_cosine(sf_dir).to_pandas()["vec_id"])
    rows = []
    for method, q in (("lsh", q_knn_lsh), ("ivf", q_knn_ivf),
                      ("pq", q_knn_pq)):
        approx = set(q(sf_dir).to_pandas()["vec_id"])
        rows.append({
            "method": method,
            "k": len(brute),
            "n_overlap": len(brute & approx),
        })
    return pd.DataFrame(rows)


# --- n-gram LM quality filter (CCNet shape) --------------------------------

_LM_WIDTH = 1 << 18
_LM_SEED = 7171
_LM_ADDK = 0.1


def q_lm_score(sf_dir: str):
    """CCNet-style LM quality filter: pass 1 trains a hashed bigram LM
    on the corpus (per-block count partials, one merge), pass 2 scores
    every doc's mean bigram log-prob via an actor pool holding the
    ray.put model. Rows-only; tests/test_lm.py pins the batch kernel to
    a per-row reference and asserts repeated text scores above shuffled
    text (the filter's discriminating property)."""
    import ray

    from consult_ray.stages.lm import BigramLMScorer, train_bigram_lm

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    c1, c2 = train_bigram_lm(docs, _LM_WIDTH, _LM_SEED)
    c1_ref, c2_ref = ray.put(c1), ray.put(c2)
    return docs.map_batches(
        BigramLMScorer,
        fn_constructor_kwargs=dict(
            c1_ref=c1_ref, c2_ref=c2_ref, width=_LM_WIDTH,
            seed=_LM_SEED, add_k=_LM_ADDK,
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).select_columns(["doc_id", "lm_logprob"])


# --- BPE tokenizer training (stages/bpe.py) --------------------------------

_BPE_MERGES = 48
_BPE_MAX_WORDS = 4096


def q_bpe_pair_counts(sf_dir: str):
    """Round-0 BPE statistics: top-50 adjacent-char pairs over every
    word occurrence (count desc, pair asc). The per-batch kernel folds
    the word census INTO the block (value_counts, then one weighted
    vectorized pair scan over the concatenated codepoints), so the only
    shuffle is the alphabet^2-bounded (pair, n) groupby. SQL-checked:
    packed uint64 pair order == (left, right) binary collation."""
    from consult_ray.stages.bpe import pair_counts, pair_strings

    docs = _read(sf_dir, "documents", ["text"])
    top = (
        pair_counts(docs)
        .sort(["n", "pair"], descending=[True, False])
        .limit(50)
    )

    def expand(batch: pa.Table) -> pa.Table:
        return pair_strings(batch).select(["left", "right", "n"])

    return top.map_batches(expand, batch_format="pyarrow")


def q_bpe_vocab(sf_dir: str):
    """Trained BPE merge table (rank, left, right, token, n): ONE
    distributed census pass shrinks the corpus to its distinct-word
    frequency table, the greedy merge loop then runs over the bounded
    top-`max_words` slice only (the census-then-local-merges shape every
    production tokenizer trainer uses at scale). SQL-checked since
    round 5: _bpe_vocab_sql unrolls every merge round as materialized
    CTEs — per-round pair census (sum of word counts over lead()
    windows), (n DESC, left, right) argmax, and the greedy
    left-to-right rewrite via the run-parity rule (consecutive hit
    positions only arise for left==right; keep even offsets). Integer
    counts end-to-end, so DuckDB replays training bit-exactly (also
    pinned by tests/test_bpe.py's brute per-word reference)."""
    from consult_ray.stages.bpe import train_bpe, word_census

    docs = _read(sf_dir, "documents", ["text"])
    return train_bpe(
        word_census(docs, cfg=CFG), n_merges=_BPE_MERGES, max_words=_BPE_MAX_WORDS
    )


def q_bpe_encode(sf_dir: str):
    """Fixed-table BPE encoding of the whole corpus: train once on the
    census (driver-side bounded merge loop), then an actor pool applies
    the merge table to every block — the reference's build-table-once /
    stream-reads-against-it shape (main_map.cpp builds,
    main_search.cpp:704-894 consumes). Emits (doc_id, n_tokens,
    n_words, n_chars); merges compile once per actor in __init__.
    Rows-only; tests/test_bpe.py asserts n_tokens equals the brute
    per-doc encoder and the n_words/n_chars columns are SQL-trivial."""
    from consult_ray.stages.bpe import BpeEncoder, train_bpe, word_census

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = train_bpe(
        word_census(docs, cfg=CFG), n_merges=_BPE_MERGES, max_words=_BPE_MAX_WORDS
    )
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_kwargs=dict(merges=merges),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def _bpe_vocab_sql(n_merges: int = _BPE_MERGES,
                   max_words: int = _BPE_MAX_WORDS,
                   min_count: int = 2) -> str:
    """DuckDB replay of stages.bpe.train_bpe (see q_bpe_vocab): every
    merge round unrolled as MATERIALIZED CTEs (DuckDB inlines plain
    CTEs, which re-executes the whole round chain per reference —
    exponential). t{k} holds the round-k tokenization as (word, pos,
    count, symbol) rows; b{k} picks the round's merge by (n DESC, left,
    right) — the engine's tie-break, since a merge product (len >= 2)
    can never equal a single char, string order determines the id order
    too; the rewrite keeps hit positions with EVEN offset inside runs
    of consecutive hits (only left==right can produce runs), exactly
    train_bpe's greedy left-to-right rule. Output stops at the first
    round whose count drops below min_count (the engine's stop rule);
    validated round-for-round against a brute per-word Python trainer
    on repeat-run-heavy fixtures before adoption."""
    parts = [f"""WITH bpe_words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM bpe_words WHERE w <> ''
  GROUP BY w ORDER BY cnt DESC, w LIMIT {max_words}
),
bpe_nums AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 65536)),
t0 AS MATERIALIZED (
  SELECT wc.w, n.i, wc.cnt, substring(wc.w, CAST(n.i AS INT), 1) AS s
  FROM wc JOIN bpe_nums n ON n.i <= length(wc.w)
)"""]
    for k in range(n_merges):
        parts.append(f""",
b{k} AS MATERIALIZED (
  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS n FROM (
    SELECT s AS l, lead(s) OVER (PARTITION BY w ORDER BY i) AS r, cnt
    FROM t{k}
  ) WHERE r IS NOT NULL
  GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1
),
mm{k} AS MATERIALIZED (
  SELECT *, CASE WHEN hit = 1 AND
      (rn - min(rn) OVER (PARTITION BY w, run)) % 2 = 0
    THEN 1 ELSE 0 END AS merged
  FROM (
    SELECT *, CASE WHEN hit = 1 THEN
        CAST(rn - row_number() OVER (PARTITION BY w, hit ORDER BY rn)
             AS BIGINT)
      ELSE NULL END AS run
    FROM (
      SELECT w, i, cnt, s,
        lead(s) OVER (PARTITION BY w ORDER BY i) AS nxt,
        row_number() OVER (PARTITION BY w ORDER BY i) AS rn,
        CASE WHEN s = (SELECT l FROM b{k})
              AND lead(s) OVER (PARTITION BY w ORDER BY i)
                  = (SELECT r FROM b{k})
             THEN 1 ELSE 0 END AS hit
      FROM t{k}
    )
  )
),
t{k + 1} AS MATERIALIZED (
  SELECT w, rn AS i, cnt,
    CASE WHEN merged = 1 THEN s || nxt ELSE s END AS s
  FROM (SELECT *, COALESCE(lag(merged) OVER (PARTITION BY w ORDER BY rn), 0)
          AS prev_m FROM mm{k})
  WHERE prev_m = 0
)""")
    sel = " UNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", '
        f"l || r AS token, n FROM b{k}"
        for k in range(n_merges)
    )
    parts.append(f""",
merged_all AS (SELECT * FROM ({sel}))
SELECT CAST(rank AS BIGINT) AS rank, "left", "right", token,
       CAST(n AS BIGINT) AS n
FROM merged_all
WHERE rank < COALESCE(
  (SELECT MIN(rank) FROM merged_all WHERE n < {min_count}), {n_merges})
ORDER BY rank""")
    return "".join(parts)


_SQL_BPE_VOCAB = _bpe_vocab_sql()


_SQL_BPE_PAIRS = (
    "WITH words AS ("
    "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
    "), nz AS (SELECT w FROM words WHERE w <> ''), "
    "pairs AS ("
    "SELECT substring(w, n.i, 1) AS \"left\", "
    "substring(w, n.i + 1, 1) AS \"right\" "
    "FROM nz JOIN (SELECT CAST(range AS INT) AS i FROM range(1, 65536)) n "
    "ON n.i < length(w)) "
    "SELECT \"left\", \"right\", CAST(count(*) AS BIGINT) AS n "
    "FROM pairs GROUP BY 1, 2 ORDER BY n DESC, 1, 2 LIMIT 50"
)


# --- lineage / metrics surface ------------------------------------------

def q_pipeline_lineage(sf_dir: str):
    """The north-rule lineage/metrics contract as a driver-visible
    query: run the checkpointed flagship pipeline end-to-end in a fresh
    workdir and return its stage lineage (stage, rows_out, skipped).
    Wall-times and per-partition file splits are in the workdir's
    lineage JSONL (nondeterministic across runs, so not in the checked
    output); tests/test_checkpoint_resume.py covers resume semantics
    (rerun -> all stages skipped=True, identical outputs)."""
    import tempfile

    import pandas as pd

    from consult_ray.pipelines.checkpointed import CheckpointedDedupPipeline

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # fresh workdir per call — reuse would flip `skipped` to True; the
    # result is fully materialized below, so the dir is removed eagerly
    wd = tempfile.mkdtemp(prefix="consult_ray_lineage_")
    try:
        pipe = CheckpointedDedupPipeline(wd, CFG)
        pipe.run(docs)
        t = pipe.lineage_table().select(["stage", "rows_out", "skipped"])
        return t.to_pandas().sort_values("stage", ignore_index=True)
    finally:
        import shutil

        shutil.rmtree(wd, ignore_errors=True)


TRAIN_QUERIES = {
    "docs_from_fasta": q_docs_from_fasta,
    "docs_from_fastq": q_docs_from_fastq,
    "pipeline_lineage": q_pipeline_lineage,
    "quality_features": q_quality_features,
    "doc_chunks": q_doc_chunks,
    "knn_recall": q_knn_recall,
    "lm_score": q_lm_score,
    "pack_sequences": q_pack_sequences,
    "pages_links": q_pages_links,
    "host_pagerank": q_host_pagerank,
    "authority_top_docs": q_authority_top_docs,
    "shuffle_shards": q_shuffle_shards,
    "quality_classifier": q_quality_classifier,
    "curriculum_rank": q_curriculum_rank,
    "token_budget_head": q_token_budget_head,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_vocab": q_bpe_vocab,
    "bpe_encode": q_bpe_encode,
    "ttr_stats": q_ttr_stats,
    "docs_from_warc": q_docs_from_warc,
}

TRAIN_ORACLE_SQL = {
    "pack_sequences": _SQL_PACK,
    "pages_links": _SQL_LINKS,
    "host_pagerank": _SQL_PAGERANK,
    "authority_top_docs": _SQL_AUTHORITY_TOP,
    "shuffle_shards": _SQL_SHUFFLE,
    "docs_from_fasta": _SQL_FASTA,
    "docs_from_fastq": _SQL_FASTQ,
    "quality_features": _SQL_QUALITY_FEATURES,
    "doc_chunks": _SQL_CHUNKS,
    "curriculum_rank": _SQL_CURRICULUM,
    "token_budget_head": _SQL_BUDGET_HEAD,
    "bpe_pair_counts": _SQL_BPE_PAIRS,
    "bpe_vocab": _SQL_BPE_VOCAB,
    "ttr_stats": _SQL_TTR,
    "docs_from_warc": _sql_warc(),
}
