"""Corpus-hygiene queries: PII redaction, canonical-URL normalization,
and benchmark decontamination — the scrub passes a training-data
pipeline runs between extraction and dedup.

The sf documents table contains no natural PII or messy urls, so (like
queries.py's `_pages_table`) each query deterministically DECORATES the
rows from doc_id first — the identical decoration expression appears in
the SQL oracle, so the correctness check exercises the actual scrub
kernels, not the decoration. Both Arrow and DuckDB run RE2, which is
what makes the regex-for-regex mirroring sound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.config import PipelineConfig
from consult_ray.util import read_parquet_clean, resolve_join_partitions

CFG = PipelineConfig()


def _read(sf_dir: str, table: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _s(col) -> pa.Array:
    return pc.cast(col, pa.string())


# --- PII redaction ---------------------------------------------------

def _decorate_pii(batch: pa.Table) -> pa.Table:
    """Append a deterministic PII footer (email + IPv4 + phone) to each
    doc. Mirrored literally in the oracle SQL."""
    import numpy as np

    i = batch["doc_id"]
    ids = i.to_numpy(zero_copy_only=False)
    footer = pc.binary_join_element_wise(
        " Contact user",
        _s(i), "@mail",
        pa.array((ids % 7).astype("U")),
        ".example.com from 10.",
        pa.array((ids % 200).astype("U")),
        ".0.",
        pa.array((ids % 100).astype("U")),
        " tel +1 555 ",
        pa.array((1_000_000 + ids % 1_000_000).astype("U")),
        "",
    )
    return pa.table({
        "doc_id": i,
        "text": pc.binary_join_element_wise(batch["text"], footer, ""),
    })


def q_pii_redact(sf_dir: str):
    """Vectorized global RE2 redaction (email -> <EMAIL>, IPv4 -> <IP>,
    phone -> <PHONE>), ordered rewrites — SQL-checked bit-exact against
    DuckDB regexp_replace(..., 'g') with the same pattern sequence."""
    from consult_ray.stages.scrub import redact_pii_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(_decorate_pii, batch_format="pyarrow").map_batches(
        redact_pii_batch, batch_format="pyarrow"
    )


# the decoration expression, verbatim, for the oracle
_SQL_PII_TEXT = (
    "text || ' Contact user' || doc_id || '@mail' || (doc_id % 7) || "
    "'.example.com from 10.' || (doc_id % 200) || '.0.' || (doc_id % 100) || "
    "' tel +1 555 ' || (1000000 + doc_id % 1000000)"
)

_SQL_PII_REDACT = (
    "regexp_replace(regexp_replace(regexp_replace({t}, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'), "
    "'\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'), "
    "'\\+\\d[\\d ]{{7,}}\\d', '<PHONE>', 'g')"
).format(t=_SQL_PII_TEXT)


# --- canonical URL ---------------------------------------------------

def _decorate_urls(batch: pa.Table) -> pa.Table:
    """A deterministic messy url per doc: uppercase scheme+www+host,
    optional trailing slash, tracking and/or real query params."""
    import numpy as np

    i = batch["doc_id"]
    ids = i.to_numpy(zero_copy_only=False)
    trail = pa.array(np.where(ids % 3 == 0, "/", ""))
    m4 = ids % 4
    query = pa.array(
        np.where(
            m4 == 0, "?utm_source=feed&ref=abc",
            np.where(m4 == 2, "?utm_campaign=x&page=2", ""),
        )
    )
    url = pc.binary_join_element_wise(
        "HTTPS://WWW.Site",
        pa.array((ids % 50).astype("U")),
        ".COM/Doc/",
        _s(i), trail, query,
        "",
    )
    return pa.table({"doc_id": i, "url": url})


def q_url_canonical(sf_dir: str):
    """Canonical-URL normalization: lowercase scheme+host (path case
    preserved), strip www., drop utm_*/ref tracking params, tidy
    dangling separators, strip trailing slash. SQL-checked bit-exact
    (the oracle mirrors the same ordered RE2 rewrites)."""
    from consult_ray.stages.scrub import canonicalize_url

    docs = _read(sf_dir, "documents", ["doc_id"])

    def canon(batch: pa.Table) -> pa.Table:
        b = _decorate_urls(batch)
        return pa.table({
            "doc_id": b["doc_id"],
            "url": b["url"],
            "url_canonical": canonicalize_url(b["url"]),
        })

    return docs.map_batches(canon, batch_format="pyarrow")


_SQL_URL = (
    "'HTTPS://WWW.Site' || (doc_id % 50) || '.COM/Doc/' || doc_id || "
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || "
    "CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=abc' "
    "WHEN doc_id % 4 = 2 THEN '?utm_campaign=x&page=2' ELSE '' END"
)

_SQL_URL_CANON = (
    "regexp_replace(regexp_replace(regexp_replace("
    "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1)) || "
    "regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1), "
    "'^([a-z][a-z0-9+.-]*://)(www\\.)+', '\\1', 'g'), "
    "'(utm_[a-z]+|ref)=[^&]*&?', '', 'g'), "
    "'[?&/]+$', '', 'g')"
)


# --- decontamination -------------------------------------------------

_DECON_K = 40          # snippet byte width (one rolling-hash window)
_DECON_MOD = 97        # benchmark set = docs with doc_id % 97 == 1


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag every doc containing any
    benchmark snippet (a fixed 40-byte slice of each doc_id%97==1 doc).
    Scan = batch rolling-hash windows vs the broadcast sorted snippet
    hash set (8 B/snippet on the wire), exact substring verify on
    flagged docs only. SQL-checked against DuckDB EXISTS/contains.

    The snippet set is restricted to ASCII-only docs so the 40-CHAR
    slice here (and in the char-based SQL) is exactly the 40 BYTES one
    rolling-hash window covers — without the gate a multi-byte char in
    the slice would trip snippet_window_hashes' byte-width assert and
    the byte-window scan would diverge from the char-based oracle.
    (Scanned documents themselves need no gate: an ASCII snippet can
    never equal a window that splits a multi-byte char, because
    continuation bytes are >= 0x80.)"""
    import ray

    from consult_ray.stages.scrub import ContaminationScanner

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def mk_snip(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        blens = pc.binary_length(batch["text"]).to_numpy(zero_copy_only=False)
        t = batch.filter(
            pa.array((ids % _DECON_MOD == 1) & (lens >= 50) & (lens == blens))
        )
        return pa.table({"s": pc.utf8_slice_codeunits(t["text"], 10, 50)})

    # benchmark set: tiny by construction (1/97 of the corpus); at scale
    # keep only the hash set and shard it (ContaminationScanner doc)
    snippets = [
        r["s"] for r in docs.map_batches(mk_snip, batch_format="pyarrow").take_all()
    ]
    ref = ray.put(snippets)
    return docs.map_batches(
        ContaminationScanner,
        fn_constructor_kwargs=dict(snippets_ref=ref, k=_DECON_K),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


_SQL_DECON = (
    "WITH snip AS (SELECT substring(text, 11, 40) AS s FROM documents "
    f"WHERE doc_id % {_DECON_MOD} = 1 AND length(text) >= 50 "
    "AND strlen(text) = length(text)) "
    "SELECT d.doc_id, EXISTS (SELECT 1 FROM snip WHERE contains(d.text, snip.s)) "
    "AS contaminated FROM documents d"
)


# --- boilerplate line removal (C4/CCNet pass) ------------------------

_BOILER_T = 5  # a line present in >= T distinct docs is boilerplate


def q_boilerplate_scrub(sf_dir: str):
    """C4/CCNet-style boilerplate removal: census lines across the
    corpus (distinct-doc counts, pre-aggregated per batch before the
    merge), drop every line that appears in >= T distinct docs, and
    reassemble each doc from its surviving lines in order.

    Scale shape: the census keys on the 64-bit line-content HASH, so
    only (line_hash, partial-count) 16 B rows shuffle and the merge is
    a partition kernel (line cardinality = corpus line count — the
    native per-distinct-key aggregate's measured 58x cliff, 4fb6a54,
    AND line strings would otherwise ride the shuffle). Driver intake
    and the ray.put broadcast are bounded at 8 B per frequent line
    (<= total_lines/T entries) regardless of line length — the
    q_decontaminate hash-set pattern — where broadcasting the strings
    themselves would be GBs at 100 TB. Pass 2 is embarrassingly
    parallel; membership is hash equality at the repo-standard 64-bit
    collision contract (~3e-5 odds at 2^40 lines, same as
    exact_dedup_groups), so it matches the string-exact SQL oracle
    whenever the corpus is collision-free."""
    import ray

    from consult_ray.stages.lines import lines_batch
    from consult_ray.stages.text import doc_fingerprint_batch
    from consult_ray.util import grouped, partitioned_group_agg

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def pre(batch: pa.Table) -> pa.Table:
        lt = lines_batch(batch)
        lt = lt.append_column(
            "line_hash", doc_fingerprint_batch(lt, text_col="line")["content_hash"]
        )
        return grouped(
            lt, ["line_hash"], [("doc_id", "count_distinct")], ["nd"]
        )

    freq = partitioned_group_agg(
        docs.map_batches(pre, batch_format="pyarrow"),
        "line_hash", [("nd", "sum", "nd")], resolve_join_partitions(CFG),
    ).filter(expr=f"nd >= {_BOILER_T}")
    frequent = np.sort(
        np.array(
            [r["line_hash"] for r in freq.select_columns(["line_hash"]).take_all()],
            dtype=np.int64,
        ).view(np.uint64)
    )
    ref = ray.put(frequent)

    def scrub(batch: pa.Table) -> pa.Table:
        from consult_ray.stages.scrub import remove_frequent_lines_batch

        return remove_frequent_lines_batch(batch, frequent_hashes=ray.get(ref))

    return docs.map_batches(scrub, batch_format="pyarrow")


# the lines CTE mirrors stages/lines.py exactly (same derivation as the
# line_dedup_stats oracle in extra_queries.py)
_SQL_LINES_CTE = (
    "docs AS ("
    "SELECT doc_id, source, string_split(text, ' ') AS ws, "
    "CAST(ceil(len(string_split(text, ' ')) / 10.0) AS BIGINT) AS m "
    "FROM documents), "
    "nums AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 65536)), "
    "body AS ("
    "SELECT d.doc_id, 1 + n.k AS line_no, "
    "array_to_string(list_slice(d.ws, 10 * n.k + 1, 10 * n.k + 10), ' ') "
    "AS line FROM docs d JOIN nums n ON n.k < d.m), "
    "lines AS ("
    "SELECT doc_id, CAST(0 AS BIGINT) AS line_no, "
    "'cookie notice from ' || source AS line FROM docs "
    "UNION ALL SELECT doc_id, line_no, line FROM body "
    "UNION ALL SELECT doc_id, m + 1, "
    "'copyright ' || source || ' all rights reserved' FROM docs)"
)

_SQL_BOILER = (
    f"WITH {_SQL_LINES_CTE}, "
    "freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line), "
    f"kept AS (SELECT l.doc_id, l.line_no, l.line FROM lines l "
    f"JOIN freq f ON l.line = f.line WHERE f.nd < {_BOILER_T}), "
    "agg AS (SELECT doc_id, count(*) AS n_kept, "
    "string_agg(line, ' ' ORDER BY line_no) AS text_clean "
    "FROM kept GROUP BY doc_id) "
    "SELECT d.doc_id, CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept, "
    "COALESCE(a.text_clean, '') AS text_clean "
    "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
)


# --- JSONL source format ---------------------------------------------

def q_docs_from_jsonl(sf_dir: str):
    """Source-format breadth (the reference reads FASTA and FASTQ,
    main_search.cpp:741-766; web corpora additionally arrive as JSONL):
    the documents table is exported once to line-delimited JSON under
    /tmp (cache keyed by sf_dir + row count), read back with
    ray.data.read_json, and aggregated — proving the non-parquet read
    path feeds the same engine. Oracle = the same census on parquet."""
    import hashlib
    import os

    import ray.data as rd

    src = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    n = src.count()
    key = hashlib.md5(f"{sf_dir}:{n}:v1".encode()).hexdigest()[:12]
    out_dir = f"/tmp/consult_ray_jsonl/{key}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import json
        import shutil
        import tempfile

        # unique tmp per process (concurrent builders never share a dir)
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f"{key}.tmp",
                               dir=os.path.dirname(out_dir))

        def dump(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            name = hashlib.md5(
                json.dumps(rows[:1], sort_keys=True).encode()
            ).hexdigest()[:16]
            with open(os.path.join(tmp, f"{name}.jsonl"), "w") as f:
                for r in rows:
                    f.write(json.dumps(r, sort_keys=True) + "\n")
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        src.map_batches(dump, batch_format="pyarrow").count()
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.replace(tmp, out_dir)
        except OSError:  # lost the swap race; the winner's copy is live
            shutil.rmtree(tmp, ignore_errors=True)

    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".jsonl")
    ]
    ds = rd.read_json(files)

    def pre(batch: pa.Table) -> pa.Table:
        from consult_ray.util import grouped

        t = pa.table({
            "lang": batch["lang"],
            "n_chars": batch["n_chars"].cast(pa.int64()),
        })
        return grouped(t, ["lang"], [("n_chars", "count"), ("n_chars", "sum")],
                       ["n_docs", "total_chars"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
    )


# --- CSV source format -----------------------------------------------

def q_docs_from_csv(sf_dir: str):
    """Source-format breadth, CSV edition (same derived-export contract
    as q_docs_from_jsonl: cache keyed on sf_dir + row count, per-process
    tmp + os.replace swap): the documents table is exported once to CSV
    via pyarrow.csv.write_csv (one vectorized writer call per block, no
    per-row Python), read back with ray.data.read_csv, and aggregated
    into a per-source census. Oracle = the same census on parquet."""
    import hashlib
    import os

    import ray.data as rd

    src = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    n = src.count()
    key = hashlib.md5(f"{sf_dir}:{n}:v1".encode()).hexdigest()[:12]
    out_dir = f"/tmp/consult_ray_csv/{key}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil
        import tempfile

        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f"{key}.tmp",
                               dir=os.path.dirname(out_dir))

        def dump(batch: pa.Table) -> pa.Table:
            import pyarrow.csv as pacsv

            # first-row hash alone collides for blocks sharing a first
            # row; a per-task random component makes names unique
            name = hashlib.md5(
                batch.slice(0, 1).to_pandas().to_json().encode()
            ).hexdigest()[:16] + "-" + os.urandom(6).hex()
            pacsv.write_csv(batch, os.path.join(tmp, f"{name}.csv"))
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        src.map_batches(dump, batch_format="pyarrow").count()
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.replace(tmp, out_dir)
        except OSError:  # lost the swap race; the winner's copy is live
            shutil.rmtree(tmp, ignore_errors=True)

    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".csv")
    ]
    # explicit column types: inference would re-type a numeric-looking
    # source value (and read empty strings back as null), silently
    # diverging from the parquet-based oracle on adversarial data
    import pyarrow.csv as pacsv

    ds = rd.read_csv(
        files,
        convert_options=pacsv.ConvertOptions(
            column_types={"source": pa.string(), "n_chars": pa.int64()}
        ),
    )

    def pre(batch: pa.Table) -> pa.Table:
        from consult_ray.util import grouped

        t = pa.table({
            "source": batch["source"],
            "n_chars": batch["n_chars"].cast(pa.int64()),
        })
        return grouped(
            t, ["source"], [("n_chars", "count"), ("n_chars", "sum")],
            ["n_docs", "total_chars"],
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
    )


SCRUB_QUERIES = {
    "boilerplate_scrub": q_boilerplate_scrub,
    "docs_from_jsonl": q_docs_from_jsonl,
    "docs_from_csv": q_docs_from_csv,
    "pii_redact": q_pii_redact,
    "url_canonical": q_url_canonical,
    "decontaminate": q_decontaminate,
}

SCRUB_ORACLE_SQL = {
    "boilerplate_scrub": _SQL_BOILER,
    "docs_from_jsonl": (
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY lang"
    ),
    "docs_from_csv": (
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY source"
    ),
    "pii_redact": (
        f"SELECT doc_id, {_SQL_PII_REDACT} AS text_redacted, "
        f"({_SQL_PII_REDACT}) <> ({_SQL_PII_TEXT}) AS had_pii FROM documents"
    ),
    "url_canonical": (
        f"WITH m AS (SELECT doc_id, {_SQL_URL} AS u FROM documents) "
        f"SELECT doc_id, u AS url, {_SQL_URL_CANON} AS url_canonical FROM m"
    ),
    "decontaminate": _SQL_DECON,
}
