"""Additional operator-coverage queries (SURVEY §2.6 sorts/limits/top-k/
sampling, §2.4 multi-way joins, §2.2 minimizer analog) registered
alongside the core set in queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from consult_ray.config import PipelineConfig
from consult_ray.util import resolve_join_partitions

CFG = PipelineConfig()


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --- sorts / limits / top-k (O1-O3 analogs) --------------------------

def q_top_docs_by_chars(sf_dir: str):
    """Global sort + limit: top-20 docs by n_chars, doc_id tiebreak
    (deterministic total order, so LIMIT is well-defined)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


def q_orders_by_month(sf_dir: str):
    """Temporal bucketing + grouped count + sort by key."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def add_month(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(batch["o_orderdate"], unit="month")
        return pa.table({"month": month,
                         "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    return (
        ds.map_batches(add_month, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_deterministic_sample(sf_dir: str):
    """Deterministic 10% sample (hash-free modulo sampling — the O6
    seeded-sampling analog, reproducible across retries)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return ds.filter(expr="doc_id % 10 = 0")


# --- multi-way join (revenue per nation) -----------------------------

def q_nation_order_value(sf_dir: str):
    """customer JOIN orders JOIN nation -> total order value per nation:
    two hash joins (large-large) sized via resolve_join_partitions, then
    a pre-aggregated groupby."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    np_ = resolve_join_partitions(CFG)
    co = orders.join(cust, "inner", np_, on=("o_custkey",), right_on=("c_custkey",))
    con = co.join(nation, "inner", np_, on=("c_nationkey",), right_on=("n_nationkey",))
    agg = con.groupby("n_name").aggregate(
        Sum("o_totalprice", alias_name="total_value"), Count(alias_name="n_orders")
    )

    def final_round(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("total_value")
        return batch.set_column(
            i, "total_value",
            pc.round(batch["total_value"], ndigits=2, round_mode="half_towards_infinity"),
        )

    return agg.map_batches(final_round, batch_format="pyarrow")


# --- minimizer (M1 analog) -------------------------------------------

def q_minimizers(sf_dir: str):
    """Per-doc lexicographically-smallest k-substring — the direct
    web-text analog of CONSULT's minimizer extraction
    (/root/reference/minimization.cpp:158-180: slide a window, keep the
    lexicographically smallest). k=16 over the raw text."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    K = 16

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        mins = []
        for t in texts:
            t = t or ""
            if len(t) <= K:
                mins.append(t)
            else:
                # vectorized window-min via numpy sliding view over bytes
                b = np.frombuffer(t.encode(), dtype=np.uint8)
                if len(b) <= K:
                    mins.append(t)
                    continue
                w = np.lib.stride_tricks.sliding_window_view(b, K)
                # lexicographic argmin over fixed-width windows: view as void
                v = np.ascontiguousarray(w).view([("", np.uint8)] * K)
                idx = int(np.argmin(v.ravel()))
                mins.append(bytes(w[idx]).decode("utf-8", errors="replace"))
        return pa.table({"doc_id": batch["doc_id"], "minimizer": pa.array(mins, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


# --- set ops ---------------------------------------------------------

def q_union_langs(sf_dir: str):
    """Union + distinct across two sources (documents.lang and a filtered
    events projection is meaningless; use documents vs documents-sample)."""
    a = _read(sf_dir, "documents", ["lang"])
    b = _read(sf_dir, "documents", ["lang"]).filter(expr="lang <> 'en'")
    from consult_ray.pipelines.operators import preagg_group_count

    unioned = a.union(b)
    counts = preagg_group_count(unioned, "lang", "n")
    return counts


EXTRA_QUERIES = {
    "top_docs_by_chars": q_top_docs_by_chars,
    "orders_by_month": q_orders_by_month,
    "deterministic_sample": q_deterministic_sample,
    "nation_order_value": q_nation_order_value,
    "minimizers": q_minimizers,
    "union_langs": q_union_langs,
}

EXTRA_ORACLE_SQL = {
    "top_docs_by_chars": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 20"
    ),
    "orders_by_month": (
        "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n "
        "FROM orders GROUP BY 1"
    ),
    "deterministic_sample": (
        "SELECT doc_id, lang FROM documents WHERE doc_id % 10 = 0"
    ),
    "nation_order_value": (
        "SELECT n.n_name, round(sum(o.o_totalprice), 2) AS total_value, "
        "count(*) AS n_orders "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
    ),
    "union_langs": (
        "SELECT lang, count(*) AS n FROM ("
        "SELECT lang FROM documents UNION ALL "
        "SELECT lang FROM documents WHERE lang <> 'en') GROUP BY lang"
    ),
    # minimizers: expressible in DuckDB with a lateral substring scan
    "minimizers": (
        "SELECT doc_id, CASE WHEN length(text) <= 16 THEN text ELSE ("
        "SELECT min(substring(t.text, i, 16)) "
        "FROM generate_series(1, length(t.text) - 15) AS g(i)"
        ") END AS minimizer FROM documents t"
    ),
}
