"""Reusable relational + dedup operators over Ray Datasets — the operator
inventory of SURVEY §2 exposed as composable functions (each also backs a
`queries()` entry in __ray_entry__.py).

Pre-aggregation discipline: every groupby here that can be pre-combined
inside map_batches is (ray_guide.md "Aggregation at scale") — the
shuffle moves per-key partials, not raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from consult_ray.config import PipelineConfig
from consult_ray.stages.text import doc_fingerprint_batch
from consult_ray.util import resolve_join_partitions


# ---------------------------------------------------------------------
# exact dedup (D1 analog — the reference delegates it to Jellyfish,
# /root/reference/README.md:172; here it is a first-class operator)
# ---------------------------------------------------------------------

def exact_dedup_groups(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct text: representative id (min) + group size.

    Plan: vectorized content-hash map_batches -> groupby(content_hash)
    with Min/Count aggregates (hash-shuffle of 16-byte rows, never the
    text itself). Collision safety: 64-bit hash over <=2^40 docs has
    ~3e-5 collision probability; the strict variant verifies by joining
    text back — here the grouped MIN/COUNT is computed on the hash key
    and the text column is retained via Min(text-bearing row) upstream
    when needed.
    """
    hashed = ds.map_batches(
        lambda b: doc_fingerprint_batch(b, text_col=text_col).select(
            ["content_hash", id_col]
        ),
        batch_format="pyarrow",
    )
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="rep_id"), Count(alias_name="n_dups")
    )


def exact_dedup_survivors(ds: Dataset, cfg: PipelineConfig,
                          text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Keep exactly one doc (min id) per distinct text. Semi-join of the
    docs against the representative set on (content_hash, id)."""
    hashed = ds.map_batches(
        lambda b: doc_fingerprint_batch(b, text_col=text_col), batch_format="pyarrow"
    )
    reps = exact_dedup_groups(ds, text_col=text_col, id_col=id_col)
    return hashed.join(
        reps.select_columns(["rep_id"]),
        "left_semi",
        resolve_join_partitions(cfg),
        on=(id_col,),
        right_on=("rep_id",),
    )


# ---------------------------------------------------------------------
# n-gram Jaccard similarity (near-dup variant family)
# ---------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: pa.Table,
    pairs: list[tuple[int, int]],
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Exact character-n-gram Jaccard for explicit pairs (bounded use:
    verification of candidate pairs, tests)."""
    texts = {i: (t or "") for i, t in zip(docs[id_col].to_pylist(), docs[text_col].to_pylist())}

    def grams(s: str) -> set:
        return {s[i : i + n] for i in range(max(1, len(s) - n + 1))}

    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        ga, gb = grams(texts[a]), grams(texts[b])
        union = len(ga | gb)
        out_a.append(a)
        out_b.append(b)
        out_j.append(len(ga & gb) / union if union else 1.0)
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())}
    )


# ---------------------------------------------------------------------
# semi / anti joins (the reference's classified/unclassified split,
# /root/reference/main_search.cpp:1021-1045)
# ---------------------------------------------------------------------

def semi_join(left: Dataset, right: Dataset, cfg: PipelineConfig,
              on: str, right_on: str | None = None) -> Dataset:
    return left.join(right, "left_semi", resolve_join_partitions(cfg),
                     on=(on,), right_on=(right_on or on,))


def anti_join(left: Dataset, right: Dataset, cfg: PipelineConfig,
              on: str, right_on: str | None = None) -> Dataset:
    return left.join(right, "left_anti", resolve_join_partitions(cfg),
                     on=(on,), right_on=(right_on or on,))


def broadcast_anti_join(left: Dataset, keys: np.ndarray, on: str) -> Dataset:
    """Anti-join against a SMALL key set: ray.put once, filter per batch —
    no shuffle at all (ray_guide.md semi/anti pattern)."""
    ref = ray.put(np.asarray(keys))

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = ~np.isin(batch[on].to_numpy(zero_copy_only=False), ks)
        return batch.filter(pa.array(mask))

    return left.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------
# grouped aggregation with per-batch pre-combine
# ---------------------------------------------------------------------

def preagg_group_count(ds: Dataset, key: str, out_name: str = "n") -> Dataset:
    """groupby(key).count() with per-batch combining: the shuffle carries
    one row per key per block instead of one per input row."""

    def partial(batch: pa.Table) -> pa.Table:
        counts = pc.value_counts(batch[key])
        return pa.table(
            {key: counts.field("values"), out_name: counts.field("counts").cast(pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum(out_name, alias_name=out_name))
    )


def preagg_group_sum(ds: Dataset, key: str, value: str, out_name: str) -> Dataset:
    """groupby(key).sum(value) with per-batch combining."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key, value]).to_pandas()
        g = df.groupby(key, as_index=False)[value].sum()
        g.columns = [key, out_name]
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum(out_name, alias_name=out_name))
    )
