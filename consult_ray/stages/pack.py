"""Sequence packing: assign documents to fixed-token-budget training
sequences — the operator that turns a deduped corpus into model input
(the step after CONSULT-style classification selects the survivors; the
reference's batch boundary logic in /root/reference/main_search.cpp:704-707
slices work items the same contiguous-prefix way).

Plan shape (100 TB contract): only (doc_id, shard, n_tok) rows — 24 B —
ever shuffle; the text column never leaves its read stage. Docs are
hash-sharded into independent packing streams; within a stream, packing
is a prefix sum over doc_id order, so each stream is one bounded task.
Choose n_shards so a stream's narrow rows fit a task (1e12 docs /
65536 shards = 15M rows = 360 MB — or raise n_shards; parallelism =
n_shards, no global sort, no driver materialization).

Packing rule (deterministic, SQL-mirrorable): within a shard, docs are
taken in doc_id order; a doc starts at global token offset `before` =
sum of earlier docs' n_tok; its sequence id is before // budget and its
offset within that sequence is before % budget (contiguous packing with
straddle — the standard pretraining layout where a document may span a
sequence boundary rather than leave pad tokens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_shard_batch(
    batch: pa.Table, n_shards: int, text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Narrow projection for packing: (doc_id, shard, n_tok). Token
    count = single-space split length (duckdb string_split-compatible,
    same unit as stages/text.py token_count_batch)."""
    ids = batch[id_col]
    n_tok = pc.cast(
        pc.list_value_length(pc.split_pattern(batch[text_col], " ")),
        pa.int64(),
    )
    # python-semantics modulo (non-negative for any int64 id, matching
    # duckdb's ((id % n) + n) % n mirror)
    shard = np.mod(ids.to_numpy(zero_copy_only=False), n_shards)
    return pa.table({"doc_id": ids, "shard": pa.array(shard), "n_tok": n_tok})


def pack_shard(group: pa.Table, budget: int) -> pa.Table:
    """One packing stream: exclusive prefix sum over doc_id order ->
    (seq_id, seq_offset) per doc. Pure numpy, one sort."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    toks = group["n_tok"].to_numpy(zero_copy_only=False)
    shard = group["shard"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, toks, shard = ids[order], toks[order], shard[order]
    before = np.concatenate(([0], np.cumsum(toks)[:-1]))
    return pa.table({
        "doc_id": pa.array(ids),
        "shard": pa.array(shard),
        "n_tok": pa.array(toks),
        "seq_id": pa.array(before // budget),
        "seq_offset": pa.array(before % budget),
    })


def pack_sequences(docs, n_shards: int, budget: int,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of documents -> packing assignment Dataset
    (doc_id, shard, n_tok, seq_id, seq_offset)."""
    narrow = docs.map_batches(
        lambda b: token_shard_batch(b, n_shards, text_col, id_col),
        batch_format="pyarrow",
    )
    return narrow.groupby("shard").map_groups(
        lambda g: pack_shard(g, budget), batch_format="pyarrow"
    )


def shuffle_shards(docs, num_shards: int, seed: int,
                   id_col: str = "doc_id"):
    """Seeded deterministic global shuffle into training shards — the
    export step between a packed/deduped corpus and a training run
    (every epoch-0 data order comes from exactly this operator).

    key   = splitmix64(uint64(doc_id + seed))   (bijective per doc)
    shard = key % num_shards
    pos   = rank of key within its shard (0-based)

    Deterministic pure function of (doc_id, seed): retries, re-runs and
    re-shards are value-identical (the repo's seeded-randomness
    contract), and the oracle SQL replays the identical SplitMix64 in
    HUGEINT split-multiplication arithmetic. Plan: one map_batches
    computes (id, shard, key); one groupby(shard) ranks each shard with
    a single argsort — group size = corpus / num_shards, so num_shards
    is the worker-memory knob (same contract as pack_sequences'
    n_shards: 1e12 docs / 2^16 shards = 15M narrow rows per group).
    Text never shuffles; move only ids, then join text back at the
    shard writer by doc_id if the export needs payloads co-located."""
    from consult_ray.functions.hashing import splitmix64

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            key = splitmix64(ids.view(np.uint64) + np.uint64(seed))
        return pa.table({
            id_col: batch[id_col],
            "shard": pa.array(
                (key % np.uint64(num_shards)).astype(np.int64)
            ),
            "key": pa.array(key),
        })

    def rank(group: pa.Table) -> pa.Table:
        key = group["key"].to_numpy(zero_copy_only=False)
        pos = np.empty(len(key), dtype=np.int64)
        pos[np.argsort(key)] = np.arange(len(key), dtype=np.int64)
        return pa.table({
            id_col: group[id_col],
            "shard": group["shard"],
            "pos": pa.array(pos),
        })

    return (
        docs.select_columns([id_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pyarrow")
    )
