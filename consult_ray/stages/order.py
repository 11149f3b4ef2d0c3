"""Exact distributed total-order statistics: global rank + running sum.

The primitive behind curriculum ordering and token-budget head
selection: every row receives its exact 1-based rank in the total
order (key_col ASC, id_col ASC as tiebreak) and, when val_col is
given, the inclusive running sum of val_col in that order — without
any single task ever holding the whole dataset.

Plan (sample-sort rank assignment; reference analog: CONSULT's
per-bucket tag sort is a local ordered compaction,
/root/reference/main_map.cpp:711-826 — this stage is the corpus-wide
generalization):

  1. boundary sample — <=64 equi-spaced (key, id) probes per block,
     fan-in folded 16:1 twice before one bounded take_all (the repo's
     dense-partial convention);
  2. tag — part = COMPOSITE searchsorted of (key, id) against the
     boundaries: ties on key split by id, so a hot key value (e.g.
     thousands of docs sharing one length) cannot pile into a single
     partition — the same reason the dedup path salts hot band keys;
  3. per-part totals — per-block dense (count, val-sum) partials,
     int64-exact (np.add.at, never float bincount weights), folded
     16:1, prefix-summed on the driver into P offset pairs;
  4. rank — groupby(part).map_groups: one lexsort per partition,
     rank = rank_offset[part] + local position. Group size = n/P
     narrow rows (key + id + val = 24 B), so num_partitions is the
     worker-memory knob and is NOT capped at cluster CPUs: at 10^12
     rows pass num_partitions ~ n / 20M.

Output is boundary-independent: boundaries steer balance only; the
(rank, running) values are exact for ANY boundary set, so retries and
different block layouts are value-identical by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from consult_ray.config import PipelineConfig
from consult_ray.util import resolve_join_partitions

_PROBES_PER_BLOCK = 64
_FOLD_KEEP = 256
_FOLD_BATCH = 4096


def _np(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False)


def _equispaced(n: int, take: int) -> np.ndarray:
    return np.unique(np.linspace(0, n - 1, min(take, n)).astype(np.int64))


def composite_searchsorted(
    bk: np.ndarray, bid: np.ndarray, k: np.ndarray, ids: np.ndarray
) -> np.ndarray:
    """Per row: count of boundaries (bk[j], bid[j]) lexicographically
    <= (k_i, ids_i). (bk, bid) must be lex-sorted. Vectorized: one
    searchsorted for the strict-key part, then one small searchsorted
    per DISTINCT key value that collides with a boundary key (at most
    len(bk) such values)."""
    lo = np.searchsorted(bk, k, side="left")
    hi = np.searchsorted(bk, k, side="right")
    part = lo.copy()
    tied = hi > lo
    if tied.any():
        for kv in np.unique(k[tied]):
            j0 = int(np.searchsorted(bk, kv, side="left"))
            j1 = int(np.searchsorted(bk, kv, side="right"))
            m = tied & (k == kv)
            part[m] = j0 + np.searchsorted(bid[j0:j1], ids[m], side="right")
    return part


def _sample_boundaries(ds, key_col: str, id_col: str, parts: int):
    """Deterministic equi-spaced probes per block, folded 16:1 twice
    before a bounded take_all; returns lex-sorted (bk, bid) arrays of
    at most parts-1 distinct composite boundaries."""

    def probe(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.select([key_col, id_col])
        idx = _equispaced(len(batch), _PROBES_PER_BLOCK)
        return batch.select([key_col, id_col]).take(pa.array(idx))

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) <= _FOLD_KEEP:
            return batch
        k, i = _np(batch[key_col]), _np(batch[id_col])
        order = np.lexsort((i, k))
        keep = order[_equispaced(len(order), _FOLD_KEEP)]
        return batch.take(pa.array(np.sort(keep)))

    folded = (
        ds.map_batches(probe, batch_format="pyarrow")
        .map_batches(fold, batch_format="pyarrow", batch_size=_FOLD_BATCH)
        .map_batches(fold, batch_format="pyarrow", batch_size=_FOLD_BATCH)
        .take_all()
    )
    if not folded:
        return None
    k = np.asarray([row[key_col] for row in folded])
    i = np.asarray([row[id_col] for row in folded])
    order = np.lexsort((i, k))
    cut = order[_equispaced(len(order), parts + 1)[1:-1]] if parts > 1 else order[:0]
    bk, bid = k[cut], i[cut]
    if len(bk) > 1:  # drop duplicate composite boundaries (empty parts)
        keep = np.ones(len(bk), dtype=bool)
        keep[1:] = (bk[1:] != bk[:-1]) | (bid[1:] != bid[:-1])
        bk, bid = bk[keep], bid[keep]
    return bk, bid


def global_order_stats(
    ds,
    key_col: str,
    id_col: str = "doc_id",
    val_col: str | None = None,
    *,
    cfg: PipelineConfig | None = None,
    num_partitions: int | None = None,
):
    """Append exact 1-based "rank" (order: key_col ASC, id_col ASC) and,
    with val_col, the int64-exact inclusive "running" sum in that order.

    Input must be narrow (key_col, id_col[, val_col] only) and key/id
    non-null; for DESC orderings pass a negated key (int64 lengths and
    float scores negate exactly). Returns a Dataset with columns
    (id_col, key_col[, val_col], rank[, running])."""
    parts = num_partitions or resolve_join_partitions(cfg or PipelineConfig())
    cols = [key_col, id_col] + ([val_col] if val_col else [])
    ds = ds.select_columns(cols)
    schema = ds.schema()  # Ray Data Schema wrapper, not pa.Schema
    types = dict(zip(schema.names, schema.types))
    if val_col is not None and not pa.types.is_integer(types[val_col]):
        # the running sum is int64-exact BY CONTRACT; a float val_col
        # would be silently floor-truncated per row in the totals and
        # assign kernels — reject it (pre-scale floats to integers,
        # the lineitem_pricing convention)
        raise ValueError(
            f"global_order_stats requires an integer val_col; got "
            f"{val_col}: {types[val_col]} (pre-scale floats to int64)"
        )
    out_fields = [
        (id_col, types[id_col]),
        (key_col, types[key_col]),
    ] + ([(val_col, types[val_col])] if val_col else []) + [
        ("rank", pa.int64()),
    ] + ([("running", pa.int64())] if val_col else [])
    out_schema = pa.schema(out_fields)

    bounds = _sample_boundaries(ds, key_col, id_col, parts)
    if bounds is None:  # empty input: keep the output schema (a 0-row
        # to_pandas drops columns, so downstream asserts need schema())
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())
    bk, bid = bounds

    def tag(batch: pa.Table) -> pa.Table:
        k, i = _np(batch[key_col]), _np(batch[id_col])
        part = composite_searchsorted(bk, bid, k, i)
        return batch.append_column("part", pa.array(part.astype(np.int64)))

    # materialize: BOTH the totals pass and the rank shuffle consume the
    # tagged rows, and a sort/groupby shuffle re-executes a lazy
    # upstream (measured; see CLAUDE.md). Rows are 24-32 B.
    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    nparts = len(bk) + 1

    def totals(batch: pa.Table) -> pa.Table:
        part = _np(batch["part"])
        cnt = np.bincount(part, minlength=nparts).astype(np.int64)
        vsum = np.zeros(nparts, dtype=np.int64)
        if val_col:
            np.add.at(vsum, part, _np(batch[val_col]).astype(np.int64))
        return pa.table({
            "part": pa.array(np.arange(nparts, dtype=np.int64)),
            "cnt": pa.array(cnt),
            "vsum": pa.array(vsum),
        })

    def fold_totals(batch: pa.Table) -> pa.Table:
        part = _np(batch["part"])
        cnt = np.zeros(nparts, dtype=np.int64)
        vsum = np.zeros(nparts, dtype=np.int64)
        np.add.at(cnt, part, _np(batch["cnt"]))
        np.add.at(vsum, part, _np(batch["vsum"]))
        return pa.table({
            "part": pa.array(np.arange(nparts, dtype=np.int64)),
            "cnt": pa.array(cnt),
            "vsum": pa.array(vsum),
        })

    partials = (
        tagged.map_batches(totals, batch_format="pyarrow")
        .map_batches(fold_totals, batch_format="pyarrow",
                     batch_size=nparts * 16)
        .take_all()
    )
    cnt = np.zeros(nparts, dtype=np.int64)
    vsum = np.zeros(nparts, dtype=np.int64)
    for row in partials:
        cnt[row["part"]] += row["cnt"]
        vsum[row["part"]] += row["vsum"]
    rank_off = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    val_off = np.concatenate(([0], np.cumsum(vsum)[:-1]))

    def assign(group: pa.Table) -> pa.Table:
        p = int(group["part"][0].as_py())
        k, i = _np(group[key_col]), _np(group[id_col])
        order = np.lexsort((i, k))
        rank = np.empty(len(k), dtype=np.int64)
        rank[order] = rank_off[p] + 1 + np.arange(len(k), dtype=np.int64)
        data = {id_col: group[id_col], key_col: group[key_col]}
        if val_col:
            v = _np(group[val_col]).astype(np.int64)
            running = np.empty(len(k), dtype=np.int64)
            running[order] = val_off[p] + np.cumsum(v[order])
            data[val_col] = group[val_col]
            data["rank"] = pa.array(rank)
            data["running"] = pa.array(running)
        else:
            data["rank"] = pa.array(rank)
        return pa.table(data)

    return tagged.groupby("part").map_groups(assign, batch_format="pyarrow")
