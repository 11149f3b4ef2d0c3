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
from ray.data.aggregate import Max

from consult_ray.config import PipelineConfig
from consult_ray.stages.text import doc_fingerprint_batch
from consult_ray.util import resolve_join_partitions


# ---------------------------------------------------------------------
# exact dedup (D1 analog — the reference delegates it to Jellyfish,
# /root/reference/README.md:172; here it is a first-class operator)
# ---------------------------------------------------------------------

def exact_dedup_groups(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    cfg: PipelineConfig | None = None,
) -> Dataset:
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
    # distinct-text cardinality ~= corpus size, so the native
    # groupby.aggregate's per-distinct-key cost (measured 58x worse than
    # one partition kernel at 2.6M keys — util.partitioned_group_min
    # docstring) would dominate at scale; min+count in one kernel pass
    from consult_ray.util import partitioned_group_min

    out = partitioned_group_min(
        hashed, "content_hash", id_col,
        resolve_join_partitions(cfg or PipelineConfig()),
        count_col="n_dups",
    )

    def finish(b: pa.Table) -> pa.Table:
        # rename BY NAME (partitioned_group_min emits exactly
        # (content_hash, <id_col>, n_dups); positional renames would
        # silently transpose if its column order ever changed)
        return pa.table({
            "content_hash": b["content_hash"],
            "rep_id": b[id_col],
            "n_dups": b["n_dups"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def exact_dedup_survivors(ds: Dataset, cfg: PipelineConfig,
                          text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Keep exactly one doc (min id) per distinct text. Semi-join of the
    docs against the representative set on (content_hash, id)."""
    hashed = ds.map_batches(
        lambda b: doc_fingerprint_batch(b, text_col=text_col), batch_format="pyarrow"
    )
    reps = exact_dedup_groups(ds, text_col=text_col, id_col=id_col, cfg=cfg)
    # reps is a hash-aggregate output: pin the schema (engine ids are
    # int64 end-to-end, stages/ids.py) so empty partitions can't feed
    # the semi-join schema-less blocks (the doc_top_terms failure class)
    from consult_ray.util import pin_schema

    return hashed.join(
        pin_schema(
            reps.select_columns(["rep_id"]),
            pa.schema([("rep_id", pa.int64())]),
        ),
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
    # the right side is typically a filtered/derived key set; a 0-row
    # first block would reach the join schema-less (util.pin_schema
    # docstring), so drop empty blocks — one narrow-column pass. An
    # ALL-empty right (which Ray's join cannot consume) means nothing
    # matches: empty semi result, identity anti result.
    from consult_ray.util import drop_empty_blocks

    r = drop_empty_blocks(right, cfg)
    if r.count() == 0:
        return left.limit(0)
    return left.join(r, "left_semi", resolve_join_partitions(cfg),
                     on=(on,), right_on=(right_on or on,))


def anti_join(left: Dataset, right: Dataset, cfg: PipelineConfig,
              on: str, right_on: str | None = None) -> Dataset:
    from consult_ray.util import drop_empty_blocks

    r = drop_empty_blocks(right, cfg)
    if r.count() == 0:
        return left
    return left.join(r, "left_anti", resolve_join_partitions(cfg),
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

def preagg_group_count(
    ds: Dataset, key: str, out_name: str = "n",
    cfg: PipelineConfig | None = None,
) -> Dataset:
    """groupby(key).count() with per-batch combining: the shuffle carries
    one row per key per block instead of one per input row, and the
    merge is a partition kernel (util.partitioned_group_agg) so callers
    with corpus-scaling keys (user ids, hosts) never hit the native
    aggregate's per-distinct-key cliff (58x, commit 4fb6a54); bounded
    keys pay only a no-op partitioning."""
    from consult_ray.util import partitioned_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        counts = pc.value_counts(batch[key])
        return pa.table(
            {key: counts.field("values"), out_name: counts.field("counts").cast(pa.int64())}
        )

    return partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key, [(out_name, "sum", out_name)],
        resolve_join_partitions(cfg or PipelineConfig()),
    )


# ---------------------------------------------------------------------
# temporal operators Ray Data lacks natively: as-of join, sessionization
# (custom operators per SURVEY §2 "custom operators" mandate; both rely
# on a single hash-partitioning by entity key, documented here: every
# row of one entity must land in one group, which groupby guarantees)
# ---------------------------------------------------------------------

def asof_join(
    left: Dataset,
    right: Dataset,
    cfg: PipelineConfig,
    on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    out_ts: str = "asof_ts",
    left_keep: tuple[str, ...] = (),
) -> Dataset:
    """For each left row, the greatest right_ts <= left_ts within the same
    key (inner semantics: unmatched left rows drop) — DuckDB's ASOF JOIN,
    which Ray Data has no primitive for.

    Plan: both sides project to a common (key, ts, side, payload) schema,
    union, ONE hash-partition shuffle on the key, and ONE vectorized
    sort + forward-scan kernel per partition covering all its keys (P
    Python calls total — never one per entity). All rows of one key land
    in one partition, so memory rides the partition, with P the knob.

    Keys may be integer (normalized to int64 so an int32/int64
    cross-table pair still groups together) or string (url/host keys
    pass through); keep-column types are read from the tagged left
    stream's schema so right-side blocks carry matching typed nulls.
    Rows with a null key or null timestamp drop on both sides — the
    join is inner, and SQL's ASOF predicate never matches NULL."""

    lcols = [on, left_ts, *left_keep]

    def _key(col):
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return col if pa.types.is_string(col.type) else col.cast(pa.int64())

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch[on]), pc.is_valid(batch[left_ts]))
        )
        cols = {
            "k": _key(batch[on]),
            "ts": batch[left_ts],
            "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
        }
        for c in left_keep:
            cols[c] = batch[c]
        return pa.table(cols)

    tagged_left = left.select_columns(lcols).map_batches(
        tag_left, batch_format="pyarrow"
    )
    lschema = tagged_left.schema().base_schema
    keep_types = {c: lschema.field(c).type for c in left_keep}
    ts_type = lschema.field("ts").type

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch[right_on]), pc.is_valid(batch[right_ts]))
        )
        cols = {
            "k": _key(batch[right_on]),
            "ts": batch[right_ts],
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
        }
        for c in left_keep:
            cols[c] = pa.nulls(batch.num_rows, keep_types[c])
        return pa.table(cols)

    both = tagged_left.union(
        right.select_columns([right_on, right_ts]).map_batches(tag_right, batch_format="pyarrow")
    )

    # Finalize per HASH PARTITION of the key, not per key group:
    # groupby(k).map_groups costs one Python call per entity (~10^5
    # tiny tables whose concatenation fragments every downstream block —
    # the measured 2x tiny-groups tax, CLAUDE.md). One partition kernel
    # handles ALL its keys vectorized: sort by (k, ts, side desc) so
    # rights precede lefts on timestamp ties (rts == lts matches), then
    # "latest right at-or-before me" is a forward running max of right
    # row indices, validated against the key-segment id.
    P = resolve_join_partitions(cfg)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _hash_partition_col(batch["k"], P)
        )

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        n = g.num_rows
        if n == 0:
            return pa.table(
                {c: pa.array([], keep_types[c]) for c in left_keep}
                | {out_ts: pa.array([], ts_type)}
            )
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("k", "ascending"), ("ts", "ascending"), ("side", "descending")
            ],
        )
        s = g.take(order)
        kcol = s["k"].combine_chunks()
        if n > 1:
            neq = pc.fill_null(
                pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)), True
            ).to_numpy(zero_copy_only=False)
            seg = np.concatenate(([0], np.cumsum(neq.astype(np.int64))))
        else:
            seg = np.zeros(1, dtype=np.int64)
        side = s["side"].to_numpy(zero_copy_only=False)
        cand = np.maximum.accumulate(
            np.where(side == 1, np.arange(n, dtype=np.int64), -1)
        )
        lpos = np.flatnonzero(side == 0)
        c = cand[lpos]
        ok = c >= 0
        ok[ok] = seg[c[ok]] == seg[lpos[ok]]  # right must share the key
        keep_idx = pa.array(lpos[ok])
        out = {col: s[col].take(keep_idx) for col in left_keep}
        out[out_ts] = s["ts"].take(pa.array(c[ok]))
        return pa.table(out)

    return (
        both.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def range_join_count(
    left: Dataset,
    right: Dataset,
    cfg: PipelineConfig,
    on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
    left_keep: tuple[str, ...] = (),
    out_count: str = "n_window",
) -> Dataset:
    """Interval/range join (an operator Ray Data lacks): for each left
    row, COUNT right rows with the same key and |left_ts - right_ts| <=
    window (inclusive both ends) — the band-join shape behind "orders
    within a day of the event".

    Plan (bucketed band join, no all-pairs blowup): time buckets of
    width = window; each RIGHT row replicates to buckets {b-1, b, b+1}
    (a fixed 3x on narrow (key, bucket, ts) rows — the text/payload
    never moves), each LEFT row keeps its own bucket, ONE
    hash-partition shuffle on (key, bucket), then one exact vectorized
    sort + composite-rank searchsorted count per PARTITION covering all
    its (key, bucket) groups at once. Any in-window pair differs by at
    most one bucket, so it meets in the left row's bucket exactly once;
    out-of-window same-bucket pairs are filtered by the exact check.
    Every left row lands in exactly one group, so unmatched rows emit
    count 0 (LEFT-join semantics) and the output has len(left) rows.
    Partitioning assumption: group size is bounded by one key's rows in
    a 3-window span — skew rides the hottest (key, bucket), not the
    hottest key (the advantage over asof_join's whole-key groups).

    Key and left_keep columns may be any Arrow type (string url keys
    included); the keep-column types are read from the tagged left
    stream's schema so right-side blocks carry matching typed nulls
    (a sort partition may hold only right rows — its groups must still
    agree on schema). NULL semantics mirror the SQL oracle: a left row
    with a null key or null timestamp never matches anything but still
    emits count 0 (LEFT-join), and null right rows never count."""
    W = np.int64(window_us)
    lcols = [on, left_ts, *left_keep]

    def _ts_i64(col) -> np.ndarray:
        return col.to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).view(np.int64)

    def _key(col):
        # same normalization as asof_join: integers widen to int64 so an
        # int32/int64 cross-table pair still groups; strings pass through
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return col if pa.types.is_string(col.type) else col.cast(pa.int64())

    def tag_left(batch: pa.Table) -> pa.Table:
        t = _ts_i64(batch[left_ts])
        ok = (
            pc.and_(pc.is_valid(batch[on]), pc.is_valid(batch[left_ts]))
            .to_numpy(zero_copy_only=False)
        )
        t = np.where(ok, t, np.int64(0))
        # side 0 = joinable left row; side 2 = null-key/ts left row,
        # which rides through to emit count 0 (SQL LEFT-join semantics)
        cols = {
            "k": _key(batch[on]),
            "bkt": pa.array(np.floor_divide(t, W)),
            "ts": pa.array(t),
            "side": pa.array(np.where(ok, 0, 2).astype(np.int8)),
        }
        for c in left_keep:
            cols[c] = batch[c]
        return pa.table(cols)

    tagged_left = left.select_columns(lcols).map_batches(
        tag_left, batch_format="pyarrow"
    )
    lschema = tagged_left.schema().base_schema
    keep_types = {c: lschema.field(c).type for c in left_keep}

    def tag_right(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch[right_on]), pc.is_valid(batch[right_ts])
        )
        batch = batch.filter(ok)  # null rows never count (SQL predicate)
        t = _ts_i64(batch[right_ts])
        b = np.floor_divide(t, W)
        n = len(t)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), 3))
        cols = {
            "k": _key(batch[right_on]).take(rep),
            "bkt": pa.array(np.repeat(b, 3) + np.tile(
                np.array([-1, 0, 1], dtype=np.int64), n
            )),
            "ts": pa.array(np.repeat(t, 3)),
            "side": pa.array(np.ones(3 * n, dtype=np.int8)),
        }
        for c in left_keep:
            cols[c] = pa.nulls(3 * n, keep_types[c])
        return pa.table(cols)

    both = tagged_left.union(
        right.select_columns([right_on, right_ts]).map_batches(
            tag_right, batch_format="pyarrow"
        )
    )

    # Finalize per HASH PARTITION of (k, bkt), not per group — one
    # vectorized kernel per partition instead of one Python call per
    # (key, bucket) group (the tiny-groups tax; same rationale as
    # asof_join above). Within a partition: sort by (k, bkt, ts); the
    # in-window count for a left row is a difference of two
    # searchsorteds over a composite (segment, ts-rank) key — the rank
    # remap makes ONE global searchsorted answer every segment's range
    # query at once (ts <= b  ⟺  rank_left(ts) < rank_right(b), so
    # segment-local bounds become disjoint integer intervals seg*M+lo ..
    # seg*M+hi that never bleed across segments).
    P = resolve_join_partitions(cfg)

    def add_part(batch: pa.Table) -> pa.Table:
        kp = _hash_partition_col(batch["k"], P).to_numpy(zero_copy_only=False)
        bp = batch["bkt"].to_numpy(zero_copy_only=False)
        part = ((kp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                ^ bp.view(np.uint64)) % np.uint64(P)
        return batch.append_column(
            "__part", pa.array(part.astype(np.int64))
        )

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        n = g.num_rows
        if n == 0:
            return pa.table(
                {c: pa.array([], keep_types[c]) for c in left_keep}
                | {out_count: pa.array([], pa.int64())}
            )
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("k", "ascending"), ("bkt", "ascending"), ("ts", "ascending")
            ],
        )
        s = g.take(order)
        kcol = s["k"].combine_chunks()
        bkt = s["bkt"].to_numpy(zero_copy_only=False)
        if n > 1:
            neq_k = pc.fill_null(
                pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)), True
            ).to_numpy(zero_copy_only=False)
            neq = neq_k | (bkt[1:] != bkt[:-1])
            seg = np.concatenate(([0], np.cumsum(neq.astype(np.int64))))
        else:
            seg = np.zeros(1, dtype=np.int64)
        side = s["side"].to_numpy(zero_copy_only=False)
        ts = s["ts"].to_numpy(zero_copy_only=False)
        is_r = side == 1
        r_seg, r_ts = seg[is_r], ts[is_r]
        sorted_rts = np.sort(r_ts)
        M = np.int64(len(sorted_rts) + 1)
        # rights stay (seg, ts)-sorted under the global sort, and rank
        # is monotone in ts, so comp is sorted
        comp = r_seg * M + np.searchsorted(sorted_rts, r_ts, side="left")
        lmask = side != 1
        l_seg, l_ts = seg[lmask], ts[lmask]
        hi = np.searchsorted(sorted_rts, l_ts + W, side="right")
        lo = np.searchsorted(sorted_rts, l_ts - W, side="left")
        cnt = (
            np.searchsorted(comp, l_seg * M + hi, side="left")
            - np.searchsorted(comp, l_seg * M + lo, side="left")
        ).astype(np.int64)
        cnt[side[lmask] == 2] = 0  # null-key/ts left rows match nothing
        out = {c: s[c].filter(pa.array(lmask)) for c in left_keep}
        out[out_count] = pa.array(cnt)
        return pa.table(out)

    return (
        both.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def sessionize(
    ds: Dataset,
    cfg: PipelineConfig,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> Dataset:
    """Per-key session count with a fixed inactivity gap (streaming-window
    analog, SURVEY §2.9): ONE hash-partition shuffle on the key, one
    vectorized sort + gap-diff kernel per partition (all keys at once).
    """
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)
    # one vectorized kernel per HASH PARTITION of the key (P Python
    # calls), not one per key group: sort by (key, ts, tiebreak), mark
    # gap breaks on adjacent rows, suppress breaks that cross a key
    # boundary, and count per key segment with one bincount.
    P = resolve_join_partitions(cfg)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _hash_partition_col(batch[key], P)
        )

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        n = g.num_rows
        if n == 0:
            return pa.table({
                key: pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
            })
        order = pc.sort_indices(
            g,
            sort_keys=[
                (key, "ascending"), (ts, "ascending"),
                (order_tiebreak, "ascending"),
            ],
        )
        s = g.take(order)
        kcol = s[key].combine_chunks()
        t = (
            s[ts].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        if n > 1:
            neq = pc.fill_null(
                pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)), True
            ).to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
            intra_break = (np.diff(t) > gap_us) & ~neq
            # break at adjacent pair (p, p+1) belongs to the segment of
            # row p (no key boundary crossed there by construction)
            seg_of_break = (
                np.searchsorted(starts, np.flatnonzero(intra_break),
                                side="right") - 1
            )
            counts = 1 + np.bincount(seg_of_break, minlength=len(starts))
        else:
            starts = np.zeros(1, dtype=np.int64)
            counts = np.ones(1, dtype=np.int64)
        return pa.table({
            key: kcol.take(pa.array(starts)).cast(pa.int64()),
            "n_sessions": pa.array(counts.astype(np.int64)),
        })

    return (
        ds.select_columns([key, ts, order_tiebreak])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def distinct_count_by(
    ds: Dataset, group_key: str, distinct_key: str,
    out_name: str = "n_distinct", cfg: PipelineConfig | None = None,
) -> Dataset:
    """Exact COUNT(DISTINCT distinct_key) GROUP BY group_key: per-batch
    pair dedup -> ONE (group, distinct)-keyed partition-kernel pass that
    dedupes pairs AND emits per-group partial counts (a pair's
    duplicates co-locate under the composite hash, so partition-level
    dedup is global; a group's pairs span partitions, so counts merge in
    a second tiny kernel). Pair cardinality scales with the corpus —
    never the native per-distinct-key aggregate (58x, 4fb6a54).

    Null semantics: a null distinct_key counts as ONE distinct value
    per group (the Arrow group_by dedupe behavior of the per-batch
    partial; SQL COUNT(DISTINCT) would exclude it) and a null
    group_key forms its own group — boundary detection is null-aware,
    so a null at a sorted boundary can never produce a null mask entry
    that Arrow's filter would drop (which silently ate the NEXT group's
    first pair)."""
    from consult_ray.config import PipelineConfig
    from consult_ray.util import (
        hash_partition_cols,
        partitioned_group_agg,
    )

    P = resolve_join_partitions(cfg or PipelineConfig())

    def pairs(batch: pa.Table) -> pa.Table:
        tb = batch.select([group_key, distinct_key])
        tb = tb.group_by([group_key, distinct_key]).aggregate([])
        return tb.append_column(
            "__part",
            hash_partition_cols(tb, [group_key, distinct_key], P),
        )

    def dedupe_count(g: pa.Table) -> pa.Table:
        g = g.select([group_key, distinct_key])
        n = g.num_rows
        if n == 0:
            return pa.table({
                group_key: pa.array([], g.schema.field(group_key).type),
                "_pc": pa.array([], pa.int64()),
            })
        idx = pc.sort_indices(
            g, sort_keys=[(group_key, "ascending"), (distinct_key, "ascending")]
        )
        s = g.take(idx)
        gk = s.column(group_key).combine_chunks()
        dk = s.column(distinct_key).combine_chunks()

        def nsafe_neq(col, ln):
            a, b = col.slice(1), col.slice(0, ln - 1)
            return pc.or_(
                pc.xor(pc.is_null(a), pc.is_null(b)),
                pc.fill_null(pc.not_equal(a, b), False),
            )

        if n > 1:
            neq = pc.or_(
                nsafe_neq(gk, n), nsafe_neq(dk, n)
            ).to_numpy(zero_copy_only=False)
            first = np.r_[True, neq]
        else:
            first = np.ones(1, dtype=bool)
        gk_f = gk.filter(pa.array(first))
        m = len(gk_f)
        if m > 1:
            gneq = nsafe_neq(gk_f, m).to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.flatnonzero(gneq) + 1))
        else:
            starts = np.zeros(min(m, 1), dtype=np.int64)
        return pa.table({
            group_key: gk_f.take(pa.array(starts)),
            "_pc": pa.array(np.diff(np.append(starts, m)).astype(np.int64)),
        })

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedupe_count, batch_format="pyarrow")
    )
    return partitioned_group_agg(
        partials, group_key, [("_pc", "sum", out_name)], P
    )


def hll_register_maxima(
    ds: Dataset,
    group_key: str,
    distinct_key: str,
    p: int = 12,
    seed: int = 7,
) -> Dataset:
    """The mergeable HLL summary itself: per (group_key, reg) the max
    rho over every distinct_key hash (Flajolet et al. 2007). All-integer
    and deterministic — splitmix64(value ^ seed), reg = top p bits,
    rho = leading zeros of the rest + 1 — so unlike the float estimate
    it admits a BIT-EXACT SQL oracle (the HUGEINT splitmix replay,
    extra_queries "hll_registers_daily"). Each batch pre-folds to its
    own (group, reg) maxima, so the only shuffle is a groupby-max over
    at most 2^p rows per group key regardless of input size."""
    from consult_ray.functions.sketch import hll_register_updates

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[distinct_key].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(g):
            return pa.table({
                group_key: pa.array([], pa.int64()),
                "reg": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            })
        idx, rho = hll_register_updates(v.view(np.uint64), p, seed)
        # per-batch pre-combine: max rho per (group, register). Lexsort,
        # not bit-packing — group values may be epoch timestamps whose
        # magnitude would overflow a packed int64
        order = np.lexsort((idx, g))
        g_s, i_s, r_s = g[order], idx[order], rho[order]
        starts = np.flatnonzero(
            np.r_[True, (g_s[1:] != g_s[:-1]) | (i_s[1:] != i_s[:-1])]
        )
        maxes = np.maximum.reduceat(r_s, starts)
        return pa.table({
            group_key: pa.array(g_s[starts]),
            "reg": pa.array(i_s[starts]),
            "rho": pa.array(maxes),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_key, "reg"])
        .aggregate(Max("rho", alias_name="rho"))
    )


def approx_distinct_count_by(
    ds: Dataset,
    group_key: str,
    distinct_key: str,
    out_name: str = "n_distinct_approx",
    p: int = 12,
    seed: int = 7,
) -> Dataset:
    """Approximate COUNT(DISTINCT distinct_key) GROUP BY group_key via
    HyperLogLog (relative error ~1.04/sqrt(2^p), ~1.6% at p=12).

    The exact path (distinct_count_by) shuffles one row per distinct
    (group, value) pair — unbounded. Here each batch folds its values
    into per-(group, register) maxima (hll_register_maxima), the only
    shuffle is a groupby-max over at most 2^p rows per group key, and a
    per-group pass reduces registers to the estimate. This is the plan
    shape an exact count cannot have at 10^12 rows."""
    merged = hll_register_maxima(ds, group_key, distinct_key, p=p, seed=seed)

    # Finalize per HASH PARTITION, not per group: groupby(g).map_groups
    # costs one Python call per group (days are cheap, but user/host
    # group keys are not — the tiny-groups tax, CLAUDE.md). One kernel
    # estimates every group in a partition: sort by group, segment the
    # (reg, rho) rows, and compute the dense-register sum analytically —
    # absent registers contribute 2^0 = 1 each, and every PRESENT
    # register has rho >= 1 (hll_register_updates emits leading-zeros+1),
    # so zeros-for-linear-counting = m - n_present exactly.
    P = resolve_join_partitions(PipelineConfig())
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _hash_partition_col(batch[group_key], P)
        )

    def finalize_part(t: pa.Table) -> pa.Table:
        g = t[group_key].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(g):
            return pa.table({
                group_key: pa.array([], pa.int64()),
                out_name: pa.array([], pa.int64()),
            })
        rho = t["rho"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(g, kind="stable")
        g_s, rho_s = g[order], rho[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        counts = np.diff(np.r_[starts, len(g_s)])
        pow_sums = np.add.reduceat(np.power(2.0, -rho_s.astype(np.float64)), starts)
        zeros = (m - counts).astype(np.float64)
        raw = alpha * m * m / (pow_sums + zeros)
        with np.errstate(divide="ignore"):
            lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1.0), 1.0))
        est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
        return pa.table({
            group_key: pa.array(g_s[starts]),
            out_name: pa.array(np.rint(est).astype(np.int64)),
        })

    return (
        merged.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(finalize_part, batch_format="pyarrow")
    )


def preagg_group_sum(
    ds: Dataset, key: str, value: str, out_name: str,
    cfg: PipelineConfig | None = None,
) -> Dataset:
    """groupby(key).sum(value) with per-batch combining (Arrow-native —
    pa.Table.group_by — no pandas round-trip in the partial); partition-
    kernel merge (see preagg_group_count)."""

    def partial(batch: pa.Table) -> pa.Table:
        from consult_ray.util import grouped

        return grouped(batch.select([key, value]), [key], [(value, "sum")], [out_name])

    from consult_ray.util import partitioned_group_agg

    return partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key, [(out_name, "sum", out_name)],
        resolve_join_partitions(cfg or PipelineConfig()),
    )


# ---------------------------------------------------------------------
# grouped top-k (O1/O2 per-bucket sort + cap generalized to a relational
# operator: the reference caps candidates per bucket with a sorted
# prefix, main_search.cpp:866-894 / SURVEY §2.6; here: per-group ranked
# head over arbitrary key/order columns — the "best k pages per domain"
# curation primitive)
# ---------------------------------------------------------------------

def _top_k_batch(
    tbl: pa.Table,
    group_col: str,
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str | None,
) -> pa.Table:
    """Keep the first k rows of each group under (order_by, implicit
    total order must be provided by the caller's tiebreak columns).
    Vectorized: one multi-key sort, group boundaries from a shifted
    not-equal, within-group rank by arange - repeat(starts)."""
    n = tbl.num_rows
    if n == 0:
        return (
            tbl.append_column(rank_col, pa.array([], pa.int64()))
            if rank_col
            else tbl
        )
    keys = [(group_col, "ascending")] + [
        (c, "descending" if desc else "ascending") for c, desc in order_by
    ]
    s = tbl.take(pc.sort_indices(tbl, sort_keys=keys))
    g = s.column(group_col).combine_chunks()
    if n > 1:
        neq = pc.fill_null(
            pc.not_equal(g.slice(1), g.slice(0, n - 1)), True
        ).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
    else:
        starts = np.zeros(1, dtype=np.int64)
    counts = np.diff(np.append(starts, n))
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
    keep = rank <= k
    out = s.filter(pa.array(keep))
    if rank_col:
        out = out.append_column(rank_col, pa.array(rank[keep]))
    return out


# moved to consult_ray.util (shared with the CC label rounds); the old
# private name stays importable for the call sites across this package
from consult_ray.util import hash_partition_col as _hash_partition_col  # noqa: E402


def grouped_top_k(
    ds: Dataset,
    group_col: str,
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = "rank",
    cfg: PipelineConfig | None = None,
) -> Dataset:
    """Per-group top-k rows under a deterministic order.

    order_by: [(column, descending), ...]; the caller MUST include a
    unique tiebreak column (e.g. doc_id) so ranks are well-defined.

    Scale plan: a per-block vectorized combiner keeps at most k rows
    per group BEFORE the shuffle, so the shuffle moves <= k rows per
    group per block (k * n_blocks worst-case group size, tiny width —
    the same partial-then-final shape as preagg_group_sum). The
    finalize groups by a HASH PARTITION of group_col — P Python calls
    total — and runs the multi-group vectorized `_top_k_batch` once per
    partition; a per-GROUP map_groups would cost one Python call per
    group (per DOCUMENT for doc-keyed callers) and fragment downstream
    blocks into thousands of chunks (the measured 2x tiny-groups tax —
    same shape as cap_partition, pipelines/dedup.py). Only the
    group/order/keep columns should be in `ds` — select before calling.
    """
    P = resolve_join_partitions(cfg or PipelineConfig())

    def partial(batch: pa.Table) -> pa.Table:
        t = _top_k_batch(batch, group_col, order_by, k, None)
        return t.append_column("__part", _hash_partition_col(t[group_col], P))

    def final_partition(grp: pa.Table) -> pa.Table:
        t = _top_k_batch(
            grp.drop_columns(["__part"]), group_col, order_by, k, rank_col
        )
        return t.combine_chunks()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final_partition, batch_format="pyarrow")
    )
