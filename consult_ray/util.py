"""Small execution helpers shared by pipelines."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from consult_ray.config import PipelineConfig


def grouped(
    table: pa.Table,
    keys: list[str],
    aggs: list[tuple[str, str]],
    out_names: list[str],
) -> pa.Table:
    """pa.Table.group_by().aggregate() with VERSION-SAFE output naming:
    aggregate columns are selected by their generated '{col}_{agg}'
    names before the positional rename, so the key-vs-aggregate column
    order (which changed across pyarrow releases) can never silently
    transpose data."""
    g = table.group_by(keys).aggregate(aggs)
    gen = [f"{c}_{a}" for c, a in aggs]
    return g.select(keys + gen).rename_columns(keys + out_names)


def pin_schema(ds, schema: pa.Schema, cfg: PipelineConfig | None = None):
    """Make a hash-aggregate output safe to feed `Dataset.join` by
    ELIMINATING its empty blocks and pinning every surviving block to
    `schema`. Required between any Ray hash aggregate and a join.

    Root cause (read from Ray 2.49 hash_shuffle.py:548-589 and
    join.py:104-127, reproduced at num_cpus=32 on sf0.01 — the one red
    row in CORRECTNESS_r03, doc_top_terms): a hash aggregate emits
    EMPTY (schema-less) blocks for partitions that received no rows,
    and the join's shuffle broadcasts schemas to its aggregators ONLY
    with the FIRST block of each side (`send_empty_blocks=True` once).
    `_shuffle_block` returns early for a 0-row block WITHOUT fanning
    out the schema-bearing empty shards, but the operator still marks
    schemas as broadcast — so when the first block of a side is empty,
    every join partition whose hash range receives no real rows
    finalizes a schema-less table, and Acero fails with "No match or
    multiple matches for key field reference FieldRef.Name(...)".
    Retyping empty blocks CANNOT fix this (map_batches never visits
    empty blocks, and a typed 0-row first block still short-circuits
    the broadcast); the empty blocks must be REMOVED.

    The same hazard applies to JOIN outputs fed into another join
    (reproduced: an inner-join output at 16 partitions has typed empty
    blocks for key-less partitions; if one of those is the side's FIRST
    block the next join crashes the same way — and a map_batches in
    between makes it worse by stripping empty blocks to a NULL schema).
    Use `drop_empty_blocks` for such sides when the schema is dynamic.

    Mechanics: materialize (the aggregate is already a barrier, so
    this adds no extra shuffle), then `repartition(k)` — which rebuilds
    blocks from row ranges, so empty blocks vanish and every output
    block is non-empty whenever the side has >= k rows — then one
    map_batches casting each block to the declared schema, materialized
    so multi-branch consumers (e.g. a per-round label set read by a
    join AND a union) don't re-execute the tail. k is capped by the
    row count so small sides can never reintroduce empty blocks. A
    COMPLETELY empty side is returned as a single typed empty block
    (Ray 2.49's join still cannot consume an all-empty side; callers
    that can hit that case must early-exit, as connected_components
    does)."""
    import ray.data as rd

    m = ds.materialize()
    n = m.count()
    if n == 0:
        return rd.from_arrow(schema.empty_table())
    k = max(1, min(resolve_join_partitions(cfg or PipelineConfig()), n))

    def _fix(batch: pa.Table) -> pa.Table:
        cols = [batch.column(f.name).cast(f.type) for f in schema]
        return pa.table(cols, schema=schema)

    return m.repartition(k).map_batches(_fix, batch_format="pyarrow").materialize()


def drop_empty_blocks(ds, cfg: PipelineConfig | None = None):
    """Schema-agnostic half of `pin_schema` (see its docstring for the
    root cause): eliminate a dataset's empty blocks so it is safe to
    feed `Dataset.join`, without needing a static schema. For sides
    whose schema varies with the caller (e.g. a cluster-assignment
    join output carrying a caller-chosen key column). A completely
    empty dataset is returned as-is — callers that can hit that case
    must early-exit before the join."""
    m = ds.materialize()
    n = m.count()
    if n == 0:
        return m
    k = max(1, min(resolve_join_partitions(cfg or PipelineConfig()), n))
    return m.repartition(k).materialize()


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """read_parquet with the file's schema METADATA stripped at the
    source. Parquet written via pandas carries a b'pandas' schema-
    metadata dict that makes pa.Schema unhashable, so every downstream
    Ray Data schema-dedup logs 'Failed to hash the schemas' and pays
    the slow unify path on EVERY block (transform_pyarrow.unify_schemas
    hashes schemas for an early exit). Stripping at the read keeps all
    derived blocks metadata-free."""
    import ray.data as rd

    if "filter" in kw:
        # a row filter binds against the OVERRIDE schema, which is
        # pre-projected to `columns`; filter fields outside the
        # projection would fail to bind. Skip the override and strip
        # metadata per block instead (zero-copy table rebuild — arrays
        # are shared), so filtered reads can still feed hash shuffles
        # without the per-block 'Failed to hash the schemas' slow path.
        def _strip_meta(batch: pa.Table) -> pa.Table:
            clean = pa.schema(
                [f.remove_metadata() for f in batch.schema], metadata=None
            )
            return pa.table(batch.columns, schema=clean)

        return rd.read_parquet(path, columns=columns, **kw).map_batches(
            _strip_meta, batch_format="pyarrow"
        )

    schema = None
    try:
        import os

        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            names = sorted(
                n for n in os.listdir(path) if n.endswith(".parquet")
            )
            target = os.path.join(path, names[0]) if names else path
        schema = pq.read_schema(target)
        if schema.metadata is None and all(
            f.metadata is None for f in schema
        ):
            schema = None  # already clean; let Ray infer as usual
        else:
            fields = [f.remove_metadata() for f in schema]
            if columns is not None:
                # Ray applies the schema to the PROJECTED batches, so it
                # must be pre-projected to the requested columns
                by_name = {f.name: f for f in fields}
                fields = [by_name[c] for c in columns]
            schema = pa.schema(fields, metadata=None)
    except Exception:
        schema = None
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)


def cluster_cpus() -> int:
    """Total CPUs of the current Ray cluster (>=1). Works before/after
    ray.init — Ray Data auto-inits on first use anyway."""
    try:
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 1)))
    except Exception:
        pass
    import os

    return max(1, os.cpu_count() or 1)


def resolve_join_partitions(cfg: PipelineConfig) -> int:
    """Hash-shuffle partition count that cannot deadlock the cluster.

    Ray's hash-shuffle aggregator pool reserves ~num_partitions/8 CPUs up
    front; a partition count far above the cluster CPU count stalls the
    join behind resource contention (observed: num_partitions=32 on a
    4-CPU cluster never schedules). Cap the configured value at the
    cluster CPU count — on a 256-node cluster the cap is the configured
    value, on a laptop it is the laptop.

    GRAFT_JOIN_PARTITIONS overrides (bench.py sets it to the MEASURED
    delivered parallelism: hosts that advertise more vCPUs than they
    deliver invert scaling when the shuffle is sized to the advertised
    count)."""
    import os

    env = os.environ.get("GRAFT_JOIN_PARTITIONS")
    if env:
        return max(2, int(env))
    return max(2, min(cfg.join_partitions, cluster_cpus()))


def _col_hash_u64(col):
    """uint64 content hash of ANY key column: integers go through
    SplitMix64 (sequential ids would otherwise stripe), strings and
    binaries through the content hash the id stage uses. Vectorized
    end-to-end. Nulls hash as a fill constant (0 / empty) — partition
    placement only: callers that GROUP must distinguish nulls from the
    fill value themselves (partitioned_group_agg's null-aware boundary
    detection does), a collision merely co-locates."""
    import numpy as np

    from consult_ray.functions.hashing import splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or (
        pa.types.is_binary(t) or pa.types.is_large_binary(t)
    ):
        from consult_ray.stages.ids import hash_keys

        if col.null_count:
            col = col.fill_null(
                b"" if pa.types.is_binary(t) or pa.types.is_large_binary(t)
                else ""
            )
        return hash_keys(col).view(np.uint64)
    col = col.cast(pa.int64())
    if col.null_count:
        col = col.fill_null(0)
    return splitmix64(
        col.to_numpy(zero_copy_only=False).view(np.uint64)
    )


def hash_partition_col(col, num_partitions: int) -> pa.Array:
    """Deterministic partition id for ANY key column (see _col_hash_u64)."""
    import numpy as np

    h = _col_hash_u64(col)
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def hash_partition_cols(tbl: pa.Table, cols: list[str], num_partitions: int) -> pa.Array:
    """Deterministic partition id over a COMPOSITE key: per-column
    uint64 hashes folded through SplitMix64 so co-partitioning holds for
    the full tuple (and for any prefix-keyed second pass that re-derives
    the same fold)."""
    import numpy as np

    from consult_ray.functions.hashing import splitmix64

    h = None
    for c in cols:
        hc = _col_hash_u64(tbl[c])
        h = hc if h is None else splitmix64(h ^ hc)
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def partitioned_group_min(
    ds, key_col: str, val_col: str, num_partitions: int,
    count_col: str | None = None,
):
    """Distributed MIN(val) GROUP BY key for LARGE key cardinalities.

    `ds.groupby(key).aggregate(Min(...))` pays a per-distinct-key cost
    in this Ray version that dwarfs the data movement once keys reach
    millions — measured here at 17M rows / 2.6M int64 keys on 8 CPUs:
    140.1 s for the native aggregate vs 2.4 s for this shape (58x).
    The fix is the repo's standard partition-kernel pattern
    (CLAUDE.md tiny-groups note): hash-partition the key space into
    `num_partitions` buckets (ONE shuffle, same bytes moved), then one
    vectorized lexsort + minimum.reduceat kernel per PARTITION — Python
    call count bounded by the partition count, never the key count.
    Emits exactly (key_col, val_col) with one row per distinct key;
    with count_col set, also the per-key ROW count (callers that
    pre-combine per batch must then feed (key, min, partial_count) rows
    through the val-sum variant instead — this one counts input rows)."""
    import numpy as np

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, val_col]).append_column(
            "__part", hash_partition_col(batch[key_col], num_partitions)
        )

    def min_kernel(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        if not len(k):
            cols = {
                key_col: pa.array([], g.schema.field(key_col).type),
                val_col: pa.array([], g.schema.field(val_col).type),
            }
            if count_col:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        v = g[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k_s, v_s = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        cols = {
            key_col: pa.array(k_s[starts]),
            val_col: pa.array(np.minimum.reduceat(v_s, starts)),
        }
        if count_col:
            cols[count_col] = pa.array(
                np.diff(np.r_[starts, len(k_s)]).astype(np.int64)
            )
        return pa.table(cols)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(min_kernel, batch_format="pyarrow")
    )


def partitioned_group_agg(
    ds,
    key_cols: list[str] | str,
    aggs: list[tuple[str | None, str, str]],
    num_partitions: int,
):
    """Distributed multi-aggregate GROUP BY for LARGE key cardinalities
    (the general sibling of `partitioned_group_min`; same rationale —
    Ray 2.49's native hash aggregate pays a per-DISTINCT-KEY cost,
    measured 58x slower than this shape at 2.6M keys, commit 4fb6a54).

    One hash shuffle over `num_partitions` buckets of the composite key,
    then ONE vectorized Arrow-sort + reduceat kernel per PARTITION —
    Python call count bounded by the partition count, never the key
    count. Works for any key type (strings sort through Arrow's C++
    sort, not numpy object arrays) and any mix of aggregates.

    `aggs`: list of (val_col, op, out_name) with op in
    {"min", "max", "sum", "count"}; for "count" val_col may be None
    (row count per key), and a val_col may BE a key column (e.g. a
    first-key-per-group min). NULL KEYS form their own group — SQL
    GROUP BY semantics, matching every DuckDB oracle (nulls hash to one
    partition via a fill constant; grouping uses null-aware boundary
    detection, so a fill-value collision only co-locates, never
    merges). VALUES must be non-null for min/max/sum (asserted —
    Arrow's native aggregates silently SKIP null values, and a silent
    semantic divergence from the shape this replaces must fail loudly
    instead).
    Output: key_cols (original types) + one column per agg, one row per
    distinct key. Sum keeps the value dtype (int64 partials stay int64);
    count is int64. Callers that pre-combine per batch feed partial
    rows through a "sum" here, exactly like the native-aggregate shape
    this replaces."""
    import numpy as np

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    val_cols = []
    for v, _op, _out in aggs:
        if v is not None and v not in val_cols:
            val_cols.append(v)
    in_cols = list(key_cols) + [v for v in val_cols if v not in key_cols]

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.select(in_cols).append_column(
            "__part", hash_partition_cols(batch, key_cols, num_partitions)
        )

    ufunc = {"min": np.minimum, "max": np.maximum, "sum": np.add}

    def kernel(g: pa.Table) -> pa.Table:
        g = g.select(in_cols)
        n = g.num_rows
        if n == 0:
            cols = {k: pa.array([], g.schema.field(k).type) for k in key_cols}
            for v, op, out in aggs:
                t = pa.int64() if op == "count" else g.schema.field(v).type
                cols[out] = pa.array([], t)
            return pa.table(cols)
        order = pc.sort_indices(
            g, sort_keys=[(k, "ascending") for k in key_cols]
        )
        s = g.take(order)
        neq = None
        for k in key_cols:
            ks = s.column(k).combine_chunks()
            if n > 1:
                a, b = ks.slice(1), ks.slice(0, n - 1)
                # null-aware boundary: validity flip = new group;
                # both-null compares equal (one null group per key tuple)
                d = pc.or_(
                    pc.xor(pc.is_null(a), pc.is_null(b)),
                    pc.fill_null(pc.not_equal(a, b), False),
                )
                neq = d if neq is None else pc.or_(neq, d)
        if n > 1:
            starts = np.concatenate(
                ([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1)
            )
        else:
            starts = np.zeros(1, dtype=np.int64)
        take_idx = pa.array(starts)
        out_cols = {k: s.column(k).take(take_idx) for k in key_cols}
        needed = {v for v, op, _ in aggs if v is not None and op != "count"}
        vals = {}
        for v in needed:
            vc = s.column(v).combine_chunks()
            assert vc.null_count == 0, (
                f"null aggregate value in {v!r} (Arrow native aggregates "
                "skip nulls; fill or filter before this kernel)"
            )
            vals[v] = vc.to_numpy(zero_copy_only=False)
        for v, op, out in aggs:
            if op == "count":
                out_cols[out] = pa.array(
                    np.diff(np.append(starts, n)).astype(np.int64)
                )
            else:
                out_cols[out] = pa.array(ufunc[op].reduceat(vals[v], starts))
        return pa.table(out_cols)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(kernel, batch_format="pyarrow")
    )
