"""The flagship near-dup pipeline: fingerprints -> band rows -> skew
census + cap -> band-key self-join -> hamming verify -> dup edges.

Physical plan (Ray-Data-first, one all-to-all for the whole candidate +
verify path):

    read -> map_batches(fingerprint)            stateless, zero-copy Arrow
         -> map_batches(band expand)            ~L+b rows/doc, 40 B/row
         -> [census: partial counts -> groupby.sum]   tiny pre-aggregated shuffle
         -> [cap hot keys at C=28, log drops]   CONSULT's bucket cap,
                                                /root/reference/main_map.cpp:592
         -> join(self, on=band_key)             THE shuffle (hash-partitioned)
         -> filter a<b, popcount(x^y)<=p        vectorized verify, analog of
                                                hd() /root/reference/main_search.cpp:1238-1259

Design notes for 100 TB:
  * band rows carry (band_key, doc_id, simhash) only — 40 bytes — html/text
    never enters a shuffle (SURVEY §7 hard part f).
  * the census is pre-aggregated inside map_batches before its groupby, so
    the skew-detection shuffle moves one row per distinct key per block,
    not one per band row (A3 analog, /root/reference/main_map.cpp:1167-1197).
  * hot keys (> bucket_cap members) are capped to the C smallest doc_ids —
    deterministic, and the analog of CONSULT's silent first-28 policy
    except drops are COUNTED and reported via lineage.
  * duplicate edges from multiple colliding bands are NOT deduplicated
    here: connected components is insensitive to edge multiplicity, and a
    pair-level exchange would be a second all-to-all for zero semantic
    gain at c=1. With collision_threshold c>1 pair_count_threshold runs
    ONE (a,b)-prefix partition-kernel shuffle that dedupes per
    (a, b, band_kind, band) and applies the distinct-collision count
    (A4 analog, /root/reference/main_search.cpp:883-894).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from consult_ray.config import PipelineConfig
from consult_ray.util import resolve_join_partitions
from consult_ray.functions.hashing import popcount64
from consult_ray.stages.bands import make_band_fn
from consult_ray.stages.fingerprint import make_fingerprint_fn


def _throttle(cfg: PipelineConfig) -> dict:
    """map_batches kwargs capping concurrent tasks for bandwidth-bound
    kernels (see PipelineConfig.compute_concurrency). A no-op dict when
    unset, and a no-op cap when >= the session's CPU count."""
    if cfg.compute_concurrency is None:
        return {}
    return {"concurrency": int(cfg.compute_concurrency)}


def fingerprints(
    docs: Dataset,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """docs -> fingerprints (doc_id, simhash, minhash, n_shingles)."""
    if text_col != "text" or id_col != "doc_id":
        fn = make_fingerprint_fn(cfg, text_col=text_col, id_col=id_col)
    else:
        fn = make_fingerprint_fn(cfg)
    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=cfg.batch_size, **_throttle(cfg)
    )


def band_rows(
    fp: Dataset, cfg: PipelineConfig, kinds: tuple[str, ...] = ("simhash", "minhash")
) -> Dataset:
    return fp.map_batches(
        make_band_fn(cfg, kinds=kinds), batch_format="pyarrow",
        batch_size=cfg.batch_size, **_throttle(cfg)
    )


def _partial_key_counts(batch: pa.Table) -> pa.Table:
    """Per-batch pre-aggregation: one (band_key, cnt) row per distinct key."""
    counts = pc.value_counts(batch["band_key"])
    return pa.table(
        {"band_key": counts.field("values"), "cnt": counts.field("counts").cast(pa.int64())}
    )


def band_key_census(bands: Dataset, cfg: PipelineConfig) -> Dataset:
    """Exact per-key member counts via partial counts -> partition-
    kernel merge. The skew detector (A3 analog). band_key cardinality
    scales with the corpus, so the merge never runs as a native
    per-distinct-key aggregate (the measured 58x cliff, 4fb6a54)."""
    from consult_ray.util import partitioned_group_agg

    partial = bands.map_batches(
        _partial_key_counts, batch_format="pyarrow", **_throttle(cfg)
    )
    return partitioned_group_agg(
        partial, "band_key", [("cnt", "sum", "cnt")],
        resolve_join_partitions(cfg),
    )


def hot_band_keys(census: Dataset, cfg: PipelineConfig) -> tuple[set[int], int]:
    """Keys with more than bucket_cap members, plus total dropped rows.
    The hot-key set is small by construction (boilerplate-driven), so
    collecting it to the driver for broadcast is the right plan shape —
    the 100 TB analog broadcasts it via ray.put to every filter task."""
    hot = census.filter(expr=f"cnt > {cfg.bucket_cap}")
    rows = hot.take_all()
    keys = {r["band_key"] for r in rows}
    dropped = sum(r["cnt"] - cfg.bucket_cap for r in rows)
    return keys, int(dropped)


def _cap_by_partition(hot: Dataset, cfg: PipelineConfig) -> Dataset:
    """Partition-kernel bucket cap over a hot-side band stream — the ONE
    implementation shared by the exact-census and sketch cap paths:
    a per-block partial cap (<= bucket_cap rows per band_key per block,
    the grouped-top-k combiner shape) bounds what any one hot key can
    put on a shuffle partition, then one vectorized multi-bucket cap
    per HASH PARTITION emits P contiguous tables. Never
    groupby(band_key).map_groups: one Python call per hot key plus
    downstream block fragmentation were the measured 2x tax the fused
    path engineered out."""
    from consult_ray.pipelines.operators import _top_k_batch

    cap, P = cfg.bucket_cap, resolve_join_partitions(cfg)

    def partial_cap(batch: pa.Table) -> pa.Table:
        return _top_k_batch(batch, "band_key", [("doc_id", False)], cap, None)

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
        part = (k % np.uint64(P)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def cap_partition(g: pa.Table) -> pa.Table:
        t = _top_k_batch(g, "band_key", [("doc_id", False)], cap, None)
        return t.drop_columns(["part"]).combine_chunks()

    return (
        hot.map_batches(partial_cap, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cap_partition, batch_format="pyarrow")
    )


def cap_hot_buckets(bands: Dataset, cfg: PipelineConfig, hot_keys: set[int]) -> Dataset:
    """Keep only the bucket_cap smallest doc_ids within each hot band key
    (deterministic cap; CONSULT keeps the FIRST 28 of stream order at
    main_map.cpp:592 — min-doc_id is the order-free equivalent)."""
    if not hot_keys:
        return bands
    import ray

    hot_ref = ray.put(np.fromiter(hot_keys, dtype=np.int64))

    def split_cold(batch: pa.Table) -> pa.Table:
        import ray as _ray

        hot = _ray.get(hot_ref)
        mask = np.isin(batch["band_key"].to_numpy(zero_copy_only=False), hot)
        return batch.filter(pa.array(~mask))

    def split_hot(batch: pa.Table) -> pa.Table:
        import ray as _ray

        hot = _ray.get(hot_ref)
        mask = np.isin(batch["band_key"].to_numpy(zero_copy_only=False), hot)
        return batch.filter(pa.array(mask))

    cold = bands.map_batches(split_cold, batch_format="pyarrow", **_throttle(cfg))
    capped_hot = _cap_by_partition(
        bands.map_batches(split_hot, batch_format="pyarrow", **_throttle(cfg)),
        cfg,
    )
    return cold.union(capped_hot)


_CMS_MERGE_CHUNKS = 64
# driver-merge branch: block grids are pre-summed in worker tasks of
# this fan-in before take_all, bounding driver intake at ~n_blocks/16
# grids instead of one grid per block
_CMS_COMBINE_FANIN = 16
# Above this many band rows the per-block grids (~12 MB each at the
# default width; blocks are ~3M band rows at the 128 MB target block
# size) would stream an unbounded volume into the driver — switch to the
# distributed chunked reduce. Below it the driver merge is faster (the
# groupby machinery has ~2 s of fixed cost) and driver intake is bounded
# at ~16 blocks x 12 MB.
_CMS_DRIVER_MERGE_MAX_ROWS = 50_000_000


def _merged_cms_grid(
    bands: Dataset, cfg: PipelineConfig, saturate: int | None = None
) -> np.ndarray | None:
    """Global count-min-sketch grid over band_key (int64 (D, W), or None
    for an empty dataset).

    Small inputs: per-block grids -> a worker-side combine pass (one
    task per _CMS_COMBINE_FANIN block grids) -> driver sum, so driver
    intake is ~n_blocks/fanin rows instead of one 12 MB grid per block
    (80 blocks of uint32 grids shipped 960 MB to the driver and were the
    single largest fixed cost in the headline run). With `saturate`
    (thresholding-only callers, see cms_block_counts) per-block transit
    drops another 4x via uint8 grids. Large inputs: each block's grid is
    split into _CMS_MERGE_CHUNKS fixed cell ranges and a
    groupby(chunk_id) sums each range across blocks inside the shuffle
    aggregators — a tree reduce; the driver reassembles ONE grid from a
    constant number of rows regardless of block count."""
    from consult_ray.functions.sketch import cms_block_counts, cms_merge

    W, D, seed = cfg.cms_width, cfg.cms_depth, cfg.seed + 999

    if bands.count() <= _CMS_DRIVER_MERGE_MAX_ROWS:
        block_dtype = np.uint8 if saturate is not None else np.uint32

        def sk_full(batch: pa.Table) -> pa.Table:
            grid = cms_block_counts(
                batch["band_key"].to_numpy(zero_copy_only=False), W, D, seed,
                saturate=saturate,
            )
            return pa.table({"sketch": pa.array([grid.tobytes()], pa.large_binary())})

        def combine(batch: pa.Table) -> pa.Table:
            # sum <= fanin block grids into one uint32 grid (exact: cell
            # sums are bounded by _CMS_DRIVER_MERGE_MAX_ROWS << 2^32;
            # summing per-block-saturated grids keeps the superset
            # guarantee, see cms_block_counts)
            col = batch["sketch"]
            acc = np.zeros(D * W, dtype=np.uint32)
            for blob in col:
                # astype first: mixed-width in-place adds hit numpy's
                # slow mixed-dtype ufunc loops (see CLAUDE.md)
                acc += np.frombuffer(blob.as_py(), dtype=block_dtype).astype(np.uint32)
            return pa.table({"sketch": pa.array([acc.tobytes()], pa.large_binary())})

        rows = (
            bands.map_batches(
                sk_full, batch_format="pyarrow", batch_size=None, **_throttle(cfg)
            )
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=_CMS_COMBINE_FANIN)
            .take_all()
        )
        if not rows:
            return None
        return cms_merge(
            [np.frombuffer(r["sketch"], dtype=np.uint32).reshape(D, W) for r in rows]
        )

    total_cells = D * W
    bounds = np.linspace(0, total_cells, _CMS_MERGE_CHUNKS + 1).astype(np.int64)

    def sk(batch: pa.Table) -> pa.Table:
        grid = cms_block_counts(
            batch["band_key"].to_numpy(zero_copy_only=False), W, D, seed
        )
        flat = grid.reshape(-1)  # uint32 in transit: halves shuffle bytes
        return pa.table({
            "chunk_id": pa.array(np.arange(_CMS_MERGE_CHUNKS, dtype=np.int64)),
            "vals": pa.array([flat[bounds[i]: bounds[i + 1]]
                              for i in range(_CMS_MERGE_CHUNKS)]),
        })

    def sum_chunk(g: pa.Table) -> pa.Table:
        arr = g["vals"].combine_chunks()
        m = np.asarray(arr.flatten(), dtype=np.int64).reshape(g.num_rows, -1)
        return pa.table({
            "chunk_id": g["chunk_id"].slice(0, 1),
            "vals": pa.array([m.sum(axis=0)]),
        })

    rows = (
        bands.map_batches(sk, batch_format="pyarrow", batch_size=None,
                          **_throttle(cfg))
        .groupby("chunk_id")
        .map_groups(sum_chunk, batch_format="pyarrow")
        .take_all()
    )
    if not rows:
        return None
    flat = np.empty(total_cells, dtype=np.int64)
    for r in rows:
        cid = int(r["chunk_id"])
        flat[bounds[cid]: bounds[cid + 1]] = r["vals"]
    return flat.reshape(D, W)


def cap_hot_buckets_sketch(bands: Dataset, cfg: PipelineConfig) -> Dataset:
    """Sketch-based hot-bucket capping: detect heavy band keys with a
    count-min sketch (functions/sketch.py) instead of the exact census
    groupby — two vectorized passes over the band rows and NO shuffle
    except the tiny groupby over the hot subset itself.

    CMS estimates only overcount, so the candidate set is a deterministic
    superset of the true >cap keys; false positives only route a few
    extra under-cap groups through the capping groupby, where head(C) of
    a group smaller than C keeps every row. The merge is the distributed
    chunk-wise tree reduce of _merged_cms_grid — the driver never holds
    per-block grids."""
    import ray

    from consult_ray.functions.sketch import cms_estimate

    W, D, seed = cfg.cms_width, cfg.cms_depth, cfg.seed + 999
    thr = cfg.bucket_cap + 1
    # this grid is only THRESHOLDED at thr, so per-block uint8
    # saturation is value-identical (superset guarantee intact, see
    # cms_block_counts) and ships 4x fewer census bytes
    merged = _merged_cms_grid(
        bands, cfg, saturate=thr if thr <= 255 else None
    )
    if merged is None:
        return bands
    # a key's estimate is the min over its OWN cell per depth row; those
    # cells sit at different indices, so the only sound early-exit bound
    # is the global max cell: if even that is under thr, no estimate can
    # reach thr
    if int(merged.max()) < thr:
        return bands  # provably no key exceeds the cap

    ref = ray.put(merged)

    def hot_mask(batch: pa.Table) -> np.ndarray:
        grid = ray.get(ref)
        est = cms_estimate(
            grid, batch["band_key"].to_numpy(zero_copy_only=False), W, D, seed
        )
        return est >= thr

    def split_cold(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~hot_mask(batch)))

    def split_hot(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(hot_mask(batch)))

    # Hot-side capping runs per HASH PARTITION, not per band_key group
    # (_cap_by_partition docstring for the measured rationale).
    cold = bands.map_batches(split_cold, batch_format="pyarrow", **_throttle(cfg))
    capped_hot = _cap_by_partition(
        bands.map_batches(split_hot, batch_format="pyarrow", **_throttle(cfg)),
        cfg,
    )
    return cold.union(capped_hot)


def salt_hot_buckets(bands: Dataset, cfg: PipelineConfig) -> Dataset:
    """LOSSLESS hot-key policy: salted repartitioning (north_rule's
    explicit skew strategy) instead of the reference's drop-past-cap.

    Members of a hot band key are split into S = ceil(est/target) salt
    groups by hash(doc_id), and each member is REPLICATED into the S
    triangle buckets (g, j>=g) and (i<=g, g) it participates in — so the
    downstream band_key self-join still generates every intra-bucket
    pair, but no single shuffle partition ever holds more than ~2x
    target rows of one key. Pair duplicates across triangle buckets are
    harmless at c=1 (connected components ignores edge multiplicity) and
    are collapsed on (a, b, band_kind, band) by pair_count_threshold
    before any c>1 distinct-collision count.

    Cold keys pass through with salt 0 and one copy. Detection reuses
    the CMS grid (deterministic superset, same as the cap path).
    """
    import ray

    from consult_ray.functions.sketch import cms_estimate
    from consult_ray.functions.hashing import splitmix64

    W, D, seed = cfg.cms_width, cfg.cms_depth, cfg.seed + 999
    target = cfg.bucket_cap

    merged = _merged_cms_grid(bands, cfg)
    if merged is None:
        return bands
    ref = ray.put(merged)

    def salt(batch: pa.Table) -> pa.Table:
        grid = ray.get(ref)
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        est = cms_estimate(grid, keys, W, D, seed)
        S = np.maximum(1, -(-est // target)).astype(np.int64)  # ceil
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        g = (splitmix64(docs.astype(np.uint64)) % S.astype(np.uint64)).astype(np.int64)
        # replicate row r into buckets (min(g,o), max(g,o)) for o in 0..S-1
        reps = np.repeat(np.arange(len(keys)), S)
        other = np.concatenate([np.arange(s) for s in S]) if len(S) else np.empty(0, np.int64)
        gi = g[reps]
        lo = np.minimum(gi, other)
        hi = np.maximum(gi, other)
        salted = splitmix64(
            keys[reps].view(np.uint64)
            ^ splitmix64(lo.astype(np.uint64) * np.uint64(0x1F3) + hi.astype(np.uint64))
        ).view(np.int64)
        # S == 1 rows keep their original key (no mixing) so cold keys
        # shuffle exactly as before
        plain = S[reps] == 1
        salted = np.where(plain, keys[reps], salted)
        out = batch.take(pa.array(reps))
        return out.set_column(
            out.schema.get_field_index("band_key"), "band_key", pa.array(salted)
        )

    return bands.map_batches(salt, batch_format="pyarrow", **_throttle(cfg))


def capped_band_rows(
    bands: Dataset, cfg: PipelineConfig, eager_stats: bool = True
) -> tuple[Dataset, dict]:
    """Apply the bucket-cap policy per cfg.census_mode; returns the
    capped band rows + stats.

    eager_stats=False (sketch path only) skips the materialize + count
    that exist purely to report dropped_band_rows, returning the capped
    union LAZY so a single-consumer downstream (the "group" candidate
    shuffle) fuses the cap split into its map side — one less full
    write+read of the band table through the object store (at web scale
    that is an entire extra band-table materialization).
    dropped_band_rows is None in that case."""
    stats: dict = {"census_mode": cfg.census_mode, "hot_policy": cfg.hot_policy}
    if cfg.hot_policy == "salt":
        n_before = bands.count()
        salted = salt_hot_buckets(bands, cfg).materialize()
        stats["dropped_band_rows"] = 0
        stats["replicated_band_rows"] = int(salted.count() - n_before)
        return salted, stats
    if cfg.census_mode == "exact":
        cens = band_key_census(bands, cfg)
        hot, dropped = hot_band_keys(cens, cfg)
        stats["hot_keys"] = len(hot)
        stats["dropped_band_rows"] = dropped
        return cap_hot_buckets(bands, cfg, hot).materialize(), stats
    capped = cap_hot_buckets_sketch(bands, cfg)
    if capped is bands:
        # census proved no key exceeds the cap: identity, nothing dropped
        stats["dropped_band_rows"] = 0
        return capped, stats
    if not eager_stats:
        stats["dropped_band_rows"] = None
        return capped, stats
    n_before = bands.count()
    capped = capped.materialize()
    stats["dropped_band_rows"] = int(n_before - capped.count())
    return capped, stats


def _expand_bucket_pairs(
    group: pa.Table, p: int, carry_band: bool, cap: int | None = None
) -> pa.Table:
    """All intra-bucket unordered pairs of one hash partition, hamming-
    verified — fully vectorized (sort by key, run-length bucket bounds,
    cached triu index broadcast per distinct bucket size; bucket sizes
    are bounded by the cap/salt policy so the size loop is tiny).

    cap: when set, every bucket is first truncated to its `cap`
    smallest doc_ids (the O4 policy applied IN the partition). Because
    the partition holds each band_key's rows in full, this equals the
    census-then-cap plan exactly: capping an under-cap bucket is the
    identity and the CMS hot set is a superset of the truly-hot keys,
    so "cap every bucket" == "cap only hot buckets". band_key ties on
    doc_id are whole-row duplicates (the key embeds (kind, band),
    stages/bands.py:9-13), so doc_id order is a total order up to
    identical rows and the kept multiset is deterministic."""
    empty = pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "hamming": pa.array([], pa.int8()),
        **({"band_kind": pa.array([], pa.int8()),
            "band": pa.array([], pa.int16())} if carry_band else {}),
    })
    if group.num_rows < 2:
        return empty
    keys = group["band_key"].to_numpy(zero_copy_only=False)
    if cap is not None:
        # doc-minor order so the per-bucket head is the cap smallest
        order = np.lexsort(
            (group["doc_id"].to_numpy(zero_copy_only=False), keys)
        )
    else:
        order = np.argsort(keys, kind="stable")
    ks = keys[order]
    change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [len(ks)])))
    if cap is not None and len(sizes) and int(sizes.max()) > cap:
        rank = np.arange(len(ks), dtype=np.int64) - np.repeat(starts, sizes)
        keep = rank < cap
        order, ks = order[keep], ks[keep]
        if len(ks) < 2:
            return empty
        change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(ks)])))
    docs = group["doc_id"].to_numpy(zero_copy_only=False)[order]
    sims = group["simhash"].to_numpy(zero_copy_only=False)[order].view(np.uint64)
    ia_parts, ib_parts = [], []
    for m in np.unique(sizes):
        if m < 2:
            continue
        I, J = np.triu_indices(int(m), k=1)
        s = starts[sizes == m]
        ia_parts.append((s[:, None] + I[None, :]).ravel())
        ib_parts.append((s[:, None] + J[None, :]).ravel())
    if not ia_parts:
        return empty
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    a, b = docs[ia], docs[ib]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    ham = popcount64(sims[ia] ^ sims[ib])
    ok = (ham <= p) & (lo != hi)
    cols = {
        "a": pa.array(lo[ok]),
        "b": pa.array(hi[ok]),
        "hamming": pa.array(ham[ok].astype(np.int8)),
    }
    if carry_band:
        cols["band_kind"] = pa.array(
            group["band_kind"].to_numpy(zero_copy_only=False)[order][ia][ok]
        )
        cols["band"] = pa.array(
            group["band"].to_numpy(zero_copy_only=False)[order][ia][ok]
        )
    return pa.table(cols)


def candidate_edges(
    bands: Dataset, cfg: PipelineConfig, cap: int | None = None
) -> Dataset:
    """Band rows -> verified dup edges (a, b, hamming), a < b.

    cap (group strategy only): fuse the O4 bucket-cap INTO this stage —
    a vectorized per-block partial cap (<= cap rows per band_key per
    block, the grouped-top-k combiner shape) bounds the skew a hot key
    can put on one shuffle partition, and the in-partition expansion
    applies the exact cap (_expand_bucket_pairs). Replaces the whole
    census/split/sort/cap-group/union pre-stage of the sketch path with
    ZERO extra passes over the band table — same edge multiset
    (pytest: test_fused_cap_matches_census_cap).

    Two physically different plans with the SAME edge multiset
    (pytest-asserted equal, including band identity at c>1):

    - cfg.candidate_strategy == "group" (default): ONE hash-bucketed
      shuffle — part = band_key % join_partitions — then vectorized
      intra-bucket pair expansion per partition (_expand_bucket_pairs).
      Moves the 24-40 B band rows across the wire exactly once and
      never emits the join's m self-pairs / both-orders duplicates.
      Per-task memory = band_rows/P, the same bound the hash join's
      per-partition build table has.
    - "join": Dataset.join self-join on band_key + a<b popcount verify
      (the original plan; kept as the cross-check twin).

    Band identity (kind, band index) rides through ONLY when
    collision_threshold > 1: with hot_policy="salt" one band collision
    appears in several salted triangle buckets and c>1 must count
    DISTINCT band collisions (salt_hot_buckets contract) — either pair
    side's values work because band_key determines (kind, band). At c=1
    the columns are pruned before the shuffle.
    """
    carry_band = cfg.collision_threshold > 1
    if not carry_band:
        bands = bands.select_columns(["band_key", "doc_id", "simhash"])

    if cfg.candidate_strategy == "group":
        P = resolve_join_partitions(cfg)
        p = cfg.hamming_budget

        if cap is not None:
            from consult_ray.pipelines.operators import _top_k_batch

            def partial_cap(batch: pa.Table) -> pa.Table:
                return _top_k_batch(
                    batch, "band_key", [("doc_id", False)], cap, None
                )

            bands = bands.map_batches(
                partial_cap, batch_format="pyarrow", **_throttle(cfg)
            )

        def add_part(batch: pa.Table) -> pa.Table:
            k = batch["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
            part = (k % np.uint64(P)).astype(np.int64)
            return batch.append_column("part", pa.array(part))

        def expand(group: pa.Table) -> pa.Table:
            return _expand_bucket_pairs(group, p, carry_band, cap)

        return (
            bands.map_batches(add_part, batch_format="pyarrow", **_throttle(cfg))
            .groupby("part")
            .map_groups(expand, batch_format="pyarrow")
        )
    joined = bands.join(
        bands,
        join_type="inner",
        num_partitions=resolve_join_partitions(cfg),
        on=("band_key",),
        left_suffix="_l",
        right_suffix="_r",
    )

    p = cfg.hamming_budget

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["doc_id_l"].to_numpy(zero_copy_only=False)
        b = batch["doc_id_r"].to_numpy(zero_copy_only=False)
        keep = a < b
        a, b = a[keep], b[keep]
        sa = batch["simhash_l"].to_numpy(zero_copy_only=False)[keep].view(np.uint64)
        sb = batch["simhash_r"].to_numpy(zero_copy_only=False)[keep].view(np.uint64)
        ham = popcount64(sa ^ sb)
        ok = ham <= p
        cols = {
            "a": pa.array(a[ok]),
            "b": pa.array(b[ok]),
            "hamming": pa.array(ham[ok].astype(np.int8)),
        }
        if carry_band:
            cols["band_kind"] = pa.array(
                batch["band_kind_l"].to_numpy(zero_copy_only=False)[keep][ok]
            )
            cols["band"] = pa.array(
                batch["band_l"].to_numpy(zero_copy_only=False)[keep][ok]
            )
        return pa.table(cols)

    return joined.map_batches(verify, batch_format="pyarrow", **_throttle(cfg))


def pair_count_threshold(edges: Dataset, cfg: PipelineConfig) -> Dataset:
    """Keep pairs seen in >= c DISTINCT band collisions (A4 analog,
    /root/reference/main_search.cpp:883-894). A projection at c=1 — the
    pair-key groupbys (extra all-to-alls) only run when c > 1.

    Distinctness matters under hot_policy="salt": a single band collision
    in a hot bucket is replicated into S triangle buckets, so raw edge
    multiplicity would overcount by up to S. Edges are first collapsed on
    (a, b, band_kind, band) — within which each pair can legitimately
    appear only once, since every doc emits exactly one row per band —
    then counted per (a, b).

    Plan shape: pair cardinality scales with the corpus, so neither
    collapse runs as a native per-distinct-key aggregate (the measured
    58x cliff, commit 4fb6a54). Both FUSE into ONE shuffle: rows
    hash-partition on (a, b) — a prefix of the distinctness key, so a
    pair's every band collision lands in the same partition — and one
    lexsort kernel per partition dedupes on (a, b, band_kind, band),
    counts distinct collisions per (a, b), and applies the threshold.
    The per-batch Arrow-native pre-combine still shrinks the shuffle."""
    if cfg.collision_threshold <= 1:
        return edges.select_columns(["a", "b", "hamming"])

    from consult_ray.util import (
        grouped,
        hash_partition_cols,
        resolve_join_partitions,
    )

    BAND_KEYS = ["a", "b", "band_kind", "band"]
    num_partitions = resolve_join_partitions(cfg)
    c = cfg.collision_threshold

    def dedupe_partial(batch: pa.Table) -> pa.Table:
        t = grouped(
            batch.select(BAND_KEYS + ["hamming"]),
            BAND_KEYS, [("hamming", "min")], ["hamming"],
        )
        return t.append_column(
            "__part", hash_partition_cols(t, ["a", "b"], num_partitions)
        )

    def kernel(g: pa.Table) -> pa.Table:
        n = g.num_rows
        ham_t = g.schema.field("hamming").type
        if n == 0:
            return pa.table({
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], ham_t),
            })
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        bk = g["band_kind"].to_numpy(zero_copy_only=False)
        bd = g["band"].to_numpy(zero_copy_only=False)
        h = g["hamming"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, bd, bk, b, a))
        a, b, bk, bd, h = a[order], b[order], bk[order], bd[order], h[order]
        # first row of each (a, b, band_kind, band) run carries the
        # run's min hamming (h is the innermost ascending sort key)
        first = np.r_[
            True,
            (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            | (bk[1:] != bk[:-1]) | (bd[1:] != bd[:-1]),
        ]
        a2, b2, h2 = a[first], b[first], h[first]
        starts = np.flatnonzero(
            np.r_[True, (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])]
        )
        cnt = np.diff(np.r_[starts, len(a2)])
        keep = cnt >= c
        hmin = np.minimum.reduceat(h2, starts)
        return pa.table({
            "a": pa.array(a2[starts][keep]),
            "b": pa.array(b2[starts][keep]),
            "hamming": pa.array(hmin[keep]).cast(ham_t),
        })

    return (
        edges.map_batches(dedupe_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def dup_edges(
    docs: Dataset,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: tuple[str, ...] = ("simhash", "minhash"),
    census: bool = True,
    eager_stats: bool | None = None,
) -> tuple[Dataset, dict]:
    """End-to-end: documents -> verified dup edges. Returns (edges, stats).

    `bands` is ALWAYS materialized before the candidate stage — even on
    the fused-cap path where it has only one logical consumer: this Ray
    version's sort-shuffle re-executes a lazy upstream for its sampling
    pass, so streaming fingerprints into the shuffle re-runs the
    dominant compute (measured 31 s -> 104-119 s on the 1.2M-doc bench
    phase at 8 CPUs — strictly worse, do not "optimize" this away).
    The census/split passes and the join strategy consume it more than
    once anyway. In the checkpointed pipeline (pipelines.checkpointed)
    the materialization is a parquet stage boundary instead.

    eager_stats: whether the cap stage materializes + counts to report
    dropped_band_rows (see capped_band_rows). Default: lazy under the
    single-consumer "group" candidate strategy (the cap fuses into the
    candidate shuffle's map side), eager under "join" (which consumes
    its input twice and must not re-run the split scans).
    """
    fp = fingerprints(docs, cfg, text_col=text_col, id_col=id_col)
    bands = band_rows(fp, cfg, kinds=kinds)
    stats: dict = {"dropped_band_rows": 0, "hot_keys": 0}
    if eager_stats is None:
        eager_stats = cfg.candidate_strategy != "group"
    fused = (
        census
        and not eager_stats  # dropped_band_rows reporting needs the census
        and cfg.census_mode == "sketch"
        and cfg.hot_policy == "cap"
        and cfg.candidate_strategy == "group"
    )
    if fused and cfg.collision_threshold <= 1:
        # band identity never rides at c=1 (candidate_edges prunes it
        # anyway) — prune BEFORE the materialize so the object store
        # holds 24 B rows instead of 27 B
        bands = bands.select_columns(["band_key", "doc_id", "simhash"])
    bands = bands.materialize()
    if fused:
        # fused cap: the candidate shuffle already co-locates every
        # band_key's rows, so the O4 cap applies inside the expansion
        # with no census pass, no cold/hot split, no extra shuffle —
        # measured 78 s -> ~30 s on the 1.2M-doc bench phase at 8 CPUs.
        # Identical edge multiset (capping an under-cap bucket is the
        # identity; the CMS hot set was a superset of the truly hot).
        stats.update({
            "census_mode": "fused-cap",
            "hot_policy": cfg.hot_policy,
            "dropped_band_rows": None,
        })
        edges = candidate_edges(bands, cfg, cap=cfg.bucket_cap)
    else:
        if census:
            bands, cstats = capped_band_rows(bands, cfg, eager_stats=eager_stats)
            stats.update(cstats)
        edges = candidate_edges(bands, cfg)
    edges = pair_count_threshold(edges, cfg)
    return edges, stats


def dedup_url_pages(
    pages: Dataset,
    cfg: PipelineConfig,
    key_col: str = "url",
    text_col: str = "text",
    audit: bool = False,
) -> tuple[Dataset, dict]:
    """Flagship near-dup dedup over a STRING-KEYED pages table (the
    BASELINE.json input_hint schema: url-keyed Common-Crawl-style rows;
    the reference likewise keys records by their free-form id line,
    /root/reference/main_search.cpp:761-766).

    Stage one assigns each key a deterministic content-hash int64 id
    (stages.ids) so the whole int64 engine — 40 B band rows, CC label
    reduction — runs unchanged; the output round-trips ids back to keys.
    Returns (clusters, stats): clusters has (key_col, cluster_<key_col>)
    where cluster_<key_col> is the representative member's key (the
    member whose id is the cluster label), plus the int64 doc_id and
    cluster_id columns for downstream joins.

    audit=True runs the distributed id-collision audit and raises on a
    collision (a collision would silently merge two unrelated pages).
    """
    from consult_ray.pipelines.cluster import assign_clusters, connected_components
    from consult_ray.stages.ids import add_hashed_doc_ids, audit_id_collisions

    with_ids = add_hashed_doc_ids(pages, key_col=key_col).materialize()
    stats: dict = {}
    if audit:
        n_bad = audit_id_collisions(with_ids, key_col=key_col)
        stats["id_collisions"] = n_bad
        if n_bad:
            raise ValueError(
                f"{n_bad} hashed doc ids collide across distinct {key_col} "
                "keys; rerun with a different stages.ids seed or assign "
                "dense ids"
            )
    edges, estats = dup_edges(with_ids, cfg, text_col=text_col)
    stats.update(estats)
    labels = connected_components(edges, cfg)
    clusters = assign_clusters(
        with_ids, labels, cfg, keep_cols=(key_col,)
    )  # (doc_id, key, cluster_id)

    # id round-trip for the cluster label: the label is the min member
    # id, so one narrow (id -> key) hash join recovers that member's key.
    # clusters is itself a join output routed through map_batches — its
    # empty hash partitions would feed this join schema-less first
    # blocks (util.pin_schema docstring), so drop them first
    from consult_ray.util import drop_empty_blocks

    clusters = drop_empty_blocks(clusters, cfg)
    mapping = with_ids.select_columns(["doc_id", key_col])
    out = clusters.join(
        mapping,
        "inner",
        resolve_join_partitions(cfg),
        on=("cluster_id",),
        right_on=("doc_id",),
        right_suffix="_rep",
    )

    rep_col = f"{key_col}_rep" if key_col in clusters.columns() else key_col

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            f"cluster_{key_col}": batch[rep_col],
            "doc_id": batch["doc_id"],
            "cluster_id": batch["cluster_id"],
        })

    return out.map_batches(finalize, batch_format="pyarrow"), stats


def dedup_tiers(
    docs: Dataset,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """The full tiered-dedup attribution in one pass: every document ->
    (doc_id, cluster_id, tier) with tier in {'exact', 'substring',
    'near', 'survivor'} — the complete north-rule flow (exact dedup,
    LSH near-dup clustering, suffix-array substring removal) with the
    DROP REASON attributed per row, i.e. the per-tier accounting a
    corpus-curation run reports (the reference's matched/unmatched
    split, /root/reference/main_search.cpp:1021-1045, widened to name
    WHICH stage claimed each record).

    Tier precedence (each doc gets exactly one):
      exact      doc_id != min doc_id of its identical-text group
      substring  dropped by within-cluster containment (stages/substring)
      near       survives both but is not its cluster's survivor
                 (survivor = min non-substring-dropped member, the
                 checkpointed pipeline's build_survivors rule)
      survivor   the emitted representative

    Plan (100 TB shape): the near-dup engine runs unchanged (one band
    all-to-all, text moves only for the dup fraction); the exact tier
    is ONE hash shuffle of 16 B (content_hash, id) rows with a
    per-partition vectorized rep broadcast (never a per-hash-group
    Python call); the survivor rule is folded into the same partition
    kernel that carries the substring verdicts; the single stitch join
    keys on doc_id with both sides schema-pinned (empty-block join
    hazard, util.pin_schema docstring)."""
    from consult_ray.pipelines.cluster import connected_components
    from consult_ray.pipelines.operators import _hash_partition_col
    from consult_ray.stages.substring import substring_stage
    from consult_ray.stages.text import doc_fingerprint_batch
    from consult_ray.util import pin_schema

    P = resolve_join_partitions(cfg)
    edges, _stats = dup_edges(docs, cfg, text_col=text_col, id_col=id_col)
    labels = connected_components(edges, cfg).materialize()
    sub = substring_stage(docs, labels, cfg, text_col=text_col, id_col=id_col)

    # exact tier: rep = min doc_id per content hash. One 16 B/row hash
    # shuffle; the rep broadcasts to its group inside a partition kernel
    # (P Python calls total — the cap_partition shape, never per group).
    def hash_part(batch: pa.Table) -> pa.Table:
        t = doc_fingerprint_batch(batch, text_col=text_col)
        t = t.select([id_col, "content_hash"])
        return t.append_column(
            "__part", _hash_partition_col(t["content_hash"], P)
        )

    def rep_kernel(g: pa.Table) -> pa.Table:
        d = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(d):
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
            })
        h = g["content_hash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        d_s, h_s = d[order], h[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        counts = np.diff(np.r_[starts, len(h_s)])
        return pa.table({
            id_col: pa.array(d_s),
            "rep_id": pa.array(np.repeat(d_s[starts], counts)),
        })

    rep_map = (
        docs.select_columns([id_col, text_col])
        .map_batches(hash_part, batch_format="pyarrow", **_throttle(cfg))
        .groupby("__part")
        .map_groups(rep_kernel, batch_format="pyarrow")
    )

    # survivor rule folded into one cluster-partitioned kernel over the
    # substring verdicts (all rows of a cluster land in one partition)
    def cluster_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _hash_partition_col(batch["cluster_id"], P)
        )

    def survivor_kernel(g: pa.Table) -> pa.Table:
        d = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(d):
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "substring_dropped": pa.array([], pa.bool_()),
                "survivor_id": pa.array([], pa.int64()),
            })
        c = g["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dr = g["substring_dropped"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((d, c))
        d_s, c_s, dr_s = d[order], c[order], dr[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        counts = np.diff(np.r_[starts, len(c_s)])
        # min non-dropped member; containment is a partial order and
        # equal texts only drop the larger id, so >=1 always survives
        masked = np.where(dr_s, np.iinfo(np.int64).max, d_s)
        surv = np.minimum.reduceat(masked, starts)
        return pa.table({
            id_col: pa.array(d_s),
            "cluster_id": pa.array(c_s),
            "substring_dropped": pa.array(dr_s),
            "survivor_id": pa.array(np.repeat(surv, counts)),
        })

    verdicts = (
        sub.map_batches(cluster_part, batch_format="pyarrow", **_throttle(cfg))
        .groupby("__part")
        .map_groups(survivor_kernel, batch_format="pyarrow")
    )

    # single stitch join on doc_id; both sides are map_groups outputs
    # (hazardous join inputs when partitions outnumber keys) -> pin
    stitched = pin_schema(
        verdicts,
        pa.schema([
            (id_col, pa.int64()), ("cluster_id", pa.int64()),
            ("substring_dropped", pa.bool_()), ("survivor_id", pa.int64()),
        ]),
        cfg,
    ).join(
        pin_schema(
            rep_map,
            pa.schema([(id_col, pa.int64()), ("rep_id", pa.int64())]),
            cfg,
        ),
        "inner",
        P,
        on=(id_col,),
    )

    def tier_kernel(batch: pa.Table) -> pa.Table:
        d = batch[id_col].to_numpy(zero_copy_only=False)
        rep = batch["rep_id"].to_numpy(zero_copy_only=False)
        dr = batch["substring_dropped"].to_numpy(zero_copy_only=False).astype(bool)
        surv = batch["survivor_id"].to_numpy(zero_copy_only=False)
        tier = np.select(
            [rep != d, dr, surv != d],
            ["exact", "substring", "near"],
            default="survivor",
        )
        return pa.table({
            "doc_id": batch[id_col],
            "cluster_id": batch["cluster_id"],
            "tier": pa.array(tier.astype(object), pa.string()),
        })

    return stitched.map_batches(tier_kernel, batch_format="pyarrow")
