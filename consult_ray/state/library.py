"""Persistent, partitioned band-table library — the durable form of the
lookup index (S7/S8).

The reference's central artifact is a reusable on-disk library written
once (/root/reference/main_map.cpp:859-1132: 5 array families x 24 chunk
files + _meta) and parallel-loaded by a later process
(/root/reference/main_search.cpp:156-658), with entries routed by a tag
prefix of the signature (/root/reference/main_map.cpp:578-584). This
module is its Ray recast:

  * save_band_library: corpus -> band rows -> ONE groupby(part) shuffle
    (part = top bits of the band_key, the tag analog — a key range) ->
    per-partition cap + doc-major sort + parquet write from the workers,
    plus a _meta.json pinning the signature config. Durability is a
    rename-free manifest commit (state/fsio.py) that works on object
    stores, unlike the reference's mkdir refusal (main_map.cpp:361-372).
  * classify_queries_partitioned: query docs -> fingerprint -> band rows
    -> map_batches probe with BATCH-LEVEL routing: each task splits its
    own band rows by key-range partition id and probes each partition's
    CSR through a byte-bounded per-worker-process LRU cache (the
    parallel chunk load of main_search.cpp:523-658, loaded on demand)
    -> per-doc partial aggregate inside the batch -> one small
    groupby(doc_id) -> left join back onto the queries. No shuffle of
    the band rows, probe parallelism equals input block count, no task
    ever materializes a partition's query-side row set, and worker
    memory is bounded by the cache budget — so the library can exceed
    single-node RAM, the property the reference needs 128 GB for
    (README.md:34).

Per-row semantics are identical to state.lookup.BandLookupActor (the
broadcast path): match_count counts band probes with >=1 hamming<=p
neighbor (A4, main_search.cpp:766,868,996), match_doc is the min
matching corpus doc, matched = match_count >= c. A pytest asserts
bitwise-equal outputs of the two paths.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from consult_ray.config import PipelineConfig
from consult_ray.functions.hashing import popcount64
from consult_ray.state import fsio
from consult_ray.state.lookup import _capped_gather_idx, BandTableCSR
from consult_ray.util import resolve_join_partitions

LIBRARY_FORMAT_VERSION = 2
_META = "_meta.json"
_SUCCESS = "_SUCCESS"
_NO_MATCH = np.int64(np.iinfo(np.int64).max)  # Min-aggregate identity
# novel-id sets at or below this broadcast via ray.put (80 MB of int64);
# above it the band rows semi-join the id set distributedly instead
_BROADCAST_ID_LIMIT = 5_000_000


def _cfg_signature(cfg: PipelineConfig, kinds: tuple[str, ...]) -> dict:
    """The fields that determine band keys — a library built under one
    signature must never serve queries fingerprinted under another (the
    reproducibility contract map_fixed_pos exists for)."""
    return {
        "format_version": LIBRARY_FORMAT_VERSION,
        "shingle_k": cfg.shingle_k,
        "simhash_bands": cfg.simhash_bands,
        "simhash_bits_per_band": cfg.simhash_bits_per_band,
        "hamming_budget": cfg.hamming_budget,
        "num_perm": cfg.num_perm,
        "minhash_bands": cfg.minhash_bands,
        "minhash_rows": cfg.minhash_rows,
        "bucket_cap": cfg.bucket_cap,
        "seed": cfg.seed,
        "kinds": list(kinds),
    }


def partition_of(band_keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Key-range partition id: the top log2(P) bits of the band key
    (uniform, since keys are splitmix64-mixed) — the tag-prefix routing
    of main_map.cpp:578-584 generalized to P partitions."""
    bits = int(num_partitions).bit_length() - 1
    return (band_keys.view(np.uint64) >> np.uint64(64 - bits)).astype(np.int64)


def _part_name(part: int, gen: str) -> str:
    return f"part-{part:05d}-{gen}.parquet"


def _manifest_files(meta: dict) -> dict[int, str]:
    """part -> data-file name from a manifest (v1 libraries carried no
    file field; fall back to their fixed naming)."""
    return {
        int(p["part"]): p.get("file", f"part-{int(p['part']):05d}.parquet")
        for p in meta["partitions"]
    }


def _commit_manifest(
    fs, root: str, meta: dict, retired: list[str]
) -> dict:
    """The rename-free commit (see state/fsio.py): data files are
    already in place under generation-unique names; writing _meta.json
    as one single-object PUT publishes the new snapshot. Files replaced
    by THIS commit are retained one generation (readers holding the
    previous manifest stay valid); files retired before that are
    garbage-collected best-effort."""
    meta = {**meta, "retired": sorted(set(retired))}
    live = set(_manifest_files(meta).values()) | set(meta["retired"])
    fsio.write_json(fs, fsio.join(root, _META), meta)
    fsio.write_marker(fs, fsio.join(root, _SUCCESS))
    doomed = [
        fsio.join(root, f)
        for f in fsio.list_files(fs, root)
        if f.endswith(".parquet") and f not in live
    ]
    fsio.delete_files_best_effort(fs, doomed)
    return meta


def save_band_library(
    corpus: Dataset,
    cfg: PipelineConfig,
    path: str,
    num_partitions: int = 16,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Build the band table from a corpus and persist it partitioned by
    band-key range. Returns the manifest (also written to _meta.json).

    One all-to-all: groupby(part). Within each partition group the
    bucket cap is applied globally per key (every key lives in exactly
    one partition) and rows are written (band_key, doc_id)-sorted so the
    loader builds its CSR with one pass, no re-sort.

    Durability: manifest commit, no renames (state/fsio.py) — workers
    write generation-unique immutable part files straight to the final
    root (any pyarrow.fs: local or object store), and the driver's
    _meta.json PUT is the commit point. A crashed save leaves the
    previous snapshot fully readable; its orphan files are GC'd by the
    next successful commit."""
    assert num_partitions & (num_partitions - 1) == 0, "num_partitions must be 2^k"
    from consult_ray.pipelines.dedup import band_rows, fingerprints

    fs, root = fsio.resolve_fs(path)
    fsio.mkdirs(fs, root)
    gen = uuid.uuid4().hex[:8]
    old_files: list[str] = []
    if fsio.exists(fs, fsio.join(root, _META)):
        old_files = list(_manifest_files(fsio.read_json(fs, fsio.join(root, _META))).values())

    fp = fingerprints(corpus, cfg, text_col=text_col, id_col=id_col)
    bands = band_rows(fp, cfg, kinds=kinds)

    def add_part(batch: pa.Table) -> pa.Table:
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(partition_of(keys, num_partitions))
        )

    def write_partition(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        keys = g["band_key"].to_numpy(zero_copy_only=False)
        docs = g["doc_id"].to_numpy(zero_copy_only=False)
        sims = g["simhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, keys))
        keys, docs, sims = keys[order], docs[order], sims[order]
        uniq, starts = np.unique(keys, return_index=True)
        sizes = np.diff(np.append(starts, len(keys)))
        idx, _keep = _capped_gather_idx(starts, sizes, cfg.bucket_cap)
        out = pa.table({
            "band_key": pa.array(keys[idx]),
            "doc_id": pa.array(docs[idx]),
            "simhash": pa.array(sims[idx]),
        })
        name = _part_name(part, gen)
        pq.write_table(out, fsio.join(root, name), filesystem=fs)
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "file": pa.array([name], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "n_keys": pa.array([len(uniq)], pa.int64()),
            "dropped": pa.array([int(len(keys) - out.num_rows)], pa.int64()),
        })

    manifest_rows = (
        bands.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_partition, batch_format="pyarrow")
        .take_all()
    )
    manifest = {
        "signature": _cfg_signature(cfg, kinds),
        "num_partitions": num_partitions,
        "partitions": sorted(manifest_rows, key=lambda r: r["part"]),
    }
    return _commit_manifest(fs, root, manifest, retired=old_files)


def append_to_band_library(
    new_docs: Dataset,
    cfg: PipelineConfig,
    path: str,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally insert new docs into an existing library (the
    growing-corpus workload the reference cannot express — its library
    is write-once). Each touched partition merges old + new rows,
    re-sorts, drops exact duplicate (band_key, doc_id) rows (so a
    re-append of the same docs is a no-op) and re-applies the per-key
    min-doc_id cap — which makes append ORDER-FREE: appending B to a
    library built from A yields byte-identical partitions to building
    from A ∪ B (pytest-asserted). Durability follows the manifest
    protocol (state/fsio.py): merged partitions land in NEW
    generation-unique files; the _meta.json PUT publishes them and
    retires the replaced files for one generation."""
    from consult_ray.pipelines.dedup import band_rows, fingerprints

    fp = fingerprints(new_docs, cfg, text_col=text_col, id_col=id_col)
    bands = band_rows(fp, cfg, kinds=kinds)
    return append_band_rows(bands, cfg, path, kinds=kinds)


def append_band_rows(
    bands: Dataset,
    cfg: PipelineConfig,
    path: str,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
) -> dict:
    """append_to_band_library's core, taking PRE-COMPUTED band rows —
    streaming ingest reuses the band rows it already computed for
    classification instead of fingerprinting every novel doc twice."""
    meta = read_library_meta(path)
    check_signature(meta, cfg, kinds)
    num_partitions = int(meta["num_partitions"])
    fs, root = fsio.resolve_fs(path)
    files = _manifest_files(meta)
    gen = uuid.uuid4().hex[:8]

    def add_part(batch: pa.Table) -> pa.Table:
        keys = batch["band_key"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(partition_of(keys, num_partitions))
        )

    def merge_partition(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        keys = g["band_key"].to_numpy(zero_copy_only=False)
        docs = g["doc_id"].to_numpy(zero_copy_only=False)
        sims = g["simhash"].to_numpy(zero_copy_only=False)
        old_name = files.get(part)
        if old_name is not None:
            old = pq.read_table(fsio.join(root, old_name), filesystem=fs)
            keys = np.concatenate([old["band_key"].to_numpy(zero_copy_only=False), keys])
            docs = np.concatenate([old["doc_id"].to_numpy(zero_copy_only=False), docs])
            sims = np.concatenate([old["simhash"].to_numpy(zero_copy_only=False), sims])
        order = np.lexsort((docs, keys))
        keys, docs, sims = keys[order], docs[order], sims[order]
        fresh = np.r_[True, (keys[1:] != keys[:-1]) | (docs[1:] != docs[:-1])]
        keys, docs, sims = keys[fresh], docs[fresh], sims[fresh]
        uniq, starts = np.unique(keys, return_index=True)
        sizes = np.diff(np.append(starts, len(keys)))
        idx, _keep = _capped_gather_idx(starts, sizes, cfg.bucket_cap)
        out = pa.table({
            "band_key": pa.array(keys[idx]),
            "doc_id": pa.array(docs[idx]),
            "simhash": pa.array(sims[idx]),
        })
        name = _part_name(part, gen)
        pq.write_table(out, fsio.join(root, name), filesystem=fs)
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "file": pa.array([name], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "n_keys": pa.array([len(uniq)], pa.int64()),
            "dropped": pa.array([int(len(keys) - out.num_rows)], pa.int64()),
        })

    touched = (
        bands.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_partition, batch_format="pyarrow")
        .take_all()
    )
    by_part = {int(p["part"]): p for p in meta["partitions"]}
    replaced = [
        files[int(p["part"])] for p in touched if int(p["part"]) in files
    ]
    for p in touched:
        by_part[int(p["part"])] = p
    meta["partitions"] = [by_part[k] for k in sorted(by_part)]
    return _commit_manifest(fs, root, meta, retired=replaced)


def init_band_library(
    path: str,
    cfg: PipelineConfig,
    num_partitions: int = 16,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
) -> dict:
    """An empty library (for streaming ingest that starts from nothing)."""
    assert num_partitions & (num_partitions - 1) == 0, "num_partitions must be 2^k"
    fs, root = fsio.resolve_fs(path)
    fsio.mkdirs(fs, root)
    old_files: list[str] = []
    if fsio.exists(fs, fsio.join(root, _META)):
        old_files = list(
            _manifest_files(fsio.read_json(fs, fsio.join(root, _META))).values()
        )
    manifest = {
        "signature": _cfg_signature(cfg, kinds),
        "num_partitions": num_partitions,
        "partitions": [],
    }
    return _commit_manifest(fs, root, manifest, retired=old_files)


def ingest_shard(
    shard: Dataset,
    library_path: str,
    cfg: PipelineConfig,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """One step of the STREAMING dedup workload (the reference's
    continuous-classification shape, main_search run per query set, made
    stateful): classify the incoming shard against the resident library;
    docs with no near-dup resident (matched == False) are NEW — they are
    appended to the library and returned as survivors; matched docs are
    duplicates of resident content and drop.

    Like the reference, each doc classifies against the library AS OF
    the shard start — duplicates WITHIN one shard are not cross-checked
    (run exact/near dedup on the shard first if that matters). The
    shard fingerprints ONCE: its band rows serve classification and,
    filtered to the novel docs, the library append. Returns
    {"survivors": Dataset, "n_in": int, "n_new": int, "n_dup": int}.
    """
    import ray

    from consult_ray.pipelines.dedup import band_rows, fingerprints

    fp = fingerprints(shard, cfg, text_col=text_col, id_col=id_col)
    bands = band_rows(fp, cfg, kinds=kinds).materialize()

    out = classify_queries_partitioned(
        shard, library_path, cfg, kinds=kinds, text_col=text_col,
        id_col=id_col, bands=bands,
    ).materialize()
    n_in = out.count()
    new_docs = out.filter(expr="matched == False").drop_columns(
        ["matched", "match_count", "match_doc"]
    ).materialize()
    n_new = new_docs.count()
    if n_new:
        if n_new <= _BROADCAST_ID_LIMIT:
            # small side: collect ids Arrow-natively (no per-row dicts),
            # ray.put ONCE, filter band rows with a searchsorted
            parts = [
                b[id_col].to_numpy(zero_copy_only=False)
                for b in new_docs.select_columns([id_col]).iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            ref = ray.put(np.sort(np.concatenate(parts)))

            def only_new(batch: pa.Table) -> pa.Table:
                ids = ray.get(ref)
                docs = batch["doc_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ids, docs)
                pos_c = np.clip(pos, 0, len(ids) - 1)
                return batch.filter(pa.array(ids[pos_c] == docs))

            novel_bands = bands.map_batches(only_new, batch_format="pyarrow")
        else:
            # large shard: distributed semi-join (novel ids are unique,
            # so the inner hash join neither duplicates nor collects
            # anything driver-side). new_docs is a filter output — an
            # empty first block would reach the join schema-less
            # (util.pin_schema docstring), so drop empty blocks first.
            from consult_ray.util import drop_empty_blocks, resolve_join_partitions

            novel_bands = bands.join(
                drop_empty_blocks(new_docs.select_columns([id_col]), cfg),
                "inner",
                resolve_join_partitions(cfg),
                on=("doc_id",),
                right_on=(id_col,),
                right_suffix="_new",
            )
            if id_col != "doc_id":
                novel_bands = novel_bands.drop_columns([f"{id_col}_new"])
        append_band_rows(novel_bands, cfg, library_path, kinds=kinds)
    return {
        "survivors": new_docs,
        "n_in": int(n_in),
        "n_new": int(n_new),
        "n_dup": int(n_in - n_new),
    }


def read_library_meta(path: str) -> dict:
    fs, root = fsio.resolve_fs(path)
    assert fsio.exists(fs, fsio.join(root, _SUCCESS)), (
        f"band library at {path} is incomplete (no _SUCCESS)"
    )
    return fsio.read_json(fs, fsio.join(root, _META))


def check_signature(meta: dict, cfg: PipelineConfig, kinds: tuple[str, ...]) -> None:
    want = _cfg_signature(cfg, kinds)
    got = meta["signature"]
    if got != want:
        diff = {k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]}
        raise ValueError(f"band library signature mismatch: {diff}")


def _empty_csr() -> BandTableCSR:
    e = np.empty(0, dtype=np.int64)
    return BandTableCSR(e, np.zeros(1, dtype=np.int64), e, e.view(np.uint64))


def load_partition_csr(
    path: str, part: int, file: str | None = None
) -> BandTableCSR:
    """One key-range partition -> CSR arrays. Rows are stored sorted by
    (band_key, doc_id), so this is a single pass, no sort. `file` is
    the manifest's data-file name; omit it to resolve via _meta.json."""
    fs, root = fsio.resolve_fs(path)
    if file is None:
        file = _manifest_files(read_library_meta(path)).get(part)
    if file is None:  # no corpus keys in this range
        return _empty_csr()
    t = pq.read_table(fsio.join(root, file), filesystem=fs)
    keys = t["band_key"].to_numpy(zero_copy_only=False)
    docs = t["doc_id"].to_numpy(zero_copy_only=False)
    sims = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    uniq, starts = np.unique(keys, return_index=True)
    offs = np.append(starts, len(keys)).astype(np.int64)
    return BandTableCSR(uniq.astype(np.int64), offs, docs, sims)


# per-worker-process partition cache: repeated probe tasks on the same
# worker reuse the loaded CSR instead of re-reading parquet. Data files
# are immutable and generation-unique (manifest protocol), so the FILE
# NAME is a complete identity — no mtime/size stat, which object stores
# do not provide reliably. A library rewritten in place publishes NEW
# file names, so long-lived workers can never serve a stale CSR; old
# generations age out of the LRU. Bounded by BYTES (not entry count):
# batch-routed probing touches every partition a batch's keys span, so
# a worker may legitimately cache the whole library when it fits, and
# must evict cleanly when it does not.
from collections import OrderedDict

_PART_CACHE: OrderedDict[tuple, BandTableCSR] = OrderedDict()
_PART_CACHE_BYTES = 0
_PART_CACHE_BUDGET = int(
    os.environ.get("CONSULT_RAY_PART_CACHE_BYTES", 2 << 30)
)


def _csr_nbytes(csr: BandTableCSR) -> int:
    return csr.keys.nbytes + csr.offs.nbytes + csr.docs.nbytes + csr.sims.nbytes


def _cached_partition(
    path: str, part: int, file: str | None
) -> BandTableCSR:
    global _PART_CACHE_BYTES
    if file is None:  # no corpus keys in this range: nothing to cache
        return _empty_csr()
    key = (path, part, file)
    hit = _PART_CACHE.get(key)
    if hit is not None:
        _PART_CACHE.move_to_end(key)
        return hit
    csr = load_partition_csr(path, part, file)
    # drop any stale versions of this partition, then bound the cache
    for k in [k for k in _PART_CACHE if k[:2] == (path, part)]:
        _PART_CACHE_BYTES -= _csr_nbytes(_PART_CACHE.pop(k))
    _PART_CACHE[key] = csr
    _PART_CACHE_BYTES += _csr_nbytes(csr)
    while _PART_CACHE_BYTES > _PART_CACHE_BUDGET and len(_PART_CACHE) > 1:
        _, old = _PART_CACHE.popitem(last=False)
        _PART_CACHE_BYTES -= _csr_nbytes(old)
    return csr


def _probe_against_csr(
    t: BandTableCSR,
    pkeys: np.ndarray,
    pdocs: np.ndarray,
    psims: np.ndarray,
    cfg: PipelineConfig,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bucket scan (T5, /root/reference/main_search.cpp:831-874)
    of probe rows against one CSR. Returns per probe row:
    (hit: bool — >=1 hamming<=p neighbor, mdoc: int64 min matching doc,
    _NO_MATCH when none)."""
    hit = np.zeros(len(pkeys), dtype=bool)
    mdoc = np.full(len(pkeys), _NO_MATCH, dtype=np.int64)
    if not len(t.keys) or not len(pkeys):
        return hit, mdoc
    pos = np.searchsorted(t.keys, pkeys)
    pos_c = np.clip(pos, 0, len(t.keys) - 1)
    found = t.keys[pos_c] == pkeys
    starts = t.offs[pos_c]
    sizes = np.where(found, t.offs[pos_c + 1] - starts, 0)
    cand_idx, keep = _capped_gather_idx(starts, sizes, cfg.bucket_cap)
    if not len(cand_idx):
        return hit, mdoc
    probe_of = np.repeat(np.arange(len(pkeys), dtype=np.int64), keep)
    ham = popcount64(psims[probe_of] ^ t.sims[cand_idx])
    ok = (ham <= cfg.hamming_budget) & (t.docs[cand_idx] != pdocs[probe_of])
    if ok.any():
        ok_probe = probe_of[ok]
        hit[ok_probe] = True
        np.minimum.at(mdoc, ok_probe, t.docs[cand_idx][ok])
    return hit, mdoc


def probe_band_rows_batch(
    batch: pa.Table,
    library_path: str,
    cfg: PipelineConfig,
    num_partitions: int,
    files: dict[int, str] | None = None,
) -> pa.Table:
    """Probe ONE query band-row batch against the library with NO
    shuffle: split the batch's rows by key-range partition id, probe
    each present partition's worker-cached CSR, then pre-aggregate per
    query doc. This is the load shape of the reference's whole search
    program (/root/reference/main_search.cpp:704-707: dynamic work items
    over a shared read-only index) — probe parallelism equals input
    block count (not num_partitions), and no task ever materializes a
    partition's full query-side row set (the round-2 scale cap).

    Worker memory is bounded by the CSR cache budget; a library larger
    than the budget trades cache misses (partition re-reads) for the
    all-to-all the routed-groupby plan would pay instead.

    With cfg.probe_early_exit (O3, main_search.cpp:866-894): partitions
    are visited in key-range order and a doc's remaining probe rows are
    skipped once it holds collision_threshold matches. `matched` is
    unchanged (skipping starts only at >= c); match_count/match_doc
    reflect only the probes performed.

    Output: one row per distinct query doc in the batch —
    (doc_id, hit: partial match count, mdoc: partial min match doc)."""
    if files is None:
        files = _manifest_files(read_library_meta(library_path))
    pkeys = batch["band_key"].to_numpy(zero_copy_only=False)
    pdocs = batch["doc_id"].to_numpy(zero_copy_only=False)
    n = len(pkeys)
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "hit": pa.array([], pa.int64()),
            "mdoc": pa.array([], pa.int64()),
        })
    psims = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    part = partition_of(pkeys, num_partitions)

    hit = np.zeros(n, dtype=bool)
    mdoc = np.full(n, _NO_MATCH, dtype=np.int64)

    order = np.argsort(part, kind="stable")
    sp = part[order]
    bounds = np.append(np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]]), n)

    early = cfg.probe_early_exit
    if early:
        udocs = np.unique(pdocs)
        counts = np.zeros(len(udocs), dtype=np.int64)
        local = np.searchsorted(udocs, pdocs)

    for i in range(len(bounds) - 1):
        sel = order[bounds[i] : bounds[i + 1]]
        if early:
            sel = sel[counts[local[sel]] < cfg.collision_threshold]
            if not len(sel):
                continue
        p_i = int(sp[bounds[i]])
        t = _cached_partition(library_path, p_i, files.get(p_i))
        h, m = _probe_against_csr(t, pkeys[sel], pdocs[sel], psims[sel], cfg)
        hit[sel] = h
        mdoc[sel] = m
        if early and h.any():
            np.add.at(counts, local[sel[h]], 1)

    # per-doc partial aggregate: the groupby("doc_id") shuffle then moves
    # one row per doc per batch instead of one per band row
    o2 = np.argsort(pdocs, kind="stable")
    d = pdocs[o2]
    st = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    return pa.table({
        "doc_id": pa.array(d[st]),
        "hit": pa.array(np.add.reduceat(hit[o2].astype(np.int64), st)),
        "mdoc": pa.array(np.minimum.reduceat(mdoc[o2], st)),
    })


# merged-bloom cache: keyed by the manifest's immutable data-file set,
# so an append (new generation files) naturally invalidates it
_BLOOM_CACHE: dict[tuple, tuple[np.ndarray, int, int]] = {}
_BLOOM_SEED = 0xB100F


def library_bloom(path: str, fpp: float = 0.02) -> tuple[np.ndarray, int, int]:
    """(packed words, m_bits, k) Bloom filter over every band key in the
    library. Built distributedly — per-block OR partials over the
    partition files' band_key columns, merged driver-side (same plan
    shape as the CMS census; above ~50M keys swap the driver fold for
    the chunked tree reduce dedup.py uses). Cached per manifest
    generation; sized from the manifest's exact per-partition n_keys."""
    import ray.data as rd

    meta = read_library_meta(path)
    files = _manifest_files(meta)
    key = (path, tuple(sorted(files.values())), fpp)
    hit = _BLOOM_CACHE.get(key)
    if hit is not None:
        return hit
    from consult_ray.functions.sketch import bloom_block_bits, bloom_merge, bloom_size_for

    n_keys = sum(int(p["n_keys"]) for p in meta["partitions"])
    m_bits, k = bloom_size_for(n_keys, fpp)
    fs, root = fsio.resolve_fs(path)
    paths = [fsio.join(root, f) for f in files.values()]
    if not paths:
        words = np.zeros(m_bits >> 6, dtype=np.uint64)
    else:
        def partial(b: pa.Table) -> pa.Table:
            w = bloom_block_bits(
                b["band_key"].to_numpy(zero_copy_only=False),
                m_bits, k, _BLOOM_SEED,
            )
            return pa.table({"w": pa.array([w.tobytes()], pa.large_binary())})

        def combine(b: pa.Table) -> pa.Table:
            # OR-fold <= 16 block bit-arrays in a worker task so the
            # driver receives ~n_blocks/16 words rows, not one per block
            # (same bounded-intake shape as the CMS census combine)
            w = bloom_merge(
                [np.frombuffer(v.as_py(), dtype=np.uint64) for v in b["w"]]
            )
            return pa.table({"w": pa.array([w.tobytes()], pa.large_binary())})

        blocks = (
            rd.read_parquet(paths, columns=["band_key"], filesystem=fs)
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow", batch_size=16)
            .take_all()
        )
        words = bloom_merge(
            [np.frombuffer(r["w"], dtype=np.uint64) for r in blocks]
        )
    _BLOOM_CACHE.clear()  # at most one resident filter per process
    _BLOOM_CACHE[key] = (words, m_bits, k)
    return words, m_bits, k


def classify_queries_partitioned(
    queries: Dataset,
    library_path: str,
    cfg: PipelineConfig,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: Dataset | None = None,
) -> Dataset:
    """Stream query docs against a persisted band library with key-range
    routing. Output schema == state.lookup.classify_queries (queries +
    matched/match_count/match_doc). Pass pre-computed `bands` (the
    queries' band rows) to skip the fingerprint pass — streaming ingest
    shares one fingerprinting between classify and append."""
    from consult_ray.pipelines.dedup import band_rows, fingerprints

    meta = read_library_meta(library_path)
    check_signature(meta, cfg, kinds)
    num_partitions = int(meta["num_partitions"])

    if bands is None:
        fp = fingerprints(queries, cfg, text_col=text_col, id_col=id_col)
        bands = band_rows(fp, cfg, kinds=kinds)

    if cfg.probe_bloom_prefilter:
        # Bloom misses are guaranteed absent from the library, so
        # dropping them here cannot change any doc's match set; docs
        # whose every band row misses fall out entirely and surface as
        # matched=False through the left_outer join below
        import ray

        from consult_ray.functions.sketch import bloom_contains

        words, m_bits, k = library_bloom(library_path, cfg.bloom_fpp)
        wref = ray.put(words)

        def prefilter(b: pa.Table) -> pa.Table:
            keys = b["band_key"].to_numpy(zero_copy_only=False)
            keep = bloom_contains(ray.get(wref), keys, m_bits, k, _BLOOM_SEED)
            return b.filter(pa.array(keep))

        bands = bands.map_batches(prefilter, batch_format="pyarrow")

    # batch-level routing, NO all-to-all: each map task splits its own
    # band rows by key-range partition and probes the worker-cached CSRs
    # (probe parallelism = block count; see probe_band_rows_batch). The
    # manifest's part->file map is resolved ONCE on the driver and
    # shipped in the closure, pinning every probe task to this snapshot.
    files = _manifest_files(meta)
    probes = bands.map_batches(
        lambda b: probe_band_rows_batch(b, library_path, cfg, num_partitions, files),
        batch_format="pyarrow",
        batch_size=None,
    )
    agg = probes.groupby("doc_id").aggregate(
        Sum("hit", alias_name="match_count"), Min("mdoc", alias_name="mdoc")
    )
    # hash-aggregate output feeding Dataset.join: pin the schema so
    # empty partitions (partitions > distinct probed doc ids) can't
    # emit schema-less blocks into Acero (util.pin_schema docstring)
    from consult_ray.util import pin_schema

    agg = pin_schema(agg, pa.schema([
        ("doc_id", pa.int64()), ("match_count", pa.int64()),
        ("mdoc", pa.int64()),
    ]))

    joined = queries.join(
        agg,
        "left_outer",
        resolve_join_partitions(cfg),
        on=(id_col,),
        right_on=("doc_id",),
        right_suffix="_r",
    )

    c = cfg.collision_threshold

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cnt = pc.fill_null(batch["match_count"], 0).combine_chunks().cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        md = pc.fill_null(batch["mdoc"], int(_NO_MATCH)).combine_chunks().cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        md = np.where(md == _NO_MATCH, np.int64(-1), md)
        keep = [
            f for f in batch.column_names
            if f not in ("match_count", "mdoc", "doc_id_r")
        ]
        out = batch.select(keep)
        return (
            out.append_column("matched", pa.array(cnt >= c))
            .append_column("match_count", pa.array(cnt))
            .append_column("match_doc", pa.array(md))
        )

    return joined.map_batches(finalize, batch_format="pyarrow")
