"""Connected components over dup edges -> cluster labels.

The reference stops at per-read membership (anti-join classification,
/root/reference/main_search.cpp:1021-1045); clustering is the north_rule
addition. Cluster id = MIN doc_id in the component, so labels are
deterministic, order-free, and idempotent across retries (SURVEY §2.9).

Two exact paths:
  * distributed: iterative min-label propagation — per round, two
    hash-joins attach current labels to edge endpoints, each edge sends
    min(label_a, label_b) to both endpoints, and a groupby-min folds
    messages into new labels. Labels only ever decrease, so sum(label)
    is a strictly-decreasing convergence witness; rounds ~ graph
    diameter (dup clusters are near-cliques, so 2-4 rounds). This is the
    label-exchange half of BTS (PAPERS.md, ICDE 2024) with plain
    Dataset primitives.
  * driver: exact union-find when the verified edge set is small
    (edges fit comfortably on the driver); the default auto mode picks
    it below `driver_edge_limit` edges. The distributed path is the
    10^12-doc plan — per-round state is one row per non-singleton node.

Singleton docs never enter the propagation: labels are computed over
edge endpoints only, then left-outer joined back onto the full doc set
(missing -> own id). At web scale non-singleton nodes are a small
fraction of docs, which keeps every CC round's shuffle proportional to
the dup graph, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from consult_ray.config import PipelineConfig
from consult_ray.util import resolve_join_partitions
from consult_ray.state.unionfind import vectorized_labels

# Edges are 16 B/row; 20M edges = 320 MB driver-side, and the vectorized
# min-label kernel clears that in seconds — far under the cost of even
# one distributed propagation round. Above this, the distributed path.
DRIVER_EDGE_LIMIT = 20_000_000


def _edge_nodes(edges: Dataset, num_partitions: int) -> Dataset:
    """Distinct endpoint nodes with initial label = node id.

    The dedupe runs as the partition-kernel min (util.partitioned_group_min),
    NOT `groupby(node).aggregate(Min)`: this Ray version's native
    aggregate pays per-distinct-key costs that dominate at web scale —
    measured on this host at 2.6M keys: 140 s native vs 2.4 s kernel
    (58x; the same tiny-groups class CLAUDE.md documents for
    map_groups). Bytes moved are identical: one hash shuffle either way."""

    def emit(batch: pa.Table) -> pa.Table:
        nodes = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False),
                    batch["b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": pa.array(nodes), "label": pa.array(nodes)})

    from consult_ray.util import partitioned_group_min

    return partitioned_group_min(
        edges.map_batches(emit, batch_format="pyarrow"),
        "node", "label", num_partitions,
    )


LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _directed_edges(edges: Dataset) -> Dataset:
    """(a, b) -> both directions (src, dst): built ONCE before the
    propagation loop so every round pays a single hash join instead of
    two chained ones. 2x the edge rows at 16 B/row — cheaper than the
    second all-to-all per round it replaces, and it removes the
    join-output-feeds-a-join hazard (pin_schema docstring) entirely."""

    def emit(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        })

    return edges.map_batches(emit, batch_format="pyarrow")


def _propagate_round(diredges: Dataset, labels: Dataset, num_partitions: int) -> Dataset:
    """One min-label round: each directed edge ships its source's label
    to its destination; a node's new label = Min(own, incoming) — plus
    an in-round `changed` witness so convergence needs NO confirmation
    round (the sum-equality witness cost one full extra round).

    NO Dataset.join and NO native groupby(key) aggregate: both pay
    per-partition/per-key machinery costs that dwarf the data movement
    at web scale (the join: measured 46 s/round for a 46.5M-row edge
    table whose bytes move in ~10 s; the aggregate: 58x per-key tax,
    util.partitioned_group_min docstring). Instead the round is TWO
    co-partitioned kernel shuffles of the same bytes:

      1. gather: edges (k=src, dst) and labels (k=node, label) union
         into one stream hash-partitioned on k; a per-partition kernel
         sorted-gathers label[src] (every src has a label — labels are
         seeded from edge endpoints and nodes are never dropped) and
         emits per-dst min partials.
      2. merge: labels (tag 0) union messages (tag 1) hash-partitioned
         on node; a per-partition kernel emits (node, label=min,
         changed=any incoming < own).

    The join-free shape also removes the empty-block Acero hazard
    (util.pin_schema docstring) from the loop entirely. Output schema:
    (node, label, changed:int8); callers strip/aggregate `changed`.

    The lazy `messages` stream feeding the second sort-based shuffle was
    audited for the sort-reexecution quirk (round-4 advice): measured
    identical wall-time with and without an intermediate materialize()
    on the 1000-node chain fixture — the gather work is small relative
    to the two shuffles — so the round stays a single fused plan. The
    ACTUAL round cost driver was per-round block growth, fixed in the
    caller (connected_components_distributed's labels repartition)."""
    from consult_ray.util import hash_partition_col

    P = num_partitions
    I64_MAX = np.iinfo(np.int64).max

    def edges_kd(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "k": batch["src"],
            "dst": batch["dst"],
            "label": pa.nulls(n, pa.int64()),
        })

    def labels_kd(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "k": batch["node"],
            "dst": pa.nulls(n, pa.int64()),
            "label": batch["label"],
        })

    def part_k(batch: pa.Table) -> pa.Table:
        return batch.append_column("__part", hash_partition_col(batch["k"], P))

    def gather_kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "node": pa.array([], pa.int64()), "label": pa.array([], pa.int64()),
        })
        if not g.num_rows:
            return empty
        k = g["k"].to_numpy(zero_copy_only=False)
        # int64-with-nulls must NOT round-trip through float (precision):
        # take the validity mask first, then fill
        is_edge = pc.is_valid(g["dst"].combine_chunks()).to_numpy(zero_copy_only=False)
        dst = g["dst"].combine_chunks().fill_null(0).to_numpy(zero_copy_only=False)
        lab = g["label"].combine_chunks().fill_null(0).to_numpy(zero_copy_only=False)
        ln, ll = k[~is_edge], lab[~is_edge]
        es, ed = k[is_edge], dst[is_edge]
        if not len(es):
            return empty
        o = np.argsort(ln, kind="stable")
        ln_s, ll_s = ln[o], ll[o]
        pos = np.searchsorted(ln_s, es)
        # every edge src must have a label row co-partitioned with it;
        # a broken invariant (e.g. resuming a cc_rounds checkpoint
        # against a CHANGED edge set) would otherwise silently gather a
        # wrong label — fail loudly instead (cheap vectorized check)
        assert pos.size == 0 or (
            int(pos.max()) < len(ln_s) and bool((ln_s[pos] == es).all())
        ), "CC gather: edge src without a label row in its partition"
        elab = ll_s[pos]
        # per-dst min partial (one row per distinct dst in the partition)
        o2 = np.lexsort((elab, ed))
        ed_s, el_s = ed[o2], elab[o2]
        starts = np.flatnonzero(np.r_[True, ed_s[1:] != ed_s[:-1]])
        return pa.table({
            "node": pa.array(ed_s[starts]),
            "label": pa.array(np.minimum.reduceat(el_s, starts)),
        })

    messages = (
        diredges.map_batches(edges_kd, batch_format="pyarrow")
        .union(labels.map_batches(labels_kd, batch_format="pyarrow"))
        .map_batches(part_k, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(gather_kernel, batch_format="pyarrow")
    )

    def tag(t: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["node"], "label": batch["label"],
                "tag": pa.array(np.full(batch.num_rows, t, dtype=np.int8)),
            })
        return fn

    def part_node(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", hash_partition_col(batch["node"], P)
        )

    def merge_kernel(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({
                "node": pa.array([], pa.int64()), "label": pa.array([], pa.int64()),
                "changed": pa.array([], pa.int8()),
            })
        n = g["node"].to_numpy(zero_copy_only=False)
        l = g["label"].to_numpy(zero_copy_only=False)
        t = g["tag"].to_numpy(zero_copy_only=False)
        # every node has EXACTLY ONE tag-0 (own-label) row; incoming
        # tag-1 message rows are optional
        own = np.where(t == 0, l, I64_MAX)
        inc = np.where(t == 1, l, I64_MAX)
        o = np.argsort(n, kind="stable")
        n_s, own_s, inc_s = n[o], own[o], inc[o]
        starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
        old = np.minimum.reduceat(own_s, starts)
        m = np.minimum.reduceat(inc_s, starts)
        return pa.table({
            "node": pa.array(n_s[starts]),
            "label": pa.array(np.minimum(old, m)),
            "changed": pa.array((m < old).astype(np.int8)),
        })

    return (
        labels.map_batches(tag(0), batch_format="pyarrow")
        .union(messages.map_batches(tag(1), batch_format="pyarrow"))
        .map_batches(part_node, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge_kernel, batch_format="pyarrow")
    )


def _labels_arrays(labels: Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(nodes_sorted, labels) int64 arrays from a (node, label) Dataset
    — the driver-state representation (16 B/node)."""
    parts = list(labels.select_columns(["node", "label"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ))
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(parts)
    n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    l = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(n, kind="stable")
    return n[o], l[o]


def _arrays_labels(nodes: np.ndarray, labels: np.ndarray, P: int) -> Dataset:
    ds = rd.from_arrow(pa.table({
        "node": pa.array(nodes), "label": pa.array(labels),
    }))
    return ds.repartition(max(1, min(P, len(nodes)))) if len(nodes) else ds


def _propagate_round_driver(
    diredges: Dataset,
    nodes_sorted: np.ndarray,
    labels_np: np.ndarray,
    P: int,
) -> tuple[np.ndarray, int]:
    """One min-label round with per-NODE state on the driver (the
    pagerank pattern — see PipelineConfig.cc_driver_node_limit).

    The co-partitioned `_propagate_round` re-shuffles EVERY directed
    edge through a sort exchange EVERY round just to co-locate it with
    a 16 B/node label table; when that table fits the driver, ray.put
    it instead and the gather becomes ONE shuffle-free vectorized map
    over the static edge table (searchsorted label lookup + per-batch
    per-dst min partials), merged by a single partition-kernel min over
    at most node-count partial rows. Measured at 22.4M directed edges /
    2.6M nodes on 8 CPUs: 42 s -> ~4 s per round. Edges never leave the
    cluster; only (dst, min-label) partials move."""
    import ray as _ray

    ref = _ray.put((nodes_sorted, labels_np))

    def gather_partial(batch: pa.Table) -> pa.Table:
        ln, ll = _ray.get(ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        if not len(src):
            return pa.table({
                "node": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
            })
        pos = np.searchsorted(ln, src)
        assert int(pos.max()) < len(ln) and bool((ln[pos] == src).all()), (
            "CC gather: edge src without a label row"
        )
        lab = ll[pos]
        o = np.lexsort((lab, dst))
        d_s, l_s = dst[o], lab[o]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.table({
            "node": pa.array(d_s[starts]),
            "m": pa.array(np.minimum.reduceat(l_s, starts)),
        })

    from consult_ray.util import partitioned_group_agg

    merged = partitioned_group_agg(
        diredges.map_batches(gather_partial, batch_format="pyarrow"),
        "node", [("m", "min", "m")], P,
    )
    new = labels_np.copy()
    changed = 0
    # one row per node after the partition merge, so every idx is
    # first-touch and `imp` compares against the OLD label — the same
    # changed witness merge_kernel computes
    for b in merged.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        n_ = b["node"].to_numpy(zero_copy_only=False)
        m_ = b["m"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(nodes_sorted, n_)
        imp = m_ < new[idx]
        new[idx[imp]] = m_[imp]
        changed += int(imp.sum())
    return new, changed


def _contract_blocks(edges: Dataset) -> Dataset:
    """Per-block local contraction (the BTS 'local union-find inside the
    partition' half): each block's edge set is replaced by the star
    edges (node -> block-local min label) of its own connected
    components — same connectivity, ≤ #nodes edges per block instead of
    #edges, and local diameter 1, so the global min-label rounds only
    pay for CROSS-block structure."""

    def contract(batch: pa.Table) -> pa.Table:
        from consult_ray.state.unionfind import vectorized_labels

        nodes, labs = vectorized_labels(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        )
        keep = nodes != labs
        return pa.table({"a": pa.array(nodes[keep]), "b": pa.array(labs[keep])})

    return edges.map_batches(contract, batch_format="pyarrow")


def connected_components_distributed(
    edges: Dataset, cfg: PipelineConfig, checkpoint_dir: str | None = None
) -> Dataset:
    """(a, b) edges -> (node, label) via per-block contraction + global
    min-label propagation.

    checkpoint_dir: when set, every propagation round commits its labels
    via the rename-free manifest protocol (state/fsio.py): labels land
    in a generation-unique <dir>/cc_round_<i>-<gen>/ data dir and the
    single-object <dir>/cc_round_<i>.json PUT (holding the data-dir name
    and the convergence witness) is the commit point — object-store
    safe. A re-run RESUMES from the last committed round — the
    per-iteration checkpointing of SURVEY §7 step 5. Rounds are
    idempotent (labels only decrease, min-label is monotone), so
    resuming mid-convergence is value-identical. Data dirs not named by
    any round manifest (crashed writes) are swept at scan time.
    """
    import uuid

    import pyarrow.fs as pafs

    import ray.data as rd

    from consult_ray.state import fsio

    labels = None
    prev_sum = None
    start_round = 0
    fs = ckroot = None
    if checkpoint_dir:
        import posixpath
        import re

        fs, ckroot = fsio.resolve_fs(checkpoint_dir)
        fsio.mkdirs(fs, ckroot)
        # round -> labels data dir; new format (cc_round_<i>.json naming
        # a generation-unique dir) and the legacy pre-manifest format
        # (a cc_round_<i>/ dir holding _SUCCESS + _meta.json with the
        # same label_sum witness) both count as committed progress
        done: dict[int, str] = {}
        referenced = set()
        for f in fsio.list_files(fs, ckroot):
            m = re.fullmatch(r"cc_round_(\d+)\.json", f)
            if m:
                data = fsio.read_json(fs, fsio.join(ckroot, f))["data"]
                done[int(m.group(1))] = data
                referenced.add(data)
        legacy = set()
        try:
            for i in fs.get_file_info(pafs.FileSelector(ckroot, recursive=False)):
                base = posixpath.basename(i.path)
                m = re.fullmatch(r"cc_round_(\d+)", base)
                if (
                    i.type == pafs.FileType.Directory
                    and m
                    and fsio.exists(fs, fsio.join(i.path, "_SUCCESS"))
                ):
                    legacy.add(base)
                    done.setdefault(int(m.group(1)), base)
        except Exception:
            pass
        # sweep only GENERATION-SUFFIXED data dirs no manifest names
        # (crashed/superseded writes of THIS format) and legacy .tmp
        # leftovers; exact-named legacy round dirs are committed state
        try:
            for i in fs.get_file_info(pafs.FileSelector(ckroot, recursive=False)):
                base = posixpath.basename(i.path)
                if i.type != pafs.FileType.Directory:
                    continue
                stale_gen = (
                    re.fullmatch(r"cc_round_\d+-[0-9a-f]+", base)
                    and base not in referenced
                )
                if stale_gen or (base.startswith("cc_round_") and ".tmp-" in base):
                    fs.delete_dir(i.path)
        except Exception:
            pass
        if done:
            last = max(done)
            data = done[last]
            if data in legacy:
                meta = fsio.read_json(
                    fs, fsio.join(ckroot, data, "_meta.json")
                )
            else:
                meta = fsio.read_json(
                    fs, fsio.join(ckroot, f"cc_round_{last}.json")
                )
            labels = rd.read_parquet(
                fsio.join(ckroot, data), filesystem=fs
            ).select_columns(["node", "label"])
            # n_changed == 0 is the committed convergence witness (new
            # manifests); legacy label_sum-only manifests can't prove
            # convergence, so resuming them just runs (idempotent)
            # rounds until the in-round witness fires
            if meta.get("n_changed") == 0:
                return labels
            prev_sum = meta["label_sum"]
            start_round = last + 1

    if labels is None:
        labels = _edge_nodes(edges, resolve_join_partitions(cfg)).materialize()
    if labels.count() == 0:
        # empty edge set: no nodes, nothing to propagate — and the loop
        # below would otherwise burn cc_max_iters rounds writing empty
        # checkpoints (an empty round's witness can never fire).
        return labels
    diredges = _directed_edges(
        _contract_blocks(edges.select_columns(["a", "b"]))
    ).materialize()
    P = resolve_join_partitions(cfg)
    n_nodes = labels.count()
    # per-node driver state when it fits (cc_driver_node_limit
    # docstring): each round is one shuffle-free map over the static
    # edge table instead of re-shuffling every edge; beyond the limit
    # the co-partitioned rounds below carry arbitrarily large graphs
    driver_state = n_nodes <= cfg.cc_driver_node_limit
    if driver_state:
        nodes_np, labels_np = _labels_arrays(labels)
    for i in range(start_round, cfg.cc_max_iters):
        if driver_state:
            labels_np, n_changed = _propagate_round_driver(
                diredges, nodes_np, labels_np, P
            )
            if checkpoint_dir:
                # only the checkpoint write needs a Dataset view; the
                # post-loop build below serves the return value, so a
                # non-checkpointed run never serializes the label table
                # into the object store mid-loop
                labels = _arrays_labels(nodes_np, labels_np, P)
        else:
            out = _propagate_round(diredges, labels, P).materialize()
            # in-round witness: rounds end as soon as no label improved
            # — the previous sum-equality witness needed one full
            # CONFIRM round after convergence (a ~50 s round at 2.6M
            # nodes / 46.5M directed edges on this host) plus a
            # full-label Sum
            row = out.aggregate(Sum("changed", alias_name="c"))
            n_changed = row["c"] if isinstance(row, dict) else row
            # REPARTITION before the next round: Ray 2.49's sort
            # shuffle emits one output block per INPUT block (not per
            # partition), so each round's label set would otherwise
            # inherit blocks(labels) + blocks(messages) blocks — an
            # EXPONENTIAL per-round block growth (L_{i+1} = 2 L_i + D;
            # measured: a 10-block 1000-node path graph reached ~2550
            # blocks by round 7 and a single merge round spawned 5110
            # map tasks). Bounding labels at P row-range blocks keeps
            # every round's task count O(P + blocks(diredges)).
            labels = (
                out.select_columns(["node", "label"])
                .repartition(P).materialize()
            )
        if checkpoint_dir:
            if driver_state:
                cur = int(labels_np.sum())
            else:
                row = labels.aggregate(Sum("label", alias_name="s"))
                cur = row["s"] if isinstance(row, dict) else row
            gen = f"cc_round_{i}-{uuid.uuid4().hex[:8]}"
            labels.write_parquet(fsio.join(ckroot, gen), filesystem=fs)
            # commit point: one single-object PUT naming the data dir;
            # label_sum stays for auditability/legacy readers, n_changed
            # is the convergence witness
            fsio.write_json(fs, fsio.join(ckroot, f"cc_round_{i}.json"), {
                "round": i,
                "data": gen,
                "label_sum_before": prev_sum,
                "label_sum": int(cur) if cur is not None else None,
                "n_changed": int(n_changed) if n_changed is not None else None,
            })
            prev_sum = cur
        if not n_changed:
            break
    if driver_state:
        labels = _arrays_labels(nodes_np, labels_np, P)
    return labels


def connected_components_driver(edges: Dataset) -> Dataset:
    """Exact union-find on the driver (small edge sets / test oracle)."""
    parts = list(
        edges.select_columns(["a", "b"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    a = tbl["a"].to_numpy(zero_copy_only=False)
    b = tbl["b"].to_numpy(zero_copy_only=False)
    # band multiplicity means the same pair arrives many times; dedupe
    # once (packed-pair unique) before the O(E)-per-round label kernel
    if len(a):
        lo = np.minimum(a, b).astype(np.uint64)
        hi = np.maximum(a, b).astype(np.uint64)
        packed = np.unique((lo << np.uint64(32)) | hi) if (hi < (1 << 32)).all() else None
        if packed is not None:
            a = (packed >> np.uint64(32)).astype(np.int64)
            b = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    nodes, labs = vectorized_labels(a, b)
    return rd.from_arrow(pa.table({"node": pa.array(nodes), "label": pa.array(labs)}))


def connected_components(
    edges: Dataset, cfg: PipelineConfig, mode: str = "auto",
    checkpoint_dir: str | None = None,
) -> Dataset:
    """(node, label) for every node appearing in an edge.

    mode: "auto" (driver below DRIVER_EDGE_LIMIT edges), "driver",
    "distributed". checkpoint_dir enables per-round checkpoints on the
    distributed path (ignored by the driver path, whose whole run is
    one cheap step).
    """
    if mode == "auto":
        # materialize once: count() would otherwise execute the whole
        # candidate join and the chosen path would re-execute it
        edges = edges.materialize()
        mode = "driver" if edges.count() <= DRIVER_EDGE_LIMIT else "distributed"
    if mode == "driver":
        return connected_components_driver(edges)
    return connected_components_distributed(edges, cfg, checkpoint_dir=checkpoint_dir)


# Labels are 16 B/row; 5M rows = 80 MB broadcast once via ray.put — far
# cheaper than hash-shuffling the full doc id table. Non-singleton nodes
# are a small fraction of docs at web scale, so broadcast is the common
# case; above the limit the shuffle join is the scale path.
BROADCAST_LABEL_LIMIT = 5_000_000


def broadcast_labels(labels: Dataset):
    """Collect a (node, label) dataset into node-sorted arrays and
    ray.put them ONCE (shared by the broadcast assign path and the
    substring stage's label routing)."""
    import ray

    parts = list(labels.select_columns(["node", "label"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ))
    if parts:
        tbl = pa.concat_tables(parts)
        nodes = tbl["node"].to_numpy(zero_copy_only=False)
        labs = tbl["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(nodes)
        nodes, labs = nodes[order], labs[order]
    else:
        nodes = np.empty(0, dtype=np.int64)
        labs = np.empty(0, dtype=np.int64)
    return ray.put((nodes, labs))


def resolve_labels(ids: np.ndarray, nodes: np.ndarray, labs: np.ndarray):
    """(hit, label): hit marks ids present in the label set; label is the
    component label where hit, else the id itself (singleton)."""
    ids = ids.astype(np.int64)
    if len(nodes):
        pos = np.searchsorted(nodes, ids)
        pos_c = np.clip(pos, 0, len(nodes) - 1)
        hit = nodes[pos_c] == ids
        lab = np.where(hit, labs[pos_c], ids)
    else:
        hit = np.zeros(len(ids), dtype=bool)
        lab = ids
    return hit, lab


def assign_clusters(
    docs: Dataset, labels: Dataset, cfg: PipelineConfig, id_col: str = "doc_id",
    mode: str = "auto",
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """(doc_id, [keep_cols...,] cluster_id): component label where
    present, own id for singletons. keep_cols ride through unchanged
    (e.g. the url key column for string-keyed tables — cheaper than a
    post-hoc id->key join).

    mode "broadcast": labels ship once via ray.put as sorted arrays and
    every task resolves ids with a searchsorted — NO shuffle of the doc
    table (the flagship pipeline's only remaining doc-proportional
    all-to-all outside the band join). mode "join": left-outer hash join
    + coalesce. "auto" picks broadcast below BROADCAST_LABEL_LIMIT."""
    if mode == "auto":
        labels = labels.materialize()
        mode = "broadcast" if labels.count() <= BROADCAST_LABEL_LIMIT else "join"

    cols = [id_col, *keep_cols]

    if mode == "broadcast":
        import ray

        ref = broadcast_labels(labels)

        def lookup(batch: pa.Table) -> pa.Table:
            ns, ls = ray.get(ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            _, lab = resolve_labels(ids, ns, ls)
            out = {c: batch[c] for c in cols}
            out["cluster_id"] = pa.array(lab)
            return pa.table(out)

        return docs.select_columns(cols).map_batches(lookup, batch_format="pyarrow")

    ids = docs.select_columns(cols)
    # the distributed-CC label set is a hash-aggregate output; pin its
    # schema so empty partitions can't feed the join schema-less blocks
    from consult_ray.util import pin_schema

    joined = ids.join(
        pin_schema(labels, LABEL_SCHEMA), "left_outer",
        resolve_join_partitions(cfg), on=(id_col,), right_on=("node",),
    )

    def coalesce(batch: pa.Table) -> pa.Table:
        lab = pc.coalesce(batch["label"].cast(pa.int64()), batch[id_col].cast(pa.int64()))
        out = {c: batch[c] for c in cols}
        out["cluster_id"] = lab
        return pa.table(out)

    return joined.map_batches(coalesce, batch_format="pyarrow")


def pagerank(
    edges: Dataset,
    cfg: PipelineConfig,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    scale: int = 10**12,
    out_col: str = "pr",
    id_seed: int | None = None,
) -> Dataset:
    """Integer-arithmetic PageRank over a DISTINCT (src, dst) string-key
    edge table — the domain-authority score a crawl pipeline feeds into
    frontier prioritization and domain-level quality weighting (the
    second iterative graph operator next to connected_components; the
    reference stops at per-read membership, main_search.cpp:1021-1045).

    All arithmetic is int64 floor division on a fixed-point scale, so
    results are bit-exact reproducible across retries/shards AND exactly
    mirrorable in SQL (the repo's integer-money oracle convention):

        R0[v]     = scale // N
        R_t+1[v]  = (15*scale) // (100*N) + (85 * S_v) // 100
        S_v       = sum over edges (s, v) of R_t[s] // outdeg[s]

    (damping 0.85; dangling mass is dropped, the documented
    simplification — both sides mirror it.)

    Plan: the edge table is assumed deduped (distinct pairs) and is read
    `iters` times; node census (host, outdeg) collects ONCE to the
    driver — per-node state is the same driver bound every census
    operator here carries (~10^8 hosts = a few GB; beyond that the
    round update becomes an edges⋈ranks hash join, not this path). Per
    round, the per-source contribution array broadcasts via ray.put
    keyed by sorted 63-bit host hashes (stages/ids.hash_keys — collision
    - audited below), each edge batch emits per-batch (dst, partial)
    sums via searchsorted gather, and ONE groupby(dst) of <= N rows
    returns to the driver. Text/html never moves; shuffle rows are
    (host, int64).
    """
    import ray

    from consult_ray.stages.ids import DEFAULT_ID_SEED, hash_keys
    from consult_ray.util import grouped

    seed = DEFAULT_ID_SEED ^ cfg.seed if id_seed is None else id_seed
    e = edges.select_columns([src_col, dst_col]).materialize()

    def census_partial(batch: pa.Table) -> pa.Table:
        # srcs carry their outdeg partials; dsts ride along at outdeg 0,
        # so ONE groupby yields both the full node set and the degrees
        s = grouped(
            pa.table({
                "h": batch[src_col],
                "outdeg": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }),
            ["h"], [("outdeg", "sum")], ["outdeg"],
        )
        u = batch[dst_col].combine_chunks().unique()
        z = pa.table({
            "h": u, "outdeg": pa.array(np.zeros(len(u), dtype=np.int64)),
        })
        return pa.concat_tables([s, z]).combine_chunks()

    # host cardinality scales with the corpus — partition-kernel merge,
    # not the native per-distinct-key aggregate (58x, commit 4fb6a54)
    from consult_ray.util import partitioned_group_agg

    P = resolve_join_partitions(cfg)
    census = partitioned_group_agg(
        e.map_batches(census_partial, batch_format="pyarrow"),
        "h", [("outdeg", "sum", "outdeg")], P,
    ).to_pandas()
    n = len(census)
    if n == 0 or "h" not in census.columns:  # empty edge table
        return rd.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            out_col: pa.array([], pa.int64()),
        }))

    hosts = census["h"].to_numpy(dtype=object).astype(str)
    sidx = np.argsort(hosts)
    hosts = hosts[sidx]
    hostcol = pa.array(hosts, pa.string())
    hid = hash_keys(hostcol, seed=seed)
    order = np.argsort(hid)
    if len(np.unique(hid)) != n:  # 63-bit birthday audit (ids.py bound)
        raise ValueError(
            "host-id hash collision; rerun with a different id_seed"
        )
    outdeg = census["outdeg"].to_numpy(dtype=np.int64)[sidx]

    teleport = np.int64((15 * scale) // (100 * n))
    r = np.full(n, scale // n, dtype=np.int64)

    for _ in range(iters):
        contrib = np.where(outdeg > 0, r // np.maximum(outdeg, 1), 0)
        ref = ray.put((hid[order], contrib[order]))

        def round_partial(batch: pa.Table, _ref=ref) -> pa.Table:
            ids_sorted, c_sorted = ray.get(_ref)
            gidx = np.searchsorted(
                ids_sorted, hash_keys(batch[src_col], seed=seed)
            )
            t = pa.table({
                "dst": batch[dst_col],
                "c": pa.array(c_sorted[gidx]),
            })
            return grouped(t, ["dst"], [("c", "sum")], ["c"])

        agg = partitioned_group_agg(
            e.map_batches(round_partial, batch_format="pyarrow"),
            "dst", [("c", "sum", "c")], P,
        ).to_pandas()
        s = np.zeros(n, dtype=np.int64)
        if len(agg):
            didx = np.searchsorted(
                hid[order],
                hash_keys(pa.array(agg["dst"], pa.string()), seed=seed),
            )
            s[order[didx]] = agg["c"].to_numpy(dtype=np.int64)
        r = teleport + (np.int64(85) * s) // np.int64(100)

    return rd.from_arrow(pa.table({"host": hostcol, out_col: pa.array(r)}))
