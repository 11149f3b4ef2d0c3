"""Similarity search over embedding columns (list<float>).

Brute-force cosine top-k as the exact baseline — per-batch numpy matmul
against a driver-broadcast query matrix (ray.put once, ray.get in each
task; never re-shipped per batch) — plus an LSH-bucketed variant
(random-hyperplane SimHash of embeddings) as the scale path: candidates
only within matching sign-buckets, the embedding-space twin of the text
band tables.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from consult_ray.config import PipelineConfig
from consult_ray.util import resolve_join_partitions


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lens = np.asarray(arr.value_lengths())
    dim = int(lens[0]) if len(lens) else 0
    assert dim and (lens == dim).all(), "ragged embedding column"
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(-1, dim)


def brute_force_topk(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: frozenset[int] = frozenset(),
) -> pa.Table:
    """Exact cosine top-k of one query vector against a Dataset.

    Per-batch: normalized dot product (numpy, float64) -> per-batch local
    top-k -> a worker-side fan-in combine (one vectorized top-k per
    ~16 block partials, the _CMS_COMBINE_FANIN shape) -> tiny driver
    heap merge. The full dataset streams; driver intake is k rows per
    COMBINE output (~n_blocks/16), constant in block count rather than
    linear. The combine uses the exact (-cos_sim, id) total order of
    the final merge, so it is a lossless superset reduction.
    """
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if exclude_ids:
            keep = ~np.isin(ids, np.fromiter(exclude_ids, dtype=ids.dtype))
            ids, sims = ids[keep], sims[keep]
        top = np.argsort(-sims, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]), "cos_sim": pa.array(sims[top])})

    def combine(batch: pa.Table) -> pa.Table:
        sims = batch["cos_sim"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[top]), "cos_sim": pa.array(sims[top])})

    partials = embeddings.map_batches(score, batch_format="pyarrow").map_batches(
        combine, batch_format="pyarrow", batch_size=16 * k
    )
    rows = partials.take_all()
    best = heapq.nsmallest(k, rows, key=lambda r: (-r["cos_sim"], r[id_col]))
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in best], pa.int64()),
            "cos_sim": pa.array([r["cos_sim"] for r in best], pa.float64()),
        }
    )


def rademacher_signature(m: np.ndarray, n_planes: int, seed: int) -> np.ndarray:
    """Integer-exact sign-random-projection bucket per row of `m`.

    Hyperplanes are +-1 Rademacher vectors (Achlioptas 2003 sparse
    random projections — same LSH guarantees as Gaussian sign
    projections) with entry (p, j) = +1 iff the low bit of
    SplitMix64(seed + p*dim + j) is set; coordinates are e4-quantized
    via floor(x*1e4 + 0.5) (three exact IEEE ops both numpy and DuckDB
    reproduce bit-identically — the quality_scores precedent), so the
    projection is pure int64 arithmetic and the whole signature is
    REPLAYABLE IN SQL (the knn_lsh DuckDB oracle replays SplitMix64 in
    HUGEINT and sums the same +-x4 terms). No float dot ever decides a
    sign, so there is no 1-ulp sign-flip hazard near zero."""
    from consult_ray.functions.hashing import splitmix64

    dim = m.shape[1]
    x4 = np.floor(m * 1e4 + 0.5).astype(np.int64)
    idx = np.uint64(seed) + np.arange(dim * n_planes, dtype=np.uint64)
    s = np.where(
        (splitmix64(idx) & np.uint64(1)).astype(bool), 1, -1
    ).astype(np.int64).reshape(n_planes, dim)
    dots = x4 @ s.T
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    return ((dots >= 0).astype(np.int64) * weights).sum(axis=1)


def add_hyperplane_buckets(
    embeddings: Dataset,
    cfg: PipelineConfig,
    n_planes: int = 16,
    dim: int | None = None,
    vec_col: str = "embedding",
) -> Dataset:
    """ANN scale path: random-hyperplane signature -> int64 bucket column.

    Vectors whose signs agree on all n_planes hyperplanes share a bucket;
    search probes only the query's bucket (optionally multi-probe by
    flipping low-margin bits). Seeded by cfg.seed — deterministic, and
    (since the signature is rademacher_signature's integer kernel)
    bit-replayable in the knn_lsh SQL oracle. The sign matrix derives
    from SplitMix64 inside the batch function — no driver state to
    broadcast."""
    seed = cfg.seed + 77

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "bucket", pa.array(np.empty(0, dtype=np.int64))
            )
        m = _embedding_matrix(batch, vec_col)
        bucket = rademacher_signature(m, n_planes, seed)
        return batch.append_column("bucket", pa.array(bucket))

    return embeddings.map_batches(bucketize, batch_format="pyarrow")


def embedding_dup_pairs_lsh(
    embeddings: Dataset,
    cfg: PipelineConfig,
    tau: float = 0.35,
    n_bands: int = 16,
    planes_per_band: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Embedding-cosine near-dup pairs via BANDED hyperplane LSH — the
    scale path for the brute-force `embedding_dup_pairs` query (which
    broadcasts the full N x d matrix and scores N x M). Structure is the
    text pipeline's band plan applied to vectors:

        normalize -> b bands x r sign bits -> band-key self-join ->
        exact-cosine verify >= tau -> pair dedup groupby

    A pair with cosine c collides in one band with prob
    (1 - acos(c)/pi)^r, so recall is 1-(1-p^r)^b (~0.9995 at tau=0.35,
    b=16, r=2); precision is exact (the verify is true cosine).
    Candidates never leave their bucket, so no full-matrix broadcast.
    The normalized vector rides along band rows (d=64 float64 here; at
    10^12 scale this column would be fp16 or a PQ code — the schema and
    plan are unchanged)."""
    rng = np.random.default_rng(cfg.seed + 177)
    first = embeddings.limit(1).take_all()
    if not first:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "cos_e4": pa.array([], pa.int64()),
        }))
    dim = len(first[0][vec_col])
    planes_ref = ray.put(rng.standard_normal((n_bands, dim, planes_per_band)))
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)

    def _pack(m: np.ndarray) -> pa.Array:
        """(n, dim) float64 -> large_binary rows (Arrow's hash join
        rejects list-typed non-key columns; fixed-width bytes pass)."""
        n = m.shape[0]
        row_bytes = dim * 8
        offs = (np.arange(n + 1, dtype=np.int64) * row_bytes)
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(m).tobytes())],
        )

    def band_rows(batch: pa.Table) -> pa.Table:
        from consult_ray.functions.hashing import splitmix64

        planes = ray.get(planes_ref)
        m = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        n = m.shape[0]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = np.empty((n_bands, n), dtype=np.uint64)
        for bidx in range(n_bands):
            signs = (m @ planes[bidx]) >= 0
            raw = (signs.astype(np.int64) * weights).sum(axis=1).astype(np.uint64)
            keys[bidx] = splitmix64(
                raw ^ splitmix64(np.uint64(bidx + 0xE17B))
            )
        return pa.table({
            "bucket_key": pa.array(keys.reshape(-1).view(np.int64)),
            "vec_id": pa.array(np.tile(ids, n_bands)),
            "vec": _pack(np.tile(m, (n_bands, 1))),
        })

    bands = embeddings.map_batches(band_rows, batch_format="pyarrow").materialize()
    joined = bands.join(
        bands,
        join_type="inner",
        num_partitions=resolve_join_partitions(cfg),
        on=("bucket_key",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def _unpack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64,
                             count=len(col) + 1 + col.offset)
        offs = offs[col.offset: col.offset + len(col) + 1]
        data = np.frombuffer(col.buffers()[2], dtype=np.float64)
        starts = offs[:-1] // 8
        idx = starts[:, None] + np.arange(dim)[None, :]
        return data[idx]

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["vec_id_l"].to_numpy(zero_copy_only=False)
        b = batch["vec_id_r"].to_numpy(zero_copy_only=False)
        keep = a < b
        if not keep.any():
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cos_e4": pa.array([], pa.int64())})
        kept = batch.filter(pa.array(keep))
        va = _unpack(kept["vec_l"])
        vb = _unpack(kept["vec_r"])
        cos = np.einsum("ij,ij->i", va, vb)
        ok = cos >= tau
        e4 = np.floor(cos[ok] * 10000.0 + 0.5).astype(np.int64)
        from consult_ray.util import grouped

        return grouped(
            pa.table({
                "a": pa.array(a[keep][ok]), "b": pa.array(b[keep][ok]),
                "cos_e4": pa.array(e4),
            }),
            ["a", "b"], [("cos_e4", "min")], ["cos_e4"],
        )

    from consult_ray.util import partitioned_group_agg

    # pair cardinality scales with the corpus — dedupe cross-band pair
    # duplicates with a partition kernel, not the native
    # per-distinct-key aggregate (the measured 58x cliff, 4fb6a54)
    pairs = joined.map_batches(verify, batch_format="pyarrow")
    return partitioned_group_agg(
        pairs, ["a", "b"], [("cos_e4", "min", "cos_e4")],
        resolve_join_partitions(cfg),
    )


def ivf_build_centroids(
    embeddings: Dataset,
    cfg: PipelineConfig,
    nlist: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(nlist, dim) float64 IVF coarse centroids: seeded k-means (Lloyd)
    over a bounded driver-side sample. At 10^12 vectors the sample stays
    bounded (`limit(sample)` streams only that many rows) and assignment
    is distributed — only the tiny centroid matrix lives on the driver."""
    rows = embeddings.limit(sample).take_all()
    m = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    rng = np.random.default_rng(cfg.seed + 1234)
    cent = m[rng.choice(len(m), size=min(nlist, len(m)), replace=False)]
    for _ in range(iters):
        sims = m @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def add_ivf_cells(
    embeddings: Dataset, centroids: np.ndarray, vec_col: str = "embedding"
) -> Dataset:
    """Distributed IVF assignment: int32 `ivf_cell` = argmax cosine
    against the broadcast centroid matrix (ray.put once)."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        m = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cell = np.argmax((m / norms[:, None]) @ cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))

    return embeddings.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    embeddings_with_cells: Dataset,
    centroids: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: frozenset[int] = frozenset(),
) -> pa.Table:
    """IVF search: score only rows whose cell is among the query's
    nprobe nearest centroids. nprobe == nlist degenerates to exact."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(centroids @ qn))[:nprobe]
    probe_ref = ray.put(order.astype(np.int32))

    def in_cells(batch: pa.Table) -> pa.Table:
        cells = ray.get(probe_ref)
        mask = np.isin(batch["ivf_cell"].to_numpy(zero_copy_only=False), cells)
        return batch.filter(pa.array(mask))

    cand = embeddings_with_cells.map_batches(in_cells, batch_format="pyarrow")
    return brute_force_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col,
                            exclude_ids=exclude_ids)


def lsh_topk(
    embeddings_bucketed: Dataset,
    query: np.ndarray,
    cfg: PipelineConfig,
    k: int = 10,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_bits: int = 1,
) -> pa.Table:
    """Approximate top-k via MULTI-PROBE LSH: score rows in the query's
    hyperplane bucket plus every bucket within n_probe_bits sign flips
    (the standard recall/cost knob — a near neighbor on the wrong side
    of one hyperplane lands one bit away). The probe set is tiny
    (1 + C(n_planes, <=n_probe_bits) buckets), so candidates stay a
    small fraction of the table."""
    q = np.asarray(query, dtype=np.float64)
    qbucket = int(rademacher_signature(q[None, :], n_planes, cfg.seed + 77)[0])
    probes = {qbucket}
    if n_probe_bits >= 1:
        for i in range(n_planes):
            probes.add(qbucket ^ (1 << i))
    if n_probe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    probe_arr = np.fromiter(probes, dtype=np.int64)

    import ray as _ray

    ref = _ray.put(probe_arr)

    def in_probes(batch: pa.Table) -> pa.Table:
        ps = _ray.get(ref)
        mask = np.isin(batch["bucket"].to_numpy(zero_copy_only=False), ps)
        return batch.filter(pa.array(mask))

    cand = embeddings_bucketed.map_batches(in_probes, batch_format="pyarrow")
    return brute_force_topk(cand, query, k=k, id_col=id_col, vec_col=vec_col)


def kmeans_embeddings(
    embeddings: Dataset,
    cfg: PipelineConfig,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[Dataset, np.ndarray]:
    """Distributed Lloyd's k-means over the FULL embedding table — the
    semantic-bucketing operator for data curation (cluster-then-sample,
    semantic dedup cells). ivf_build_centroids fits on a bounded driver
    sample; here the UPDATE step is distributed too, so every vector
    contributes to the centroids at any corpus size.

    Per round: centroids broadcast ONCE via ray.put ((k, d) float64,
    L2-normalized; cosine assignment = argmax x_hat @ c_hat.T); each
    batch emits one row per non-empty cluster (cid, vector-sum bytes,
    count) — a k x d dense partial, the same bounded-intake shape as
    the CMS/Bloom folds — pre-folded fan-in 16 in worker tasks before
    take_all, so the driver receives ~n_blocks/16 x k rows per round.
    Empty clusters keep their previous centroid. Deterministic within a
    session (the fan-in tree fixes the float accumulation order;
    retries are value-identical). Init: the seeded bounded-sample
    k-means (ivf_build_centroids).

    Returns (assignments Dataset with an int32 `cluster` column,
    (k, d) centroid matrix).

    Init: deterministic farthest-point (maxmin) over a bounded driver
    sample — unlike a random draw it cannot seed two centroids inside
    one tight blob, so well-separated mixtures recover exactly (pinned
    by tests/test_stages.py); ivf_build_centroids keeps its seeded draw
    (IVF only needs balanced cells, not blob identity)."""
    rows = embeddings.limit(4096).take_all()
    m = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    k = min(k, len(m))
    picked = [0]  # Ray limit() order is deterministic per plan
    best = m @ m[0]
    for _ in range(k - 1):
        nxt = int(np.argmin(best))  # least similar to every chosen seed
        picked.append(nxt)
        best = np.maximum(best, m @ m[nxt])
    cent = m[picked].copy()
    d = cent.shape[1]

    def round_partial(batch: pa.Table, _ref) -> pa.Table:
        c = ray.get(_ref)
        m = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mh = m / norms[:, None]
        assign = np.argmax(mh @ c.T, axis=1)
        cids, sums, ns = [], [], []
        for ci in np.unique(assign):
            sel = mh[assign == ci]
            cids.append(int(ci))
            sums.append(sel.sum(axis=0).tobytes())
            ns.append(len(sel))
        return pa.table({
            "cid": pa.array(cids, pa.int32()),
            "s": pa.array(sums, pa.large_binary()),
            "n": pa.array(np.asarray(ns, dtype=np.int64)),
        })

    def combine(batch: pa.Table) -> pa.Table:
        cids = batch["cid"].to_numpy(zero_copy_only=False)
        ns = batch["n"].to_numpy(zero_copy_only=False)
        out_c, out_s, out_n = [], [], []
        for ci in np.unique(cids):
            rows = np.flatnonzero(cids == ci)
            acc = np.zeros(d, dtype=np.float64)
            for i in rows:  # <=16 rows per cid per combine batch
                acc += np.frombuffer(batch["s"][int(i)].as_py(), np.float64)
            out_c.append(int(ci))
            out_s.append(acc.tobytes())
            out_n.append(int(ns[rows].sum()))
        return pa.table({
            "cid": pa.array(out_c, pa.int32()),
            "s": pa.array(out_s, pa.large_binary()),
            "n": pa.array(np.asarray(out_n, dtype=np.int64)),
        })

    for _ in range(iters):
        ref = ray.put(cent)
        rows = (
            embeddings.map_batches(
                lambda b, _r=ref: round_partial(b, _r),
                batch_format="pyarrow",
            )
            .map_batches(combine, batch_format="pyarrow", batch_size=16)
            .take_all()
        )
        sums = np.zeros((k, d), dtype=np.float64)
        ns = np.zeros(k, dtype=np.int64)
        for r in rows:  # bounded: ~n_blocks/16 x k rows
            sums[r["cid"]] += np.frombuffer(r["s"], np.float64)
            ns[r["cid"]] += r["n"]
        nxt = cent.copy()  # empty clusters keep their centroid
        live = ns > 0
        v = sums[live] / ns[live, None]
        vn = np.linalg.norm(v, axis=1)
        vn[vn == 0] = 1.0
        nxt[live] = v / vn[:, None]
        cent = nxt

    ref = ray.put(cent)

    def assign_final(batch: pa.Table, _r=ref) -> pa.Table:
        c = ray.get(_r)
        m = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        a = np.argmax((m / norms[:, None]) @ c.T, axis=1).astype(np.int32)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a),
        })

    return embeddings.map_batches(assign_final, batch_format="pyarrow"), cent


# ---------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid 2011, "Product
# quantization for nearest neighbor search") — the memory-scale ANN
# path: 8-byte codes instead of 256-byte float32 vectors (32x), so a
# 10^10-vector index fits a cluster's RAM where raw vectors cannot.
# All vectors are L2-normalized first, so squared-L2 ADC ranking is
# cosine ranking (||a-b||^2 = 2 - 2 cos for unit vectors) and results
# are comparable with brute_force_topk / ivf_topk.
# ---------------------------------------------------------------------


def pq_train_codebooks(
    embeddings: Dataset,
    cfg: PipelineConfig,
    m: int = 8,
    ks: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, ks, d/m) float64 per-subspace codebooks: seeded Lloyd's over
    a bounded driver-side sample of NORMALIZED vectors (same bounded-
    sample contract as ivf_build_centroids — at 10^12 vectors only
    `sample` rows ever reach the driver; encoding is distributed)."""
    rows = embeddings.limit(sample).take_all()
    x = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    x = x / norms[:, None]
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(cfg.seed + 4321)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        kj = min(ks, len(xs))
        cent = xs[rng.choice(len(xs), size=kj, replace=False)].copy()
        for _ in range(iters):
            d2 = (
                (xs * xs).sum(1)[:, None]
                - 2.0 * (xs @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(kj):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(axis=0)
        books[j, :kj] = cent
        if kj < ks:  # degenerate tiny sample: repeat the first center
            books[j, kj:] = cent[0]
    return books


def pq_encode(
    embeddings: Dataset,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Distributed PQ encoding: (id_col, pq_code fixed_size_binary(m)).
    Codebooks ship once via ray.put; per batch one (n, ks) distance
    matrix per subspace (vectorized), codes written straight into a
    fixed-size-binary Arrow buffer — no per-row Python."""
    books_ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        m, _ks, dsub = books.shape
        x = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        x = x / norms[:, None]
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            cj = books[j]
            d2 = (
                (xs * xs).sum(1)[:, None]
                - 2.0 * (xs @ cj.T)
                + (cj * cj).sum(1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        fsb = pa.Array.from_buffers(
            pa.binary(m), len(x), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({id_col: batch[id_col], "pq_code": fsb})

    return embeddings.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    encoded: Dataset,
    codebooks: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    exclude_ids: frozenset[int] = frozenset(),
) -> pa.Table:
    """Asymmetric-distance top-k over PQ codes: one (m, ks) LUT of
    query-to-center squared sub-distances broadcast once, per batch one
    uint8 gather + add per subspace, local top-k per block, tiny heap
    merge on the driver (brute_force_topk shape — k rows per block)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ks, dsub = books.shape
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    lut = np.empty((m, ks), dtype=np.float64)
    for j in range(m):
        diff = books[j] - q[j * dsub:(j + 1) * dsub][None, :]
        lut[j] = (diff * diff).sum(1)
    lut_ref = ray.put(lut)

    def score(batch: pa.Table) -> pa.Table:
        tab = ray.get(lut_ref)
        n = batch.num_rows
        col = batch["pq_code"].combine_chunks()
        buf = np.frombuffer(col.buffers()[1], dtype=np.uint8)
        codes = buf[col.offset * m:(col.offset + n) * m].reshape(n, m)
        dist = np.zeros(n, dtype=np.float64)
        for j in range(m):
            dist += tab[j][codes[:, j]]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if exclude_ids:
            keep = ~np.isin(ids, np.fromiter(exclude_ids, dtype=ids.dtype))
            ids, dist = ids[keep], dist[keep]
        top = np.lexsort((ids, dist))[:k]
        return pa.table({
            id_col: pa.array(ids[top]),
            "pq_dist": pa.array(dist[top]),
        })

    rows = encoded.map_batches(score, batch_format="pyarrow").take_all()
    best = heapq.nsmallest(k, rows, key=lambda r: (r["pq_dist"], r[id_col]))
    return pa.table({
        id_col: pa.array([r[id_col] for r in best], pa.int64()),
        "pq_dist": pa.array([r["pq_dist"] for r in best], pa.float64()),
    })
