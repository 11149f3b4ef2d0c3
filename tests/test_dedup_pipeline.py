"""End-to-end dedup pipeline correctness: recall + cluster assignments vs
a brute-force oracle at the same signature config (the BASELINE.md gate:
dup-pair recall >= 0.99, matching cluster assignments)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.functions.hashing import popcount64
from consult_ray.pipelines.cluster import assign_clusters, connected_components
from consult_ray.pipelines.dedup import dup_edges, fingerprints
from consult_ray.sources.synth import make_pages_corpus
from consult_ray.state.unionfind import UnionFind

CFG = PipelineConfig()
N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(ray_session):
    c = make_pages_corpus(N_DOCS, seed=42)
    docs = c.pages.append_column("doc_id", pa.array(np.arange(c.pages.num_rows)))
    return docs, c.truth


def _oracle_edges(docs: pa.Table, cfg: PipelineConfig) -> set[tuple[int, int]]:
    """Brute-force all-pairs at the SAME config: dup iff
    popcount(simhash_a ^ simhash_b) <= p — the reference predicate
    (hd <= p, /root/reference/main_search.cpp:1238-1259) over our
    fingerprints."""
    import ray

    fp = fingerprints(rd.from_arrow(docs), cfg).to_pandas()
    fp = fp.sort_values("doc_id")
    sims = fp["simhash"].to_numpy().view(np.uint64)
    ids = fp["doc_id"].to_numpy()
    n = len(ids)
    edges = set()
    for i in range(n):
        ham = popcount64(sims[i] ^ sims[i + 1 :])
        for j in np.nonzero(ham <= cfg.hamming_budget)[0]:
            edges.add((int(ids[i]), int(ids[i + 1 + j])))
    return edges


def _oracle_clusters(n: int, edges: set[tuple[int, int]]) -> dict[int, int]:
    uf = UnionFind()
    for i in range(n):
        uf.add(i)
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


def test_dedup_recall_and_clusters(corpus):
    docs_tbl, truth = corpus
    docs = rd.from_arrow(docs_tbl)

    edges_ds, stats = dup_edges(docs, CFG)
    got_edges = {
        (r["a"], r["b"]) for r in edges_ds.select_columns(["a", "b"]).take_all()
    }

    oracle = _oracle_edges(docs_tbl, CFG)
    assert oracle, "oracle found no dup pairs — corpus generator broken"

    missed = oracle - got_edges
    recall = 1 - len(missed) / len(oracle)
    assert recall >= 0.99, f"recall {recall:.4f}, missed {len(missed)}/{len(oracle)}"

    # no false positives: every emitted edge satisfies the predicate
    assert got_edges <= oracle, f"false edges: {list(got_edges - oracle)[:5]}"

    # cluster assignments match the oracle's union-find exactly when
    # recall is 1.0 (and must still match on every non-missed component)
    labels = connected_components(edges_ds, CFG, mode="driver")
    clusters = assign_clusters(docs, labels, CFG).to_pandas()
    got = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    want = _oracle_clusters(docs_tbl.num_rows, oracle)
    if not missed:
        assert got == want

    # exact duplicates ALWAYS co-cluster (property test, FIXTURES.md)
    texts = docs_tbl["text"].to_pylist()
    by_text: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        if len(ids) > 1:
            assert len({got[i] for i in ids}) == 1


def test_distributed_cc_matches_driver(corpus, ray_session):
    docs_tbl, _ = corpus
    docs = rd.from_arrow(docs_tbl)
    edges_ds, _ = dup_edges(docs, CFG)
    edges_ds = edges_ds.materialize()
    drv = connected_components(edges_ds, CFG, mode="driver").to_pandas()
    dist = connected_components(edges_ds, CFG, mode="distributed").to_pandas()
    a = dict(zip(drv["node"], drv["label"]))
    b = dict(zip(dist["node"], dist["label"]))
    assert a == b


def test_distributed_cc_copartitioned_path_matches_driver(corpus, ray_session):
    """The beyond-driver-limit co-partitioned rounds (forced via
    cc_driver_node_limit=0) must produce the same labels as the driver
    union-find and as the driver-state rounds — the scale path cannot
    silently rot now that small graphs default to driver state."""
    import dataclasses

    docs_tbl, _ = corpus
    docs = rd.from_arrow(docs_tbl)
    edges_ds, _ = dup_edges(docs, CFG)
    edges_ds = edges_ds.materialize()
    drv = connected_components(edges_ds, CFG, mode="driver").to_pandas()
    forced = dataclasses.replace(CFG, cc_driver_node_limit=0)
    dist = connected_components(edges_ds, forced, mode="distributed").to_pandas()
    assert dict(zip(drv["node"], drv["label"])) == dict(
        zip(dist["node"], dist["label"])
    )


def test_distributed_cc_copartitioned_checkpoint_resume(ray_session, tmp_path):
    """Checkpoint round commits + resume on the forced co-partitioned
    path (the driver-state default is covered by the main resume test)."""
    import dataclasses

    n = 400
    edges = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    ds = rd.from_arrow(edges).repartition(6).materialize()
    forced = dataclasses.replace(CFG, cc_driver_node_limit=0)
    d = str(tmp_path / "cc_forced")
    r1 = connected_components(
        ds, forced, mode="distributed", checkpoint_dir=d
    ).to_pandas()
    r2 = connected_components(
        ds, forced, mode="distributed", checkpoint_dir=d
    ).to_pandas()
    assert set(r1.label) == {0} and len(r1) == n
    a = dict(zip(r1["node"], r1["label"]))
    b = dict(zip(r2["node"], r2["label"]))
    assert a == b


def test_census_caps_hot_boilerplate_keys(ray_session):
    """A corpus of near-identical docs produces a hot band key; the census
    must find it and the cap must bound pair generation."""
    base = "boilerplate " * 100
    texts = [base + f"tail{i}" for i in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120)), "text": pa.array(texts)})
    # exact mode so per-key hot stats are reported (the sketch path only
    # reports dropped rows; its equivalence is covered below)
    import dataclasses
    cfg = dataclasses.replace(PipelineConfig(), census_mode="exact")
    edges, stats = dup_edges(rd.from_arrow(tbl), cfg)
    n = edges.count()
    assert stats["hot_keys"] > 0
    assert stats["dropped_band_rows"] > 0
    # capping must strictly reduce pair generation vs the uncapped run
    edges_uncapped, _ = dup_edges(rd.from_arrow(tbl), cfg, census=False)
    n_uncapped = edges_uncapped.count()
    assert n < n_uncapped
    # a fully-hot band family contributes at most C*(C-1)/2 pairs per key;
    # the uncapped one contributes up to 120*119/2 = 7140
    assert n_uncapped > 7000


def test_sketch_capping_matches_exact(corpus, ray_session):
    """The CMS candidate set is a superset of the true hot keys and
    capping under-cap groups is a no-op, so the sketch and exact census
    paths must produce identical capped band rows — hence identical
    edges."""
    import dataclasses

    import ray.data as rd

    from consult_ray.pipelines.dedup import band_rows, capped_band_rows, fingerprints

    docs_tbl, _truth = corpus
    # append a boilerplate block so the corpus definitely HAS hot keys
    # (a hot-key-free corpus would vacuously pass)
    n0 = docs_tbl.num_rows
    base = "boilerplate " * 100
    hot_tbl = pa.table({
        "doc_id": pa.array(np.arange(n0, n0 + 120)),
        "text": pa.array([base + f"tail{i}" for i in range(120)]),
    })
    docs = rd.from_arrow(pa.concat_tables(
        [docs_tbl.select(["doc_id", "text"]), hot_tbl]
    ))
    cfg_exact = dataclasses.replace(CFG, census_mode="exact")
    cfg_sketch = dataclasses.replace(CFG, census_mode="sketch")
    bands = band_rows(fingerprints(docs, CFG), CFG).materialize()
    capped_e, stats_e = capped_band_rows(bands, cfg_exact)
    capped_s, stats_s = capped_band_rows(bands, cfg_sketch)
    assert stats_e["dropped_band_rows"] > 0
    assert stats_e["dropped_band_rows"] == stats_s["dropped_band_rows"]
    key = ["band_kind", "band", "band_key", "doc_id"]
    a = capped_e.to_pandas().sort_values(key, ignore_index=True)
    b = capped_s.to_pandas().sort_values(key, ignore_index=True)
    assert a.equals(b)


def test_salted_hot_policy_is_lossless(ray_session):
    """The salt policy must generate every intra-bucket pair the uncapped
    run generates (dedup'd), while the cap policy drops past-cap members."""
    import dataclasses

    base = "boilerplate " * 100
    texts = [base + f"tail{i}" for i in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120)), "text": pa.array(texts)})

    def edge_set(cfg, census=True):
        edges, _ = dup_edges(rd.from_arrow(tbl), cfg, census=census)
        df = edges.to_pandas()
        return set(zip(df.a, df.b))

    cfg_salt = dataclasses.replace(PipelineConfig(), hot_policy="salt")
    uncapped = edge_set(PipelineConfig(), census=False)
    salted = edge_set(cfg_salt)
    capped = edge_set(dataclasses.replace(PipelineConfig(), hot_policy="cap"))
    assert salted == uncapped, "salting must preserve every pair"
    assert len(capped) < len(uncapped), "capping must drop pairs here"


def test_cluster_ids_invariant_to_input_order(corpus, ray_session):
    """Permutation invariance (SURVEY §5): shuffling input row order must
    not change any cluster assignment — labels are min-member ids, so
    they are order-free, not merely stable up to relabeling."""
    docs_tbl, _ = corpus
    rng = np.random.default_rng(5)
    perm = rng.permutation(docs_tbl.num_rows)
    shuffled = docs_tbl.take(pa.array(perm))

    def run(tbl):
        docs = rd.from_arrow(tbl)
        edges, _ = dup_edges(docs, CFG)
        labels = connected_components(edges, CFG, mode="driver")
        df = assign_clusters(docs, labels, CFG).to_pandas()
        return dict(zip(df.doc_id, df.cluster_id))

    assert run(docs_tbl) == run(shuffled)


def test_distributed_cc_chain_across_blocks(ray_session):
    """A 1000-node path graph split across many blocks: per-block
    contraction plus global min-label rounds must still converge to one
    component labeled by the global min node."""
    n = 1000
    edges = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    ds = rd.from_arrow(edges).repartition(10).materialize()
    dist = connected_components(ds, CFG, mode="distributed").to_pandas()
    assert len(dist) == n
    assert set(dist.label) == {0}


def test_collision_threshold_filters_edges(ray_session):
    """c>1 keeps only pairs colliding in >= c distinct band probes (the
    A4 counter, main_search.cpp:883-894): a strict subset of c=1 edges,
    and exactly the pairs whose c=1 multiplicity reaches c."""
    import dataclasses

    c = make_pages_corpus(200, seed=9)
    tbl = c.pages.append_column("doc_id", pa.array(np.arange(c.pages.num_rows)))

    edges1, _ = dup_edges(rd.from_arrow(tbl), CFG)
    df1 = edges1.to_pandas()
    from collections import Counter
    mult = Counter(zip(df1.a, df1.b))

    cfg2 = dataclasses.replace(CFG, collision_threshold=2)
    edges2, _ = dup_edges(rd.from_arrow(tbl), cfg2)
    got2 = set(zip(*[edges2.to_pandas()[k] for k in ("a", "b")]))
    want2 = {p for p, m in mult.items() if m >= 2}
    assert got2 == want2 and got2
    # a threshold above the max multiplicity must drop everything
    cmax = max(mult.values())
    cfg_hi = dataclasses.replace(CFG, collision_threshold=cmax + 1)
    edges_hi, _ = dup_edges(rd.from_arrow(tbl), cfg_hi)
    assert edges_hi.count() == 0


def test_collision_threshold_with_salted_hot_buckets(ray_session):
    """Regression for the salt + c>1 interaction: a band collision in a
    hot bucket is replicated into S triangle buckets, and the c>1 count
    must collapse those duplicates — the (a, b, band_kind, band) dedup in
    pair_count_threshold. The salted c=2 edge set must equal the
    uncapped (no census) c=2 edge set exactly."""
    import dataclasses

    base = "boilerplate " * 100
    texts = [base + f"tail{i}" for i in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120)), "text": pa.array(texts)})

    def edge_set(cfg, census=True):
        edges, _ = dup_edges(rd.from_arrow(tbl), cfg, census=census)
        df = edges.to_pandas()
        return set(zip(df.a, df.b))

    cfg_c2 = dataclasses.replace(PipelineConfig(), collision_threshold=2)
    cfg_salt_c2 = dataclasses.replace(
        PipelineConfig(), hot_policy="salt", collision_threshold=2
    )
    uncapped_c2 = edge_set(cfg_c2, census=False)
    salted_c2 = edge_set(cfg_salt_c2)
    assert uncapped_c2, "fixture must produce multi-band collisions"
    assert salted_c2 == uncapped_c2, (
        "salted triangle duplicates must not inflate the distinct band "
        "collision count"
    )


def test_cms_distributed_merge_matches_driver(ray_session, monkeypatch):
    """The chunked groupby tree reduce (large-input path) must produce a
    grid identical to the bounded driver merge."""
    from consult_ray.pipelines import dedup as dmod
    from consult_ray.pipelines.dedup import band_rows, fingerprints

    c = make_pages_corpus(200, seed=3)
    tbl = c.pages.append_column("doc_id", pa.array(np.arange(c.pages.num_rows)))
    bands = band_rows(
        fingerprints(rd.from_arrow(tbl).repartition(4), CFG), CFG
    ).materialize()
    g_driver = dmod._merged_cms_grid(bands, CFG)
    monkeypatch.setattr(dmod, "_CMS_DRIVER_MERGE_MAX_ROWS", 0)
    g_dist = dmod._merged_cms_grid(bands, CFG)
    assert g_driver is not None and g_dist is not None
    assert (g_driver == g_dist).all()


def test_band_occupancy_histogram_matches_bruteforce(corpus, ray_session):
    """A3 occupancy histogram (main_map.cpp:1167-1197): the distributed
    census->histogram must equal a numpy recount of the band rows."""
    from consult_ray.pipelines.dedup import band_key_census, band_rows, fingerprints
    from consult_ray.pipelines.operators import preagg_group_count

    docs_tbl, _ = corpus
    bands = band_rows(
        fingerprints(rd.from_arrow(docs_tbl), CFG), CFG
    ).materialize()
    census = band_key_census(bands, CFG)
    hist = preagg_group_count(census, "cnt", "n_buckets").to_pandas()
    got = dict(zip(hist.cnt, hist.n_buckets))

    keys = np.concatenate([
        b["band_key"].to_numpy(zero_copy_only=False)
        for b in bands.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ])
    _, per_key = np.unique(keys, return_counts=True)
    occ, n_buckets = np.unique(per_key, return_counts=True)
    want = dict(zip(occ.tolist(), n_buckets.tolist()))
    assert got == want and 1 in want


def test_assign_clusters_broadcast_matches_join(corpus, ray_session):
    """The broadcast label lookup (no doc-table shuffle) must produce the
    same assignments as the left-outer-join path."""
    docs_tbl, _ = corpus
    docs = rd.from_arrow(docs_tbl)
    edges, _ = dup_edges(docs, CFG)
    labels = connected_components(edges, CFG).materialize()
    a = assign_clusters(docs, labels, CFG, mode="broadcast").to_pandas()
    b = assign_clusters(docs, labels, CFG, mode="join").to_pandas()
    a = a.sort_values("doc_id", ignore_index=True)
    b = b.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    assert (a.cluster_id <= a.doc_id).all()  # labels are component minima


def test_distributed_cc_round_checkpoint_resume(ray_session, tmp_path):
    """SURVEY §7 step 5: the distributed CC path checkpoints every
    propagation round; a crash that loses the last round resumes from
    the previous one and converges to identical labels."""
    import os
    import shutil

    n = 600
    edges = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    ds = rd.from_arrow(edges).repartition(6).materialize()
    d = str(tmp_path / "cc")
    r1 = connected_components(ds, CFG, mode="distributed", checkpoint_dir=d).to_pandas()
    import re

    marks = [x for x in os.listdir(d) if re.fullmatch(r"cc_round_\d+\.json", x)]
    assert len(marks) >= 2, "path graph must need multiple rounds"
    assert set(r1.label) == {0}

    # crash simulation: lose the last round's commit marker AND its data
    # dir, rerun (the resume scan must fall back to the previous round)
    import json

    last = max(int(x.split("_")[-1].split(".")[0]) for x in marks)
    mark = os.path.join(d, f"cc_round_{last}.json")
    with open(mark) as f:
        data_dir = json.load(f)["data"]
    shutil.rmtree(os.path.join(d, data_dir))
    os.remove(mark)
    r2 = connected_components(ds, CFG, mode="distributed", checkpoint_dir=d).to_pandas()
    assert dict(zip(r1.node, r1.label)) == dict(zip(r2.node, r2.label))

    # fully-converged dir: rerun is a fast fixpoint re-check, same labels
    r3 = connected_components(ds, CFG, mode="distributed", checkpoint_dir=d).to_pandas()
    assert dict(zip(r1.node, r1.label)) == dict(zip(r3.node, r3.label))


def test_pipeline_handles_doc_ids_above_32_bits(ray_session):
    """10^12-doc credibility: ids above 2^32 must flow through
    fingerprint -> bands -> join -> CC -> assignment unchanged (the
    driver CC's packed-pair dedup falls back gracefully)."""
    c = make_pages_corpus(120, seed=13)
    base_ids = np.arange(c.pages.num_rows, dtype=np.int64)
    OFF = np.int64(1) << 33

    def run(ids):
        tbl = c.pages.append_column("doc_id", pa.array(ids)).select(
            ["doc_id", "text"]
        )
        docs = rd.from_arrow(tbl)
        edges, _ = dup_edges(docs, CFG)
        labels = connected_components(edges, CFG)
        df = assign_clusters(docs, labels, CFG).to_pandas()
        return dict(zip(df.doc_id, df.cluster_id))

    small = run(base_ids)
    big = run(base_ids + OFF)
    assert big == {k + OFF: v + OFF for k, v in small.items()}


def test_cc_resume_survives_torn_tmp_round_dir(ray_session, tmp_path):
    """A crash between writing _SUCCESS into a round's tmp dir and the
    rename leaves cc_round_<i>.tmp-<hex>; the resume scan must ignore
    and sweep it, not crash parsing the round number."""
    import os

    n = 200
    edges = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    ds = rd.from_arrow(edges).repartition(4).materialize()
    d = str(tmp_path / "cc")
    r1 = connected_components(ds, CFG, mode="distributed", checkpoint_dir=d).to_pandas()
    # simulate the torn write
    torn = os.path.join(d, "cc_round_3.tmp-deadbeef")
    os.makedirs(torn)
    open(os.path.join(torn, "_SUCCESS"), "w").close()
    r2 = connected_components(ds, CFG, mode="distributed", checkpoint_dir=d).to_pandas()
    assert dict(zip(r1.node, r1.label)) == dict(zip(r2.node, r2.label))
    assert not os.path.exists(torn), "torn tmp dir must be swept"


def test_compute_concurrency_cap_is_semantics_free(corpus, ray_session):
    """PipelineConfig.compute_concurrency throttles task concurrency on
    the bandwidth-bound stages (host-weather knob) — it must never
    change a single cluster assignment."""
    docs_tbl, _ = corpus

    def run(cfg):
        docs = rd.from_arrow(docs_tbl)
        edges, _ = dup_edges(docs, cfg)
        labels = connected_components(edges, cfg, mode="driver")
        df = assign_clusters(docs, labels, cfg).to_pandas()
        return dict(zip(df.doc_id, df.cluster_id))

    assert run(CFG) == run(PipelineConfig(compute_concurrency=2))


def test_candidate_strategy_group_equals_join(corpus, ray_session):
    """The grouped single-shuffle pair expansion and the legacy hash
    self-join must produce the SAME edge multiset, at c=1 and at c>1
    with the salt policy (band identity carried)."""
    import dataclasses
    from collections import Counter

    docs, _truth = corpus
    ds = rd.from_arrow(docs)

    def multiset(cfg):
        edges, _ = dup_edges(ds, cfg)
        df = edges.to_pandas()
        return Counter(map(tuple, df[sorted(df.columns)].itertuples(index=False)))

    for base in (
        PipelineConfig(),
        dataclasses.replace(
            PipelineConfig(), hot_policy="salt", collision_threshold=2
        ),
    ):
        g = multiset(dataclasses.replace(base, candidate_strategy="group"))
        j = multiset(dataclasses.replace(base, candidate_strategy="join"))
        assert g == j, (
            f"strategy mismatch at c={base.collision_threshold}: "
            f"{len(g)} vs {len(j)} distinct edge rows"
        )


def test_lazy_cap_stats_edges_match_eager(ray_session):
    """dup_edges with lazy cap stats (the fused group-strategy plan, no
    capped materialize) must emit exactly the eager plan's edges."""
    base = "boilerplate " * 100
    texts = [base + f"tail{i}" for i in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120)), "text": pa.array(texts)})

    eager_edges, eager_stats = dup_edges(rd.from_arrow(tbl), CFG, eager_stats=True)
    lazy_edges, lazy_stats = dup_edges(rd.from_arrow(tbl), CFG, eager_stats=False)
    assert eager_stats["dropped_band_rows"] > 0
    assert lazy_stats["dropped_band_rows"] is None

    key = ["a", "b", "hamming"]
    a = eager_edges.to_pandas().sort_values(key, ignore_index=True)
    b = lazy_edges.to_pandas().sort_values(key, ignore_index=True)
    assert a.equals(b)
    assert len(a) > 0


def test_cc_resumes_from_legacy_round_dirs(ray_session, tmp_path):
    """Pre-manifest-migration checkpoints (cc_round_<i>/ dirs holding
    _SUCCESS + _meta.json) are committed progress: the resume scan must
    read them — not sweep them — and continue from the next round."""
    import json
    import os
    import re
    import shutil

    n = 600
    edges = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    ds = rd.from_arrow(edges).repartition(6).materialize()

    # reference run (new format) to harvest a round-0 label snapshot
    ref_dir = str(tmp_path / "ref")
    r_ref = connected_components(
        ds, CFG, mode="distributed", checkpoint_dir=ref_dir
    ).to_pandas()
    marks = sorted(
        x for x in os.listdir(ref_dir) if re.fullmatch(r"cc_round_\d+\.json", x)
    )
    assert len(marks) >= 2, "path graph must need multiple rounds"
    with open(os.path.join(ref_dir, "cc_round_0.json")) as f:
        m0 = json.load(f)

    # forge the legacy layout: exact-named dir, parquet + meta + marker
    leg_root = tmp_path / "legacy"
    leg_root.mkdir()
    leg0 = leg_root / "cc_round_0"
    shutil.copytree(os.path.join(ref_dir, m0["data"]), leg0)
    with open(leg0 / "_meta.json", "w") as f:
        json.dump({"round": 0, "label_sum_before": None,
                   "label_sum": m0["label_sum"]}, f)
    open(leg0 / "_SUCCESS", "w").close()

    r2 = connected_components(
        ds, CFG, mode="distributed", checkpoint_dir=str(leg_root)
    ).to_pandas()
    assert dict(zip(r_ref.node, r_ref.label)) == dict(zip(r2.node, r2.label))
    # the legacy dir survived the sweep and round 0 was NOT recomputed
    assert (leg0 / "_SUCCESS").exists()
    assert not (leg_root / "cc_round_0.json").exists()
    assert (leg_root / "cc_round_1.json").exists()


def test_fused_cap_matches_census_cap(corpus, ray_session):
    """The default path now fuses the O4 bucket cap into the candidate
    shuffle (dup_edges sketch+cap+group). Its edge multiset must equal
    the explicit census->split->cap pre-stage (exact census mode, which
    the sketch path is in turn pytest-equal to): capping an under-cap
    bucket is the identity and the candidate partition holds each
    band_key's rows in full."""
    import dataclasses

    docs_tbl, _truth = corpus
    n0 = docs_tbl.num_rows
    base = "boilerplate " * 100
    hot_tbl = pa.table({
        "doc_id": pa.array(np.arange(n0, n0 + 120)),
        "text": pa.array([base + f"tail{i}" for i in range(120)]),
    })
    docs = rd.from_arrow(pa.concat_tables(
        [docs_tbl.select(["doc_id", "text"]), hot_tbl]
    ))
    fused_edges, fstats = dup_edges(docs, CFG)
    assert fstats["census_mode"] == "fused-cap"
    exact_edges, estats = dup_edges(
        docs, dataclasses.replace(CFG, census_mode="exact")
    )
    assert estats["dropped_band_rows"] > 0, "corpus must exercise the cap"
    key = ["a", "b", "hamming"]
    fa = fused_edges.to_pandas().sort_values(key, ignore_index=True)
    ea = exact_edges.to_pandas().sort_values(key, ignore_index=True)
    assert fa.equals(ea)
