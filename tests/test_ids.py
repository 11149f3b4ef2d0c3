"""String/url doc-id assignment (stages.ids) + the url-keyed flagship
path: deterministic key->int64 ids, collision audit, and cluster
equality with the int64-keyed engine."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.pipelines.cluster import assign_clusters, connected_components
from consult_ray.pipelines.dedup import dedup_url_pages, dup_edges
from consult_ray.sources.synth import make_pages_corpus
from consult_ray.stages.ids import (
    add_hashed_doc_ids,
    audit_id_collisions,
    hash_keys,
)

CFG = PipelineConfig()


def test_hash_keys_deterministic_and_nonnegative():
    keys = pa.array([f"https://ex.org/{i}" for i in range(1000)] + ["", "a"])
    h1 = hash_keys(keys)
    h2 = hash_keys(keys)
    assert (h1 == h2).all()
    assert (h1 >= 0).all()
    # batch-split invariance: hashing a slice matches the full run
    h_lo = hash_keys(keys.slice(0, 500))
    h_hi = hash_keys(keys.slice(500))
    assert (np.concatenate([h_lo, h_hi]) == h1).all()
    # distinct keys -> distinct ids at this scale
    assert len(np.unique(h1)) == len(keys)


def test_audit_counts_real_collisions(ray_session):
    tbl = pa.table({
        "url": pa.array(["a", "b", "c", "c", "d"]),
        "doc_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
    })
    # id 1 claimed by distinct keys a and b -> exactly one collision;
    # id 2 has one key seen twice -> not a collision
    assert audit_id_collisions(rd.from_arrow(tbl)) == 1


def test_fingerprint_rejects_string_ids(ray_session):
    from consult_ray.stages.fingerprint import fingerprint_batch

    tbl = pa.table({"doc_id": pa.array(["u1", "u2"]),
                    "text": pa.array(["x" * 40, "y" * 40])})
    with pytest.raises(TypeError, match="add_hashed_doc_ids"):
        fingerprint_batch(tbl, CFG)


def test_url_pipeline_matches_int64_clusters(ray_session):
    """The url-keyed flagship run must induce the SAME partition of the
    corpus into clusters as the int64-keyed run on identical texts, and
    every cluster_url must be a member of its own cluster."""
    c = make_pages_corpus(400, seed=11)
    n = c.pages.num_rows
    urls = [f"https://ex.org/p/{i}" for i in range(n)]
    pages = pa.table({"url": pa.array(urls), "text": c.pages["text"]})

    out, stats = dedup_url_pages(rd.from_arrow(pages), CFG, audit=True)
    got = out.to_pandas()
    assert stats["id_collisions"] == 0
    assert len(got) == n and set(got.url) == set(urls)

    # int64 reference run on the same texts
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": c.pages["text"],
    })
    docs = rd.from_arrow(tbl)
    edges, _ = dup_edges(docs, CFG)
    labels = connected_components(edges, CFG)
    want = assign_clusters(docs, labels, CFG).to_pandas()

    def partition(frame, key, cluster):
        groups = {}
        for k, cl in zip(frame[key], frame[cluster]):
            groups.setdefault(cl, set()).add(k)
        return {frozenset(g) for g in groups.values()}

    url_of = dict(enumerate(urls))
    want_parts = {
        frozenset(url_of[d] for d in g)
        for g in partition(want, "doc_id", "cluster_id")
    }
    got_parts = partition(got, "url", "cluster_url")
    assert got_parts == want_parts

    # the representative key is a member of its own cluster
    by_rep = got.groupby("cluster_url").url.apply(set)
    for rep, members in by_rep.items():
        assert rep in members
