"""Structural contract of the bench-corpus expansion (sources/benchgen).

The scaling measurement's validity rests on expand_documents preserving
the documented dup mix at ANY expand factor: every 7-variant window
contributes a {base, exact-dup, near-dup} triple that must co-cluster,
the 4 unique-ified variants must stay singletons, and windows must not
merge. This drives the real flagship pipeline over a small expansion
and checks those invariants end to end.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from consult_ray.config import PipelineConfig
from consult_ray.sources.benchgen import CORPUS_VERSION, expand_documents

N_BASE = 60  # base docs sliced from sf0.001
EXPAND = 14  # two full 7-variant windows


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("benchgen")
    sf_dir = str(root / "sf")
    os.makedirs(sf_dir)
    src = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, N_BASE)
    pq.write_table(src, os.path.join(sf_dir, "documents.parquet"))
    out_dir = str(root / "cache")
    pages_dir = expand_documents(sf_dir, EXPAND, out_dir)
    return sf_dir, out_dir, pages_dir, src


def test_expand_shape_and_idempotence(corpus_dirs):
    sf_dir, out_dir, pages_dir, src = corpus_dirs
    tbl = pq.read_table(pages_dir)
    assert tbl.num_rows == N_BASE * EXPAND
    ids = tbl["doc_id"].to_numpy()
    assert len(np.unique(ids)) == len(ids)  # doc_id = base*EXPAND + r is injective
    # idempotent: a second call returns the cached corpus untouched
    before = sorted(os.listdir(pages_dir))
    mtimes = [os.stat(os.path.join(pages_dir, f)).st_mtime_ns for f in before]
    assert expand_documents(sf_dir, EXPAND, out_dir) == pages_dir
    after = sorted(os.listdir(pages_dir))
    assert after == before
    assert [os.stat(os.path.join(pages_dir, f)).st_mtime_ns for f in after] == mtimes
    with open(os.path.join(out_dir, "_SUCCESS")) as fh:
        assert f"v={CORPUS_VERSION}" in fh.read()


def test_expanded_corpus_dup_structure(corpus_dirs, ray_session):
    """Run the real flagship pipeline over the expansion and check the
    documented cluster structure (benchgen module docstring)."""
    import ray.data as rd

    from consult_ray.pipelines.cluster import assign_clusters, connected_components
    from consult_ray.pipelines.dedup import dup_edges

    _, _, pages_dir, src = corpus_dirs
    cfg = PipelineConfig()
    docs = rd.read_parquet(pages_dir, columns=["doc_id", "text"])
    edges, _ = dup_edges(docs, cfg)
    labels = connected_components(edges, cfg)
    clusters = assign_clusters(docs, labels, cfg)
    tbl = pa.concat_tables(
        clusters.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    lab = dict(zip(tbl["doc_id"].to_numpy(), tbl["cluster_id"].to_numpy()))
    assert len(lab) == N_BASE * EXPAND

    base_ids = src["doc_id"].to_numpy()
    text_len = np.array([len(t.as_py() or "") for t in src["text"]])
    # The exact-dup / no-false-positive invariants hold at ANY length.
    # The 1-token near-dup edit is a FIXED ~35-byte shingle delta, so
    # its Jaccard (and hence LSH collision probability) rises with doc
    # length: ~0.9 recall at >=400 chars, correctly below threshold for
    # short docs. Everything is seeded, so these are deterministic
    # regression pins, not flaky probabilistic asserts.
    checked = 0
    near_hits = 0
    near_total = 0
    for d, n in zip(base_ids, text_len):
        if n < 200:
            continue
        checked += 1
        for w0 in (0, 7):  # the two windows
            base, dup, near = (lab[d * EXPAND + w0 + k] for k in (0, 1, 2))
            assert base == dup, "exact duplicate must co-cluster with its base"
            if n >= 400:
                near_total += 1
                near_hits += base == near
            uniq = [lab[d * EXPAND + w0 + k] for k in (3, 4, 5, 6)]
            assert base not in uniq, "unique-ified variant joined the window triple"
            assert len(set(uniq)) == 4, "unique-ified variants merged with each other"
        assert lab[d * EXPAND + 0] != lab[d * EXPAND + 7], "windows must not merge"
    assert checked >= 20  # the slice must actually exercise the contract
    assert near_total >= 30
    assert near_hits / near_total >= 0.85, (near_hits, near_total)
