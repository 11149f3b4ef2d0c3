"""Exercise the fsio manifest protocol against a NON-POSIX filesystem
double (`norename://` — state/fsio.ObjectStoreDoubleHandler): rename
raises and mtimes are stripped, the two object-store constraints the
protocol's docstring promises to survive. Round-3 verdict item: the
protocol was designed for S3/GCS but only ever ran through
LocalFileSystem, which silently FORGIVES rename-based code."""

import numpy as np
import pyarrow as pa
import pyarrow.fs as pafs
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.sources.synth import make_pages_corpus
from consult_ray.state import fsio

CFG = PipelineConfig()


def test_double_enforces_object_store_rules(tmp_path):
    fs, root = fsio.resolve_fs(f"norename://{tmp_path}")
    assert isinstance(fs, pafs.PyFileSystem)
    fsio.mkdirs(fs, fsio.join(root, "d"))
    fsio.write_json(fs, fsio.join(root, "d", "m.json"), {"x": 1})
    assert fsio.read_json(fs, fsio.join(root, "d", "m.json")) == {"x": 1}
    info = fs.get_file_info(fsio.join(root, "d", "m.json"))
    assert info.mtime is None, "double must strip mtimes"
    with pytest.raises(NotImplementedError, match="no rename"):
        fs.move(fsio.join(root, "d", "m.json"), fsio.join(root, "d", "n.json"))
    # the double must pickle into Ray workers by reconstruction
    import pickle

    fs2 = pickle.loads(pickle.dumps(fs))
    assert fsio.exists(fs2, fsio.join(root, "d", "m.json"))


@pytest.fixture(scope="module")
def corpus(ray_session):
    c = make_pages_corpus(200, seed=77)
    tbl = c.pages.append_column(
        "doc_id", pa.array(np.arange(c.pages.num_rows))
    ).select(["doc_id", "text"])
    half = tbl.num_rows // 2
    return tbl.slice(0, half), tbl.slice(half)


def test_library_build_and_probe_through_double(corpus, tmp_path_factory):
    """save -> overwrite-save (GC path) -> partitioned probe, all via
    norename://, must match the plain LocalFileSystem build exactly."""
    from consult_ray.state.library import (
        classify_queries_partitioned,
        read_library_meta,
        save_band_library,
    )

    corpus_tbl, query_tbl = corpus
    base = tmp_path_factory.mktemp("osd")
    lib_os = f"norename://{base}/band_tables"
    lib_local = str(tmp_path_factory.mktemp("loc") / "band_tables")

    save_band_library(rd.from_arrow(corpus_tbl), CFG, lib_os, num_partitions=4)
    # second commit over the first: exercises manifest replace + GC
    # with rename forbidden
    m_os = save_band_library(
        rd.from_arrow(corpus_tbl), CFG, lib_os, num_partitions=4
    )
    m_loc = save_band_library(
        rd.from_arrow(corpus_tbl), CFG, lib_local, num_partitions=4
    )
    strip = lambda parts: [
        {k: v for k, v in p.items() if k != "file"} for p in parts
    ]
    assert strip(m_os["partitions"]) == strip(m_loc["partitions"])
    assert read_library_meta(lib_os)["partitions"] == m_os["partitions"]

    got = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib_os, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    want = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib_local, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    cols = ["doc_id", "matched", "match_count", "match_doc"]
    assert got[cols].equals(want[cols])


def test_library_append_through_double(corpus, tmp_path_factory):
    """init + two ingest_shard appends via norename:// equals one batch
    build over the survivors (the append==rebuild invariant, now under
    object-store rules)."""
    from consult_ray.state.library import (
        init_band_library,
        ingest_shard,
        read_library_meta,
        save_band_library,
    )

    corpus_tbl, query_tbl = corpus
    base = tmp_path_factory.mktemp("osa")
    lib = f"norename://{base}/band_tables"
    init_band_library(lib, CFG, num_partitions=4)
    r1 = ingest_shard(rd.from_arrow(corpus_tbl), lib, CFG)
    r2 = ingest_shard(rd.from_arrow(query_tbl), lib, CFG)
    assert r1["n_in"] == corpus_tbl.num_rows
    surv = pa.concat_tables(
        [b for r in (r1, r2)
         for b in r["survivors"].iter_batches(batch_format="pyarrow")]
    ).select(["doc_id", "text"]).sort_by("doc_id")
    lib2 = str(tmp_path_factory.mktemp("osb") / "band_tables")
    m2 = save_band_library(rd.from_arrow(surv), CFG, lib2, num_partitions=4)
    m1 = read_library_meta(lib)
    strip = lambda parts: [
        {k: v for k, v in p.items() if k != "file"} for p in parts
    ]
    assert strip(m1["partitions"]) == strip(m2["partitions"])


def test_checkpoint_roundtrip_and_cc_resume_through_double(
    ray_session, tmp_path_factory
):
    from consult_ray.pipelines.checkpointed import (
        _is_complete,
        _read_checkpoint,
        _write_checkpoint,
    )
    from consult_ray.pipelines.cluster import (
        connected_components_distributed,
        connected_components_driver,
    )

    base = tmp_path_factory.mktemp("osc")
    ck = f"norename://{base}/stage"
    t = pa.table({"x": pa.array(np.arange(100, dtype=np.int64))})
    n, parts = _write_checkpoint(rd.from_arrow(t), ck)
    assert n == 100 and _is_complete(ck)
    back = _read_checkpoint(ck).to_pandas().sort_values("x", ignore_index=True)
    assert (back["x"].to_numpy() == np.arange(100)).all()

    edges = pa.table({
        "a": pa.array([1, 2, 5, 9, 10], pa.int64()),
        "b": pa.array([2, 3, 6, 10, 11], pa.int64()),
    })
    ccdir = f"norename://{base}/cc"
    got = connected_components_distributed(
        rd.from_arrow(edges).repartition(2), CFG, checkpoint_dir=ccdir
    ).to_pandas().sort_values("node", ignore_index=True)
    # second run must RESUME from committed rounds (no rename needed)
    again = connected_components_distributed(
        rd.from_arrow(edges).repartition(2), CFG, checkpoint_dir=ccdir
    ).to_pandas().sort_values("node", ignore_index=True)
    want = connected_components_driver(
        rd.from_arrow(edges)
    ).to_pandas().sort_values("node", ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    pd.testing.assert_frame_equal(again, want, check_dtype=False)
