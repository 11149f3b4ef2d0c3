"""Persistent partitioned band-table library (S7/S8): save once, reload
from disk with key-range routing, and match the broadcast lookup path
bit-for-bit."""

import dataclasses
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.sources.synth import make_pages_corpus
from consult_ray.state.library import (
    classify_queries_partitioned,
    load_partition_csr,
    partition_of,
    read_library_meta,
    save_band_library,
)
from consult_ray.state.lookup import build_band_table, classify_queries

def _no_files(parts):
    """Manifest rows minus the generation-unique data-file names."""
    return [{k: v for k, v in p.items() if k != "file"} for p in parts]


def _part_table(lib, meta, part):
    import pyarrow.parquet as pq

    from consult_ray.state.library import _manifest_files

    return pq.read_table(f"{lib}/{_manifest_files(meta)[int(part)]}")


CFG = PipelineConfig()


@pytest.fixture(scope="module")
def corpus_and_queries(ray_session):
    c = make_pages_corpus(300, seed=21)
    tbl = c.pages.append_column("doc_id", pa.array(np.arange(c.pages.num_rows)))
    tbl = tbl.select(["doc_id", "text"])
    half = tbl.num_rows // 2
    return tbl.slice(0, half), tbl.slice(half)


def test_partitioned_matches_broadcast(corpus_and_queries, tmp_path_factory):
    corpus_tbl, query_tbl = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("lib") / "band_tables")
    manifest = save_band_library(rd.from_arrow(corpus_tbl), CFG, lib,
                                 num_partitions=8)
    assert os.path.exists(os.path.join(lib, "_SUCCESS"))
    assert 1 < len(manifest["partitions"]) <= 8, "routing must spread keys"

    got = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    want = classify_queries(
        rd.from_arrow(query_tbl), rd.from_arrow(corpus_tbl), CFG, concurrency=2
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    cols = ["doc_id", "matched", "match_count", "match_doc"]
    assert got[cols].equals(want[cols])
    # sanity: the corpus has dups of the query half's texts, so some match
    assert got.matched.any() and (~got.matched).any()


def test_partition_files_union_is_the_broadcast_table(corpus_and_queries,
                                                      tmp_path_factory):
    """The partition files, concatenated, must hold exactly the capped
    CSR rows the broadcast build produces — same cap policy per key."""
    corpus_tbl, _ = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("lib2") / "band_tables")
    manifest = save_band_library(rd.from_arrow(corpus_tbl), CFG, lib,
                                 num_partitions=8)
    t = build_band_table(rd.from_arrow(corpus_tbl), CFG)
    want_rows = len(t.docs)
    got_rows = sum(p["rows"] for p in manifest["partitions"])
    assert got_rows == want_rows
    # every key routed to the partition that owns its range, rows sorted
    for p in manifest["partitions"]:
        csr = load_partition_csr(lib, int(p["part"]))
        assert (partition_of(csr.keys, manifest["num_partitions"])
                == int(p["part"])).all()
        assert (np.diff(csr.keys) > 0).all()


def test_signature_mismatch_rejected(corpus_and_queries, tmp_path_factory):
    corpus_tbl, query_tbl = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("lib3") / "band_tables")
    save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=4)
    other = dataclasses.replace(CFG, seed=CFG.seed + 1)
    with pytest.raises(ValueError, match="signature mismatch"):
        classify_queries_partitioned(rd.from_arrow(query_tbl), lib, other)


def test_overwrite_is_idempotent(corpus_and_queries, tmp_path_factory):
    """Unlike the reference's refuse-to-overwrite mkdir guard
    (main_map.cpp:361-372), re-saving replaces the library atomically."""
    corpus_tbl, _ = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("lib4") / "band_tables")
    m1 = save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=4)
    m2 = save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=4)
    assert _no_files(m1["partitions"]) == _no_files(m2["partitions"])
    assert read_library_meta(lib)["num_partitions"] == 4
    # second commit retired the first generation's files (still on disk
    # for in-flight readers of the old manifest); a third commit GCs them
    retired = read_library_meta(lib)["retired"]
    assert sorted(retired) == sorted(
        p["file"] for p in m1["partitions"]
    )
    for f in retired:
        assert os.path.exists(os.path.join(lib, f))
    m3 = save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=4)
    on_disk = {f for f in os.listdir(lib) if f.endswith(".parquet")}
    live = {p["file"] for p in m3["partitions"]} | set(
        read_library_meta(lib)["retired"]
    )
    assert on_disk == live  # older generations garbage-collected


def test_probe_early_exit_preserves_matched(corpus_and_queries):
    """O3 early exit: `matched` is identical to the full scan,
    match_count caps at collision_threshold, and match_doc is a real
    matching doc wherever matched."""
    corpus_tbl, query_tbl = corpus_and_queries
    full = classify_queries(
        rd.from_arrow(query_tbl), rd.from_arrow(corpus_tbl), CFG, concurrency=2
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    cfg_ee = dataclasses.replace(CFG, probe_early_exit=True)
    fast = classify_queries(
        rd.from_arrow(query_tbl), rd.from_arrow(corpus_tbl), cfg_ee, concurrency=2
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(full.matched) == list(fast.matched)
    c = CFG.collision_threshold
    assert (fast.match_count == np.minimum(full.match_count, c)).all()
    m = fast.matched
    assert (fast.match_doc[m] >= 0).all() and (fast.match_doc[~m] == -1).all()
    assert full.matched.any()


def test_partitioned_early_exit_preserves_matched(corpus_and_queries,
                                                  tmp_path_factory):
    """O3 on the PARTITIONED path (round-2 gap): early exit must leave
    `matched` identical to the full partitioned scan, and match_doc must
    be a real matching doc wherever matched."""
    corpus_tbl, query_tbl = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("libee") / "band_tables")
    save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=8)
    full = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    cfg_ee = dataclasses.replace(CFG, probe_early_exit=True)
    fast = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, cfg_ee
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(full.matched) == list(fast.matched)
    assert (fast.match_count <= full.match_count).all()
    m = fast.matched
    assert (fast.match_doc[m] >= 0).all() and (fast.match_doc[~m] == -1).all()
    assert full.matched.any()


def test_partitioned_probe_has_no_all_to_all(corpus_and_queries,
                                             tmp_path_factory):
    """The probe stage must be batch-routed map_batches (parallelism =
    block count), not a groupby(part).map_groups whose parallelism is
    capped at num_partitions and whose groups materialize one
    partition's whole query-side row set (round-2 scale-killer #3)."""
    corpus_tbl, query_tbl = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("libplan") / "band_tables")
    save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=8)
    out = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, CFG
    ).materialize()
    stats = out.stats()
    assert "MapGroups" not in stats, stats


def test_append_equals_rebuild(corpus_and_queries, tmp_path_factory):
    """Appending docs B to a library built from A must yield partitions
    byte-identical to building from A ∪ B (min-doc_id cap is order-free),
    and re-appending B again must be a no-op."""
    import pyarrow.parquet as pq

    from consult_ray.state.library import append_to_band_library

    corpus_tbl, query_tbl = corpus_and_queries  # use both halves as A, B
    a_tbl, b_tbl = corpus_tbl, query_tbl
    both = pa.concat_tables([a_tbl, b_tbl])

    lib_inc = str(tmp_path_factory.mktemp("inc") / "band_tables")
    save_band_library(rd.from_arrow(a_tbl), CFG, lib_inc, num_partitions=8)
    m_inc = append_to_band_library(rd.from_arrow(b_tbl), CFG, lib_inc)

    lib_full = str(tmp_path_factory.mktemp("full") / "band_tables")
    m_full = save_band_library(rd.from_arrow(both), CFG, lib_full,
                               num_partitions=8)

    assert _no_files(m_inc["partitions"]) == _no_files(m_full["partitions"])
    for p in m_full["partitions"]:
        part = int(p["part"])
        ta = _part_table(lib_inc, m_inc, part)
        tb = _part_table(lib_full, m_full, part)
        assert ta.equals(tb), part

    # idempotent re-append
    m_again = append_to_band_library(rd.from_arrow(b_tbl), CFG, lib_inc)
    assert _no_files(m_again["partitions"]) == _no_files(m_full["partitions"])


def test_streaming_ingest_dedups_across_shards(ray_session, tmp_path_factory):
    """Streaming workload: shards classify against the library as of
    their arrival; near-dups of RESIDENT docs drop, novel docs append.
    The final library must equal a batch build over exactly the
    surviving docs."""
    import pyarrow.parquet as pq

    from consult_ray.state.library import ingest_shard, init_band_library

    c = make_pages_corpus(240, seed=33)
    tbl = c.pages.append_column(
        "doc_id", pa.array(np.arange(c.pages.num_rows))
    ).select(["doc_id", "text"])
    truth = c.truth.to_pandas()

    lib = str(tmp_path_factory.mktemp("stream") / "band_tables")
    init_band_library(lib, CFG, num_partitions=8)
    n = tbl.num_rows
    cut1, cut2 = n // 3, 2 * n // 3
    shards = [tbl.slice(0, cut1), tbl.slice(cut1, cut2 - cut1), tbl.slice(cut2)]

    all_survivor_ids = []
    stats = []
    for s in shards:
        r = ingest_shard(rd.from_arrow(s), lib, CFG)
        stats.append(r)
        all_survivor_ids.extend(
            r["survivors"].select_columns(["doc_id"]).to_pandas().doc_id
        )
    assert sum(r["n_in"] for r in stats) == n
    # the synth corpus has exact dups whose base lands in an earlier
    # shard for at least some pairs, so later shards must drop something
    assert stats[1]["n_dup"] + stats[2]["n_dup"] > 0

    # every exact duplicate of a doc ingested in an EARLIER shard drops
    surv = set(all_survivor_ids)
    kinds = dict(zip(range(n), truth.kind))
    cluster_of = dict(zip(range(n), truth.truth_cluster))
    for i in range(cut1, n):
        if kinds[i] == "exact_dup" and cluster_of[i] < cut1:
            assert i not in surv, f"exact dup {i} of resident {cluster_of[i]} kept"

    # final library == batch build over the survivors
    surv_tbl = tbl.filter(pa.array([int(d) in surv for d in range(n)]))
    lib2 = str(tmp_path_factory.mktemp("batch") / "band_tables")
    m2 = save_band_library(rd.from_arrow(surv_tbl), CFG, lib2, num_partitions=8)
    from consult_ray.state.library import read_library_meta
    m1 = read_library_meta(lib)
    assert _no_files(m1["partitions"]) == _no_files(m2["partitions"])
    for p in m2["partitions"]:
        part = int(p["part"])
        ta = _part_table(lib, m1, part)
        tb = _part_table(lib2, m2, part)
        assert ta.equals(tb), part


def test_crashed_save_leaves_snapshot_readable(corpus_and_queries,
                                               tmp_path_factory):
    """Manifest commit: a save that dies after writing data files but
    before the _meta.json PUT must leave the previous snapshot fully
    readable (no torn state), and the orphan files must be GC'd by the
    next successful commit."""
    import pyarrow.parquet as pq

    corpus_tbl, query_tbl = corpus_and_queries
    lib = str(tmp_path_factory.mktemp("crash") / "band_tables")
    m1 = save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=4)
    before = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)

    # simulate a crashed overwrite: new-generation data files appear,
    # manifest never lands
    orphan = os.path.join(lib, "part-00002-deadbeef.parquet")
    pq.write_table(_part_table(lib, m1, m1["partitions"][0]["part"]), orphan)

    after = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    cols = ["doc_id", "matched", "match_count", "match_doc"]
    assert after[cols].equals(before[cols])  # old snapshot intact

    save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=4)
    assert not os.path.exists(orphan)  # next commit garbage-collects it


def test_local_manifest_write_is_rename_published(tmp_path):
    """On LocalFileSystem the commit-point write must not truncate the
    existing manifest in place: the payload lands under a temp name and
    is published by one rename, so a crash mid-write can never tear the
    committed snapshot. (Object stores get this from atomic PUTs.)"""
    import pyarrow.fs as pafs

    from consult_ray.state import fsio

    fs, root = fsio.resolve_fs(str(tmp_path))
    target = fsio.join(root, "_meta.json")
    fsio.write_json(fs, target, {"gen": 1})
    assert fsio.read_json(fs, target) == {"gen": 1}
    # overwrite: round-trips, and no temp residue is left behind
    fsio.write_json(fs, target, {"gen": 2, "parts": list(range(50))})
    assert fsio.read_json(fs, target)["gen"] == 2
    assert fsio.list_files(fs, root) == ["_meta.json"]

    # a failed write must leave the old manifest untouched: simulate by
    # writing to a read-only directory via a subclassed stream error
    class Boom(pafs.LocalFileSystem):
        def open_output_stream(self, path, *a, **k):
            s = super().open_output_stream(path, *a, **k)
            s.write(b"torn")  # partial bytes hit the TEMP file only
            raise OSError("crash mid-write")

    try:
        fsio.write_json(Boom(), target, {"gen": 3})
    except OSError:
        pass
    assert fsio.read_json(fs, target)["gen"] == 2, "old snapshot must survive"
