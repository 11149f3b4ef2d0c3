"""Fault injection: a worker process dying mid-pipeline must not change
the output. The north rule requires the job to survive node loss on a
multi-node cluster; the sandbox analog is killing one map_batches worker
hard (os._exit — a process death, not a Python exception, so it exercises
Ray's system-failure task retry, the same path a lost node takes) and
asserting the retried run's edges are byte-equal to an unfaulted run.

Determinism under retry is a designed-in property here: every kernel is
seeded from PipelineConfig (CLAUDE.md convention), so a re-executed task
recomputes identical rows. This test is the evidence."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.pipelines.dedup import dup_edges
from consult_ray.sources.synth import make_pages_corpus

CFG = PipelineConfig()


def _docs() -> pa.Table:
    c = make_pages_corpus(400, seed=42)
    return c.pages.append_column(
        "doc_id", pa.array(np.arange(c.pages.num_rows))
    )


def _kill_once_stage(marker_dir: str):
    """A pass-through map_batches fn whose FIRST task (cluster-wide,
    claimed via an O_EXCL marker file) kills its worker process hard.
    Subsequent attempts of that task, and all other tasks, pass the
    batch through untouched."""

    def fn(batch: pa.Table) -> pa.Table:
        try:
            fd = os.open(
                os.path.join(marker_dir, "killed"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            os._exit(1)  # process death -> Ray system-failure retry
        except FileExistsError:
            pass
        return batch

    return fn


def _edge_frame(edges) -> pd.DataFrame:
    df = edges.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


def test_worker_death_is_invisible_in_output(ray_session):
    docs_tbl = _docs()

    clean_edges, _ = dup_edges(
        rd.from_arrow(docs_tbl).repartition(8), CFG
    )
    clean = _edge_frame(clean_edges)
    assert len(clean) > 0  # the corpus has planted near-dups

    marker_dir = tempfile.mkdtemp(prefix="retry_inject_")
    faulted_input = (
        rd.from_arrow(docs_tbl)
        .repartition(8)
        .map_batches(_kill_once_stage(marker_dir), batch_format="pyarrow")
    )
    faulted_edges, _ = dup_edges(faulted_input, CFG)
    faulted = _edge_frame(faulted_edges)

    # the kill really happened (the marker was claimed) ...
    assert os.path.exists(os.path.join(marker_dir, "killed"))
    # ... and the output is identical anyway
    pd.testing.assert_frame_equal(clean, faulted)


def _kill_n_stage(marker_dir: str, n: int):
    """Pass-through whose first n tasks (claimed via numbered O_EXCL
    markers) each kill their worker — multiple distinct process losses
    in one run, the multi-node analog of losing several nodes."""

    def fn(batch: pa.Table) -> pa.Table:
        for i in range(n):
            path = os.path.join(marker_dir, f"killed{i}")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                continue
        return batch

    return fn


def test_multiple_worker_deaths_are_invisible(ray_session):
    """Two distinct worker deaths in one run (each retried task's
    replacement worker survives via the marker) still yield the exact
    clean-run output — rules out 'the retry only worked because the
    failure was unique'."""
    docs_tbl = _docs()

    clean_edges, _ = dup_edges(rd.from_arrow(docs_tbl).repartition(8), CFG)
    clean = _edge_frame(clean_edges)

    marker_dir = tempfile.mkdtemp(prefix="retry_inject2_")
    faulted_input = (
        rd.from_arrow(docs_tbl)
        .repartition(8)
        .map_batches(_kill_n_stage(marker_dir, 2), batch_format="pyarrow")
    )
    faulted_edges, _ = dup_edges(faulted_input, CFG)
    faulted = _edge_frame(faulted_edges)

    assert os.path.exists(os.path.join(marker_dir, "killed0"))
    assert os.path.exists(os.path.join(marker_dir, "killed1"))
    pd.testing.assert_frame_equal(clean, faulted)
