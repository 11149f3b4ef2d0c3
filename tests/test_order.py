"""Tests for the exact distributed total-order primitive
(consult_ray/stages/order.py): rank/running-sum exactness vs a brute
sort, boundary independence, hot-key tie splitting, and the empty-input
schema contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from consult_ray.stages.order import composite_searchsorted, global_order_stats


def _ds(df: pd.DataFrame, parts: int = 1):
    import ray.data as rd

    # pa.Table keeps the schema metadata-free (from_pandas attaches an
    # unhashable pandas dict that poisons downstream schema dedup)
    ds = rd.from_arrow(pa.table({c: df[c].to_numpy() for c in df.columns}))
    return ds.repartition(parts) if parts > 1 else ds


def _brute(df: pd.DataFrame, val: str | None = None) -> pd.DataFrame:
    b = df.sort_values(["k", "doc_id"]).reset_index(drop=True)
    b["rank"] = np.arange(1, len(b) + 1, dtype=np.int64)
    if val:
        b["running"] = b[val].cumsum()
    return b.sort_values("doc_id").reset_index(drop=True)


def test_composite_searchsorted_ties():
    bk = np.array([3, 5, 5, 5, 9])
    bid = np.array([0, 2, 6, 8, 1])
    k = np.array([1, 3, 5, 5, 5, 5, 7, 9, 10])
    i = np.array([9, 0, 1, 2, 7, 9, 0, 0, 0])
    want = [
        sum((a, b) <= (kk, ii) for a, b in zip(bk, bid))
        for kk, ii in zip(k, i)
    ]
    assert composite_searchsorted(bk, bid, k, i).tolist() == want


def test_rank_and_running_match_brute(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n),          # heavy ties
        "doc_id": rng.permutation(n).astype(np.int64),
        "v": rng.integers(1, 10, n).astype(np.int64),
    })
    out = (
        global_order_stats(_ds(df, 13), "k", "doc_id", "v", num_partitions=7)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = _brute(df, "v")
    np.testing.assert_array_equal(out["rank"].to_numpy(), b["rank"].to_numpy())
    np.testing.assert_array_equal(
        out["running"].to_numpy(), b["running"].to_numpy()
    )


def test_boundary_independence(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 8, 1200),
        "doc_id": rng.permutation(1200).astype(np.int64),
        "v": np.ones(1200, dtype=np.int64),
    })
    outs = [
        global_order_stats(_ds(df, 5), "k", "doc_id", "v", num_partitions=p)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
        for p in (1, 4, 31)
    ]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o[outs[0].columns.tolist()])


def test_single_hot_key_splits_across_partitions(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": np.zeros(1000, dtype=np.int64),  # one giant tie group
        "doc_id": rng.permutation(1000).astype(np.int64),
    })
    out = (
        global_order_stats(_ds(df, 5), "k", "doc_id", num_partitions=6)
        .to_pandas().sort_values("doc_id")
    )
    np.testing.assert_array_equal(
        out["rank"].to_numpy(), np.arange(1, 1001, dtype=np.int64)
    )


def test_empty_input_keeps_schema(ray_session):
    df = pd.DataFrame({
        "k": np.array([], dtype=np.int64),
        "doc_id": np.array([], dtype=np.int64),
        "v": np.array([], dtype=np.int64),
    })
    out = global_order_stats(_ds(df), "k", "doc_id", "v", num_partitions=4)
    assert out.schema().names == ["doc_id", "k", "v", "rank", "running"]
    assert out.count() == 0
