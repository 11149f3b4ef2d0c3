"""util.partitioned_group_agg — the general partition-kernel merge that
replaces corpus-cardinality native aggregates (the measured 58x
per-distinct-key cliff, commit 4fb6a54). Pinned against Arrow's own
group_by on every supported op/key-type combination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from consult_ray.util import partitioned_group_agg


def _mk(n=50_000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": rng.integers(0, 5_000, n),
        "w": np.array([f"w{x}" for x in rng.integers(0, 3_000, n)]),
        "v": rng.integers(-100, 100, n),
    })


def _native(tbl, keys, aggs, outs):
    g = tbl.group_by(keys).aggregate(aggs)
    gen = [f"{c}_{a}" for c, a in aggs]
    df = g.select(keys + gen).rename_columns(keys + outs).to_pandas()
    return df.sort_values(keys, ignore_index=True)


def test_int_key_multi_agg(ray_session):
    tbl = _mk()
    ds = rd.from_arrow(tbl).repartition(8)
    out = partitioned_group_agg(
        ds, "k",
        [("v", "sum", "s"), ("v", "min", "mn"), ("v", "max", "mx"),
         (None, "count", "c")],
        8,
    ).to_pandas().sort_values("k", ignore_index=True)
    exp = _native(tbl, ["k"],
                  [("v", "sum"), ("v", "min"), ("v", "max"), ("v", "count")],
                  ["s", "mn", "mx", "c"])
    pd.testing.assert_frame_equal(
        out[["k", "s", "mn", "mx", "c"]].astype("int64"),
        exp[["k", "s", "mn", "mx", "c"]].astype("int64"),
    )


def test_string_and_composite_keys(ray_session):
    tbl = _mk(seed=1)
    ds = rd.from_arrow(tbl).repartition(8)
    out = partitioned_group_agg(
        ds, ["w", "k"], [("v", "sum", "s")], 8
    ).to_pandas().sort_values(["w", "k"], ignore_index=True)
    exp = _native(tbl, ["w", "k"], [("v", "sum")], ["s"])
    pd.testing.assert_frame_equal(
        out.astype({"s": "int64", "k": "int64"}),
        exp.astype({"s": "int64", "k": "int64"}),
    )


def test_empty_input(ray_session):
    tbl = _mk().slice(0, 0)
    ds = rd.from_arrow(tbl)
    out = partitioned_group_agg(ds, "k", [("v", "sum", "s")], 4)
    assert out.count() == 0
    # an empty groupby never invokes the kernel, so the schema may be
    # None entirely (Ray 2.49); callers that join/pin must handle
    # empties themselves (util.pin_schema). If a schema IS reported it
    # must be the kernel's.
    sch = out.schema()
    assert sch is None or set(sch.names) in ({"k", "s"}, set())


def test_null_keys_form_their_own_group(ray_session):
    """SQL GROUP BY semantics: null keys are ONE group (matching every
    DuckDB oracle), and null-aware boundary detection means a null at a
    sorted boundary can never merge with (or corrupt) the fill-value
    group — 0 and None must stay distinct."""
    tbl = pa.table({
        "k": pa.array([1, None, 2, None, 0, 1], pa.int64()),
        "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    out = partitioned_group_agg(ds, "k", [("v", "sum", "s")], 4).to_pandas()
    got = {(None if pd.isna(k) else int(k)): int(s)
           for k, s in zip(out["k"], out["s"])}
    assert got == {1: 7, 2: 3, 0: 5, None: 6}


def test_key_column_as_aggregate_value(ray_session):
    """A val_col that IS a key column (first-key-per-group shapes) must
    work rather than KeyError."""
    tbl = pa.table({
        "k": pa.array([3, 3, 5], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })
    ds = rd.from_arrow(tbl)
    out = partitioned_group_agg(
        ds, "k", [("k", "min", "kmin"), ("v", "sum", "s")], 2
    ).to_pandas().sort_values("k", ignore_index=True)
    assert out["kmin"].tolist() == [3, 5]
    assert out["s"].tolist() == [3, 3]


def test_null_aggregate_value_fails_loudly(ray_session):
    """Arrow's native aggregates silently skip null VALUES; the kernel
    must refuse them instead of silently diverging."""
    tbl = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array([1, None], pa.int64()),
    })
    ds = rd.from_arrow(tbl)
    with pytest.raises(Exception):
        partitioned_group_agg(ds, "k", [("v", "sum", "s")], 2).take_all()


def test_distinct_count_by_null_boundary(ray_session):
    """The confirmed review repro: (g=1,u=NULL),(g=2,u=5) sort adjacent;
    a non-null-aware boundary mask dropped group 2 entirely."""
    from consult_ray.pipelines.operators import distinct_count_by

    tbl = pa.table({
        "g": pa.array([1, 2], pa.int64()),
        "u": pa.array([None, 5], pa.int64()),
    })
    ds = rd.from_arrow(tbl)
    out = distinct_count_by(ds, "g", "u", out_name="n").to_pandas()
    got = dict(zip(out["g"].astype(int), out["n"].astype(int)))
    # null counts as one distinct value per group (documented; SQL
    # COUNT(DISTINCT) would exclude it) — the essential property is
    # group 2 SURVIVES with its pair counted
    assert got == {1: 1, 2: 1}


def test_distinct_count_by_matches_brute(ray_session):
    from consult_ray.pipelines.operators import distinct_count_by

    rng = np.random.default_rng(2)
    n = 20_000
    tbl = pa.table({
        "g": rng.integers(0, 200, n),
        "u": rng.integers(0, 500, n),
    })
    ds = rd.from_arrow(tbl).repartition(6)
    out = distinct_count_by(ds, "g", "u", out_name="n").to_pandas()
    out = out.sort_values("g", ignore_index=True)
    exp = (
        tbl.to_pandas().groupby("g")["u"].nunique().rename("n").reset_index()
    )
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))
