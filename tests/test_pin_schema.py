"""Regression tests for the aggregate→join empty-block hazard
(CORRECTNESS_r03's one red row, doc_top_terms).

Ray 2.49's hash aggregate emits EMPTY schema-less blocks for partitions
that received no rows, and Dataset.join broadcasts schemas to its
aggregators only with the FIRST block of each side — a 0-row first
block short-circuits that broadcast, leaving key-gap join partitions
schema-less, which crashes Acero. The crash needs partition counts
above what the pytest fixture's 4 CPUs produce, so these tests force a
high partition count via GRAFT_JOIN_PARTITIONS (the env override
resolve_join_partitions honors) and assert both the repaired invariant
(pin_schema leaves zero empty blocks) and end-to-end oracle equality
for the query shapes that crashed or share the hazard class.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = pa.schema([("k", pa.int64()), ("v", pa.int64())])


def _aggregate_with_few_keys(n_keys: int = 3, n_blocks: int = 8):
    """A hash-aggregate output engineered to contain empty partitions:
    far fewer distinct keys than input blocks/partitions."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    t = pa.table({
        "k": pa.array(np.arange(4096, dtype=np.int64) % n_keys),
        "v": pa.array(np.ones(4096, dtype=np.int64)),
    })
    return (
        rd.from_arrow(t)
        .repartition(n_blocks)
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
    )


def test_pin_schema_leaves_no_empty_blocks(ray_session):
    import ray

    from consult_ray.util import pin_schema

    agg = _aggregate_with_few_keys()
    pinned = pin_schema(agg, SCHEMA)
    blocks = [
        ray.get(r) for r in pinned.materialize().get_internal_block_refs()
    ]
    assert blocks, "pinned dataset lost its rows"
    assert all(b.num_rows > 0 for b in blocks), (
        "pin_schema must eliminate empty blocks — a 0-row first block "
        "silently disables Dataset.join's schema broadcast (Ray 2.49 "
        "hash_shuffle._shuffle_block early-returns before fanning out "
        "schema-bearing shards)"
    )
    assert all(b.schema.equals(SCHEMA) for b in blocks)
    total = sum(b.num_rows for b in blocks)
    assert total == 3


def test_pin_schema_empty_input(ray_session):
    from consult_ray.util import pin_schema

    agg = _aggregate_with_few_keys().filter(expr="v < 0")
    pinned = pin_schema(agg, SCHEMA)
    assert pinned.count() == 0
    assert [f.name for f in pinned.schema().base_schema] == ["k", "v"]


def test_aggregate_join_partitions_above_key_count(ray_session, monkeypatch):
    """Inner join whose right side is an aggregate with 3 distinct keys,
    shuffled at 16 partitions (>> keys): the exact shape that crashed
    doc_top_terms at the driver's 32 CPUs."""
    monkeypatch.setenv("GRAFT_JOIN_PARTITIONS", "16")
    import ray.data as rd

    from consult_ray.util import pin_schema

    agg = pin_schema(_aggregate_with_few_keys(), SCHEMA)
    left = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(64, dtype=np.int64) % 3)})
    )
    out = left.join(agg, "inner", 16, on=("k",)).to_pandas()
    assert len(out) == 64
    assert (out["v"] == 4096 // 3 + (out["k"] < 4096 % 3)).all()


@pytest.mark.parametrize("name", [
    "doc_top_terms", "line_dedup_stats",          # aggregate -> join
    "nation_order_value", "region_revenue",       # join output -> join
    "customers_without_orders",                   # filtered read -> anti join
])
def test_hazard_queries_at_high_partitions(ray_session, monkeypatch, name):
    """Driver queries whose joins consume hash-aggregate outputs, other
    joins' outputs, or filtered reads — key/row cardinality can fall
    below the partition count (sf0.001 has a ~31-word vocabulary),
    forced to 16 join partitions."""
    monkeypatch.setenv("GRAFT_JOIN_PARTITIONS", "16")
    import __ray_entry__ as entrymod

    got = entrymod.queries()[name](SF_DIR)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    con = duckdb.connect()
    for t in ["documents", "customer", "orders", "lineitem", "supplier",
              "nation", "region", "events"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = con.sql(entrymod.oracle_sql()[name]).df()
    if len(got) == 0 and len(want) == 0:
        return  # a 0-row Dataset's to_pandas drops columns (CLAUDE.md)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols, ignore_index=True)
    b = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_semi_anti_join_empty_right(ray_session):
    """An all-empty right side (which Ray's join cannot consume) must
    yield an empty semi result and an identity anti result."""
    import ray.data as rd

    from consult_ray.config import PipelineConfig
    from consult_ray.pipelines.operators import anti_join, semi_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    right = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64())})
    ).filter(expr="k > 99")
    cfg = PipelineConfig()
    assert semi_join(left, right, cfg, on="k").count() == 0
    got = anti_join(left, right, cfg, on="k").to_pandas()
    assert sorted(got["k"]) == [1, 2, 3]


def test_distributed_cc_high_partitions(ray_session, monkeypatch):
    """Distributed connected components at 16 partitions on a tiny edge
    set (labels aggregate has far fewer nodes than partitions) must
    match the driver union-find exactly."""
    monkeypatch.setenv("GRAFT_JOIN_PARTITIONS", "16")
    import ray.data as rd

    from consult_ray.config import PipelineConfig
    from consult_ray.pipelines.cluster import (
        connected_components_distributed,
        connected_components_driver,
    )

    edges = pa.table({
        "a": pa.array([1, 2, 5, 9, 10], pa.int64()),
        "b": pa.array([2, 3, 6, 10, 11], pa.int64()),
    })
    ds = rd.from_arrow(edges).repartition(4)
    cfg = PipelineConfig()
    got = (
        connected_components_distributed(ds, cfg)
        .to_pandas().sort_values("node", ignore_index=True)
    )
    want = (
        connected_components_driver(rd.from_arrow(edges))
        .to_pandas().sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
