"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Nothing here (or in consult_ray) calls ray.init()/ray.shutdown(); only
bench.py, CLI entry points and the test fixture own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any
from consult_ray.util import read_parquet_clean


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full near-dup dedup
    (fingerprint -> LSH bands -> census/cap -> band-key self-join ->
    hamming verify -> connected components) over the documents table.
    Returns the clusters Dataset (doc_id, cluster_id)."""
    import ray.data as rd

    from consult_ray.config import PipelineConfig
    from consult_ray.pipelines.cluster import assign_clusters, connected_components
    from consult_ray.pipelines.dedup import dup_edges

    cfg = PipelineConfig()
    docs = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "text"])
    edges, _stats = dup_edges(docs, cfg)
    labels = connected_components(edges, cfg)
    return assign_clusters(docs, labels, cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY §2.
    See consult_ray/pipelines/queries.py for the implementations."""
    from consult_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the SQL-expressible queries; LSH/clustering/
    actor-pool outputs are non-SQL-expressible and get the driver's
    rows-only check (their exact oracles live in tests/ as brute-force
    pytest checks)."""
    from consult_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
