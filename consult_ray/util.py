"""Small execution helpers shared by pipelines."""

from __future__ import annotations

import pyarrow as pa
import ray

from consult_ray.config import PipelineConfig


def grouped(
    table: pa.Table,
    keys: list[str],
    aggs: list[tuple[str, str]],
    out_names: list[str],
) -> pa.Table:
    """pa.Table.group_by().aggregate() with VERSION-SAFE output naming:
    aggregate columns are selected by their generated '{col}_{agg}'
    names before the positional rename, so the key-vs-aggregate column
    order (which changed across pyarrow releases) can never silently
    transpose data."""
    g = table.group_by(keys).aggregate(aggs)
    gen = [f"{c}_{a}" for c, a in aggs]
    return g.select(keys + gen).rename_columns(keys + out_names)


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """read_parquet with the file's schema METADATA stripped at the
    source. Parquet written via pandas carries a b'pandas' schema-
    metadata dict that makes pa.Schema unhashable, so every downstream
    Ray Data schema-dedup logs 'Failed to hash the schemas' and pays
    the slow unify path on EVERY block (transform_pyarrow.unify_schemas
    hashes schemas for an early exit). Stripping at the read keeps all
    derived blocks metadata-free."""
    import ray.data as rd

    if "filter" in kw:
        # a row filter binds against the OVERRIDE schema, which is
        # pre-projected to `columns`; filter fields outside the
        # projection would fail to bind. Skip the override and strip
        # metadata per block instead (zero-copy table rebuild — arrays
        # are shared), so filtered reads can still feed hash shuffles
        # without the per-block 'Failed to hash the schemas' slow path.
        def _strip_meta(batch: pa.Table) -> pa.Table:
            clean = pa.schema(
                [f.remove_metadata() for f in batch.schema], metadata=None
            )
            return pa.table(batch.columns, schema=clean)

        return rd.read_parquet(path, columns=columns, **kw).map_batches(
            _strip_meta, batch_format="pyarrow"
        )

    schema = None
    try:
        import os

        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            names = sorted(
                n for n in os.listdir(path) if n.endswith(".parquet")
            )
            target = os.path.join(path, names[0]) if names else path
        schema = pq.read_schema(target)
        if schema.metadata is None and all(
            f.metadata is None for f in schema
        ):
            schema = None  # already clean; let Ray infer as usual
        else:
            fields = [f.remove_metadata() for f in schema]
            if columns is not None:
                # Ray applies the schema to the PROJECTED batches, so it
                # must be pre-projected to the requested columns
                by_name = {f.name: f for f in fields}
                fields = [by_name[c] for c in columns]
            schema = pa.schema(fields, metadata=None)
    except Exception:
        schema = None
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)


def cluster_cpus() -> int:
    """Total CPUs of the current Ray cluster (>=1). Works before/after
    ray.init — Ray Data auto-inits on first use anyway."""
    try:
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 1)))
    except Exception:
        pass
    import os

    return max(1, os.cpu_count() or 1)


def resolve_join_partitions(cfg: PipelineConfig) -> int:
    """Hash-shuffle partition count that cannot deadlock the cluster.

    Ray's hash-shuffle aggregator pool reserves ~num_partitions/8 CPUs up
    front; a partition count far above the cluster CPU count stalls the
    join behind resource contention (observed: num_partitions=32 on a
    4-CPU cluster never schedules). Cap the configured value at the
    cluster CPU count — on a 256-node cluster the cap is the configured
    value, on a laptop it is the laptop.

    GRAFT_JOIN_PARTITIONS overrides (bench.py sets it to the MEASURED
    delivered parallelism: hosts that advertise more vCPUs than they
    deliver invert scaling when the shuffle is sized to the advertised
    count)."""
    import os

    env = os.environ.get("GRAFT_JOIN_PARTITIONS")
    if env:
        return max(2, int(env))
    return max(2, min(cfg.join_partitions, cluster_cpus()))
