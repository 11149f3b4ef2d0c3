"""String-key (url) -> int64 doc-id assignment + round-trip.

The reference keys query records by their free-form FASTA/FASTQ id line
(/root/reference/main_search.cpp:761-766) — any id type. The engine's
shuffle/CC machinery is int64 end-to-end (band rows are 40 B, CC labels
are numpy int64 min-reductions), so string-keyed tables — the
BASELINE.json input_hint schema is url-keyed — get a DETERMINISTIC
content-hash id as their first stage:

    id = hash_bytes_batch_u64(utf8(key), seed) >> 1      (63-bit, >= 0)

Pure function of the key bytes, so retries, re-runs and re-shards are
value-identical (no dense-id coordination step), and the SAME key in
two different tables (corpus vs query stream) maps to the same id —
which is what lets a url-keyed query stream probe a url-keyed library.

The top bit is cleared: ids stay non-negative, so the engine's two
int64 sentinels (match_doc -1, Min-aggregate identity int64-max) can
never collide with a real id. Collision risk is birthday(2^63): ~3e-7
at 1e6 docs, ~0.05 at 1e9 — `audit_id_collisions` measures the real
count distributedly (one id-keyed groupby over (id, key) partials);
pipelines that cannot tolerate a false merge run it once per ingest
and fail fast.

Round-trip: `key_mapping` gives the (id, key) table for joining engine
outputs (cluster ids, survivor ids, match docs) back onto string keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

ID_ASSIGN_VERSION = 1
DEFAULT_ID_SEED = 0x1D5EED


def hash_keys(col: pa.Array, seed: int = DEFAULT_ID_SEED) -> np.ndarray:
    """String/binary column -> non-negative int64 ids (vectorized)."""
    from consult_ray.functions.hashing import hash_bytes_batch_u64
    from consult_ray.stages.fingerprint import _utf8_concat_and_offsets

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    concat, offsets = _utf8_concat_and_offsets(col)
    h = hash_bytes_batch_u64(concat, offsets, seed=seed)
    return (h >> np.uint64(1)).view(np.int64)


def add_hashed_doc_ids(
    ds: Dataset,
    key_col: str = "url",
    id_col: str = "doc_id",
    seed: int = DEFAULT_ID_SEED,
) -> Dataset:
    """Append the deterministic content-hash id column. The key column
    rides along untouched for the output round-trip."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = hash_keys(batch[key_col], seed=seed)
        return batch.append_column(id_col, pa.array(ids))

    return ds.map_batches(fn, batch_format="pyarrow")


def key_mapping(
    ds_with_ids: Dataset, key_col: str = "url", id_col: str = "doc_id"
) -> Dataset:
    """(id, key) projection for joining engine outputs back to keys."""
    return ds_with_ids.select_columns([id_col, key_col])


def audit_id_collisions(
    ds_with_ids: Dataset, key_col: str = "url", id_col: str = "doc_id"
) -> int:
    """Number of ids claimed by more than one DISTINCT key.

    Distributed: per-batch unique (id, key) partials (so duplicate rows
    of one key never inflate the shuffle), then one id-keyed groupby;
    an id collides iff its min key != max key. Never materializes the
    table driver-side. NOTE: the native id-keyed aggregate pays
    per-distinct-key (util.partitioned_group_min docstring) — the audit
    is an OPT-IN verification pass (default off on the scale path), so
    the cost is accepted here in exchange for exact string min/max."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, key_col])
        return t.group_by([id_col, key_col]).aggregate([]).select([id_col, key_col])

    agg = (
        ds_with_ids.map_batches(partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Min(key_col, alias_name="k_min"),
            Max(key_col, alias_name="k_max"),
        )
    )
    bad = agg.filter(expr="k_min != k_max")
    return int(bad.count())
