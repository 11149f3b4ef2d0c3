"""Stateful band-table membership lookup — the CONSULT-faithful path.

The reference loads its whole library into RAM once per process
(/root/reference/main_search.cpp:384-658) and every OpenMP thread probes
it read-only (bucket scan T5, main_search.cpp:831-874, with the hd()
predicate and early exit at matched >= c, main_search.cpp:866-894).

Ray recast: the library is a dict band_key -> (doc_ids, simhashes)
capped at bucket_cap entries, built once from a corpus Dataset, put in
the object store ONCE (ray.put), and shared zero-copy-ish by every actor
of a map_batches actor pool. Query docs stream through the pool; each
batch is fingerprinted and probed vectorized. Classified/unclassified
output is the semi/anti-join split (S6/D3 analog,
main_search.cpp:1021-1045).

Scale note: at 10^12 docs the band table cannot be a single broadcast
dict — the scale path is the shuffle join in pipelines.dedup. This actor
pool is for the CONSULT workload shape: a bounded reference library +
a large query stream (incremental dedup against a fixed corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from consult_ray.config import PipelineConfig
from consult_ray.functions.hashing import popcount64
from consult_ray.pipelines.dedup import band_rows, fingerprints
from consult_ray.stages.bands import band_rows_batch
from consult_ray.stages.fingerprint import fingerprint_batch


def build_band_table(
    corpus: Dataset, cfg: PipelineConfig, kinds: tuple[str, ...] = ("simhash", "minhash")
) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """band_key -> (doc_ids[<=C], simhashes[<=C]), deterministic (min
    doc_ids kept, CONSULT's bucket-cap analog of main_map.cpp:592)."""
    fp = fingerprints(corpus, cfg)
    bands = band_rows(fp, cfg, kinds=kinds)
    key_parts, doc_parts, sim_parts = [], [], []
    for batch in bands.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        key_parts.append(batch["band_key"].to_numpy(zero_copy_only=False))
        doc_parts.append(batch["doc_id"].to_numpy(zero_copy_only=False))
        sim_parts.append(batch["simhash"].to_numpy(zero_copy_only=False))
    if not key_parts:
        return {}
    keys = np.concatenate(key_parts)
    # sort by (band_key, doc_id) so each bucket slice is doc-ordered and
    # the cap keeps the C smallest doc_ids deterministically
    docs = np.concatenate(doc_parts)
    sims = np.concatenate(sim_parts)
    order = np.lexsort((docs, keys))
    keys, docs, sims = keys[order], docs[order], sims[order]
    uniq, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(keys))
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for i, k in enumerate(uniq.tolist()):
        lo, hi = int(bounds[i]), min(int(bounds[i + 1]), int(bounds[i]) + cfg.bucket_cap)
        out[k] = (docs[lo:hi], sims[lo:hi])
    return out


class BandLookupActor:
    """Actor-pool stage: classify query docs against a resident band table.

    __init__ runs once per actor (ray.get of the broadcast table —
    CONSULT's parallel library load, main_search.cpp:523-658);
    __call__ probes per batch.

    Usage:
        table_ref = ray.put(build_band_table(corpus, cfg))
        out = queries.map_batches(
            BandLookupActor, fn_constructor_kwargs=dict(table_ref=table_ref, cfg=cfg),
            batch_format="pyarrow", concurrency=N)

    Output adds: matched:bool, match_count:int64 (number of band probes
    that found a hamming<=p neighbor — the A4 counter,
    main_search.cpp:766,868,996), match_doc:int64 (min matching corpus
    doc_id, -1 if none).
    """

    def __init__(self, table_ref, cfg: PipelineConfig, text_col: str = "text",
                 id_col: str = "doc_id", kinds: tuple[str, ...] = ("simhash", "minhash")):
        self.table = ray.get(table_ref) if not isinstance(table_ref, dict) else table_ref
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.kinds = kinds

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        fp = fingerprint_batch(batch, cfg, text_col=self.text_col, id_col=self.id_col)
        bands = band_rows_batch(fp, cfg, kinds=self.kinds)

        n = batch.num_rows
        ids = fp[self.id_col].to_numpy(zero_copy_only=False)
        pos_of = {int(d): i for i, d in enumerate(ids)}
        match_count = np.zeros(n, dtype=np.int64)
        match_doc = np.full(n, -1, dtype=np.int64)

        keys = bands["band_key"].to_numpy(zero_copy_only=False)
        docs = bands["doc_id"].to_numpy(zero_copy_only=False)
        sims = bands["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        for k, d, s in zip(keys.tolist(), docs.tolist(), sims):
            entry = self.table.get(k)
            if entry is None:
                continue
            cand_docs, cand_sims = entry
            ham = popcount64(np.uint64(s) ^ cand_sims.view(np.uint64))
            ok = (ham <= cfg.hamming_budget) & (cand_docs != d)
            if ok.any():
                i = pos_of[int(d)]
                match_count[i] += 1
                best = int(cand_docs[ok].min())
                if match_doc[i] == -1 or best < match_doc[i]:
                    match_doc[i] = best

        matched = match_count >= cfg.collision_threshold
        return (
            batch.append_column("matched", pa.array(matched))
            .append_column("match_count", pa.array(match_count))
            .append_column("match_doc", pa.array(match_doc))
        )


def classify_queries(
    queries: Dataset,
    corpus: Dataset,
    cfg: PipelineConfig,
    concurrency: int = 4,
    batch_size: int | None = None,
) -> Dataset:
    """Semi/anti-join classification of a query stream against a corpus.
    Returns queries + matched/match_count/match_doc columns; filter on
    `matched` for the semi side, `~matched` for the anti side (the
    ucseq_ unclassified-output analog, main_search.cpp:728,1021-1041)."""
    table_ref = ray.put(build_band_table(corpus, cfg))
    return queries.map_batches(
        BandLookupActor,
        fn_constructor_kwargs=dict(table_ref=table_ref, cfg=cfg),
        batch_format="pyarrow",
        batch_size=batch_size or cfg.batch_size,
        concurrency=concurrency,
    )
