"""Band-key expansion stage: fingerprints -> LSH band rows.

The analog of CONSULT's per-l signature extraction + tag/row split
(/root/reference/main_map.cpp:574-584): each document explodes into
  * L bit-sampled SimHash band rows  (CONSULT-faithful path), and/or
  * b banded-MinHash rows            (the high-recall web-text path),
each carrying (band_kind, band, band_key, doc_id, simhash).

band_key is already mixed with the band index (fingerprint.py), so a
single int64 column is a collision-safe shuffle key across all bands of
both kinds — one groupby/join key for the whole candidate stage, the way
CONSULT folds (l, tag, row) into one flat array index.

The simhash column rides along so pair verification after the band-key
self-join needs NO extra join against the fingerprint table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from consult_ray.config import PipelineConfig
from consult_ray.functions.fingerprint import minhash_band_keys, simhash_band_keys


def band_rows_batch(
    batch: pa.Table,
    cfg: PipelineConfig,
    kinds: tuple[str, ...] = ("simhash", "minhash"),
) -> pa.Table:
    """fingerprints batch -> band rows (one row per doc per band).

    Output: band_kind:int8 (0=simhash,1=minhash), band:int16,
    band_key:int64, doc_id:int64, simhash:int64.
    """
    n = batch.num_rows
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    simhash = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)

    out_kind: list[np.ndarray] = []
    out_band: list[np.ndarray] = []
    out_key: list[np.ndarray] = []
    out_doc: list[np.ndarray] = []
    out_sim: list[np.ndarray] = []

    if "simhash" in kinds:
        keys = simhash_band_keys(simhash, cfg)  # (n, L)
        L = keys.shape[1]
        out_kind.append(np.zeros(n * L, dtype=np.int8))
        out_band.append(np.repeat(np.arange(L, dtype=np.int16)[None, :], n, axis=0).reshape(-1))
        out_key.append(keys.reshape(-1).view(np.int64))
        out_doc.append(np.repeat(doc_id, L))
        out_sim.append(np.repeat(simhash, L))

    if "minhash" in kinds:
        mh_col = batch["minhash"].combine_chunks()
        mh = np.asarray(mh_col.flatten()).view(np.uint64).reshape(n, cfg.num_perm)
        keys = minhash_band_keys(mh, cfg)  # (n, b)
        b = keys.shape[1]
        out_kind.append(np.ones(n * b, dtype=np.int8))
        out_band.append(np.repeat(np.arange(b, dtype=np.int16)[None, :], n, axis=0).reshape(-1))
        out_key.append(keys.reshape(-1).view(np.int64))
        out_doc.append(np.repeat(doc_id, b))
        out_sim.append(np.repeat(simhash, b))

    return pa.table(
        {
            "band_kind": pa.array(np.concatenate(out_kind)),
            "band": pa.array(np.concatenate(out_band)),
            "band_key": pa.array(np.concatenate(out_key)),
            "doc_id": pa.array(np.concatenate(out_doc)),
            "simhash": pa.array(np.concatenate(out_sim).view(np.int64)),
        }
    )


def make_band_fn(cfg: PipelineConfig, kinds: tuple[str, ...] = ("simhash", "minhash")):
    def fn(batch: pa.Table) -> pa.Table:
        return band_rows_batch(batch, cfg, kinds=kinds)

    return fn
