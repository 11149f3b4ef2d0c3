"""Bloom-filter pre-filter: kernel guarantees (no false negatives,
bounded false-positive rate) and end-to-end classification equality
with the exact path."""

import dataclasses

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.functions.sketch import (
    bloom_block_bits,
    bloom_contains,
    bloom_merge,
    bloom_size_for,
)
from consult_ray.sources.synth import make_pages_corpus
from consult_ray.state.library import (
    classify_queries_partitioned,
    library_bloom,
    save_band_library,
)

CFG = PipelineConfig()


def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**63, 50_000, dtype=np.int64)
    m_bits, k = bloom_size_for(len(members), fpp=0.02)
    # build from 7 unequal blocks, merged — the distributed plan shape
    blocks = [
        bloom_block_bits(c, m_bits, k, seed=1)
        for c in np.array_split(members, 7)
    ]
    words = bloom_merge(blocks)
    assert bloom_contains(words, members, m_bits, k, seed=1).all()
    probe = rng.integers(0, 2**63, 50_000, dtype=np.int64)
    fresh = probe[~np.isin(probe, members)]
    fpr = bloom_contains(words, fresh, m_bits, k, seed=1).mean()
    assert fpr <= 0.06, fpr  # target 0.02 with generous slack


def test_bloom_prefilter_classification_identical(ray_session, tmp_path_factory):
    c = make_pages_corpus(300, seed=23)
    tbl = c.pages.append_column(
        "doc_id", pa.array(np.arange(c.pages.num_rows))
    ).select(["doc_id", "text"])
    half = tbl.num_rows // 2
    corpus_tbl, query_tbl = tbl.slice(0, half), tbl.slice(half)
    lib = str(tmp_path_factory.mktemp("bloomlib") / "band_tables")
    save_band_library(rd.from_arrow(corpus_tbl), CFG, lib, num_partitions=8)

    words, m_bits, k = library_bloom(lib, CFG.bloom_fpp)
    assert m_bits % 64 == 0 and len(words) == m_bits >> 6
    # cache hit returns the same object
    again, _, _ = library_bloom(lib, CFG.bloom_fpp)
    assert again is words

    base = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, CFG
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    cfg_b = dataclasses.replace(CFG, probe_bloom_prefilter=True)
    got = classify_queries_partitioned(
        rd.from_arrow(query_tbl), lib, cfg_b
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    # a Bloom miss is never wrong -> identical classification, not just
    # identical `matched`: counts and match docs too
    for col in ["doc_id", "matched", "match_count", "match_doc"]:
        assert got[col].tolist() == base[col].tolist(), col
    assert base["matched"].any() and not base["matched"].all()
