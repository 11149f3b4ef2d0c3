"""Deterministic bench-corpus expansion.

The sf `documents` tables are small (5k rows at sf0.1) — far too small
for a meaningful throughput/scaling measurement of a pipeline designed
for 10^12 docs. This module derives a larger corpus FROM the sf table
(deterministically, seed-free string ops only), preserving the dup-mix
structure the dedup pipeline exists for, with CLUSTER SIZES BOUNDED
INDEPENDENTLY OF THE EXPANSION FACTOR:

    variants are grouped into windows of 7 (window = r // 7); each
    window gets its own salted base text, and within a window
      r % 7 == 0 : the window base            (cluster seed)
      r % 7 == 1 : exact duplicate of it      (must co-cluster)
      r % 7 == 2 : near duplicate (1-token edit; co-clusters when the
                   doc is long enough that the fixed ~35-byte shingle
                   delta stays inside the LSH collision curve — ~0.9
                   recall at >=400 chars, falling for shorter docs,
                   which correctly read as below-threshold; measured
                   and pinned in tests/test_benchgen.py)
      otherwise  : unique-ified (per-doc salt tokens every 4th position
                   so shingle windows break everywhere — a prefix alone
                   leaves the body's shingle set intact and LSH correctly
                   reports it as a near-dup, flooding buckets)

So every TRUE cluster has ~3 members at ANY expand, the dup fraction
stays ~3/7, and the number of clusters scales linearly. BAND-BUCKET
sizes are NOT fully expand-independent, though: where 4 consecutive
tokens span >= 32 bytes (long tokens), the inter-salt run carries
window-invariant shingles shared by every variant of that base doc, so
those hot buckets grow ~linearly with expand — measured 2026-08-18:
hot(>28) keys 126 -> 54,504 and max bucket 37 -> 90 from x80 to x240.
That is the realistic Common-Crawl boilerplate shape the census/cap
machinery exists for, and the cap bounds the actual candidate work:
capped pairs/doc grew only 20.1 -> 26.7 (+33%) over the same 3x — so
per-doc throughput is comparable only WITHIN one expand factor, while
the 2-leg scaling ratio at a fixed expand stays a clean A/B. Output is
written once as partitioned parquet and reused by both parallelism
levels of bench.py --scaling, so the two runs see byte-identical input.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# bump when the expansion recipe changes so cached corpora regenerate
CORPUS_VERSION = 4


def _salt_tokens(toks: list[str], salts: list[str]) -> str:
    """Insert salts[...] after every 4th token (cycled)."""
    out = []
    s = 0
    for j, tk in enumerate(toks):
        out.append(tk)
        if j % 4 == 3:
            out.append(salts[s % len(salts)])
            s += 1
    return " ".join(out)


def expand_documents(sf_dir: str, expand: int, out_dir: str, num_files: int = 32) -> str:
    """Expand sf documents by `expand`x into out_dir/pages/*.parquet.
    Idempotent: returns immediately if the _SUCCESS marker exists."""
    pages_dir = os.path.join(out_dir, "pages")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return pages_dir

    os.makedirs(pages_dir, exist_ok=True)
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    df = src.to_pandas()
    base_ids = df["doc_id"].to_numpy()
    token_lists = [t.split(" ") if t else [""] for t in df["text"]]

    frames = []
    for r in range(expand):
        w = r // 7
        wtag = f"w{w}"
        kind = r % 7
        if kind == 0 or kind == 1:
            # window base (kind 0) and its exact duplicate (kind 1)
            texts = [_salt_tokens(toks, [f"{wtag}s{j}" for j in range(3)])
                     for toks in token_lists]
        elif kind == 2:
            # near duplicate of the window base: first token replaced
            texts = []
            for toks in token_lists:
                t2 = [f"nd{w}"] + toks[1:] if len(toks) > 1 else [f"nd{w}"]
                texts.append(_salt_tokens(t2, [f"{wtag}s{j}" for j in range(3)]))
        else:
            # unique: per-doc salts so no two docs share shingle runs
            texts = [
                _salt_tokens(toks, [f"u{r}q{int(d)}x{j}" for j in range(4)])
                for d, toks in zip(base_ids, token_lists)
            ]
        frames.append(pd.DataFrame({
            "doc_id": base_ids * expand + r,
            "text": texts,
        }))

    all_df = pd.concat(frames, ignore_index=True)
    all_df = all_df.sort_values("doc_id", ignore_index=True)
    # strip the pandas-metadata dict from_pandas attaches: an unhashable
    # schema defeats Ray's schema dedup and spams "Failed to hash the
    # schemas" from every shuffle aggregator
    tbl = pa.Table.from_pandas(all_df, preserve_index=False).replace_schema_metadata(None)
    step = (len(all_df) + num_files - 1) // num_files
    for f in range(num_files):
        chunk = tbl.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"{len(all_df)} rows, expand={expand}, src={sf_dir}, v={CORPUS_VERSION}\n")
    return pages_dir
