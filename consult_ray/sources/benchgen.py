"""Deterministic bench-corpus expansion.

The sf `documents` tables are small (5k rows at sf0.1) — far too small
for a meaningful throughput/scaling measurement of a pipeline designed
for 10^12 docs. This module derives a larger corpus FROM the sf table
(deterministically, seed-free string ops only), preserving the dup-mix
structure the dedup pipeline exists for:

    per source doc, EXPAND variants:
      r == 0       : the original text
      r % 7 == 1   : exact duplicate              (must co-cluster)
      r % 7 == 2   : near duplicate (1-token edit) (should co-cluster)
      otherwise    : unique-ified (distinct tokens appended) (singleton)

Cluster sizes stay under the bucket cap (1 + 2*EXPAND/7 <= 28 for
EXPAND <= 94). Output is written once as partitioned parquet and reused
by both parallelism levels of bench.py --scaling, so the two runs see
byte-identical input.
"""

from __future__ import annotations

import os

# bump when the expansion recipe changes so cached corpora regenerate
CORPUS_VERSION = 2

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


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
    n = len(df)

    frames = []
    for r in range(expand):
        v = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy() * expand + r,
            "text": df["text"],
        })
        if r == 0:
            pass
        elif r % 7 == 1:
            pass  # exact duplicate (different doc_id)
        elif r % 7 == 2:
            # near dup: replace the first token deterministically
            v["text"] = "ndup" + str(r) + " " + v["text"].str.split(" ", n=1).str[1].fillna("")
        else:
            # unique-ified: salt every 4th token so shingle windows break
            # everywhere — a prefix/suffix alone leaves the body's shingle
            # set intact and LSH (correctly) reports the variant as a
            # near-dup of its base, flooding band buckets
            tag = f"u{r}"

            def _salt(row):
                toks = row["text"].split(" ")
                uid = f"q{row['doc_id']}"
                out = []
                for j, tk in enumerate(toks):
                    out.append(tk)
                    if j % 4 == 3:
                        out.append(f"{tag}{uid}x{j}")
                return " ".join(out)

            v["text"] = v.apply(_salt, axis=1)
        frames.append(v)

    all_df = pd.concat(frames, ignore_index=True)
    all_df = all_df.sort_values("doc_id", ignore_index=True)
    tbl = pa.Table.from_pandas(all_df, preserve_index=False)
    step = (len(all_df) + num_files - 1) // num_files
    for f in range(num_files):
        chunk = tbl.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"{len(all_df)} rows, expand={expand}, src={sf_dir}\n")
    return pages_dir
