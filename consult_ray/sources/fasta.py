"""Real FASTA / FASTQ source readers and writers — the reference's
native record formats (S1/S3/S5/S6: FASTA line iterator
`/root/reference/main_map.cpp:540-542`, FASTQ 4-line framing
`/root/reference/main_search.cpp:755-766`), re-expressed Ray-Data-first:
`ray.data.read_binary_files` makes the FILE the unit of parallelism
(exactly the reference's one-work-item-per-file scheduler,
main_search.cpp:684-707), and record parsing inside each file is Arrow
kernels over one split — the only Python loop is over the handful of
files in a batch, never over records.

Scale contract: a crawl/sequencing corpus is many files; parallelism =
file count, per-task memory = one file. Records never straddle files,
so no cross-block reassembly is needed (the classic distributed-FASTA
hazard is avoided by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --- parsing (vectorized per file) -------------------------------------

def parse_fasta_bytes(data: bytes) -> pa.Table:
    """One FASTA file -> (rec_id: string, seq: string). Multi-line
    sequences supported: everything between one `>` header and the next
    concatenates with newlines removed (the reference's line iterator
    appends lines the same way, minimization.cpp:150-157)."""
    text = data.decode("utf-8")
    if text.startswith("﻿"):
        text = text[1:]
    # one O(file) python split; everything after is Arrow
    chunks = text.split("\n>")
    if chunks and chunks[0].startswith(">"):
        chunks[0] = chunks[0][1:]
    elif chunks and not chunks[0].strip():
        chunks = chunks[1:]
    recs = pa.array(chunks, pa.string())
    parts = pc.split_pattern(recs, "\n", max_splits=1)
    rec_id = pc.list_element(parts, 0)
    # gather each record's LAST split part (its body; for header-only
    # records that's the header, which the mask discards as "")
    n_parts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(parts)
    last_idx = np.cumsum(n_parts) - 1
    body = pc.if_else(
        pa.array(n_parts > 1),
        flat.take(pa.array(last_idx)) if len(n_parts) else flat,
        pa.scalar(""),
    )
    # strip interior + trailing newlines from multi-line bodies
    seq = pc.replace_substring(body, "\n", "")
    return pa.table({"rec_id": rec_id, "seq": seq})


def parse_fastq_bytes(data: bytes) -> pa.Table:
    """One FASTQ file -> (rec_id, seq, qual) via the reference's
    lines%4 framing (id line sans '@' is the record key,
    main_search.cpp:761-766)."""
    text = data.decode("utf-8")
    lines = pa.array(text.split("\n"), pa.string())
    n = (len(lines) // 4) * 4
    idx_id = np.arange(0, n, 4, dtype=np.int64)
    ids = pc.replace_substring_regex(lines.take(idx_id), "^@", "")
    return pa.table({
        "rec_id": ids,
        "seq": lines.take(idx_id + 1),
        "qual": lines.take(idx_id + 3),
    })


def _reader(parse):
    def read_files(batch: pa.Table) -> pa.Table:
        tables = [
            parse(row)
            for row in batch["bytes"].to_pylist()  # per FILE, not per record
        ]
        return pa.concat_tables(tables) if tables else parse(b"")

    return read_files


def read_fasta(paths, **read_kwargs):
    """Dataset of (rec_id, seq) from FASTA files; parallelism = files."""
    import ray.data as rd

    return rd.read_binary_files(paths, **read_kwargs).map_batches(
        _reader(parse_fasta_bytes), batch_format="pyarrow"
    )


def read_fastq(paths, **read_kwargs):
    import ray.data as rd

    return rd.read_binary_files(paths, **read_kwargs).map_batches(
        _reader(parse_fastq_bytes), batch_format="pyarrow"
    )


# --- writers (S5-shaped: one file per block) ----------------------------

def _escape(col: pa.Array) -> pa.Array:
    # record framing is line-based; payload newlines would tear records
    return pc.replace_substring(col, "\n", " ")


def _blob(records) -> bytes:
    """Concatenate a string column of per-record framings into one file
    blob: a large_binary cast exposes the records as ONE contiguous
    Arrow buffer, so this is a single memcpy, not a per-row join."""
    from consult_ray.functions.textnorm import binary_view

    if isinstance(records, pa.ChunkedArray):
        records = records.combine_chunks()
    buf, offsets = binary_view(records)
    return buf[offsets[0]:offsets[-1]].tobytes()


def write_fasta_shards(ds, out_dir: str, text_col: str = "text",
                       id_col: str = "doc_id") -> int:
    """Write one .fa file per block (vectorized join, one buffer write
    per file). Returns total records written. Caller owns dir lifecycle/
    commit markers."""
    import os

    def dump(batch: pa.Table) -> pa.Table:
        body = pc.binary_join_element_wise(
            ">", pc.cast(batch[id_col], pa.string()), "\n",
            _escape(batch[text_col]), "\n", "",
        )
        blob = _blob(body)
        import hashlib

        # per-task random suffix: prefix+length hashes can collide
        # (identical leading records / empty blocks would overwrite)
        name = (hashlib.md5(blob[:256] + str(len(blob)).encode())
                .hexdigest()[:16] + "-" + os.urandom(6).hex())
        with open(os.path.join(out_dir, f"{name}.fa"), "wb") as f:
            f.write(blob)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    total = 0
    for r in ds.map_batches(dump, batch_format="pyarrow").take_all():
        total += r["n"]
    return total


def write_fastq_shards(ds, out_dir: str, text_col: str = "text",
                       id_col: str = "doc_id") -> int:
    import os

    def dump(batch: pa.Table) -> pa.Table:
        seq = _escape(batch[text_col])
        # constant-quality line of the same length as seq ('I' repeated):
        # one flat fill + offsets, no per-row string building
        lens = pc.utf8_length(seq).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        qbuf = np.full(int(offs[-1]), ord("I"), dtype=np.uint8)
        qual = pa.Array.from_buffers(
            pa.large_binary(), len(lens),
            [None, pa.py_buffer(offs), pa.py_buffer(qbuf)],
        ).cast(pa.large_string()).cast(pa.string())
        body = pc.binary_join_element_wise(
            "@", pc.cast(batch[id_col], pa.string()), "\n", seq,
            "\n+\n", qual, "\n", "",
        )
        blob = _blob(body)
        import hashlib

        name = (hashlib.md5(blob[:256] + str(len(blob)).encode())
                .hexdigest()[:16] + "-" + os.urandom(6).hex())
        with open(os.path.join(out_dir, f"{name}.fq"), "wb") as f:
            f.write(blob)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    total = 0
    for r in ds.map_batches(dump, batch_format="pyarrow").take_all():
        total += r["n"]
    return total
