"""WARC-style source reader/writer — the container format Common-Crawl
pages actually arrive in (ISO 28500 framing: a CRLF-terminated header
block, then a payload whose size is governed by Content-Length, then a
blank-line record separator). Same scale contract as fasta.py: the FILE
is the unit of parallelism (`ray.data.read_binary_files`, one work item
per file — the reference's scheduler shape, main_search.cpp:684-707),
records never straddle files, per-task memory = one file.

The writer is fully vectorized: headers are built with ONE
binary_join_element_wise over the batch and payloads are spliced in by
a second join — no per-record Python, and payload bytes are framed by
length, NOT escaped (the whole point of Content-Length framing: any
byte sequence round-trips exactly). The reader's only loop is the
per-RECORD framing hop within one file: a binary payload may contain
any delimiter byte sequence, so hopping by Content-Length is the only
correct parse (what warcio does); the loop body is O(1) find+slice and
the payload bytes are never copied per byte.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEP = b"\r\n\r\n"


def parse_warc_bytes(data: bytes) -> pa.Table:
    """One WARC file -> (url: string, warc_date: string,
    payload: large_binary)."""
    urls: list[str] = []
    dates: list[str] = []
    payloads: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            break
        fields: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        clen = int(fields["Content-Length"])
        body_start = hdr_end + len(_SEP)
        urls.append(fields.get("WARC-Target-URI", ""))
        dates.append(fields.get("WARC-Date", ""))
        payloads.append(data[body_start : body_start + clen])
        pos = body_start + clen + len(_SEP)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_date": pa.array(dates, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


def read_warc(paths, **read_kwargs):
    """Dataset of (url, warc_date, payload) from WARC files;
    parallelism = file count."""
    import ray.data as rd

    def read_files(batch: pa.Table) -> pa.Table:
        tables = [
            parse_warc_bytes(row)
            for row in batch["bytes"].to_pylist()  # per FILE, not per record
        ]
        return pa.concat_tables(tables) if tables else parse_warc_bytes(b"")

    return rd.read_binary_files(paths, **read_kwargs).map_batches(
        read_files, batch_format="pyarrow"
    )


def write_warc_shards(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "ts_us",
    payload_col: str = "payload",
) -> int:
    """Write one .warc file per block. ts_col is epoch microseconds
    (int64), formatted as the WARC-Date ISO-8601 string; payload_col is
    binary (or string, cast losslessly to its utf-8 bytes). Returns
    total records. Caller owns dir lifecycle/commit markers."""
    import hashlib
    import os

    from consult_ray.sources.fasta import _blob

    def dump(batch: pa.Table) -> pa.Table:
        payload = batch[payload_col]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        payload = payload.cast(pa.large_binary())
        # Arrow's %S prints fractional seconds at sub-second units; WARC
        # dates are whole seconds, so format at second resolution (our
        # epoch-us inputs are exact seconds — the cast is lossless)
        date = pc.strftime(
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.timestamp("s")),
            format="%Y-%m-%dT%H:%M:%SZ",
        )
        clen = pc.cast(pc.binary_length(payload), pa.string())
        hdr = pc.binary_join_element_wise(
            "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: ",
            batch[url_col].cast(pa.string()),
            "\r\nWARC-Date: ", date,
            "\r\nContent-Length: ", clen, "\r\n\r\n", "",
        )
        rec = pc.binary_join_element_wise(
            hdr.cast(pa.large_binary()), payload,
            pa.scalar(_SEP, pa.large_binary()),
            pa.scalar(b"", pa.large_binary()),
        )
        blob = _blob(rec)
        # content hash alone can collide (two blocks sharing a 256-byte
        # prefix + length, or multiple empty blocks, would silently
        # overwrite); a per-task random component makes names unique
        name = (
            hashlib.md5(blob[:256] + str(len(blob)).encode()).hexdigest()[:16]
            + "-" + os.urandom(6).hex()
        )
        with open(os.path.join(out_dir, f"{name}.warc"), "wb") as f:
            f.write(blob)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    total = 0
    for r in ds.map_batches(dump, batch_format="pyarrow").take_all():
        total += r["n"]
    return total
