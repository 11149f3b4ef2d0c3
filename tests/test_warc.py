"""WARC source (sources/warc.py): byte-exact round-trip under hostile
payloads (record separators / fake headers inside the body), multi-file
parallel read, and empty-input schema stability."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from consult_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_shards,
)

_EPOCH_US = 1_500_000_000_000_000


def _pages(payloads):
    return pa.table({
        "url": pa.array([f"https://ex.com/{i}" for i in range(len(payloads))]),
        "ts_us": pa.array(
            [_EPOCH_US + i * 1_000_000 for i in range(len(payloads))],
            pa.int64(),
        ),
        "payload": pa.array(payloads, pa.large_binary()),
    })


def test_hostile_payload_roundtrip(ray_session, tmp_path):
    # payloads containing the record separator, a fake WARC header, NULs
    # and non-utf8 bytes: Content-Length framing must carry them intact
    payloads = [
        b"plain body",
        b"evil\r\n\r\nWARC/1.0\r\nWARC-Target-URI: https://fake/\r\n"
        b"Content-Length: 99\r\n\r\nnot a record",
        b"\x00\xff\xfe binary \r\n\r\n bytes",
        b"",  # zero-length payload
    ]
    ds = rd.from_arrow(_pages(payloads))
    n = write_warc_shards(ds, str(tmp_path))
    assert n == len(payloads)
    out = read_warc([str(p) for p in tmp_path.iterdir()]).to_pandas()
    out = out.sort_values("url", ignore_index=True)
    assert len(out) == len(payloads)
    for i, p in enumerate(payloads):
        row = out[out.url == f"https://ex.com/{i}"].iloc[0]
        assert bytes(row.payload) == p
        assert row.warc_date == "2017-07-14T02:40:00Z" if i == 0 else True


def test_date_formatting(ray_session, tmp_path):
    ds = rd.from_arrow(_pages([b"x"]))
    write_warc_shards(ds, str(tmp_path))
    blob = next(tmp_path.iterdir()).read_bytes()
    t = parse_warc_bytes(blob)
    import datetime

    want = datetime.datetime.fromtimestamp(
        _EPOCH_US / 1e6, datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    assert t["warc_date"][0].as_py() == want


def test_parse_empty_and_truncated():
    empty = parse_warc_bytes(b"")
    assert empty.num_rows == 0
    assert empty.column_names == ["url", "warc_date", "payload"]
    # a torn trailing record (header without separator) parses what is
    # whole and stops cleanly
    ds_tbl = _pages([b"abc"])
    import ray.data as rd_

    # build one valid record blob via the writer path
    rec = None
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        write_warc_shards(rd_.from_arrow(ds_tbl), d)
        rec = open(os.path.join(d, os.listdir(d)[0]), "rb").read()
    torn = rec + b"WARC/1.0\r\nWARC-Target-URI: https://torn/"
    t = parse_warc_bytes(torn)
    assert t.num_rows == 1
    assert t["payload"][0].as_py() == b"abc"
