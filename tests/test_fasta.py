"""FASTA/FASTQ source readers (S1/S3): record framing, multi-line
sequences, and the Ray round-trip (export -> read_binary_files ->
Arrow parse)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from consult_ray.sources.fasta import (
    parse_fasta_bytes,
    parse_fastq_bytes,
    read_fasta,
    read_fastq,
    write_fasta_shards,
    write_fastq_shards,
)


def test_parse_fasta_multiline_and_empty_records():
    data = b">a desc\nACGT\nTTGG\n>b\n\n>c\nXYZ\n"
    t = parse_fasta_bytes(data).to_pydict()
    assert t["rec_id"] == ["a desc", "b", "c"]
    assert t["seq"] == ["ACGTTTGG", "", "XYZ"]


def test_parse_fasta_empty_file():
    t = parse_fasta_bytes(b"")
    assert t.num_rows == 0
    assert t.column_names == ["rec_id", "seq"]


def test_parse_fastq_framing():
    data = b"@r1\nACGT\n+\nIIII\n@r2\nGG\n+anything\nII\n"
    t = parse_fastq_bytes(data).to_pydict()
    assert t["rec_id"] == ["r1", "r2"]
    assert t["seq"] == ["ACGT", "GG"]
    assert t["qual"] == ["IIII", "II"]


def test_fasta_roundtrip_ray(ray_session, tmp_path):
    import os

    texts = ["hello world", "with\nnewline", "", "unicode é ü"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts),
    })
    d = str(tmp_path / "fa")
    os.makedirs(d)
    n = write_fasta_shards(rd.from_arrow(tbl), d)
    assert n == 4
    files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".fa")]
    got = read_fasta(files).to_pandas()
    got["doc_id"] = got["rec_id"].astype("int64")
    got = got.sort_values("doc_id", ignore_index=True)
    # newlines were escaped to spaces at export (length-preserving)
    assert got["seq"].tolist() == [t.replace("\n", " ") for t in texts]


def test_fastq_roundtrip_ray(ray_session, tmp_path):
    import os

    texts = ["abc", "", "qrs tuv"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts),
    })
    d = str(tmp_path / "fq")
    os.makedirs(d)
    n = write_fastq_shards(rd.from_arrow(tbl), d)
    assert n == 3
    files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".fq")]
    got = read_fastq(files).to_pandas()
    got["doc_id"] = got["rec_id"].astype("int64")
    got = got.sort_values("doc_id", ignore_index=True)
    assert got["seq"].tolist() == texts
    assert [len(q) for q in got["qual"]] == [len(t) for t in texts]
