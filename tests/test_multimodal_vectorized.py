"""Value-equality contract: the vectorized multimodal stub kernels must
match the original per-row forms exactly (features bit-equal, payload
slices byte-equal), including null/empty payloads and sliced inputs."""

import numpy as np
import pyarrow as pa

from consult_ray.functions.hashing import splitmix64
from consult_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    DeterministicFakeDecoder,
    DeterministicFakeResizer,
    DeterministicFrameSampler,
    make_fake_media_table,
)


def _decode_rows(batch: pa.Table, dim: int, seed: int) -> list:
    seeds = splitmix64(np.arange(dim, dtype=np.uint64) + np.uint64(seed))
    out = []
    for p in batch["payload"].to_pylist():
        p = p or b""
        h = np.uint64(len(p))
        step = max(1, len(p) // 64)
        sample = np.frombuffer(p[::step][:64], dtype=np.uint8).astype(np.uint64)
        base = splitmix64(sample.sum() + h) if len(sample) else splitmix64(h)
        out.append(
            ((splitmix64(seeds ^ base).astype(np.float64) / 2**64).astype(np.float32)).tolist()
        )
    return out


def _resize_rows(batch: pa.Table, w: int, h: int):
    target = w * h // 256 + 16
    payload, ow, oh = [], [], []
    for k, p in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist()):
        p = p or b""
        if k == "image" and len(p):
            step = max(1, len(p) // target)
            payload.append(p[::step][:target])
            ow.append(w)
            oh.append(h)
        else:
            payload.append(p)
            ow.append(-1 if k != "image" else w)
            oh.append(-1 if k != "image" else h)
    return payload, ow, oh


def _frames_rows(batch: pa.Table, F: int):
    rows = []
    for mid, k, p, dur in zip(
        batch["media_id"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["payload"].to_pylist(),
        batch["duration_ms"].to_pylist(),
    ):
        if k != "video":
            continue
        p = p or b""
        dur = max(0, dur or 0)
        for j in range(F):
            lo, hi = len(p) * j // F, len(p) * (j + 1) // F
            rows.append((mid, j, dur * j // max(1, F), p[lo:hi]))
    return rows


def _edge_table() -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "kind": pa.array(["image", "video", "audio", "video", "image", "video"]),
            "payload": pa.array(
                [b"", None, b"abc", b"0123456789" * 40, b"x" * 100000, b"ab"],
                pa.large_binary(),
            ),
            "mime": pa.array(["m"] * 6),
            "width": pa.array([1, -1, -1, -1, 9, -1], pa.int32()),
            "height": pa.array([1, -1, -1, -1, 9, -1], pa.int32()),
            "duration_ms": pa.array([-1, 5000, 0, 777, -5, 1], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def test_decoder_matches_rows():
    for tbl in (make_fake_media_table(80, seed=5), _edge_table()):
        for sl in (tbl, tbl.slice(1, 4)):
            got = DeterministicFakeDecoder(dim=8, seed=9)(sl)["features"].to_pylist()
            assert got == _decode_rows(sl, 8, 9)


def test_resizer_matches_rows():
    for tbl in (make_fake_media_table(80, seed=5), _edge_table()):
        for sl in (tbl, tbl.slice(1, 4)):
            out = DeterministicFakeResizer(96, 64)(sl)
            payload, ow, oh = _resize_rows(sl, 96, 64)
            assert out["payload"].to_pylist() == payload
            assert out["width"].to_pylist() == ow
            assert out["height"].to_pylist() == oh
            # untouched columns ride through
            assert out["media_id"].to_pylist() == sl["media_id"].to_pylist()


def test_frame_sampler_matches_rows():
    for tbl in (make_fake_media_table(80, seed=5), _edge_table()):
        for sl in (tbl, tbl.slice(1, 4)):
            out = DeterministicFrameSampler(n_frames=4)(sl)
            want = _frames_rows(sl, 4)
            got = list(
                zip(
                    out["media_id"].to_pylist(),
                    out["frame_idx"].to_pylist(),
                    out["ts_ms"].to_pylist(),
                    out["frame"].to_pylist(),
                )
            )
            assert got == want


def test_frame_sampler_no_videos_empty():
    tbl = _edge_table().filter(pa.compute.equal(pa.array(["x"] * 6), "y"))
    out = DeterministicFrameSampler(n_frames=4)(_edge_table().slice(0, 1))
    assert out.num_rows == 0
    assert out.schema.names == ["media_id", "frame_idx", "ts_ms", "frame"]
