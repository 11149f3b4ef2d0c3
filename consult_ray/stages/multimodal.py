"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): `DeterministicFakeDecoder` produces a seeded,
content-determined feature vector so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and testable,
and `LibraryDecoder` raises NotImplementedError at the exact point a
real PIL/libsndfile call would go.

Batch-size guidance baked into `recommended_batch_size`: large binary
payloads need SMALL batches so batch x concurrency fits in a worker
heap (ray_guide.md pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from consult_ray.functions.hashing import splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.large_binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),           # -1 when N/A
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def recommended_batch_size(avg_payload_bytes: int, worker_heap_bytes: int = 2 << 30,
                           safety: float = 8.0) -> int:
    """Batch size so decode intermediate (~safety x payload) fits the heap."""
    per_row = max(1, int(avg_payload_bytes * safety))
    return max(1, min(4096, worker_heap_bytes // per_row))


class DeterministicFakeDecoder:
    """Actor-pool stage: payload bytes -> fixed-dim feature vector.

    Stub for a real decode+embed stage: the feature is a seeded hash
    cascade of the payload, so it is deterministic, content-sensitive,
    and schema-identical to what a real model head would emit.
    """

    def __init__(self, dim: int = 32, seed: int = 42):
        # per-actor setup (the analog of loading a model once)
        self.dim = dim
        self.seeds = splitmix64(np.arange(dim, dtype=np.uint64) + np.uint64(seed))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            h = np.uint64(len(p))
            # sample up to 64 bytes deterministically for the content hash
            step = max(1, len(p) // 64)
            sample = np.frombuffer(p[:: step][:64], dtype=np.uint8).astype(np.uint64)
            base = splitmix64(sample.sum() + h) if len(sample) else splitmix64(h)
            feats[i] = (
                splitmix64(self.seeds ^ base).astype(np.float64) / 2**64
            ).astype(np.float32)
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), self.dim)
        )


class LibraryDecoder:
    """Where a real decoder would plug in. Import-gated: constructing it
    without the optional dependency raises NotImplementedError (per the
    build contract: stub clearly, keep plumbing real)."""

    def __init__(self, kind: str = "image"):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real media decoding requires an image/audio library not "
                "present in this environment; use DeterministicFakeDecoder"
            ) from e
        self.kind = kind

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


class DeterministicFakeResizer:
    """Actor-pool resize stage (image rows): emits a new payload whose
    bytes are a deterministic stride-subsample of the original sized to
    the target dimensions, with width/height updated; non-image rows
    pass through untouched. A real stage would swap the subsample for a
    PIL resize — the schema contract and actor shape are identical."""

    def __init__(self, width: int = 224, height: int = 224):
        self.w, self.h = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        target = self.w * self.h // 256 + 16  # fake encoded size
        out_payload, out_w, out_h = [], [], []
        for k, p in zip(kinds, payloads):
            p = p or b""
            if k == "image" and len(p):
                step = max(1, len(p) // target)
                out_payload.append(p[::step][:target])
                out_w.append(self.w)
                out_h.append(self.h)
            else:
                out_payload.append(p)
                out_w.append(-1 if k != "image" else self.w)
                out_h.append(-1 if k != "image" else self.h)
        cols = {name: batch[name] for name in batch.column_names}
        cols["payload"] = pa.array(out_payload, pa.large_binary())
        cols["width"] = pa.array(np.asarray(out_w, dtype=np.int32))
        cols["height"] = pa.array(np.asarray(out_h, dtype=np.int32))
        return pa.table(cols)


class DeterministicFrameSampler:
    """Actor-pool frame-sampling stage (video rows): expands each video
    into n_frames rows (media_id, frame_idx, ts_ms, payload slice) — the
    row-expansion pattern a real ffmpeg frame grab would use. Non-video
    rows are dropped (they belong to other branches of the pipeline)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        ids = batch["media_id"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
        for mid, k, p, dur in zip(ids, kinds, payloads, durs):
            if k != "video":
                continue
            p = p or b""
            dur = max(0, dur or 0)
            for j in range(self.n_frames):
                lo = len(p) * j // self.n_frames
                hi = len(p) * (j + 1) // self.n_frames
                out["media_id"].append(mid)
                out["frame_idx"].append(j)
                out["ts_ms"].append(dur * j // max(1, self.n_frames))
                out["frame"].append(p[lo:hi])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "ts_ms": pa.array(out["ts_ms"], pa.int32()),
            "frame": pa.array(out["frame"], pa.large_binary()),
        })


def make_fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Synthetic media table matching MEDIA_SCHEMA for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([kinds[i % 3] for i in range(n)]),
        "payload": pa.array(
            [rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
             for _ in range(n)],
            pa.large_binary(),
        ),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array(rng.integers(-1, 1920, n).astype(np.int32)),
        "height": pa.array(rng.integers(-1, 1080, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(-1, 60000, n).astype(np.int32)),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
