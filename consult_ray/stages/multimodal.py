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
