"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels are import-gated (no image/audio libraries in this
environment): `DeterministicFakeDecoder` produces a seeded,
content-determined feature vector so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and testable;
`LibraryDecoder` carries the REAL PIL decode path (RGB decode + true
dimensions + 4x4 mean-pooled features) and raises NotImplementedError
at construction where PIL is absent.

Batch-size guidance baked into `recommended_batch_size`: large binary
payloads need SMALL batches so batch x concurrency fits in a worker
heap (ray_guide.md pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from consult_ray.functions.hashing import splitmix64
from consult_ray.functions.textnorm import binary_view


def _payload_view(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bytes view, offsets, per-row lengths) for a binary column, with
    null rows forced to length 0 (the scalar kernels treated null as
    b''). Zero-copy from the Arrow buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf, offsets = binary_view(col)
    lens = np.diff(offsets)
    if col.null_count:
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        lens = np.where(valid, lens, 0)
    return buf, offsets, lens


def _strided_gather(
    buf: np.ndarray, starts: np.ndarray, steps: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather counts[i] bytes from buf at starts[i] + k*steps[i] for
    every row at once (the vectorized form of `p[::step][:count]`).
    Returns (flat bytes, row ids of each gathered byte)."""
    n = len(starts)
    total = int(counts.sum())
    row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    cstart = np.concatenate(([0], np.cumsum(counts)))
    intra = np.arange(total, dtype=np.int64) - cstart[row_ids]
    return buf[starts[row_ids] + intra * steps[row_ids]], row_ids

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
        # vectorized over the batch's concatenated payload buffer: one
        # strided gather samples <=64 bytes per row, one bincount sums
        # them, one (n, dim) splitmix cascade emits all features —
        # value-identical to the per-row form (pytest contract)
        buf, offsets, lens = _payload_view(batch["payload"])
        n = len(lens)
        steps = np.maximum(1, lens // 64)
        counts = np.minimum(64, -(-lens // steps))
        sample, row_ids = _strided_gather(buf, offsets[:-1], steps, counts)
        # byte sums are <= 64*255, exact in the float64 bincount weights
        sums = np.bincount(row_ids, weights=sample.astype(np.int64), minlength=n)
        base = splitmix64(sums.astype(np.uint64) + lens.astype(np.uint64))
        feats = (
            splitmix64(self.seeds[None, :] ^ base[:, None]).astype(np.float64)
            / 2**64
        ).astype(np.float32)
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), self.dim)
        )


def pool_rgb_features(a: np.ndarray) -> np.ndarray:
    """4x4 mean-pooled RGB feature (48 floats in [0, 1]) of a decoded
    (h, w, 3) float32 image array — the codec-independent half of
    LibraryDecoder, split out so the real feature math is unit-testable
    without the optional image library."""
    h, w = a.shape[:2]
    ys = (np.arange(h) * 4) // max(h, 1)
    xs = (np.arange(w) * 4) // max(w, 1)
    pooled = np.zeros((4, 4, 3), dtype=np.float64)
    counts = np.zeros((4, 4), dtype=np.int64)
    np.add.at(pooled, (ys[:, None], xs[None, :]), a)
    np.add.at(counts, (ys[:, None], xs[None, :]), 1)
    pooled /= np.maximum(counts, 1)[..., None]
    return (pooled.reshape(-1) / 255.0).astype(np.float32)


class LibraryDecoder:
    """The real decode stage, import-gated: constructing it without the
    optional dependency raises NotImplementedError (per the build
    contract: stub clearly, keep plumbing real). Where PIL IS installed
    the stage is live: image payloads decode to RGB and emit true
    (width, height) plus a 48-dim 4x4 mean-pooled RGB feature — the
    same output schema family as DeterministicFakeDecoder, so swapping
    stages is a constructor change, not a pipeline change.

    Decode is inherently per-payload (an encoded image is one opaque
    value); batch-level vectorization happens AROUND the codec — arrow
    buffer slicing in, one stacked numpy reduction per batch out — and
    throughput scales with the actor pool, the same shape as any model
    inference stage."""

    FEAT_DIM = 48  # 4x4 grid x RGB

    def __init__(self, kind: str = "image"):
        try:
            import PIL.Image as PILImage
        except ImportError as e:
            raise NotImplementedError(
                "real media decoding requires an image/audio library not "
                "present in this environment; use DeterministicFakeDecoder"
            ) from e
        self._Image = PILImage
        self.kind = kind

    def _decode_one(self, payload: memoryview):  # pragma: no cover - needs PIL
        import io

        import numpy as np

        try:
            img = self._Image.open(io.BytesIO(payload)).convert("RGB")
        except Exception:
            return -1, -1, np.zeros(self.FEAT_DIM, dtype=np.float32)
        a = np.asarray(img, dtype=np.float32)
        h, w = a.shape[:2]
        return w, h, pool_rgb_features(a)

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - needs PIL
        import numpy as np

        buf, offsets, lens = _payload_view(batch["payload"])
        mv = memoryview(buf)
        ws = np.full(batch.num_rows, -1, dtype=np.int32)
        hs = np.full(batch.num_rows, -1, dtype=np.int32)
        feats = np.zeros((batch.num_rows, self.FEAT_DIM), dtype=np.float32)
        kinds = pc.fill_null(pc.equal(batch["kind"], self.kind), False)
        kinds = kinds.to_numpy(zero_copy_only=False).astype(bool)
        for i in np.flatnonzero(kinds & (lens > 0)):
            ws[i], hs[i], feats[i] = self._decode_one(
                mv[offsets[i] : offsets[i] + lens[i]]
            )
        cols = {name: batch[name] for name in batch.column_names}
        cols["width"] = pa.array(np.where(kinds, ws, -1).astype(np.int32))
        cols["height"] = pa.array(np.where(kinds, hs, -1).astype(np.int32))
        cols["features"] = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.FEAT_DIM
        )
        return pa.table(cols)


class DeterministicFakeResizer:
    """Actor-pool resize stage (image rows): emits a new payload whose
    bytes are a deterministic stride-subsample of the original sized to
    the target dimensions, with width/height updated; non-image rows
    pass through untouched. A real stage would swap the subsample for a
    PIL resize — the schema contract and actor shape are identical."""

    def __init__(self, width: int = 224, height: int = 224):
        self.w, self.h = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one strided gather builds every output payload at once:
        # image rows subsample to the target size, other rows identity-
        # copy (step 1, count = len) — no per-row Python
        buf, offsets, lens = _payload_view(batch["payload"])
        n = len(lens)
        is_img = np.asarray(
            pc.fill_null(pc.equal(batch["kind"], "image"), False).to_numpy(
                zero_copy_only=False
            ),
            dtype=bool,
        )
        target = self.w * self.h // 256 + 16  # fake encoded size
        resize = is_img & (lens > 0)
        steps = np.where(resize, np.maximum(1, lens // target), 1)
        counts = np.where(resize, np.minimum(target, -(-lens // steps)), lens)
        out_buf, _ = _strided_gather(buf, offsets[:-1], steps, counts)
        out_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        payload = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [None, pa.py_buffer(out_offsets), pa.py_buffer(np.ascontiguousarray(out_buf))],
        )
        cols = {name: batch[name] for name in batch.column_names}
        cols["payload"] = payload
        cols["width"] = pa.array(np.where(is_img, self.w, -1).astype(np.int32))
        cols["height"] = pa.array(np.where(is_img, self.h, -1).astype(np.int32))
        return pa.table(cols)


class DeterministicFrameSampler:
    """Actor-pool frame-sampling stage (video rows): expands each video
    into n_frames rows (media_id, frame_idx, ts_ms, payload slice) — the
    row-expansion pattern a real ffmpeg frame grab would use. Non-video
    rows are dropped (they belong to other branches of the pipeline)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        # a video's n_frames slices tile its payload exactly, so the
        # output frame column REUSES the filtered payload buffer
        # zero-copy — only the (nv*F+1) offsets are computed, as one
        # broadcasted integer expression
        F = self.n_frames
        vid = batch.filter(pc.equal(batch["kind"], "video"))
        nv = vid.num_rows
        buf, offsets, lens = _payload_view(vid["payload"])
        if lens.size and (lens != np.diff(offsets)).any():
            # a null row with a nonzero buffer extent breaks the tiling
            # assumption; compact to a fresh buffer (identity gather)
            buf, _ = _strided_gather(
                buf, offsets[:-1], np.ones(nv, np.int64), lens
            )
            offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        j = np.arange(F, dtype=np.int64)
        frame_offs = offsets[:-1, None] + (lens[:, None] * j[None, :]) // F
        flat_offsets = np.concatenate(
            (frame_offs.reshape(-1), offsets[-1:])
        ).astype(np.int64)
        frames = pa.Array.from_buffers(
            pa.large_binary(),
            nv * F,
            [None, pa.py_buffer(np.ascontiguousarray(flat_offsets)), pa.py_buffer(buf)],
        )
        durs = np.maximum(
            pc.fill_null(vid["duration_ms"], 0).to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        ts = ((durs[:, None] * j[None, :]) // max(1, F)).reshape(-1)
        return pa.table({
            "media_id": pa.array(
                np.repeat(
                    vid["media_id"].to_numpy(zero_copy_only=False), F
                ).astype(np.int64),
                pa.int64(),
            ),
            "frame_idx": pa.array(np.tile(j, nv).astype(np.int32)),
            "ts_ms": pa.array(ts.astype(np.int32)),
            "frame": frames,
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
