"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns exactly like the
page table's ``html``.  The Ray-side plumbing — schema, actor-pool stage
shape, small batch sizes for wide rows, output layout — is real and tested;
the codec itself is STUBBED because no image/audio libraries exist in this
container:

* ``DecodeImageStub`` raises ``NotImplementedError`` when asked for a real
  decode (``strict=True``), and otherwise produces a DETERMINISTIC FAKE
  decode: metadata and a feature vector derived purely from the payload
  bytes (documented, seeded, reproducible) so downstream stages and tests
  exercise the full dataflow.

A real deployment replaces ``_fake_decode`` with PIL/ffmpeg calls in
``__init__``-loaded codecs; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches.hashing import hash64, splitmix64

FEATURE_DIM = 8


def _fake_decode(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic fake decode: width/height from byte-length arithmetic,
    features from a seeded hash chain of the payload bytes.  Accepts an
    Arrow binary array (zero-copy hashing/lengths) or a list of bytes."""
    import pyarrow.compute as pc

    if isinstance(payloads, pa.ChunkedArray):
        payloads = payloads.combine_chunks()
    if isinstance(payloads, pa.Array):
        arr = payloads.fill_null(b"") if payloads.null_count else payloads
        lens = pc.binary_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
    else:
        arr = [p or b"" for p in payloads]
        lens = np.array([len(b) for b in arr], dtype=np.int64)
    n = len(lens)
    feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
    h0 = hash64(arr)
    for j in range(FEATURE_DIM):
        hj = splitmix64(h0 ^ np.uint64(0x9E3779B97F4A7C15 * (j + 1) & 0xFFFFFFFFFFFFFFFF))
        feats[:, j] = (hj.astype(np.float64) / 2**64).astype(np.float32)
    widths = (16 + (lens % 1024)).astype(np.int32)
    heights = (16 + ((lens // 1024) % 1024)).astype(np.int32)
    return widths, heights, feats


class DecodeImageStub:
    """Actor-pool stage over a binary payload column.

    STUB: real decoding unavailable in this environment.  With
    ``strict=True`` the stage raises NotImplementedError (the behavior a
    production build would override); default is the deterministic fake.
    Use small ``batch_size`` (e.g. 64) — payload rows are wide."""

    def __init__(self, payload_col: str = "html", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; run with strict=False for the deterministic stub"
            )
        w, h, feats = _fake_decode(batch.column(self.payload_col))
        batch = batch.append_column("img_width", pa.array(w, type=pa.int32()))
        batch = batch.append_column("img_height", pa.array(h, type=pa.int32()))
        batch = batch.append_column(
            "img_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
            ),
        )
        return batch.drop_columns([self.payload_col])


def decode_images(ds, payload_col: str = "html", batch_size: int = 64, concurrency=None):
    """Wide-row actor stage: deliberately small batches so
    batch_size × concurrency payload bytes fit worker heaps."""
    return ds.map_batches(
        DecodeImageStub,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )


class FrameSampleStub:
    """Video frame-sampling stage shape: emits one row per sampled 'frame'
    (flat_map semantics via map_batches returning more rows than input).
    Frame count/positions derive deterministically from payload length."""

    def __init__(self, payload_col: str = "html", every_n_bytes: int = 4096, max_frames: int = 4):
        self.payload_col = payload_col
        self.every = every_n_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.binary_length(
            pc.fill_null(batch.column(self.payload_col), b"")
        ).to_numpy(zero_copy_only=False)
        n_frames = np.clip(lens // self.every, 1, self.max_frames).astype(np.int64)
        # vectorized fan-out: repeat each source row n_frames[i] times via a
        # single take, then attach per-frame index/offset columns
        rep_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_frames)
        total = int(n_frames.sum())
        frame_index = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_frames)[:-1])), n_frames
        )
        keys = [c for c in batch.column_names if c != self.payload_col]
        t = batch.select(keys).take(pa.array(rep_idx))
        t = t.append_column("frame_index", pa.array(frame_index, type=pa.int64()))
        t = t.append_column(
            "frame_offset", pa.array(frame_index * self.every, type=pa.int64())
        )
        return t


class ResizeStub:
    """Aspect-preserving fit-into-box resize stage.

    STUB like ``DecodeImageStub``: the pixel resample itself needs an image
    library this container lacks, but the part a pipeline depends on — the
    output geometry — is the REAL integer arithmetic any resizer uses, so
    downstream layout/batching decisions (and the oracle) are exact:

    * already inside the box → unchanged
    * width-bound (w·max_h ≥ h·max_w) → (max_w, max(1, h·max_w // w))
    * height-bound otherwise → (max(1, w·max_h // h), max_h)

    Pure vectorized np.where over the metadata columns — payloads are
    untouched (a production build resamples them here)."""

    def __init__(
        self,
        max_w: int = 224,
        max_h: int = 224,
        width_col: str = "img_width",
        height_col: str = "img_height",
    ):
        if max_w <= 0 or max_h <= 0:
            raise ValueError(f"target box must be positive, got {max_w}x{max_h}")
        self.max_w = int(max_w)
        self.max_h = int(max_h)
        self.width_col = width_col
        self.height_col = height_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column(self.width_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column(self.height_col).to_numpy(zero_copy_only=False).astype(np.int64)
        fits = (w <= self.max_w) & (h <= self.max_h)
        width_bound = w * self.max_h >= h * self.max_w
        out_w = np.where(
            fits, w, np.where(width_bound, self.max_w, np.maximum(1, w * self.max_h // np.maximum(h, 1)))
        )
        out_h = np.where(
            fits, h, np.where(width_bound, np.maximum(1, h * self.max_w // np.maximum(w, 1)), self.max_h)
        )
        batch = batch.append_column("resize_w", pa.array(out_w.astype(np.int32)))
        return batch.append_column("resize_h", pa.array(out_h.astype(np.int32)))


def resize_images(ds, max_w: int = 224, max_h: int = 224, concurrency=None):
    """Actor-pool wrapper mirroring ``decode_images`` (metadata-only today,
    so batches can be larger than the decode stage's)."""
    return ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
