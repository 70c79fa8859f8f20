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

The REAL codec path exists behind the same interface
(``DecodeImageStub(codec="auto")``): ``ImageCodec`` optional-imports PIL
once per actor in ``__init__`` (the actor-pool pattern — never per
batch), and additionally carries pure-numpy decoders for BMP and
PPM/PGM, so genuinely real pixel decoding works even in this
library-free container for those formats; payloads no codec can decode
fall back to the deterministic fake (or raise with ``strict=True``).
Video frames go through the same seam: ``VideoCodec`` probes for an
``ffmpeg`` binary per actor (``FrameSampleStub(codec='auto')``) and
splits its concatenated-PPM output with the built-in netpbm scanner.
Audio decodes for REAL too: ``AudioCodec`` parses RIFF/WAV (integer
8/16/32-bit + float32 PCM) and Sun AU with pure numpy — no library at
all — and ``DecodeAudioStub(codec='auto')`` emits real sample-rate /
frame-count / signal-statistics features with the deterministic fake as
the per-payload fallback.
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


class ImageCodec:
    """Per-actor real image codec: PIL when importable (optional import —
    once in ``__init__``, never per batch), plus pure-numpy decoders for
    the formats that need no library at all:

    * **BMP** (BITMAPINFOHEADER, uncompressed 24/32-bit): header ints +
      one bottom-up row flip — np.frombuffer, no Python pixel loop.
    * **PPM/PGM** (binary P6/P5, maxval ≤ 255): ASCII header scan + one
      reshape.

    ``decode(payload)`` → ``(width, height, float32 HxWx3 array)`` or
    ``None`` when no decoder recognizes the payload (caller falls back)."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    @property
    def has_pil(self) -> bool:
        return self._pil is not None

    def decode(self, payload: bytes):
        if not payload:
            return None
        if payload[:2] == b"BM":
            out = self._decode_bmp(payload)
            if out is not None:
                return out
        if payload[:2] in (b"P6", b"P5"):
            out = self._decode_pnm(payload)
            if out is not None:
                return out
        if self._pil is not None:
            try:
                import io as _io

                img = self._pil.open(_io.BytesIO(payload)).convert("RGB")
                arr = np.asarray(img, dtype=np.float32)
                return img.width, img.height, arr
            except Exception:
                return None
        return None

    @staticmethod
    def _decode_bmp(b: bytes):
        if len(b) < 54:
            return None
        off = int.from_bytes(b[10:14], "little")
        hdr = int.from_bytes(b[14:18], "little")
        if hdr < 40:  # BITMAPINFOHEADER or later
            return None
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if comp != 0 or bpp not in (24, 32) or w <= 0 or w > 1 << 16:
            return None
        flip = h > 0
        h = abs(h)
        if h == 0 or h > 1 << 16:
            return None
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        if off + stride * h > len(b):
            return None
        rows = np.frombuffer(b, np.uint8, stride * h, off).reshape(h, stride)
        px = rows[:, : w * nb].reshape(h, w, nb)
        if flip:
            px = px[::-1]
        # BMP stores BGR(A)
        rgb = px[:, :, 2::-1].astype(np.float32)
        return w, h, rgb

    @staticmethod
    def _scan_pnm_header(b: bytes):
        """Parse a binary-netpbm header: magic, then whitespace/comment-
        separated w h maxval.  Returns ``(w, h, maxval, data_pos)`` or
        None — shared by the single-image decoder and the video codec's
        concatenated-PPM frame splitter."""
        fields, pos = [], 2
        while len(fields) < 3 and pos < len(b):
            c = b[pos : pos + 1]
            if c == b"#":
                nl = b.find(b"\n", pos)
                if nl < 0:
                    return None
                pos = nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(b) and not b[end : end + 1].isspace():
                    end += 1
                if not b[pos:end].isdigit():
                    return None
                fields.append(int(b[pos:end]))
                pos = end
        if len(fields) < 3 or pos >= len(b):
            return None
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16 and 0 < maxval < 256):
            return None
        return w, h, maxval, pos

    @staticmethod
    def _decode_pnm(b: bytes):
        hdr = ImageCodec._scan_pnm_header(b)
        if hdr is None:
            return None
        w, h, _maxval, pos = hdr
        ch = 3 if b[:2] == b"P6" else 1
        need = w * h * ch
        if pos + need > len(b):
            return None
        px = np.frombuffer(b, np.uint8, need, pos).reshape(h, w, ch)
        if ch == 1:
            px = np.repeat(px, 3, axis=2)
        return w, h, px.astype(np.float32)


def _pixel_features(w: int, h: int, arr: np.ndarray) -> np.ndarray:
    """FEATURE_DIM real statistics of a decoded HxWx3 float32 image:
    per-channel means, gray std, aspect, log-area, mean |horizontal| and
    |vertical| gradient of the gray plane (all /255-normalized)."""
    gray = arr.mean(axis=2)
    gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
    return np.array(
        [
            arr[:, :, 0].mean() / 255.0,
            arr[:, :, 1].mean() / 255.0,
            arr[:, :, 2].mean() / 255.0,
            gray.std() / 255.0,
            w / max(h, 1),
            np.log2(max(w * h, 1)) / 32.0,
            gx / 255.0,
            gy / 255.0,
        ],
        dtype=np.float32,
    )


class DecodeImageStub:
    """Actor-pool stage over a binary payload column.

    ``codec='fake'`` (default, and the oracle-gated configuration) always
    produces the deterministic fake decode.  ``codec='auto'`` decodes for
    real — PIL if importable, BMP/PPM/PGM via the built-in numpy decoders
    regardless — and falls back to the fake per undecodable payload;
    ``strict=True`` turns that fallback into a NotImplementedError (so a
    production job fails loudly on rows its codecs can't handle instead
    of silently faking them).  Use small ``batch_size`` (e.g. 64) —
    payload rows are wide."""

    def __init__(self, payload_col: str = "html", strict: bool = False,
                 codec: str = "fake"):
        if codec not in ("fake", "auto"):
            raise ValueError(f"codec must be 'fake' or 'auto', got {codec!r}")
        self.payload_col = payload_col
        self.strict = strict
        self.codec = ImageCodec() if codec == "auto" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and self.codec is None:
            raise NotImplementedError(
                "strict image decode requires codec='auto' (PIL or a "
                "BMP/PPM payload); run with strict=False for the "
                "deterministic stub"
            )
        w, h, feats = _fake_decode(batch.column(self.payload_col))
        if self.codec is not None:
            col = batch.column(self.payload_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            for i in range(len(col)):
                payload = col[i].as_py()
                real = self.codec.decode(payload) if payload else None
                if real is not None:
                    w[i], h[i], feats[i] = real[0], real[1], _pixel_features(*real)
                elif self.strict:
                    raise NotImplementedError(
                        f"no available codec decodes payload row {i} "
                        f"({len(payload or b'')} bytes; PIL "
                        f"{'present' if self.codec.has_pil else 'absent'})"
                    )
        batch = batch.append_column("img_width", pa.array(w, type=pa.int32()))
        batch = batch.append_column("img_height", pa.array(h, type=pa.int32()))
        batch = batch.append_column(
            "img_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
            ),
        )
        return batch.drop_columns([self.payload_col])


def decode_images(ds, payload_col: str = "html", batch_size: int = 64,
                  concurrency=None, codec: str = "fake"):
    """Wide-row actor stage: deliberately small batches so
    batch_size × concurrency payload bytes fit worker heaps.  The codec
    (PIL probe included) loads once per actor in ``__init__``."""
    return ds.map_batches(
        DecodeImageStub,
        fn_constructor_kwargs={"payload_col": payload_col, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )


class VideoCodec:
    """Per-actor REAL video frame extractor: probes for an ``ffmpeg``
    binary ONCE in ``__init__`` (the PIL pattern — per actor, never per
    batch).  ``extract_frames(payload)`` pipes the container bytes
    through ``ffmpeg -f image2pipe -vcodec ppm`` and splits the
    self-describing concatenated P6 frames with the SAME pure-numpy
    netpbm scanner :class:`ImageCodec` uses — no Python pixel loop, no
    probe-for-dimensions second binary.  Returns
    ``[(w, h, float32 HxWx3), ...]`` or None (no binary / undecodable
    payload), so callers fall back to the deterministic stub exactly
    like the image path."""

    def __init__(self, binary: str | None = None, timeout_s: float = 120.0):
        import shutil

        self._bin = binary if binary is not None else shutil.which("ffmpeg")
        self.timeout_s = timeout_s

    @property
    def has_ffmpeg(self) -> bool:
        return self._bin is not None

    def extract_frames(self, payload: bytes, max_frames: int = 4,
                       fps: float | None = None):
        if not self._bin or not payload:
            return None
        import subprocess

        cmd = [self._bin, "-v", "error", "-i", "pipe:0"]
        if fps:
            cmd += ["-vf", f"fps={fps}"]
        cmd += ["-frames:v", str(int(max_frames)),
                "-f", "image2pipe", "-vcodec", "ppm", "pipe:1"]
        try:
            out = subprocess.run(
                cmd, input=bytes(payload), capture_output=True,
                timeout=self.timeout_s,
            ).stdout
        except Exception:
            return None
        frames, pos = [], 0
        while len(frames) < max_frames and out[pos : pos + 2] == b"P6":
            hdr = ImageCodec._scan_pnm_header(out[pos:])
            if hdr is None:
                break
            w, h, _maxval, data = hdr
            dec = ImageCodec._decode_pnm(out[pos:])
            if dec is None:
                break
            frames.append(dec)
            pos += data + w * h * 3
        return frames or None


class FrameSampleStub:
    """Video frame-sampling stage shape: emits one row per sampled 'frame'
    (flat_map semantics via map_batches returning more rows than input).

    ``codec='fake'`` (default, the oracle-gated configuration): frame
    count/positions derive deterministically from payload length, output
    columns are (… keys, frame_index, frame_offset) — unchanged.

    ``codec='auto'``: a per-actor :class:`VideoCodec` probes for ffmpeg
    in ``__init__``; payloads it decodes emit their REAL frames (count ≤
    max_frames) with real ``frame_width``/``frame_height``/
    ``frame_features`` columns; undecodable payloads (or no binary at
    all) fall back to the stub fan-out with fake per-frame metadata —
    or raise with ``strict=True``, mirroring ``DecodeImageStub``."""

    def __init__(self, payload_col: str = "html", every_n_bytes: int = 4096,
                 max_frames: int = 4, codec: str = "fake",
                 strict: bool = False, fps: float | None = None,
                 ffmpeg_binary: str | None = None):
        if codec not in ("fake", "auto"):
            raise ValueError(f"codec must be 'fake' or 'auto', got {codec!r}")
        self.payload_col = payload_col
        self.every = every_n_bytes
        self.max_frames = max_frames
        self.codec = (
            VideoCodec(binary=ffmpeg_binary) if codec == "auto" else None
        )
        self.strict = strict
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(self.payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.binary_length(
            col.fill_null(b"") if col.null_count else col
        ).to_numpy(zero_copy_only=False)
        n_frames = np.clip(lens // self.every, 1, self.max_frames).astype(np.int64)

        real: dict[int, list] = {}
        if self.codec is not None:
            fake_w, fake_h, fake_f = _fake_decode(col)
            for i in range(len(col)):
                payload = col[i].as_py()
                frames = (
                    self.codec.extract_frames(
                        payload, max_frames=self.max_frames, fps=self.fps
                    )
                    if payload
                    else None
                )
                if frames is not None:
                    real[i] = frames
                    n_frames[i] = len(frames)
                elif self.strict:
                    raise NotImplementedError(
                        f"no video codec decodes payload row {i} "
                        f"({len(payload or b'')} bytes; ffmpeg "
                        f"{'present' if self.codec.has_ffmpeg else 'absent'})"
                    )

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
        if self.codec is None:
            return t
        # auto mode: per-frame real metadata where decoded, fake otherwise
        fw = np.empty(total, np.int32)
        fh = np.empty(total, np.int32)
        ff = np.empty((total, FEATURE_DIM), np.float32)
        for j in range(total):
            i = int(rep_idx[j])
            if i in real:
                w, h, arr = real[i][int(frame_index[j])]
                fw[j], fh[j] = w, h
                ff[j] = _pixel_features(w, h, arr)
            else:
                fw[j], fh[j] = fake_w[i], fake_h[i]
                ff[j] = fake_f[i]
        t = t.append_column("frame_width", pa.array(fw, pa.int32()))
        t = t.append_column("frame_height", pa.array(fh, pa.int32()))
        return t.append_column(
            "frame_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(ff.ravel(), pa.float32()), FEATURE_DIM
            ),
        )


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


class AudioCodec:
    """Per-actor REAL audio decoder for the formats that need no library
    at all (the BMP/PPM posture applied to audio):

    * **WAV** (RIFF PCM integer 8/16/32-bit and IEEE float32, any
      channel count): chunk-walk the RIFF structure (fmt/data may be
      preceded by LIST/fact/cue chunks), then ONE ``np.frombuffer`` +
      reshape — no Python sample loop.
    * **AU** (Sun/NeXT ``.snd``, big-endian PCM 8/16/32 and float32):
      6-word header + the same frombuffer path.

    ``decode(payload)`` → ``(sample_rate, float32 (n_frames, channels)
    in [-1, 1])`` or None when no decoder recognizes the payload (caller
    falls back to the deterministic fake, exactly like ImageCodec)."""

    _PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}

    def decode(self, payload: bytes):
        if not payload or len(payload) < 12:
            return None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        if payload[:4] == b".snd":
            return self._decode_au(payload)
        return None

    @classmethod
    def _decode_wav(cls, b: bytes):
        pos, n = 12, len(b)
        fmt = None
        while pos + 8 <= n:
            cid = b[pos : pos + 4]
            sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
            body = b[pos + 8 : pos + 8 + sz]
            if cid == b"fmt " and sz >= 16:
                fmt = (
                    int.from_bytes(body[0:2], "little"),   # audio format
                    int.from_bytes(body[2:4], "little"),   # channels
                    int.from_bytes(body[4:8], "little"),   # sample rate
                    int.from_bytes(body[14:16], "little"),  # bits/sample
                )
            elif cid == b"data":
                if fmt is None:
                    return None
                afmt, ch, rate, bits = fmt
                if ch < 1 or rate < 1:
                    return None
                if afmt == 1 and bits in cls._PCM_DTYPES:   # integer PCM
                    dt = np.dtype(cls._PCM_DTYPES[bits])
                elif afmt == 3 and bits == 32:               # IEEE float
                    dt = np.dtype("<f4")
                else:
                    return None
                frames = len(body) // (dt.itemsize * ch)
                if frames == 0:
                    return None
                x = np.frombuffer(
                    body, dt, frames * ch
                ).reshape(frames, ch).astype(np.float32)
                if afmt == 1:
                    if bits == 8:   # WAV 8-bit is UNSIGNED, midpoint 128
                        x = (x - 128.0) / 128.0
                    else:
                        x = x / float(1 << (bits - 1))
                return rate, x
            # chunks are word-aligned: odd sizes carry one pad byte
            pos += 8 + sz + (sz & 1)
        return None

    @classmethod
    def _decode_au(cls, b: bytes):
        if len(b) < 24:
            return None
        off = int.from_bytes(b[4:8], "big")
        enc = int.from_bytes(b[12:16], "big")
        rate = int.from_bytes(b[16:20], "big")
        ch = int.from_bytes(b[20:24], "big")
        if ch < 1 or rate < 1 or off < 24 or off > len(b):
            return None
        enc_map = {2: np.dtype(">i1"), 3: np.dtype(">i2"),
                   5: np.dtype(">i4"), 6: np.dtype(">f4")}
        if enc not in enc_map:
            return None
        dt = enc_map[enc]
        body = b[off:]
        frames = len(body) // (dt.itemsize * ch)
        if frames == 0:
            return None
        x = np.frombuffer(body, dt, frames * ch).reshape(frames, ch).astype(
            np.float32
        )
        if enc != 6:
            x = x / float(1 << (dt.itemsize * 8 - 1))
        return rate, x


def _audio_features(rate: int, x: np.ndarray) -> np.ndarray:
    """FEATURE_DIM real statistics of decoded (frames, ch) float audio:
    duration, RMS, peak, zero-crossing rate, spectral centroid/rolloff of
    the mono mix (one rFFT), channel count, log frame count."""
    mono = x.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.abs(mono).max())
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono[: min(n, 1 << 16)]))
    power = spec * spec
    tot = float(power.sum()) or 1.0
    freqs = np.fft.rfftfreq(min(n, 1 << 16), d=1.0 / rate)
    centroid = float((freqs * power).sum() / tot)
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * cum[-1]))])
    return np.array(
        [
            n / rate,                      # duration s
            rms,
            peak,
            zc / max(n - 1, 1),            # zero-crossing rate
            centroid / (rate / 2),         # normalized centroid
            rolloff / (rate / 2),          # normalized 85% rolloff
            x.shape[1],                    # channels
            np.log2(max(n, 1)) / 32.0,
        ],
        dtype=np.float32,
    )


class DecodeAudioStub:
    """Actor-pool stage over a binary audio payload column — the audio
    sibling of ``DecodeImageStub``, same contract: ``codec='fake'``
    (default) emits the deterministic fake metadata; ``codec='auto'``
    decodes WAV/AU for real via the library-free :class:`AudioCodec`
    (per-actor, ``__init__``) and falls back per undecodable payload (or
    raises with ``strict=True``).  Output columns: ``sample_rate``
    (int32), ``n_frames`` (int64), ``audio_features``
    (fixed_size_list<float32>[FEATURE_DIM])."""

    def __init__(self, payload_col: str = "html", strict: bool = False,
                 codec: str = "fake"):
        if codec not in ("fake", "auto"):
            raise ValueError(f"codec must be 'fake' or 'auto', got {codec!r}")
        self.payload_col = payload_col
        self.strict = strict
        self.codec = AudioCodec() if codec == "auto" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and self.codec is None:
            raise NotImplementedError(
                "strict audio decode requires codec='auto' (a WAV/AU "
                "payload); run with strict=False for the deterministic stub"
            )
        w, h, feats = _fake_decode(batch.column(self.payload_col))
        # fake lanes: rate from the fake width, frames from byte length
        rates = (8000 + w.astype(np.int64) * 16).astype(np.int32)
        frames = (h.astype(np.int64) * 256).astype(np.int64)
        if self.codec is not None:
            col = batch.column(self.payload_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            for i in range(len(col)):
                payload = col[i].as_py()
                real = self.codec.decode(payload) if payload else None
                if real is not None:
                    rate, x = real
                    rates[i] = rate
                    frames[i] = len(x)
                    feats[i] = _audio_features(rate, x)
                elif self.strict:
                    raise NotImplementedError(
                        f"no available codec decodes audio payload row {i} "
                        f"({len(payload or b'')} bytes)"
                    )
        batch = batch.append_column("sample_rate", pa.array(rates, pa.int32()))
        batch = batch.append_column("n_frames", pa.array(frames, pa.int64()))
        batch = batch.append_column(
            "audio_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), FEATURE_DIM
            ),
        )
        return batch.drop_columns([self.payload_col])


def decode_audio(ds, payload_col: str = "html", batch_size: int = 64,
                 concurrency=None, codec: str = "fake"):
    """Actor-pool wrapper mirroring ``decode_images`` — small batches
    (audio payloads are wide rows), codec probe once per actor."""
    return ds.map_batches(
        DecodeAudioStub,
        fn_constructor_kwargs={"payload_col": payload_col, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )


def _magic_candidates(col: pa.Array, prefixes: tuple,
                      any_nonempty: bool = False) -> np.ndarray:
    """Indices of payloads whose leading bytes match one of ``prefixes``
    — ONE vectorized Arrow slice comparison instead of a Python probe per
    row (the hot-stage rule).  ``any_nonempty=True`` (a general-purpose
    codec like PIL is present) returns every non-empty row instead."""
    import pyarrow.compute as pc

    if any_nonempty:
        return np.flatnonzero(
            pc.greater(pc.binary_length(col), 0).to_numpy(zero_copy_only=False)
        )
    width = max(len(p) for p in prefixes)
    heads = pc.binary_slice(col.fill_null(b""), 0, width)
    mask = np.zeros(len(col), dtype=bool)
    for p in prefixes:
        if len(p) == width:
            mask |= pc.equal(heads, p).to_numpy(zero_copy_only=False)
        else:
            mask |= pc.equal(
                pc.binary_slice(col.fill_null(b""), 0, len(p)), p
            ).to_numpy(zero_copy_only=False)
    return np.flatnonzero(mask)


# ------------------------------------------------------------ perceptual hash
def _area_resize(gray: np.ndarray, out_h: int = 32, out_w: int = 32) -> np.ndarray:
    """Exact area-mean resize of a 2-D array to (out_h, out_w): two
    ``np.add.reduceat`` passes over block boundaries + one outer-product
    count division — no interpolation library, no Python pixel loop."""
    h, w = gray.shape
    rb = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cb = (np.arange(out_w, dtype=np.int64) * w) // out_w
    rows = np.add.reduceat(gray, rb, axis=0)
    blocks = np.add.reduceat(rows, cb, axis=1)
    # upscaling duplicates boundaries; reduceat then yields the SINGLE
    # source element for the empty slice (numpy's documented rule), so the
    # effective count is 1, never the 0 the plain diff computes
    rcnt = np.maximum(np.diff(np.concatenate((rb, [h]))), 1)
    ccnt = np.maximum(np.diff(np.concatenate((cb, [w]))), 1)
    return blocks / np.outer(rcnt, ccnt)


def _dct2(x: np.ndarray) -> np.ndarray:
    """2-D DCT-II via FFT (Makhoul's even-odd reorder), separable — the
    pHash frequency transform with no scipy dependency."""

    def dct1(v: np.ndarray) -> np.ndarray:  # along the last axis
        n = v.shape[-1]
        reordered = np.concatenate(
            [v[..., ::2], v[..., 1::2][..., ::-1]], axis=-1
        )
        V = np.fft.fft(reordered, axis=-1)
        k = np.arange(n)
        return 2.0 * np.real(V * np.exp(-1j * np.pi * k / (2 * n)))

    return dct1(dct1(x).T).T


def phash64(arr: np.ndarray) -> np.uint64:
    """Classic 64-bit perceptual hash of a decoded image: gray → 32×32
    area-mean → 2-D DCT-II → top-left 8×8 low-frequency block → one bit
    per coefficient above the median of the 63 AC coefficients (DC
    excluded — it only encodes brightness).  Robust to resize/re-encode;
    Hamming distance ≈ visual difference."""
    gray = arr.mean(axis=2) if arr.ndim == 3 else arr
    d = _dct2(_area_resize(gray.astype(np.float64)))
    blk = d[:8, :8].ravel()
    med = np.median(blk[1:])
    # DC (blk[0]) participates as a bit but not in the median above
    bits = blk > med
    return np.uint64(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class ImagePHash:
    """Actor stage: binary image payload → 64-bit pHash code rows
    (doc_id, code) for `dedup.hamming_code_pairs`.  Real decode via the
    per-actor :class:`ImageCodec` (PIL optional, BMP/PPM built-in);
    payloads no codec decodes fall back to a DETERMINISTIC fake code
    (splitmix chain of the payload hash) so the pipeline stays total —
    fake codes are uniform random bits, so two of them collide below any
    small Hamming radius only at ~2⁻⁶⁴-scale rates UNLESS the payloads
    are byte-identical (equal hashes ⇒ equal codes ⇒ distance 0), which
    is exactly the degenerate-but-correct answer for exact duplicates."""

    def __init__(self, payload_col: str = "html", id_col: str = "doc_id",
                 strict: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.strict = strict
        self.codec = ImageCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        col = batch.column(self.payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fake = splitmix64(hash64(col.fill_null(b"") if col.null_count else col))
        codes = fake.copy()
        # vectorized magic-byte prefilter: the per-payload Python decode
        # probe only runs on rows that CAN be images (BMP/netpbm always;
        # everything non-trivial when PIL is present) — a corpus of html
        # payloads costs one Arrow slice comparison, not 1M as_py calls
        cand = _magic_candidates(
            col, (b"BM", b"P6", b"P5"), any_nonempty=self.codec.has_pil
        )
        n_real = 0
        for i in cand:
            payload = col[i].as_py()
            real = self.codec.decode(payload) if payload else None
            if real is not None:
                codes[i] = phash64(real[2])
                n_real += 1
        if self.strict and n_real != len(col):
            raise NotImplementedError(
                f"{len(col) - n_real} payload row(s) have no decodable "
                "image for pHash"
            )
        return pa.table(
            {
                "doc_id": ids,
                "code": pa.array(codes.view(np.int64), pa.int64()),
            }
        )


def image_phash_pairs(ds, payload_col: str = "html", id_col: str = "doc_id",
                      max_hamming: int = 6, batch_size: int = 64,
                      concurrency=None, n_parts: int | None = None,
                      strict: bool = False):
    """Image near-duplicate pairs by perceptual hash: the pHash actor
    stage (decode + DCT, state in ``__init__``) feeding the SAME banded
    Hamming pairing core text SimHash uses
    (`ops.dedup.hamming_code_pairs`) — one 64-bit code per image moves,
    never pixels.  Output: (doc_a, doc_b, hamming)."""
    from .dedup import _auto_parts, hamming_code_pairs

    codes = ds.map_batches(
        ImagePHash,
        fn_constructor_kwargs={
            "payload_col": payload_col, "id_col": id_col, "strict": strict,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
    return hamming_code_pairs(
        codes, max_hamming=max_hamming, n_parts=n_parts or _auto_parts(ds)
    )


# --------------------------------------------------------- audio fingerprint
def audio_fingerprint64(rate: int, x: np.ndarray) -> np.uint64:
    """64-bit clip-level audio fingerprint, Haitsma–Kalker style (robust
    audio hashing via energy-difference signs): the mono mix splits into
    8 equal time slices; each slice's rFFT folds into 9 log-spaced band
    energies; each bit is the sign of the difference between adjacent
    band energies (8 slices × 8 diffs = 64 bits).  Sign-of-difference
    bits are invariant to overall level and to any monotone per-band
    scaling; relative time slicing makes the code sample-rate- and
    duration-agnostic for the same material.  Hamming distance ≈
    perceptual difference, pairing through `dedup.hamming_code_pairs`
    exactly like text SimHash and image pHash."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    n = len(mono)
    if n < 16:
        mono = np.pad(mono, (0, 16 - n))
        n = 16
    bits = np.zeros(64, dtype=np.uint8)
    # 9 log-spaced band edges in ABSOLUTE Hz (125 Hz .. 4 kHz, the
    # Haitsma–Kalker band range): the same material carries the same
    # physical frequencies regardless of sample rate, so bands must be
    # Hz-anchored — Nyquist FRACTIONS would shift every band when the
    # rate changes (measured: fraction bands read Hamming 23 for the
    # same tone sequence at 8 kHz vs 16 kHz; Hz bands read ≤6)
    edges_hz = np.logspace(np.log10(125.0), np.log10(4000.0), 10)
    for s in range(8):
        seg = mono[(s * n) // 8 : ((s + 1) * n) // 8]
        if len(seg) < 2:
            continue
        spec = np.abs(np.fft.rfft(seg)) ** 2
        m = len(spec)
        idx = np.minimum(
            (edges_hz / (rate / 2.0) * (m - 1)).astype(np.int64), m - 1
        )
        e = np.array(
            [spec[idx[j] : max(idx[j + 1], idx[j] + 1)].sum() for j in range(9)]
        )
        bits[s * 8 : (s + 1) * 8] = (np.diff(e) > 0).astype(np.uint8)
    return np.uint64(np.packbits(bits).view(">u8")[0])


class AudioFingerprintStage:
    """Actor stage: binary audio payload → (doc_id, code) rows for
    `dedup.hamming_code_pairs`.  Real decode via the per-actor
    :class:`AudioCodec` (WAV/AU, zero libraries); undecodable payloads
    fall back to the deterministic hash-chain fake code (byte-identical
    payloads ⇒ equal codes ⇒ distance 0; anything else pairs only at
    ~2⁻⁶⁴ rates) — the `ImagePHash` contract."""

    def __init__(self, payload_col: str = "html", id_col: str = "doc_id",
                 strict: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.strict = strict
        self.codec = AudioCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        col = batch.column(self.payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # a distinct mix constant from the pHash fake chain, so an image
        # payload and an audio payload of the same bytes never collide
        # across modality code spaces
        fake = splitmix64(
            hash64(col.fill_null(b"") if col.null_count else col)
            ^ np.uint64(0xA5A5A5A55A5A5A5A)
        )
        codes = fake.copy()
        n_real = 0
        for i in _magic_candidates(col, (b"RIFF", b".snd")):
            payload = col[i].as_py()
            real = self.codec.decode(payload) if payload else None
            if real is not None:
                codes[i] = audio_fingerprint64(*real)
                n_real += 1
        if self.strict and n_real != len(col):
            raise NotImplementedError(
                f"{len(col) - n_real} payload row(s) have no decodable "
                "audio for fingerprinting"
            )
        return pa.table(
            {
                "doc_id": ids,
                "code": pa.array(codes.view(np.int64), pa.int64()),
            }
        )


def audio_dup_pairs(ds, payload_col: str = "html", id_col: str = "doc_id",
                    max_hamming: int = 6, batch_size: int = 64,
                    concurrency=None, n_parts: int | None = None,
                    strict: bool = False):
    """Audio near-duplicate pairs by 64-bit fingerprint — the audio
    sibling of `image_phash_pairs`, same banded Hamming pairing core:
    one int64 code per clip moves, never samples."""
    from .dedup import _auto_parts, hamming_code_pairs

    codes = ds.map_batches(
        AudioFingerprintStage,
        fn_constructor_kwargs={
            "payload_col": payload_col, "id_col": id_col, "strict": strict,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
    return hamming_code_pairs(
        codes, max_hamming=max_hamming, n_parts=n_parts or _auto_parts(ds)
    )
