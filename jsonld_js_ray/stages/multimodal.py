"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with a JSON
metadata column; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages (state loaded once per actor in
``__init__``, work per batch in ``__call__``; small batch sizes because
binary rows are wide).

The decode path is REAL end-to-end with no third-party codec libraries:

- images are 24-bit uncompressed **BMP** (BITMAPINFOHEADER, BI_RGB) —
  encoded and decoded here with struct+numpy; any external image tool
  can read/write the payloads;
- audio is 16-bit PCM **WAV** (RIFF) — our struct codec is cross-checked
  in tests against the stdlib ``wave`` module in both directions.

A heavier codec (PIL for JPEG/PNG, soundfile for FLAC/OGG) is picked up
per actor in ``__init__`` when installed; unknown containers without one
raise ValueError. (The reference processor has no media pipeline; this
module is part of the training-data layer the engine adds.)
"""

from __future__ import annotations

import io
import json
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("kind", pa.string()),          # 'image' | 'audio' | 'video'
    ("payload", pa.large_binary()),
    ("meta", pa.string()),          # JSON: source, codec, ...
])


# --- BMP (24-bit BI_RGB) codec: struct+numpy, no external libs ---

_BMP_HEADER = 14
_BMP_INFO = 40
_BMP_OFFSET = _BMP_HEADER + _BMP_INFO


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes
    (bottom-up rows, BGR order, rows padded to 4-byte multiples)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    body = np.zeros((h, row_size), dtype=np.uint8)
    body[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # flip+BGR
    file_size = _BMP_OFFSET + body.size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_OFFSET)
    info = struct.pack("<IiiHHIIiiII", _BMP_INFO, w, h, 1, 24, 0,
                       body.size, 2835, 2835, 0, 0)
    return header + info + body.tobytes()


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """24-bit uncompressed BMP bytes → (w, h, 3, (h, w, 3) uint8 RGB).
    Handles both bottom-up (height > 0) and top-down (height < 0)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset, = struct.unpack_from("<I", payload, 10)
    info_size, w, h = struct.unpack_from("<Iii", payload, _BMP_HEADER)
    planes, bpp, compression = struct.unpack_from(
        "<HHI", payload, _BMP_HEADER + 12)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    body = np.frombuffer(payload, dtype=np.uint8, offset=offset,
                         count=h * row_size).reshape(h, row_size)
    rgb = body[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return w, h, 3, np.ascontiguousarray(rgb)


def encode_bmp_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic random-pixel BMP (test/bench payloads)."""
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    return encode_bmp(pixels)


def synthesize_media_table(n_items: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic media table for tests/benchmarks (no external
    data); payloads are real BMP files."""
    rng = np.random.RandomState(seed)
    payloads = []
    metas = []
    for i in range(n_items):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        payloads.append(encode_bmp_image(w, h, seed=seed * 1000 + i))
        metas.append(json.dumps({"source": f"synth-{i}", "codec": "bmp"}))
    return pa.table({
        "item_id": pa.array(range(n_items), pa.int64()),
        "kind": pa.array(["image"] * n_items, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "meta": pa.array(metas, pa.string()),
    })


class ImageDecodeActor:
    """Actor: image payloads → (item_id, width, height, channels,
    mean_r/g/b) feature rows.

    BMP decodes natively (stdlib struct+numpy — a real container
    format, no stub). A heavier codec (PIL), when installed, is loaded
    ONCE per actor here in ``__init__`` and handles everything else;
    without one, non-BMP payloads raise ValueError."""

    def __init__(self) -> None:
        self.pil = None
        try:
            from PIL import Image  # noqa: F401
            self.pil = Image
        except ImportError:
            pass

    def _decode(self, payload: bytes):
        if payload[:2] == b"BM":
            try:
                return decode_bmp(payload)
            except ValueError:
                # BMP variant outside the built-in 24-bit/BI_RGB
                # subset (8-bit, RLE, ...) — fall through to PIL
                if self.pil is None:
                    raise
        if self.pil is not None:
            img = self.pil.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img)
            return arr.shape[1], arr.shape[0], arr.shape[2], arr
        raise ValueError(
            "payload is not BMP and no other image codec is installed")

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths, heights, chans = [], [], []
        means = []
        for p in payloads:
            w, h, c, px = self._decode(p)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            m = px.reshape(-1, c).mean(axis=0)
            if len(m) < 3:            # grayscale/2-channel payloads
                m = np.pad(m, (0, 3 - len(m)), constant_values=m[0]
                           if len(m) else 0.0)
            means.append(m[:3])
        means = np.stack(means) if means else np.zeros((0, 3))
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "channels": pa.array(chans, pa.int32()),
            "mean_r": pa.array(np.round(means[:, 0], 4)),
            "mean_g": pa.array(np.round(means[:, 1], 4)),
            "mean_b": pa.array(np.round(means[:, 2], 4)),
        })


class ImageResizeActor:
    """Actor: nearest-neighbor resize of BMP payloads; re-encodes to
    BMP (decode → numpy index-resize → encode, all vectorized)."""

    def __init__(self, target: int = 16) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = []
        for p in payloads:
            w, h, _c, px = decode_bmp(p)
            t = self.target
            yi = (np.arange(t) * h // t)
            xi = (np.arange(t) * w // t)
            out.append(encode_bmp(px[yi][:, xi]))
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "kind": pa.array(["image"] * len(item_ids), pa.string()),
            "payload": pa.array(out, pa.large_binary()),
            "meta": batch["meta"],
        })


class FrameSampleActor:
    """Actor: 'video' (a tall BMP as a stacked frame strip) → every Nth
    pixel-row re-encoded as a 1-row BMP frame. Demonstrates the 1→N
    flat-map layout for frame extraction."""

    def __init__(self, every: int = 4) -> None:
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_item, out_frame, out_payload = [], [], []
        for item_id, p in zip(item_ids, payloads):
            w, h, _c, px = decode_bmp(p)
            for frame_idx, row in enumerate(range(0, h, self.every)):
                out_item.append(item_id)
                out_frame.append(frame_idx)
                out_payload.append(encode_bmp(px[row:row + 1]))
        return pa.table({
            "item_id": pa.array(out_item, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "payload": pa.array(out_payload, pa.large_binary()),
        })


def decode_features(media, concurrency=None, batch_size: int = 64):
    """media Dataset → decoded feature Dataset (small batches: wide
    binary rows must not blow worker heaps)."""
    return media.map_batches(
        ImageDecodeActor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency if concurrency else (1, 4))


# --- audio: 16-bit PCM WAV (RIFF), struct codec ---

def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """mono int16 samples → WAV (RIFF, PCM 16-bit) bytes."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      byte_rate, 2, 16)
    header = struct.pack("<4sI4s", b"RIFF",
                         4 + len(fmt) + 8 + len(data), b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV (RIFF, PCM 16-bit mono) bytes → (sample_rate, int16 array).
    Walks RIFF chunks, so extra chunks (LIST/INFO, fact) are skipped."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, pos)
            bits, = struct.unpack_from("<H", payload, pos + 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only PCM 16-bit mono WAV supported (fmt="
                    f"{audio_fmt}, ch={channels}, bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", offset=pos,
                                 count=size // 2)
        pos += size + (size & 1)                  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, data


def encode_wav_audio(sample_rate: int, n_samples: int,
                     seed: int = 0) -> bytes:
    """Deterministic random-sample WAV (test/bench payloads)."""
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n_samples, dtype=np.int16)
    return encode_wav(sample_rate, samples)


def synthesize_audio_table(n_items: int = 32, seed: int = 9) -> pa.Table:
    """Deterministic audio table (no external data); payloads are real
    WAV files."""
    rng = np.random.RandomState(seed)
    payloads, metas = [], []
    for i in range(n_items):
        sr = int(rng.choice([8000, 16000, 44100]))
        n = int(rng.randint(sr // 10, sr))       # 0.1–1.0 s clips
        payloads.append(encode_wav_audio(sr, n, seed=seed * 1000 + i))
        metas.append(json.dumps({"source": f"synth-audio-{i}",
                                 "codec": "wav-pcm16"}))
    return pa.table({
        "item_id": pa.array(range(n_items), pa.int64()),
        "kind": pa.array(["audio"] * n_items, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "meta": pa.array(metas, pa.string()),
    })


class AudioDecodeActor:
    """Actor: audio payloads → (item_id, sample_rate, n_samples,
    duration_s, rms, peak) feature rows. WAV decodes natively (struct
    RIFF walker, cross-checked against stdlib ``wave`` in tests); a
    heavier codec (soundfile), when installed, is loaded once per actor
    in ``__init__`` for other containers."""

    def __init__(self) -> None:
        self.codec = None
        try:
            import soundfile  # noqa: F401
            self.codec = soundfile
        except ImportError:
            pass

    def _decode(self, payload: bytes):
        if payload[:4] == b"RIFF":
            try:
                return decode_wav(payload)
            except ValueError:
                # WAV variant outside the built-in PCM-16-mono subset
                # (stereo, float, 24-bit) — fall through to soundfile
                if self.codec is None:
                    raise
        if self.codec is not None:
            data, sr = self.codec.read(io.BytesIO(payload),
                                       dtype="int16")
            return sr, np.asarray(data).reshape(-1)
        raise ValueError(
            "payload is not WAV and no other audio codec is installed")

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        srs, ns, durs, rmss, peaks = [], [], [], [], []
        for p in payloads:
            sr, samples = self._decode(p)
            x = samples.astype(np.float64)
            srs.append(sr)
            ns.append(len(samples))
            durs.append(round(len(samples) / sr, 6) if sr else 0.0)
            rmss.append(round(float(np.sqrt(np.mean(x * x)))
                              if len(x) else 0.0, 4))
            # widen before abs: np.abs(int16(-32768)) wraps to -32768
            peaks.append(int(np.abs(samples.astype(np.int32)).max())
                         if len(samples) else 0)
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(ns, pa.int64()),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rmss, pa.float64()),
            "peak": pa.array(peaks, pa.int32()),
        })


def audio_features(media, concurrency=None, batch_size: int = 64):
    """audio Dataset → decoded feature Dataset (actor-pool map_batches,
    small batches for wide binary rows)."""
    return media.map_batches(
        AudioDecodeActor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency if concurrency else (1, 4))
