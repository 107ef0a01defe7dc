"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with a JSON
metadata column; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages. The actual codec libraries (PIL,
torchaudio, ffmpeg) are NOT in this container, so the decode kernel is
STUBBED: ``ImageDecodeActor`` tries to import PIL in ``__init__`` and
otherwise uses the deterministic fake codec below (or raises
NotImplementedError in ``strict`` mode). The Ray-side plumbing — schema,
small batch sizes for wide binary rows, actor signature, output layout —
is real and tested.

Fake codec: payload = b"FAKEIMG1" + width(u16 LE) + height(u16 LE) +
channels(u8) + pixel bytes (row-major).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG1"

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("kind", pa.string()),          # 'image' | 'audio' | 'video'
    ("payload", pa.large_binary()),
    ("meta", pa.string()),          # JSON: source, codec, ...
])


def encode_fake_image(width: int, height: int, channels: int = 3,
                      seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height * channels,
                         dtype=np.uint8)
    return (MAGIC + struct.pack("<HHB", width, height, channels)
            + pixels.tobytes())


def synthesize_media_table(n_items: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic media table for tests/benchmarks (no external data)."""
    rng = np.random.RandomState(seed)
    payloads = []
    metas = []
    for i in range(n_items):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        payloads.append(encode_fake_image(w, h, 3, seed=seed * 1000 + i))
        metas.append(json.dumps({"source": f"synth-{i}", "codec": "fake"}))
    return pa.table({
        "item_id": pa.array(range(n_items), pa.int64()),
        "kind": pa.array(["image"] * n_items, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "meta": pa.array(metas, pa.string()),
    })


def _decode_fake(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if not payload.startswith(MAGIC):
        raise ValueError("not a FAKEIMG1 payload")
    w, h, c = struct.unpack_from("<HHB", payload, len(MAGIC))
    pixels = np.frombuffer(payload, dtype=np.uint8,
                           offset=len(MAGIC) + 5).reshape(h, w, c)
    return w, h, c, pixels


class ImageDecodeActor:
    """Actor: decode payloads → (item_id, width, height, channels,
    mean_r/g/b) feature rows.

    Real decoder loads once per actor in ``__init__``; the sandbox path
    uses the deterministic fake codec. ``strict=True`` raises
    NotImplementedError when no real decoder exists (documented stub)."""

    def __init__(self, strict: bool = False) -> None:
        self.pil = None
        try:
            from PIL import Image  # noqa: F401
            self.pil = Image
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "no image codec in this environment; install PIL or "
                    "use the fake codec (strict=False)")

    def _decode(self, payload: bytes):
        if payload.startswith(MAGIC):
            return _decode_fake(payload)
        if self.pil is not None:
            import io
            img = self.pil.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img)
            return arr.shape[1], arr.shape[0], arr.shape[2], arr
        raise ValueError(
            "payload is neither FAKEIMG1 nor decodable (no codec)")

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
    """Actor: nearest-neighbor resize inside the fake codec (stand-in for
    a real resize kernel); re-encodes to the same payload format."""

    def __init__(self, target: int = 16) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = []
        for p in payloads:
            w, h, c, px = _decode_fake(p)
            t = self.target
            yi = (np.arange(t) * h // t)
            xi = (np.arange(t) * w // t)
            small = px[yi][:, xi]
            out.append(MAGIC + struct.pack("<HHB", t, t, c)
                       + small.tobytes())
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "kind": pa.array(["image"] * len(item_ids), pa.string()),
            "payload": pa.array(out, pa.large_binary()),
            "meta": batch["meta"],
        })


class FrameSampleActor:
    """Actor: 'video' → every Nth 'frame' (stand-in: slices the payload
    pixel rows into frame-sized chunks). Demonstrates the 1→N flat-map
    layout for frame extraction."""

    def __init__(self, every: int = 4) -> None:
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_item, out_frame, out_payload = [], [], []
        for item_id, p in zip(item_ids, payloads):
            w, h, c, px = _decode_fake(p)
            for frame_idx, row in enumerate(range(0, h, self.every)):
                frame = px[row:row + 1]
                out_item.append(item_id)
                out_frame.append(frame_idx)
                out_payload.append(
                    MAGIC + struct.pack("<HHB", w, 1, c) + frame.tobytes())
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


# --- audio (same opaque-binary + honest-stub pattern) ---
#
# Fake PCM codec: payload = b"FAKEAUD1" + sample_rate(u32 LE) +
# n_samples(u32 LE) + int16 LE samples.

AUDIO_MAGIC = b"FAKEAUD1"


def encode_fake_audio(sample_rate: int, n_samples: int,
                      seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n_samples,
                          dtype=np.int16)
    return (AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples)
            + samples.tobytes())


def synthesize_audio_table(n_items: int = 32, seed: int = 9) -> pa.Table:
    """Deterministic audio table (no external data)."""
    rng = np.random.RandomState(seed)
    payloads, metas = [], []
    for i in range(n_items):
        sr = int(rng.choice([8000, 16000, 44100]))
        n = int(rng.randint(sr // 10, sr))       # 0.1–1.0 s clips
        payloads.append(encode_fake_audio(sr, n, seed=seed * 1000 + i))
        metas.append(json.dumps({"source": f"synth-audio-{i}",
                                 "codec": "fake-pcm"}))
    return pa.table({
        "item_id": pa.array(range(n_items), pa.int64()),
        "kind": pa.array(["audio"] * n_items, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "meta": pa.array(metas, pa.string()),
    })


def _decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if not payload.startswith(AUDIO_MAGIC):
        raise ValueError("not a FAKEAUD1 payload")
    sr, n = struct.unpack_from("<II", payload, len(AUDIO_MAGIC))
    samples = np.frombuffer(payload, dtype="<i2",
                            offset=len(AUDIO_MAGIC) + 8, count=n)
    return sr, samples


class AudioDecodeActor:
    """Actor: audio payloads → (item_id, sample_rate, n_samples,
    duration_s, rms, peak) feature rows. A real deployment would load
    soundfile/torchaudio once per actor in ``__init__``; the sandbox
    falls back to the deterministic fake PCM codec (``strict=True``
    raises NotImplementedError — documented stub, same policy as
    ImageDecodeActor)."""

    def __init__(self, strict: bool = False) -> None:
        self.codec = None
        try:
            import soundfile  # noqa: F401
            self.codec = soundfile
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "no audio codec in this environment; install "
                    "soundfile or use the fake codec (strict=False)")

    def _decode(self, payload: bytes):
        if payload.startswith(AUDIO_MAGIC):
            return _decode_fake_audio(payload)
        if self.codec is not None:
            import io
            data, sr = self.codec.read(io.BytesIO(payload),
                                       dtype="int16")
            return sr, np.asarray(data).reshape(-1)
        raise ValueError(
            "payload is neither FAKEAUD1 nor decodable (no codec)")

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
