"""Multimodal (image/audio/video) batch stages.

Binary payloads ride as opaque ``binary`` columns with typed metadata;
decode / resize / feature-extract / frame-sample run as actor-pool
``map_batches`` stages.  The actual codec work is STUBBED (image/audio
libraries are not available in this environment): each stage either raises
``NotImplementedError`` (real-codec mode) or produces a deterministic fake
derived from the payload bytes (test mode, the default) — the Ray-side
plumbing (schemas, batch sizing, actor signatures, output layout) is real
and tested.

Scale notes: media rows are wide — keep ``batch_size`` small (≤8) and run
the stage as an actor pool so codec contexts initialize once per actor,
not per batch.  Output schema is flat Arrow; decoded frames are emitted
as fixed-shape tensors via ``pyarrow`` FixedSizeList so downstream numpy
views are zero-copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.struct([
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_channels", pa.int8()),
])


def _fake_pixels(payload: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic stand-in for a real decode: seed a PRNG from the
    payload digest so identical bytes decode identically on any worker."""
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=4).digest(), "big")
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, c), dtype=np.uint8)


class DecodeImages:
    """payload binary → fixed-size RGB thumbnail tensor + metadata.

    Actor-pool stage: ``ds.map_batches(DecodeImages, batch_size=8,
    concurrency=(2, N))``.  ``real_codecs=True`` raises until an imaging
    library is wired in (clearly-marked stub per the build contract).
    """

    THUMB_H = 32
    THUMB_W = 32
    CHANNELS = 3

    def __init__(self, real_codecs: bool = False):
        self.real_codecs = real_codecs
        # Codec contexts / lookup tables would initialize HERE, once per
        # actor — not per batch.
        self._px_type = pa.list_(
            pa.uint8(), self.THUMB_H * self.THUMB_W * self.CHANNELS)

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.real_codecs:
            raise NotImplementedError(
                "real image decode requires an imaging library not present "
                "in this environment; run with real_codecs=False")
        return _fake_pixels(payload, self.THUMB_H, self.THUMB_W,
                            self.CHANNELS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("image").to_pylist()
        thumbs = np.empty(
            (len(payloads), self.THUMB_H * self.THUMB_W * self.CHANNELS),
            dtype=np.uint8)
        widths, heights = [], []
        for i, p in enumerate(payloads):
            px = self._decode_one(p)
            thumbs[i] = px.reshape(-1)
            heights.append(px.shape[0])
            widths.append(px.shape[1])
        out = batch.drop_columns(["image"])
        out = out.append_column("thumb", pa.FixedSizeListArray.from_arrays(
            pa.array(thumbs.reshape(-1), pa.uint8()),
            self.THUMB_H * self.THUMB_W * self.CHANNELS))
        out = out.append_column("thumb_h", pa.array(
            [self.THUMB_H] * len(payloads), pa.int32()))
        out = out.append_column("thumb_w", pa.array(
            [self.THUMB_W] * len(payloads), pa.int32()))
        return out


class ImageFeatures:
    """thumbnail tensor → feature vector (channel means/stds + 8-bin
    luminance histogram).  Pure numpy over the zero-copy FixedSizeList
    buffer — no Python loop over pixels."""

    DIM = 3 + 3 + 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumb_col = batch.column("thumb")
        n = len(thumb_col)
        if n == 0:
            return batch.append_column(
                "features", pa.array([], pa.list_(pa.float32(), self.DIM)))
        flat = np.asarray(thumb_col.combine_chunks().flatten(),
                          dtype=np.uint8)
        px = flat.reshape(n, -1, 3).astype(np.float32)
        means = px.mean(axis=1)
        stds = px.std(axis=1)
        lum = px.mean(axis=2)
        hists = np.stack([
            np.histogram(row, bins=8, range=(0, 256))[0] for row in lum
        ]).astype(np.float32)
        feats = np.concatenate([means, stds, hists], axis=1)
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.DIM))


class SampleVideoFrames:
    """video binary → N evenly-spaced frame thumbnails (flat_map-shaped:
    one output row per sampled frame).  Frame decode stubbed like images."""

    def __init__(self, n_frames: int = 4, real_codecs: bool = False):
        self.n_frames = n_frames
        self.real_codecs = real_codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_codecs:
            raise NotImplementedError("real video decode not available")
        ids = batch.column("video_id").to_pylist()
        payloads = batch.column("video").to_pylist()
        out_id, out_frame, out_px = [], [], []
        for vid, p in zip(ids, payloads):
            for f in range(self.n_frames):
                out_id.append(vid)
                out_frame.append(f)
                out_px.append(_fake_pixels(
                    (p or b"") + f.to_bytes(2, "big"), 16, 16, 3).reshape(-1))
        px = np.stack(out_px) if out_px else \
            np.empty((0, 16 * 16 * 3), np.uint8)
        return pa.table({
            "video_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame": pa.FixedSizeListArray.from_arrays(
                pa.array(px.reshape(-1), pa.uint8()), 16 * 16 * 3),
        })


def decode_image_pipeline(ds, batch_size: int = 8, concurrency=None):
    """images Dataset (id + image binary) → thumbnails + features.
    Small batches (wide rows), actor pools for both stages."""
    if concurrency is None:
        concurrency = (1, 4)
    return ds.map_batches(
        DecodeImages, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
    )


class DecodeAudio:
    """audio binary → fixed-length mono PCM window + metadata.

    Same contract as DecodeImages: actor-pool stage, codec contexts
    initialize once per actor, real decode stubbed behind
    ``real_codecs=True`` (audio libraries absent in this environment);
    the deterministic fake derives the waveform from the payload digest
    so identical bytes decode identically on any worker."""

    N_SAMPLES = 2048
    SAMPLE_RATE = 16000

    def __init__(self, real_codecs: bool = False):
        self.real_codecs = real_codecs
        self._pcm_type = pa.list_(pa.float32(), self.N_SAMPLES)

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.real_codecs:
            raise NotImplementedError("real audio decode not available")
        seed = int.from_bytes(
            hashlib.blake2b(payload or b"", digest_size=4).digest(), "big")
        rng = np.random.RandomState(seed)
        # a few seeded sinusoids + noise: featureful, deterministic
        t = np.arange(self.N_SAMPLES, dtype=np.float32) / self.SAMPLE_RATE
        freqs = rng.uniform(50, 4000, size=3).astype(np.float32)
        amps = rng.uniform(0.1, 0.5, size=3).astype(np.float32)
        wave = sum(a * np.sin(2 * np.pi * f * t)
                   for a, f in zip(amps, freqs))
        wave = wave + rng.normal(0, 0.02, self.N_SAMPLES)
        return wave.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("audio").to_pylist()
        waves = np.stack([self._decode_one(p) for p in payloads]) \
            if payloads else np.empty((0, self.N_SAMPLES), np.float32)
        return pa.table({
            "audio_id": batch["audio_id"],
            "pcm": pa.FixedSizeListArray.from_arrays(
                pa.array(waves.reshape(-1), pa.float32()), self.N_SAMPLES),
            "sample_rate": pa.array(
                [self.SAMPLE_RATE] * len(payloads), pa.int32()),
        })


class AudioFeatures:
    """PCM window → feature vector: RMS, zero-crossing rate, and an
    8-band log-power spectrum (vectorized rfft over the whole batch)."""

    N_BANDS = 8
    DIM = 2 + N_BANDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        pcm_col = batch.column("pcm")
        n = len(pcm_col)
        if n == 0:
            return batch.append_column(
                "features", pa.array([], pa.list_(pa.float32(), self.DIM)))
        width = pcm_col.type.list_size
        waves = np.asarray(pcm_col.combine_chunks().flatten(),
                           dtype=np.float32).reshape(n, width)
        rms = np.sqrt((waves ** 2).mean(axis=1, keepdims=True))
        zc = (np.diff(np.signbit(waves), axis=1) != 0) \
            .mean(axis=1, keepdims=True).astype(np.float32)
        spec = np.abs(np.fft.rfft(waves, axis=1)) ** 2
        bands = np.stack([
            b.mean(axis=1)
            for b in np.array_split(spec, self.N_BANDS, axis=1)], axis=1)
        log_bands = np.log1p(bands).astype(np.float32)
        feats = np.concatenate(
            [rms.astype(np.float32), zc, log_bands], axis=1)
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.DIM))


def decode_audio_pipeline(ds, batch_size: int = 8, concurrency=None):
    """audio Dataset (audio_id + audio binary) → PCM + features."""
    if concurrency is None:
        concurrency = (1, 4)
    return ds.map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
    )


def sample_video_pipeline(ds, n_frames: int = 4, batch_size: int = 4,
                          concurrency=None):
    """video Dataset (video_id + video binary) → one row per sampled
    frame (flat_map shape) + per-frame image features."""
    if concurrency is None:
        concurrency = (1, 4)
    frames = ds.map_batches(
        SampleVideoFrames, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames},
        concurrency=concurrency)

    class _FrameFeatures(ImageFeatures):
        def __call__(self, batch: pa.Table) -> pa.Table:
            renamed = batch.rename_columns(
                ["video_id", "frame_idx", "thumb"])
            out = super().__call__(renamed)
            return out.rename_columns(
                ["video_id", "frame_idx", "frame", "features"])

    return frames.map_batches(
        _FrameFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency)
