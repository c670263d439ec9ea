"""Multimodal (image/audio/video) batch stages.

Binary payloads ride as opaque ``binary`` columns with typed metadata;
decode / resize / feature-extract / frame-sample run as actor-pool
``map_batches`` stages.  Decoding is REAL: stdlib-only PNG/BMP/GIF/JPEG/
WAV/MPNG codecs in ``stages/codecs.py`` + ``stages/jpeg.py`` (zlib
inflate, LZW, baseline DCT+Huffman — verified by round-trip tests in
``tests/test_codecs.py``).  Only external-library formats (WebP, MP3,
H.264, ...) remain gated behind ``real_codecs=True``, which raises until
such a library is wired in.

A row whose payload fails to decode never kills the job: the stage emits
a zeroed tensor plus a ``decode_error`` string column (same contract as
the extraction pipeline's per-document error capture, reference
``extractTextDir.js:198-242``).

Scale notes: media rows are wide — keep ``batch_size`` small (≤8) and run
the stage as an actor pool so codec contexts initialize once per actor,
not per batch.  Pool size defaults to an autoscaling range derived from
the cluster's CPU count (a hardcoded cap would starve a big node).
Output schema is flat Arrow; decoded frames are emitted as fixed-shape
tensors via ``pyarrow`` FixedSizeList so downstream numpy views are
zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import (decode_image, gif_decode_frames, mpng_decode_frame,
                     mpng_info, resize_nearest, sniff_image_format, to_rgb,
                     wav_decode)

IMAGE_META_SCHEMA = pa.struct([
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_channels", pa.int8()),
])


def _default_concurrency():
    """Autoscaling actor-pool range sized from the cluster, not a magic
    number: (1, max(2, CPUs // 2)) so a 32-CPU node can run 16 decode
    actors while a laptop still starts with one."""
    from ..functions.joins import cluster_cpus
    return (1, max(2, cluster_cpus(default=4) // 2))


class DecodeImages:
    """payload binary → fixed-size RGB thumbnail tensor + metadata.

    Actor-pool stage: ``ds.map_batches(DecodeImages, batch_size=8,
    concurrency=(1, N))``.  PNG/BMP/GIF/JPEG decode with the stdlib
    codecs; ``real_codecs=True`` raises until an external imaging
    library (WebP etc.) is wired in.
    """

    THUMB_H = 32
    THUMB_W = 32
    CHANNELS = 3

    def __init__(self, real_codecs: bool = False):
        self.real_codecs = real_codecs
        # Codec contexts / lookup tables initialize HERE, once per
        # actor — not per batch.
        self._px_type = pa.list_(
            pa.uint8(), self.THUMB_H * self.THUMB_W * self.CHANNELS)

    def _decode_one(self, payload: bytes):
        """→ (thumb uint8 (H,W,3), format, width, height, channels)."""
        if self.real_codecs:
            raise NotImplementedError(
                "real_codecs=True gates external-library formats (WebP, "
                "AVIF, ...); no imaging library is present in this "
                "environment — PNG/BMP/GIF/JPEG decode with "
                "real_codecs=False")
        fmt = sniff_image_format(payload or b"")
        px = decode_image(payload)
        h, w = px.shape[:2]
        c = 1 if px.ndim == 2 else px.shape[2]
        thumb = resize_nearest(to_rgb(px), self.THUMB_H, self.THUMB_W)
        return thumb, fmt, w, h, c

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("image").to_pylist()
        n = len(payloads)
        thumbs = np.zeros(
            (n, self.THUMB_H * self.THUMB_W * self.CHANNELS),
            dtype=np.uint8)
        fmts, widths, heights, chans, errs = [], [], [], [], []
        for i, p in enumerate(payloads):
            try:
                thumb, fmt, w, h, c = self._decode_one(p)
                thumbs[i] = thumb.reshape(-1)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                chans.append(c)
                errs.append(None)
            except NotImplementedError:
                raise
            except Exception as e:  # poison payload → error column
                fmts.append(None)
                widths.append(0)
                heights.append(0)
                chans.append(0)
                errs.append(f"{type(e).__name__}: {e}")
        out = batch.drop_columns(["image"])
        out = out.append_column("thumb", pa.FixedSizeListArray.from_arrays(
            pa.array(thumbs.reshape(-1), pa.uint8()),
            self.THUMB_H * self.THUMB_W * self.CHANNELS))
        out = out.append_column("format", pa.array(fmts, pa.string()))
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("n_channels", pa.array(chans, pa.int8()))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
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
    """video binary (MPNG container or animated GIF) → N evenly-spaced
    frame thumbnails (flat_map-shaped: one output row per sampled
    frame).  MPNG seeks to sampled frames without decoding skipped
    ones; GIF decodes its frame sequence in one LZW pass."""

    FRAME_H = 16
    FRAME_W = 16

    def __init__(self, n_frames: int = 4, real_codecs: bool = False):
        self.n_frames = n_frames
        self.real_codecs = real_codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_codecs:
            raise NotImplementedError(
                "real_codecs=True gates external video codecs (H.264, "
                "VP9, ...) not present in this environment")
        ids = batch.column("video_id").to_pylist()
        payloads = batch.column("video").to_pylist()
        out_id, out_frame, out_src, out_px, out_err = [], [], [], [], []
        px_len = self.FRAME_H * self.FRAME_W * 3
        for vid, p in zip(ids, payloads):
            try:
                gif_frames = None
                if (p or b"")[:6] in (b"GIF87a", b"GIF89a"):
                    # real animated-GIF container: all frames decode in
                    # one LZW pass (no per-frame seek table)
                    gif_frames = gif_decode_frames(p)
                    total = len(gif_frames)
                else:
                    total, _fps = mpng_info(p or b"")
                # evenly-spaced sample positions over the real timeline
                src = np.unique(np.linspace(
                    0, max(total - 1, 0), self.n_frames).round()
                    .astype(np.int64))
                for f_out, f_src in enumerate(src):
                    frame = gif_frames[int(f_src)] \
                        if gif_frames is not None \
                        else mpng_decode_frame(p, int(f_src))
                    px = to_rgb(frame)
                    px = resize_nearest(px, self.FRAME_H, self.FRAME_W)
                    out_id.append(vid)
                    out_frame.append(f_out)
                    out_src.append(int(f_src))
                    out_px.append(px.reshape(-1))
                    out_err.append(None)
            except Exception as e:
                out_id.append(vid)
                out_frame.append(0)
                out_src.append(0)
                out_px.append(np.zeros(px_len, np.uint8))
                out_err.append(f"{type(e).__name__}: {e}")
        px = np.stack(out_px) if out_px else np.empty((0, px_len), np.uint8)
        return pa.table({
            "video_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "src_frame": pa.array(out_src, pa.int32()),
            "frame": pa.FixedSizeListArray.from_arrays(
                pa.array(px.reshape(-1), pa.uint8()), px_len),
            "decode_error": pa.array(out_err, pa.string()),
        })


def decode_image_pipeline(ds, batch_size: int = 8, concurrency=None):
    """images Dataset (id + image binary) → thumbnails + features.
    Small batches (wide rows), actor pools for both stages."""
    if concurrency is None:
        concurrency = _default_concurrency()
    return ds.map_batches(
        DecodeImages, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
    )


class DecodeAudio:
    """audio binary (WAV-PCM) → fixed-length mono PCM window + metadata.

    Same contract as DecodeImages: actor-pool stage, real stdlib WAV
    decode (8/16/32-bit PCM, channel-averaged to mono), window trimmed or
    zero-padded to N_SAMPLES; ``real_codecs=True`` gates external codecs
    (MP3, AAC, ...)."""

    N_SAMPLES = 2048

    def __init__(self, real_codecs: bool = False):
        self.real_codecs = real_codecs
        self._pcm_type = pa.list_(pa.float32(), self.N_SAMPLES)

    def _decode_one(self, payload: bytes):
        """→ (float32[N_SAMPLES], sample_rate, n_samples_in_file)."""
        if self.real_codecs:
            raise NotImplementedError(
                "real_codecs=True gates external audio codecs (MP3, AAC, "
                "...) not present in this environment — WAV-PCM decodes "
                "with real_codecs=False")
        samples, rate = wav_decode(payload or b"")
        total = len(samples)
        window = np.zeros(self.N_SAMPLES, np.float32)
        take = min(total, self.N_SAMPLES)
        window[:take] = samples[:take]
        return window, rate, total

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("audio").to_pylist()
        n = len(payloads)
        waves = np.zeros((n, self.N_SAMPLES), np.float32)
        rates, totals, errs = [], [], []
        for i, p in enumerate(payloads):
            try:
                window, rate, total = self._decode_one(p)
                waves[i] = window
                rates.append(rate)
                totals.append(total)
                errs.append(None)
            except NotImplementedError:
                raise
            except Exception as e:
                rates.append(0)
                totals.append(0)
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "audio_id": batch["audio_id"],
            "pcm": pa.FixedSizeListArray.from_arrays(
                pa.array(waves.reshape(-1), pa.float32()), self.N_SAMPLES),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(totals, pa.int64()),
            "decode_error": pa.array(errs, pa.string()),
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
        concurrency = _default_concurrency()
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
        concurrency = _default_concurrency()
    frames = ds.map_batches(
        SampleVideoFrames, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames},
        concurrency=concurrency)

    class _FrameFeatures(ImageFeatures):
        def __call__(self, batch: pa.Table) -> pa.Table:
            renamed = batch.rename_columns(
                ["video_id", "frame_idx", "src_frame", "thumb",
                 "decode_error"])
            out = super().__call__(renamed)
            return out.rename_columns(
                ["video_id", "frame_idx", "src_frame", "frame",
                 "decode_error", "features"])

    return frames.map_batches(
        _FrameFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency)


def extract_pdf_images_batch(batch: pa.Table) -> pa.Table:
    """(url, payload binary) → one row per embedded PDF image XObject
    (flat-map shape): metadata + converted payload + crc32.

    Task-based map_batches stage over the doc-wide enumeration in
    stages/pdf/images.py (parsePdfImages.js:199 extractImages); per-doc
    failures land in the ``error`` column with zero image rows, they
    never poison the batch.  At 100 TB this stays embarrassingly
    parallel — no shuffle, payload bytes never leave the task except as
    the (smaller) converted outputs."""
    import zlib as _zlib

    from .pdf.images import extract_images, page_image_map
    from .pdf.objects import PdfFile

    urls, payloads = batch["url"].to_pylist(), batch["payload"].to_pylist()
    cols = {k: [] for k in ("url", "obj_num", "first_page", "width",
                            "height", "bits_per_component", "color_space",
                            "filter", "ext", "image_mask", "has_smask",
                            "n_bytes", "crc32", "data", "error")}

    def emit(url, info, first_page):
        data = info.get("data") or b""
        cols["url"].append(url)
        cols["obj_num"].append(info.get("obj_num", -1))
        cols["first_page"].append(first_page)
        cols["width"].append(info.get("width", 0))
        cols["height"].append(info.get("height", 0))
        cols["bits_per_component"].append(
            info.get("bits_per_component", 0))
        cols["color_space"].append(info.get("color_space") or "")
        cols["filter"].append(info.get("filter") or "")
        cols["ext"].append(info.get("ext") or "")
        cols["image_mask"].append(bool(info.get("image_mask")))
        cols["has_smask"].append(info.get("smask_obj") is not None)
        cols["n_bytes"].append(len(data))
        cols["crc32"].append(_zlib.crc32(data))
        cols["data"].append(data)
        cols["error"].append(info.get("error") or "")

    for url, payload in zip(urls, payloads):
        try:
            pdf = PdfFile(payload)
            pages_of = page_image_map(pdf)
            for info in extract_images(pdf):
                emit(url, info, pages_of.get(info["obj_num"], 0))
        except Exception as exc:  # noqa: BLE001 — error is data
            emit(url, {"error": f"{type(exc).__name__}: {exc}"[:200]}, 0)

    return pa.table({
        "url": pa.array(cols["url"], pa.string()),
        "obj_num": pa.array(cols["obj_num"], pa.int32()),
        "first_page": pa.array(cols["first_page"], pa.int32()),
        "width": pa.array(cols["width"], pa.int32()),
        "height": pa.array(cols["height"], pa.int32()),
        "bits_per_component": pa.array(cols["bits_per_component"],
                                       pa.int32()),
        "color_space": pa.array(cols["color_space"], pa.string()),
        "filter": pa.array(cols["filter"], pa.string()),
        "ext": pa.array(cols["ext"], pa.string()),
        "image_mask": pa.array(cols["image_mask"], pa.bool_()),
        "has_smask": pa.array(cols["has_smask"], pa.bool_()),
        "n_bytes": pa.array(cols["n_bytes"], pa.int64()),
        "crc32": pa.array(cols["crc32"], pa.int64()),
        "data": pa.array(cols["data"], pa.large_binary()),
        "error": pa.array(cols["error"], pa.string()),
    })


def pdf_images_pipeline(ds):
    """pages Dataset (url + payload) → per-embedded-image Dataset."""
    return ds.map_batches(extract_pdf_images_batch,
                          batch_format="pyarrow", batch_size=None)
