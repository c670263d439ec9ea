"""Multimodal stages: REAL stdlib decode + schemas + error capture."""

import numpy as np
import pyarrow as pa
import pytest

from scribe_js_ray.sources.synth import (
    synth_audio_payload, synth_image_payload, synth_video_payload)
from scribe_js_ray.stages.codecs import (
    mpng_encode, png_encode, resize_nearest, wav_encode)
from scribe_js_ray.stages.multimodal import (
    DecodeAudio, DecodeImages, ImageFeatures, SampleVideoFrames,
    decode_image_pipeline)


def _images_ds(n=10):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "image_id": pa.array(range(n), pa.int64()),
        "image": pa.array([synth_image_payload(i) for i in range(n)],
                          pa.binary()),
    }))


def test_decode_pipeline_schema_and_determinism(ray_session):
    out1 = decode_image_pipeline(_images_ds(), batch_size=2).to_pandas()
    out2 = decode_image_pipeline(_images_ds(), batch_size=3).to_pandas()
    assert set(out1.columns) == {"image_id", "thumb", "format", "width",
                                 "height", "n_channels", "decode_error",
                                 "features"}
    assert len(out1) == 10
    # identical payload bytes decode identically regardless of batching
    o1 = out1.sort_values("image_id", ignore_index=True)
    o2 = out2.sort_values("image_id", ignore_index=True)
    for i in range(10):
        assert o1["decode_error"][i] is None
        assert np.array_equal(np.asarray(o1["thumb"][i]),
                              np.asarray(o2["thumb"][i]))
        assert np.allclose(np.asarray(o1["features"][i]),
                           np.asarray(o2["features"][i]))
    assert len(o1["features"][0]) == ImageFeatures.DIM
    # format sniffing: ids cycle png/bmp/gif/jpeg/tiff (synth contract)
    assert list(o1["format"]) == ["png", "bmp", "gif", "jpeg", "tiff"] * 2


def test_decode_images_exact_pixels():
    """A known 2×2 PNG decodes to the EXACT expected 32×32 thumbnail
    (nearest-neighbor of the true pixels — not a fake)."""
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    out = DecodeImages()(pa.table({
        "image_id": pa.array([1], pa.int64()),
        "image": pa.array([png_encode(px)], pa.binary()),
    }))
    thumb = np.asarray(out["thumb"][0].as_py(), np.uint8).reshape(32, 32, 3)
    assert np.array_equal(thumb, resize_nearest(px, 32, 32))
    assert thumb[0, 0].tolist() == [255, 0, 0]    # top-left quadrant red
    assert thumb[31, 31].tolist() == [10, 20, 30]
    assert out["width"][0].as_py() == 2
    assert out["height"][0].as_py() == 2
    assert out["n_channels"][0].as_py() == 3


def test_decode_images_poison_payload_is_captured():
    out = DecodeImages()(pa.table({
        "image_id": pa.array([1, 2], pa.int64()),
        "image": pa.array([b"garbage", synth_image_payload(2)],
                          pa.binary()),
    }))
    errs = out["decode_error"].to_pylist()
    assert errs[0] is not None and "unsupported" in errs[0]
    assert errs[1] is None


def test_decode_real_codecs_is_stubbed():
    dec = DecodeImages(real_codecs=True)
    with pytest.raises(NotImplementedError):
        dec(pa.table({"image": pa.array([b"xx"], pa.binary())}))


def test_video_frame_sampling(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array([1, 2], pa.int64()),
        "video": pa.array([synth_video_payload(1), synth_video_payload(2)],
                          pa.binary()),
    }))
    out = ds.map_batches(SampleVideoFrames, batch_format="pyarrow",
                         batch_size=2, concurrency=1,
                         fn_constructor_kwargs={"n_frames": 3}).to_pandas()
    assert len(out) == 6  # 2 videos × 3 frames
    assert sorted(out["frame_idx"].unique()) == [0, 1, 2]
    # 6-frame clips sampled at 3 → source frames 0, 2/3 rounds, 5
    v1 = out[out["video_id"] == 1].sort_values("frame_idx")
    assert list(v1["src_frame"]) == [0, 2, 5]
    # distinct frames of the same video differ (pattern shifts per frame)
    f0, f1 = np.asarray(v1["frame"].iloc[0]), np.asarray(v1["frame"].iloc[1])
    assert not np.array_equal(f0, f1)


def test_video_exact_frame_pixels():
    """Frame sampling decodes the TRUE source frames: an MPNG of solid-
    color frames yields exactly those colors at the sampled indices."""
    frames = [np.full((4, 4, 3), c, np.uint8) for c in (10, 60, 110, 160)]
    out = SampleVideoFrames(n_frames=2)(pa.table({
        "video_id": pa.array([5], pa.int64()),
        "video": pa.array([mpng_encode(frames)], pa.binary()),
    }))
    assert out["src_frame"].to_pylist() == [0, 3]
    px0 = np.asarray(out["frame"][0].as_py(), np.uint8)
    px1 = np.asarray(out["frame"][1].as_py(), np.uint8)
    assert (px0 == 10).all()
    assert (px1 == 160).all()


def test_audio_pipeline_real_wav(ray_session):
    import ray.data as rd

    from scribe_js_ray.stages.multimodal import decode_audio_pipeline

    t = pa.table({
        "audio_id": pa.array([1, 2], pa.int64()),
        "audio": pa.array([synth_audio_payload(1), synth_audio_payload(2)],
                          pa.binary()),
    })
    out1 = decode_audio_pipeline(rd.from_arrow(t)).to_pandas() \
        .sort_values("audio_id", ignore_index=True)
    out2 = decode_audio_pipeline(rd.from_arrow(t)).to_pandas() \
        .sort_values("audio_id", ignore_index=True)
    assert len(out1) == 2
    assert list(out1["sample_rate"]) == [8000, 8000]
    assert list(out1["n_samples"]) == [2000, 2000]
    f1 = list(out1["features"].iloc[0])
    assert len(f1) == 10  # rms + zcr + 8 bands
    assert f1 == list(out2["features"].iloc[0])  # deterministic
    # distinct payloads give distinct features
    assert f1 != list(out1["features"].iloc[1])


def test_audio_exact_samples():
    """A known 16-bit WAV decodes to the exact quantized samples in the
    PCM window (zero-padded past the clip end)."""
    samples = np.array([0.5, -0.25, 1.0 - 1 / 32768], dtype=np.float32)
    out = DecodeAudio()(pa.table({
        "audio_id": pa.array([1], pa.int64()),
        "audio": pa.array([wav_encode(samples, 16000)], pa.binary()),
    }))
    pcm = np.asarray(out["pcm"][0].as_py(), np.float32)
    assert np.allclose(pcm[:3], samples, atol=1.0 / 32768)
    assert (pcm[3:] == 0).all()
    assert out["sample_rate"][0].as_py() == 16000
    assert out["n_samples"][0].as_py() == 3


def test_audio_real_codec_mode_raises():
    with pytest.raises(NotImplementedError):
        DecodeAudio(real_codecs=True)._decode_one(b"payload")


def test_audio_poison_payload_is_captured():
    out = DecodeAudio()(pa.table({
        "audio_id": pa.array([1], pa.int64()),
        "audio": pa.array([b"not a wav"], pa.binary()),
    }))
    assert out["decode_error"][0].as_py() is not None


def test_video_pipeline_frame_rows(ray_session):
    import ray.data as rd

    from scribe_js_ray.stages.multimodal import sample_video_pipeline

    t = pa.table({
        "video_id": pa.array([7, 8], pa.int64()),
        "video": pa.array([synth_video_payload(7), synth_video_payload(8)],
                          pa.binary()),
    })
    out = sample_video_pipeline(rd.from_arrow(t), n_frames=3).to_pandas()
    assert len(out) == 6  # 2 videos × 3 frames
    assert sorted(set(out["frame_idx"])) == [0, 1, 2]
    assert len(out["features"].iloc[0]) == 14  # image-feature DIM
