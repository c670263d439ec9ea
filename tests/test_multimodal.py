"""Multimodal stage plumbing: schemas, determinism, stub gating."""

import numpy as np
import pyarrow as pa
import pytest

from scribe_js_ray.stages.multimodal import (
    DecodeImages, ImageFeatures, SampleVideoFrames, decode_image_pipeline)


def _images_ds(n=6):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "image_id": pa.array(range(n), pa.int64()),
        "image": pa.array([bytes([i]) * 100 for i in range(n)],
                          pa.binary()),
    }))


def test_decode_pipeline_schema_and_determinism(ray_session):
    out1 = decode_image_pipeline(_images_ds(), batch_size=2).to_pandas()
    out2 = decode_image_pipeline(_images_ds(), batch_size=3).to_pandas()
    assert set(out1.columns) == {"image_id", "thumb", "thumb_h", "thumb_w",
                                 "features"}
    assert len(out1) == 6
    # identical payload bytes decode identically regardless of batching
    o1 = out1.sort_values("image_id", ignore_index=True)
    o2 = out2.sort_values("image_id", ignore_index=True)
    for i in range(6):
        assert np.array_equal(np.asarray(o1["thumb"][i]),
                              np.asarray(o2["thumb"][i]))
        assert np.allclose(np.asarray(o1["features"][i]),
                           np.asarray(o2["features"][i]))
    assert len(o1["features"][0]) == ImageFeatures.DIM


def test_decode_real_codecs_is_stubbed():
    dec = DecodeImages(real_codecs=True)
    with pytest.raises(NotImplementedError):
        dec(pa.table({"image": pa.array([b"xx"], pa.binary())}))


def test_video_frame_sampling(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array([1, 2], pa.int64()),
        "video": pa.array([b"aaa", b"bbb"], pa.binary()),
    }))
    out = ds.map_batches(SampleVideoFrames, batch_format="pyarrow",
                         batch_size=2, concurrency=1,
                         fn_constructor_kwargs={"n_frames": 3}).to_pandas()
    assert len(out) == 6  # 2 videos × 3 frames
    assert sorted(out["frame_idx"].unique()) == [0, 1, 2]
    # distinct frames of the same video differ deterministically
    v1 = out[out["video_id"] == 1].sort_values("frame_idx")
    f0, f1 = np.asarray(v1["frame"].iloc[0]), np.asarray(v1["frame"].iloc[1])
    assert not np.array_equal(f0, f1)


def test_audio_pipeline_deterministic(ray_session):
    import ray.data as rd

    from scribe_js_ray.stages.multimodal import decode_audio_pipeline

    t = pa.table({
        "audio_id": pa.array([1, 2], pa.int64()),
        "audio": pa.array([b"clip-one", b"clip-two"], pa.binary()),
    })
    out1 = decode_audio_pipeline(rd.from_arrow(t)).to_pandas() \
        .sort_values("audio_id", ignore_index=True)
    out2 = decode_audio_pipeline(rd.from_arrow(t)).to_pandas() \
        .sort_values("audio_id", ignore_index=True)
    assert len(out1) == 2
    f1 = list(out1["features"].iloc[0])
    assert len(f1) == 10  # rms + zcr + 8 bands
    assert f1 == list(out2["features"].iloc[0])  # deterministic
    # distinct payloads give distinct features
    assert f1 != list(out1["features"].iloc[1])


def test_audio_real_codec_mode_raises():
    from scribe_js_ray.stages.multimodal import DecodeAudio
    import pytest
    with pytest.raises(NotImplementedError):
        DecodeAudio(real_codecs=True)._decode_one(b"payload")


def test_video_pipeline_frame_rows(ray_session):
    import ray.data as rd

    from scribe_js_ray.stages.multimodal import sample_video_pipeline

    t = pa.table({
        "video_id": pa.array([7, 8], pa.int64()),
        "video": pa.array([b"v7-bytes", b"v8-bytes"], pa.binary()),
    })
    out = sample_video_pipeline(rd.from_arrow(t), n_frames=3).to_pandas()
    assert len(out) == 6  # 2 videos × 3 frames
    assert sorted(set(out["frame_idx"])) == [0, 1, 2]
    assert len(out["features"].iloc[0]) == 14  # image-feature DIM
