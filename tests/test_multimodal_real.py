"""Real pure-numpy media codecs (PPM images, WAV PCM16 audio) and their
actor-pool decode stages."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops.multimodal import (
    DecodeAudio,
    DecodeImage,
    decode_audio,
    decode_images,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    make_fake_media_table,
    make_ppm_media_table,
    make_wav_media_table,
    resize_nearest,
)


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    with_comment = b"P6\n# a comment\n2 2\n255\n" + img[:2, :2].tobytes()
    assert np.array_equal(decode_ppm(with_comment), img[:2, :2])
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n....")


def test_resize_nearest_exact():
    small = np.array([[[0, 0, 0], [255, 255, 255]],
                      [[10, 10, 10], [20, 20, 20]]], np.uint8)
    r = resize_nearest(small, 4, 4)
    assert r.shape == (4, 4, 3)
    assert r[0, 0].tolist() == [0, 0, 0]
    assert r[0, 3].tolist() == [255, 255, 255]
    assert r[3, 3].tolist() == [20, 20, 20]
    # identity resize
    assert np.array_equal(resize_nearest(small, 2, 2), small)


def test_wav_roundtrip_mono_stereo():
    t = np.arange(8000)
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    pcm, rate = decode_wav(encode_wav(sine, 8000))
    assert rate == 8000 and np.array_equal(pcm[:, 0], sine)
    stereo = np.stack([sine, -sine], axis=1)
    pcm2, rate2 = decode_wav(encode_wav(stereo, 16000))
    assert rate2 == 16000 and np.array_equal(pcm2, stereo)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_decode_image_real_path_features():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_ppm(img)], pa.binary()),
    })
    out = DecodeImage(target_size=8)(t)
    assert out.column("width").to_pylist() == [30]
    assert out.column("height").to_pylist() == [20]
    assert out.column("real_decode").to_pylist() == [True]
    feats = np.array(out.column("features").to_pylist()[0])
    small = resize_nearest(img, 8, 8).astype(np.float32) / 255.0
    want = np.concatenate([small.mean(axis=(0, 1)), small.std(axis=(0, 1))])
    assert np.allclose(feats, want, atol=1e-6)


def test_decode_image_strict_rejects_non_ppm():
    t = make_fake_media_table(3)
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(t)
    out = DecodeImage(strict=False)(t)  # stub fallback still works
    assert out.column("real_decode").to_pylist() == [False] * 3


def test_decode_audio_sine_rms():
    rate = 8000
    t = np.arange(rate)
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    tbl = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_wav(sine, rate)], pa.binary()),
    })
    out = DecodeAudio()(tbl)
    assert out.column("sample_rate").to_pylist() == [rate]
    assert out.column("n_channels").to_pylist() == [1]
    assert abs(out.column("duration_s").to_pylist()[0] - 1.0) < 1e-9
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(out.column("rms").to_pylist()[0] - 0.5 / np.sqrt(2)) < 0.01
    # 440 Hz crosses zero ~880 times/s -> zcr ~ 880/8000
    assert abs(out.column("zcr").to_pylist()[0] - 880 / 8000) < 0.01


def test_actor_pool_pipelines_end_to_end(ray_session):
    imgs = ray.data.from_arrow(make_ppm_media_table(40, seed=3))
    out = decode_images(imgs, concurrency=(1, 2), batch_size=16)
    rows = sorted(
        (r["media_id"], r["width"], r["height"], r["real_decode"])
        for b in out.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    assert len(rows) == 40 and all(r[3] for r in rows)
    # widths/heights match a driver-side re-decode
    tbl = make_ppm_media_table(40, seed=3)
    for (mid, w, h, _), p in zip(rows, tbl.column("payload").to_pylist()):
        img = decode_ppm(p)
        assert (h, w) == img.shape[:2]

    wavs = ray.data.from_arrow(make_wav_media_table(30, seed=4))
    aout = decode_audio(wavs, concurrency=(1, 2), batch_size=16)
    arows = [r for b in aout.iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    assert len(arows) == 30
    assert all(r["sample_rate"] == 8000 and 0.0 < r["rms"] < 1.0
               for r in arows)
