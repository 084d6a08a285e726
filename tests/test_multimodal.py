"""Multimodal actor-pool plumbing: schemas, batch flow, determinism.

The decode itself is a deterministic stub (no media libs in this env); what
these tests pin down is the REAL part — actor signature, small-batch flow,
output schema, strict-mode behavior, and run-to-run determinism."""

import numpy as np
import pytest

from lucene_ray.ops.multimodal import (
    DecodeImage,
    FrameSample,
    decode_images,
    make_fake_media_table,
    sample_frames,
)


def test_fake_media_table_deterministic():
    a = make_fake_media_table(10)
    b = make_fake_media_table(10)
    assert a.equals(b)
    assert a.schema.field("payload").type == "binary"


def test_decode_images_pipeline(ray_session):
    import ray.data

    ds = ray.data.from_arrow(make_fake_media_table(50))
    out = decode_images(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"media_id", "width", "height", "resized_to", "real_decode", "features"}
    assert (out["width"] >= 64).all() and (out["width"] <= 64 + 255).all()
    assert all(len(f) == 8 for f in out["features"])
    # determinism across runs
    out2 = decode_images(ray.data.from_arrow(make_fake_media_table(50))).to_pandas()
    assert out.sort_values("media_id")["width"].tolist() == \
        out2.sort_values("media_id")["width"].tolist()


def test_decode_strict_raises():
    batch = make_fake_media_table(2)
    with pytest.raises(NotImplementedError, match="image library"):
        DecodeImage(strict=True)(batch)


def test_frame_sample(ray_session):
    import ray.data

    ds = ray.data.from_arrow(make_fake_media_table(20, kind="video"))
    out = sample_frames(ds, frames_per_clip=4).to_pandas()
    assert len(out) == 80
    assert out.groupby("media_id")["frame"].count().eq(4).all()


def test_actor_init_smoke():
    # actor __init__ errors surface late in Ray — smoke the classes directly
    DecodeImage()(make_fake_media_table(3))
    FrameSample(2)(make_fake_media_table(3))
