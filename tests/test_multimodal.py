"""Multimodal plumbing: schema, determinism, actor stage, stub behavior."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.pipelines.multimodal import (
    MediaDecodeStage,
    frame_sample,
    media_features,
    synth_media,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_schema_and_determinism(ray_session):
    d1 = synth_media(SF_DIR).to_pandas().set_index("media_id").sort_index()
    d2 = synth_media(SF_DIR).to_pandas().set_index("media_id").sort_index()
    assert (d1["payload"] == d2["payload"]).all()
    r = synth_media(SF_DIR).take(1)[0]
    assert isinstance(r["payload"], bytes) and len(r["payload"]) > 4096
    assert r["media_type"] == "image/fake"


def test_decode_stage_features(ray_session):
    df = media_features(SF_DIR).to_pandas()
    assert set(df.columns) == {"media_id", "width", "height",
                               "payload_bytes", "mean_byte", "std_byte"}
    assert len(df) == 500
    assert (df["mean_byte"].between(100, 155)).all()  # uniform bytes ~127.5
    assert df["media_id"].is_unique


def test_decode_stage_direct_and_stub():
    stage = MediaDecodeStage()
    batch = pa.table({
        "media_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([b"xx"], type=pa.large_binary()),
        "media_type": pa.array(["video/mp4"]),
        "width": pa.array([1], type=pa.int32()),
        "height": pa.array([1], type=pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        stage(batch)


def test_frame_sample(ray_session):
    ds = synth_media(SF_DIR)
    sampled = frame_sample(ds, every_n=10).to_pandas()
    assert (sampled["media_id"] % 10 == 0).all()
    assert len(sampled) == 50
