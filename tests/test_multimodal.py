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


def test_resize_media_roundtrip(ray_session):
    """Resize stage: output payloads re-decode at the target geometry and
    preserve the binary/metadata layout."""
    from lucene_solr_ray.pipelines.multimodal import (
        MediaDecodeStage,
        resize_media,
        synth_media,
    )

    sf = "/root/testdata/sf0.001"
    small = resize_media(synth_media(sf), target_w=8, target_h=6)
    out = small.take(5)
    dec = MediaDecodeStage()
    for row in out:
        assert row["width"] == 8 and row["height"] == 6
        mid, w, h, body = dec.decoders["image/fake"](row["payload"])
        assert (mid, w, h) == (row["media_id"], 8, 6)
        assert len(body) == 8 * 6
    # features still computable downstream of the resize
    feats = small.map_batches(MediaDecodeStage, batch_format="pyarrow",
                              batch_size=64, concurrency=2,
                              num_cpus=0.5).to_pandas()
    assert len(feats) == 500
    assert (feats["payload_bytes"] == 32 + 48).all()
