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


def test_netpbm_roundtrip():
    from lucene_solr_ray.pipelines.multimodal import (decode_netpbm,
                                                      encode_pgm)

    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    payload = encode_pgm(px)
    w, h, ch, raster = decode_netpbm(payload)
    assert (w, h, ch) == (8, 6, 1)
    assert (raster.reshape(6, 8) == px).all()
    # comment + extra whitespace in the header still parses
    commented = b"P5\n# a comment\n 8  6\n255\n" + px.tobytes()
    assert decode_netpbm(commented)[:2] == (8, 6)
    with pytest.raises(ValueError):
        decode_netpbm(b"JUNK")


def test_wav_roundtrip_and_features():
    import math

    from lucene_solr_ray.pipelines.multimodal import (decode_wav,
                                                      encode_wav)

    t = np.arange(1600) / 16000.0
    samples = (10000 * np.sin(2 * np.pi * 440.0 * t)).astype(np.int16)
    rate, got = decode_wav(encode_wav(samples))
    assert rate == 16000
    assert (got == samples).all()
    rms = float(np.sqrt(np.mean(got.astype(np.float64) ** 2)))
    assert rms == pytest.approx(10000 / math.sqrt(2), rel=0.01)


def test_real_media_features_pipeline(ray_session):
    from lucene_solr_ray.pipelines.multimodal import media_real_features

    out = media_real_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    img = out[out.kind == "image"]
    aud = out[out.kind == "audio"]
    assert len(img) and len(aud)
    # sine-tone RMS ~ amplitude/sqrt(2)
    assert (abs(aud["f_mean_or_rms"] - 7071) < 300).all()
    # gradient image brightness within byte range, nonzero contrast
    assert img["f_mean_or_rms"].between(0, 255).all()
    assert (img["f_std_or_zcr"] > 0).all()


def test_resize_real_pgm(ray_session):
    import ray.data as rd

    from lucene_solr_ray.pipelines.multimodal import (decode_netpbm,
                                                      encode_pgm,
                                                      resize_media)

    px = (np.outer(np.arange(20), np.ones(30)) * 12).astype(np.uint8)
    t = pa.table({
        "media_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([encode_pgm(px)], type=pa.large_binary()),
        "media_type": ["image/x-portable-graymap"],
        "width": pa.array([30], type=pa.int32()),
        "height": pa.array([20], type=pa.int32()),
    })
    out = resize_media(rd.from_arrow(t), target_w=10, target_h=8,
                       concurrency=1).to_pandas()
    w, h, _, raster = decode_netpbm(out["payload"][0])
    assert (w, h) == (10, 8)
    # nearest-neighbor of a vertical gradient keeps monotone rows
    rows = raster.reshape(8, 10).astype(int)
    assert (np.diff(rows[:, 0]) >= 0).all()
