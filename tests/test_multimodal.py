"""Multimodal plumbing tests: schema, batch shape, stub behavior."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from georip_spark.operators.multimodal import synth_media

    refs = spark.range(20).select(F.concat(F.lit("m"), F.col("id")).alias("media_ref"))
    return synth_media(refs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_ref", "payload", "meta"]
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray)) and len(row["payload"]) > 0
    assert row["meta"]["media_type"] in ("image", "audio", "video")


def test_extract_features_fake(media):
    from georip_spark.operators.multimodal import extract_features

    out = extract_features(media, n_features=8).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == 8
        assert r["n_bytes"] > 0 and len(r["digest"]) == 32
    # determinism: same input → same features
    again = extract_features(media, n_features=8).collect()
    assert {r["media_ref"]: r["features"] for r in out} == {
        r["media_ref"]: r["features"] for r in again
    }


def test_extract_features_error_stub(media):
    from georip_spark.operators.multimodal import extract_features

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, decode_stub="error").collect()


def test_resize_meta(media):
    from georip_spark.operators.multimodal import resize_meta

    out = resize_meta(media, max_side=64).collect()
    for r in out:
        assert 1 <= r["target_w"] <= 64 and 1 <= r["target_h"] <= 64


def test_sample_frames(media):
    from georip_spark.operators.multimodal import sample_frames

    vids = media.filter(F.col("meta.media_type") == "video")
    n_vids = vids.count()
    out = sample_frames(media, every=4)
    assert out.count() >= n_vids  # ≥1 frame per video
    assert out.filter(F.col("frame_idx") % 4 != 0).count() == 0
