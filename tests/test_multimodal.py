"""Multimodal plumbing tests: schema, batch shape, stub behavior,
and the REAL PNG/WAV decode paths (georip_spark.codecs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georip_spark import codecs


@pytest.fixture(scope="module")
def media(spark):
    from georip_spark.operators.multimodal import synth_media

    refs = spark.range(20).select(F.concat(F.lit("m"), F.col("id")).alias("media_ref"))
    return synth_media(refs).cache()


@pytest.fixture(scope="module")
def real_media(spark):
    from georip_spark.operators.multimodal import synth_media_real

    refs = spark.range(24).select(F.concat(F.lit("r"), F.col("id")).alias("media_ref"))
    return synth_media_real(refs).cache()


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


def test_real_payloads_are_valid_media(real_media):
    from georip_spark import jpeg

    rows = real_media.collect()
    kinds = set()
    img_kinds = set()
    for r in rows:
        payload = bytes(r["payload"])
        mt = r["meta"]["media_type"]
        if mt == "image":
            kind = codecs.sniff(payload)
            assert kind in ("png", "jpeg")
            img_kinds.add(kind)
            img = (
                codecs.png_decode(payload)
                if kind == "png"
                else jpeg.jpeg_decode(payload)
            )
            assert img.shape == (r["meta"]["height"], r["meta"]["width"], 3)
        elif mt == "video":
            from georip_spark import avi

            assert codecs.sniff(payload) == "avi"
            m = avi.avi_meta(payload)
            assert m["n_frames"] == r["meta"]["n_frames"]
            assert (m["width"], m["height"]) == (
                r["meta"]["width"], r["meta"]["height"]
            )
            frames = avi.avi_decode_frames(payload)
            assert len(frames) == m["n_frames"]
            assert frames[0].shape == (m["height"], m["width"])
        elif mt == "audio":
            assert codecs.sniff(payload) == "wav"
            samples, rate = codecs.wav_decode(payload)
            assert rate == r["meta"]["sample_rate"]
            assert samples.shape == (rate // 100, 1)
        kinds.add(mt)
    assert kinds == {"image", "audio", "video"}
    assert img_kinds == {"png", "jpeg"}  # both image codecs exercised


def test_extract_features_real_decode(real_media):
    """Every row (image, audio, AND video since the MJPEG codec)
    feature-extracts from the REAL decoded pixels/samples — verified
    by recomputing locally from the payload."""
    from georip_spark.operators.multimodal import decode_media, extract_features

    out = {r["media_ref"]: r for r in extract_features(real_media, n_features=4).collect()}
    checked = 0
    for r in real_media.collect():
        arr = decode_media(bytes(r["payload"]))
        assert arr is not None
        expect = [float(b.mean()) for b in np.array_split(arr.ravel(), 4)]
        got = out[r["media_ref"]]["features"]
        np.testing.assert_allclose(got, expect, rtol=1e-6)
        checked += 1
    assert checked > 0


def test_error_stub_passes_recognized_formats(real_media, spark):
    """decode_stub='error' only raises for UNRECOGNIZED payloads: the
    whole real corpus (PNG/JPEG/WAV/MJPEG-AVI) decodes under the
    strict posture; a fake inter-frame payload still raises."""
    from georip_spark.operators.multimodal import extract_features, synth_media

    assert (
        extract_features(real_media, decode_stub="error").count()
        == real_media.count()
    )
    fake = synth_media(
        spark.range(3).select(F.concat(F.lit("f"), F.col("id")).alias("media_ref"))
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(fake, decode_stub="error").collect()


def test_media_meta_cols_jvm_parse(real_media):
    """The pure-column-math header parse agrees with the python codecs
    on every recognized payload — no python workers in its plan."""
    from georip_spark.operators.multimodal import media_meta_cols

    out = media_meta_cols(real_media)
    for r in out.collect():
        payload = bytes(r["payload"])
        kind = codecs.sniff(payload)
        assert r["sniffed_type"] == kind
        if kind == "png":
            m = codecs.png_meta(payload)
            assert (r["media_w"], r["media_h"]) == (m["width"], m["height"])
            assert r["media_bit_depth"] == m["bit_depth"]
            assert r["media_channels"] == m["channels"]
        elif kind == "wav":
            m = codecs.wav_meta(payload)
            assert r["media_sample_rate"] == m["sample_rate"]
            assert r["media_channels"] == m["n_channels"]
            assert r["media_bit_depth"] == m["bits"]
        elif kind == "jpeg":
            # JVM parse sniffs the magic only (SOF0 floats behind
            # variable-length segments); dims come from the python
            # parse, asserted here for the same payload
            from georip_spark import jpeg

            assert r["media_w"] is None and r["media_h"] is None
            m = jpeg.jpeg_meta(payload)
            assert m["width"] > 0 and m["height"] > 0 and m["channels"] == 3
        elif kind == "avi":
            from georip_spark import avi

            m = avi.avi_meta(payload)
            assert (r["media_w"], r["media_h"]) == (m["width"], m["height"])
            assert r["media_n_frames"] == m["n_frames"]


def test_media_meta_cols_plan_is_jvm_only(real_media):
    from georip_spark.operators.multimodal import media_meta_cols

    # the metadata projection itself must add no python eval node
    base = real_media.select("media_ref", "payload")
    plan = media_meta_cols(base)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sample_frames_decode_real(real_media):
    """MJPEG-AVI rows emit REAL decoded frames at the sampled indices,
    carried as lossless PNG — pixel-compared against a local decode of
    the same payload."""
    from georip_spark import avi
    from georip_spark.operators.multimodal import sample_frames_decode

    every = 2
    out = sample_frames_decode(real_media, every=every).collect()
    by_ref: dict = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], {})[r["frame_idx"]] = r
    checked = 0
    for r in real_media.collect():
        payload = bytes(r["payload"])
        if codecs.sniff(payload) != "avi":
            assert r["media_ref"] not in by_ref  # no frames for non-video
            continue
        frames = {i: f for i, f in enumerate(avi.avi_decode_frames(payload))}
        got = by_ref[r["media_ref"]]
        assert sorted(got) == [i for i in sorted(frames) if i % every == 0]
        for i, row in got.items():
            img = codecs.png_decode(bytes(row["frame_png"]))
            np.testing.assert_array_equal(img, frames[i])
            assert (row["frame_h"], row["frame_w"]) == frames[i].shape
            checked += 1
    assert checked > 0


def test_resize_image_real(real_media):
    from georip_spark import jpeg
    from georip_spark.operators.multimodal import resize_image

    out = {r["media_ref"]: r for r in resize_image(real_media, max_side=32).collect()}
    jpeg_checked = 0
    for r in real_media.collect():
        res = out[r["media_ref"]]
        src_payload = bytes(r["payload"])
        kind = codecs.sniff(src_payload)
        if r["meta"]["media_type"] != "image":
            assert bytes(res["payload"]) == src_payload  # passthrough
            continue
        if kind == "png":
            img = codecs.png_decode(bytes(res["payload"]))
            src = codecs.png_decode(src_payload)
        else:
            img = jpeg.jpeg_decode(bytes(res["payload"]))
            src = jpeg.jpeg_decode(src_payload)
            jpeg_checked += 1
        assert res["target_h"] == img.shape[0] and res["target_w"] == img.shape[1]
        assert max(img.shape[:2]) <= 32
        # nearest-neighbor: every resampled pixel exists in the source
        ys = (np.arange(res["target_h"]) * src.shape[0]) // res["target_h"]
        xs = (np.arange(res["target_w"]) * src.shape[1]) // res["target_w"]
        expect = src[ys][:, xs]
        if kind == "png":
            np.testing.assert_array_equal(img, expect)
        else:
            # jpeg re-encode at q90 is lossy, and a pure-noise source
            # is jpeg's worst case (all high-frequency energy, which
            # quantization removes — measured ≈36 mean abs here).
            # Uncorrelated uint8 pairs would read ≈85, so 50 still
            # proves the resample indexed the right source pixels.
            assert codecs.sniff(bytes(res["payload"])) == "jpeg"
            err = np.abs(img.astype(int) - expect.astype(int)).mean()
            assert err < 50.0
    assert jpeg_checked > 0
