"""Multimodal binary-column plumbing: synthesis, decode stubs, feature
extraction, resize, frame sampling — schemas and batch shapes are real,
codecs are deterministic fakes (no image/audio libs in the container)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ddsketch_spark.operators.multimodal import (
    decode_image, encode_fake_image, encode_fake_video, extract_features,
    fake_decode_image, fake_decode_video, resize_images, sample_frames,
    synthesize_media,
)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(encode_fake_image(4, 4, 1))


def test_fake_image_roundtrip():
    img = fake_decode_image(encode_fake_image(10, 6, 7))
    assert img.shape == (6, 10) and img.dtype == np.uint8
    assert np.array_equal(img, fake_decode_image(encode_fake_image(10, 6, 7)))


def test_synthesize_media_deterministic(spark):
    a = synthesize_media(spark, 30).orderBy("media_id").toPandas()
    b = synthesize_media(spark, 30).orderBy("media_id").toPandas()
    assert list(a["kind"]) == list(b["kind"])
    assert all(bytes(x) == bytes(y) for x, y in zip(a["payload"], b["payload"]))
    assert set(a["kind"]) == {"image", "audio", "video"}


def test_extract_features_all_modalities(spark):
    media = synthesize_media(spark, 30)
    feats = extract_features(media).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats["feature"])
    # image features are byte means in [0, 255]
    img = feats[feats["kind"] == "image"]
    assert all(0 <= v <= 255 for f in img["feature"] for v in f)


def test_resize_images(spark):
    media = synthesize_media(spark, 30)
    small = resize_images(media, 8, 8).toPandas()
    assert (small["meta_width"] == 8).all() and (small["meta_height"] == 8).all()
    for _, row in small.iterrows():
        img = fake_decode_image(bytes(row["payload"]))
        assert img.shape == (8, 8)


def test_sample_frames(spark):
    media = synthesize_media(spark, 30)
    frames = sample_frames(media, every=2).toPandas()
    vids = media.where(F.col("kind") == "video").toPandas()
    want = sum((fake_decode_video(bytes(p)).shape[0] + 1) // 2
               for p in vids["payload"])
    assert len(frames) == want
    assert (frames["frame_idx"] % 2 == 0).all()


def test_arith_media_decode_roundtrip(spark):
    """The arithmetic synthesizer's payloads decode to exactly the integer
    sequence the DuckDB oracle re-derives (multimodal_stats_sql)."""
    import numpy as np

    from ddsketch_spark.operators.multimodal import (
        ARITH_MUL, fake_decode_audio, fake_decode_image, fake_decode_video,
        synthesize_media_arith,
    )

    rows = synthesize_media_arith(spark, 12, seed=7).orderBy("media_id").collect()
    assert [r["kind"] for r in rows[:3]] == ["image", "audio", "video"]
    for r in rows:
        i = r["media_id"]
        s = 7 * 1_000_003 + i
        if r["kind"] == "image":
            a = fake_decode_image(bytes(r["payload"])).ravel().astype(np.int64)
            want = (s + (np.arange(a.size) + 1) * ARITH_MUL) % 256
        elif r["kind"] == "audio":
            a = fake_decode_audio(bytes(r["payload"]))[1].astype(np.int64)
            want = ((s + (np.arange(a.size) + 1) * ARITH_MUL) % 4001) - 2000
        else:
            a = fake_decode_video(bytes(r["payload"])).ravel().astype(np.int64)
            want = (s + (np.arange(a.size) + 1) * ARITH_MUL) % 256
        assert a.size % 8 == 0  # equal 8-way chunks for extract_features
        assert (a == want).all()
