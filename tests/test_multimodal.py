"""Multimodal plumbing: schema, deterministic synthesis, feature
extraction and resize stages run distributed; the real-decode stub is
correctly gated behind NotImplementedError."""

import numpy as np
import pytest

from eaststorm_searchengine_spark.operators import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synthesize_media(spark, SF).cache()


def test_schema_and_counts(spark, media):
    assert media.count() == 500
    assert dict(media.dtypes)["content"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio"}
    row = media.filter("kind = 'image'").first()
    assert row["meta"]["mime"] == "image/x-fake"
    assert row["meta"]["width"] is not None


def test_determinism(spark):
    a = multimodal.synthesize_media(spark, SF)
    b = multimodal.synthesize_media(spark, SF)
    ha = a.selectExpr("bit_xor(xxhash64(doc_id, kind, content)) h").collect()[0]["h"]
    hb = b.selectExpr("bit_xor(xxhash64(doc_id, kind, content)) h").collect()[0]["h"]
    assert ha == hb


def test_features_distributed(spark, media):
    feats = multimodal.media_features(media).collect()
    assert len(feats) == 500
    for r in feats[:20]:
        assert len(r["features"]) == multimodal.FEATURE_DIM
    # deterministic per doc
    again = multimodal.media_features(media).collect()
    assert sorted((r["doc_id"], tuple(r["features"])) for r in feats) == sorted(
        (r["doc_id"], tuple(r["features"])) for r in again
    )


def test_resize(spark, media):
    out = multimodal.resize_images(media, 16, 16).collect()
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)
    assert len(out) == media.filter("kind = 'image'").count()


def test_real_decode_is_stubbed():
    content, _ = multimodal.synth_image(7)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(content, fake=False)
    img = multimodal.decode_image(content, fake=True)
    assert img.ndim == 2 and img.dtype == np.float32
