"""Multimodal columns: real stdlib decoders (PNG incl. all five
scanline filters, PGM/PPM, BMP, WAV) round-tripped against the
encoders, format dispatch, and the distributed feature/resize stages
over a mixed-format corpus."""

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
    mimes = {r["meta"]["mime"] for r in media.select("meta").collect()}
    assert {"image/png", "image/x-portable-graymap", "image/bmp",
            "image/x-fake", "audio/wav", "audio/x-fake"} <= mimes


def test_determinism(spark):
    a = multimodal.synthesize_media(spark, SF)
    b = multimodal.synthesize_media(spark, SF)
    ha = a.selectExpr("bit_xor(xxhash64(doc_id, kind, content)) h").collect()[0]["h"]
    hb = b.selectExpr("bit_xor(xxhash64(doc_id, kind, content)) h").collect()[0]["h"]
    assert ha == hb


# ---- decoder round trips (no Spark) --------------------------------------

def _gray(px):
    return px.astype(np.float32).mean(axis=2) / 255.0


def test_png_roundtrip_all_filters():
    """Every PNG scanline filter (0=None, 1=Sub, 2=Up, 3=Average,
    4=Paeth) must unfilter back to the original pixels."""
    rng = np.random.RandomState(11)
    for channels in (1, 3, 4):
        px = rng.randint(0, 256, size=(13, 9, channels), dtype=np.uint8)
        want = px.astype(np.float32).mean(axis=2) / 255.0
        for ft in range(5):
            content = multimodal.png_encode(px, filter_type=ft)
            got = multimodal.decode_image(content)
            assert np.allclose(got, want), (channels, ft)


def test_pgm_ppm_roundtrip():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(7, 11), dtype=np.uint8)
    pgm = b"P5\n# comment line\n11 7\n255\n" + px.tobytes()
    assert np.allclose(multimodal.decode_image(pgm), px.astype(np.float32) / 255.0)
    px3 = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    ppm = b"P6 6 4 255\n" + px3.tobytes()
    assert np.allclose(multimodal.decode_image(ppm), _gray(px3))


def test_bmp_roundtrip():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(6, 10, 3), dtype=np.uint8)
    content = multimodal.bmp_encode(px)
    assert np.allclose(multimodal.decode_image(content), _gray(px))


def test_wav_roundtrip():
    content, meta = multimodal.synth_wav(3)
    sr, samples = multimodal.decode_audio(content)
    assert sr == meta["sample_rate"]
    assert samples.size * 1000 // sr == meta["duration_ms"]
    assert np.abs(samples).max() <= 1.0
    assert np.abs(samples).max() > 0.1  # actual sine content


def test_fake_containers_still_decode():
    content, _ = multimodal.synth_fake_image(7)
    img = multimodal.decode_image(content)
    assert img.ndim == 2 and img.dtype == np.float32
    content, meta = multimodal.synth_fake_audio(9)
    sr, arr = multimodal.decode_audio(content)
    assert sr == meta["sample_rate"] and arr.size > 0


def test_unsupported_formats_raise_named_dependency():
    with pytest.raises(NotImplementedError, match="JPEG"):
        multimodal.decode_image(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"not-an-image-at-all")


# ---- distributed stages ----------------------------------------------------

def test_features_distributed(spark, media):
    feats = multimodal.media_features(media).collect()
    assert len(feats) == 500
    for r in feats[:20]:
        assert len(r["features"]) == multimodal.FEATURE_DIM
    again = multimodal.media_features(media).collect()
    assert sorted((r["doc_id"], tuple(r["features"])) for r in feats) == sorted(
        (r["doc_id"], tuple(r["features"])) for r in again
    )


def test_resize(spark, media):
    out = multimodal.resize_images(media, 16, 16).collect()
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)
    assert len(out) == media.filter("kind = 'image'").count()


def test_mp3_sync_and_16bit_netpbm_raise():
    with pytest.raises(NotImplementedError, match="MP3"):
        multimodal.decode_audio(b"\xff\xfb\x90\x64realmp3frame")
    with pytest.raises(NotImplementedError, match="MP3"):
        multimodal.decode_audio(b"ID3\x04\x00taggedmp3")
    with pytest.raises(NotImplementedError, match="maxval"):
        multimodal.decode_image(b"P5\n2 2\n65535\n" + b"\x00" * 8)
