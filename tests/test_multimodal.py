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
    assert kinds == {"image", "audio", "video"}
    mimes = {r["meta"]["mime"] for r in media.select("meta").collect()}
    assert {"image/png", "image/x-portable-graymap", "image/bmp",
            "image/x-fake", "audio/wav", "audio/x-fake",
            "video/x-yuv4mpeg"} <= mimes


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


def test_y4m_roundtrip_and_420():
    """y4m encode → decode is exact for mono; a hand-built 4:2:0 stream
    decodes its Y planes correctly too."""
    import numpy as np

    frames = [
        (np.arange(16 * 8, dtype=np.uint8).reshape(8, 16) + i) % 256
        for i in range(5)
    ]
    blob = multimodal.y4m_encode(frames, fps=10)
    fps, got = multimodal.decode_video(blob)
    assert fps == 10.0 and got.shape == (5, 8, 16)
    for i in range(5):
        assert np.array_equal((got[i] * 255).round().astype(np.uint8), frames[i])
    # 4:2:0: Y plane + quarter-size U and V per frame
    w, h = 8, 4
    y = np.full((h, w), 77, dtype=np.uint8)
    uv = bytes((w // 2) * (h // 2)) * 2
    blob420 = (f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
               + (b"FRAME\n" + y.tobytes() + uv) * 3)
    fps2, got2 = multimodal.decode_video(blob420)
    assert fps2 == 25.0 and got2.shape == (3, h, w)
    assert np.allclose(got2, 77 / 255.0)


def test_sample_frames(spark, media):
    """every_n sampling: frame indexes 0, n, 2n…, timestamps idx/fps,
    row counts = ceil(n_frames / every_n) per video."""
    import math

    out = multimodal.sample_frames(media, every_n=2).collect()
    assert len(out) > 0
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert r["frame_idx"] % 2 == 0
        assert abs(r["t_sec"] - r["frame_idx"] / 10.0) < 1e-9
        assert len(r["features"]) == multimodal.FEATURE_DIM
    for did, rows in by_doc.items():
        n_frames = 4 + (did % 5)
        assert len(rows) == math.ceil(n_frames / 2), did
    assert set(by_doc) == {
        r["doc_id"] for r in media.filter("kind = 'video'").select("doc_id").collect()
    }


def test_video_compressed_formats_raise_named_dependency():
    import pytest as _pytest

    mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16
    with _pytest.raises(NotImplementedError, match="ffmpeg|PyAV"):
        multimodal.decode_video(mp4)
    webm = b"\x1a\x45\xdf\xa3" + b"\x00" * 16
    with _pytest.raises(NotImplementedError, match="ffmpeg|PyAV"):
        multimodal.decode_video(webm)
    with _pytest.raises(ValueError, match="unrecognized video"):
        multimodal.decode_video(b"garbage data")


def test_sample_frames_every_one_keeps_all(spark, media):
    out = multimodal.sample_frames(media, every_n=1).collect()
    n_expected = sum(
        4 + (r["doc_id"] % 5)
        for r in media.filter("kind = 'video'").select("doc_id").collect()
    )
    assert len(out) == n_expected
