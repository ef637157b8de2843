"""Multimodal plumbing: schema, mapInPandas batch shapes, deterministic
fake codecs, stubbed real codecs."""

from __future__ import annotations

import pytest

from usajobs_etl_service_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synth_media(spark, n=30).cache()


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: r for r in MM.extract_image_features(media).collect()}
    b = {r["media_id"]: r for r in MM.extract_image_features(media).collect()}
    assert len(a) == 10  # 30 rows, every 3rd is an image
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["brightness"] == b[k]["brightness"]  # same bytes -> same pixels
        assert 0 <= a[k]["brightness"] <= 255
        assert a[k]["n_pixels"] == a[k]["width"] * a[k]["height"]


def test_synth_media_ascii_content_mode(spark):
    """q86's oracle precondition: with content_mode="ascii" the binary
    payload is EXACTLY the ASCII bytes of "{seed}:{i}" (so DuckDB's
    sha256(VARCHAR) hashes identical bytes), and the fake codec's
    geometry matches the hand-computed digest arithmetic."""
    import hashlib

    rows = {r["media_id"]: r for r in MM.synth_media(spark, n=6, content_mode="ascii").collect()}
    assert bytes(rows[0]["content"]) == b"42:0"
    assert bytes(rows[5]["content"]) == b"42:5"
    feats = {r["media_id"]: r for r in MM.extract_image_features(
        MM.synth_media(spark, n=6, content_mode="ascii")
    ).collect()}
    for i in (0, 3):
        dg = hashlib.sha256(f"42:{i}".encode()).digest()
        assert feats[i]["height"] == 8 + dg[8] % 8
        assert feats[i]["width"] == 8 + dg[9] % 8
    with pytest.raises(ValueError, match="content_mode"):
        MM.synth_media(spark, n=3, content_mode="nope")


def test_resize_shapes(spark, media):
    out = MM.resize_images(media, target_h=4, target_w=6).collect()
    assert len(out) == 10
    for r in out:
        assert (r["height"], r["width"]) == (4, 6)
        assert len(r["content"]) == 4 * 6 * 3  # raw RGB bytes


def test_video_frame_sampling(spark, media):
    out = MM.sample_video_frames(media, fps=2.0).collect()
    # 3500 ms at 2 fps -> 7 frames per video; 10 videos
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 10
    for frames in by_media.values():
        assert len(frames) == 7
        assert sorted(f["frame_idx"] for f in frames) == list(range(7))
        assert all(f["ts_ms"] == f["frame_idx"] * 500 for f in frames)


def test_audio_stats(spark, media):
    out = MM.audio_stats(media).collect()
    assert len(out) == 10
    for r in out:
        assert 0.0 < r["rms"] <= 1.0
        assert r["peak"] <= 1.0
        assert r["n_samples"] >= 256


def test_real_codec_is_explicitly_stubbed():
    """Without the optional libs, codec="real" must fail loudly, never
    silently fall back to the fake."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"x", "png", codec="real")
    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            MM.decode_audio(b"x", "wav", codec="real")


@pytest.mark.gated
def test_real_image_codec_when_available():
    """Exercised the day PIL lands in the environment; skipped until
    then (the [media] extra's -m gated lane)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (4, 3), color=(10, 20, 30)).save(buf, format="PNG")
    px = MM.decode_image(buf.getvalue(), "png", codec="real")
    assert px.shape == (3, 4, 3) and px.dtype.name == "uint8"
    assert (px[0, 0] == [10, 20, 30]).all()


@pytest.mark.gated
def test_real_audio_codec_when_available():
    """Exercised the day soundfile lands in the environment; skipped
    until then (the [media] extra's -m gated lane)."""
    sf = pytest.importorskip("soundfile")
    import io

    import numpy as np

    buf = io.BytesIO()
    wave = np.sin(np.linspace(0, 3.14, 100)).astype("float32")
    sf.write(buf, wave, 8000, format="WAV")
    out = MM.decode_audio(buf.getvalue(), "wav", codec="real")
    assert out.ndim == 1 and len(out) == 100


def test_metadata_only_query_prunes_binary(spark, media, tmp_path):
    """Column pruning: a metadata-only aggregate over the parquet media
    table must not read the binary column (ReadSchema check)."""
    path = str(tmp_path / "media_parquet")
    media.write.parquet(path)
    df = spark.read.parquet(path).groupBy("kind").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan  # binary column pruned from the scan
