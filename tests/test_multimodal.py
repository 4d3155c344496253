"""Multimodal plumbing: synthetic media table, Arrow-batched
decode/featurize (deterministic fake), frame sampling, resize planning,
and the features → ANN integration."""

import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators import multimodal, similarity


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, 60)


def test_synth_media_shape(media):
    rows = media.collect()
    assert len(rows) == 60
    by_kind = {r.kind: r for r in rows}
    assert set(by_kind) == {"image", "audio", "video"}
    # image payloads are real binary PPM, audio real PCM WAV, video
    # real uncompressed AVI — every kind decodable by the stdlib paths
    assert bytes(by_kind["image"].payload).startswith(b"P6\n")
    assert len(bytes(by_kind["image"].payload)) == 11 + 4 * 4 * 3
    assert bytes(by_kind["audio"].payload).startswith(b"RIFF")
    assert len(bytes(by_kind["audio"].payload)) == 44 + 128
    vid = bytes(by_kind["video"].payload)
    assert vid.startswith(b"RIFF") and vid[8:12] == b"AVI "
    w, h, frames = multimodal._avi_parse(vid)
    assert (w, h, len(frames)) == (4, 4, 2)
    assert set(rows[0].meta) == {"width", "height", "duration_ms"}
    # deterministic across evaluations
    assert media.collect() == rows


def test_decode_and_featurize(media):
    feats = multimodal.decode_and_featurize(media).collect()
    assert len(feats) == 60
    by_id = {r.media_id: r for r in feats}
    assert by_id[0].n_bytes == 59  # P6 header + 4×4 RGB raster
    assert by_id[1].n_bytes == 172  # WAV header + 64 16-bit samples
    parts, fb = multimodal._avi_parts(4, 4, 2)
    assert by_id[2].n_bytes == sum(map(len, parts)) + 2 * fb  # AVI container
    assert len(by_id[0].features) == multimodal.FEATURE_DIM
    assert all(-1.0 <= v < 1.0 for v in by_id[0].features)
    # determinism: same payload → same features
    again = {r.media_id: r.features for r in multimodal.decode_and_featurize(media).collect()}
    assert again == {r.media_id: r.features for r in feats}


def test_strict_mode_gates_real_decoder(media, spark):
    # every kind (PPM image, WAV audio, AVI video) decodes for real —
    # the whole table passes strict end-to-end: no fake ever needed
    rows = multimodal.decode_and_featurize(media, strict=True).collect()
    assert len(rows) == 60 and all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    # an undecodable payload must still be refused under strict
    junk = spark.createDataFrame(
        [(99, "video", bytearray(b"\x00" * 128), {})], multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        multimodal.decode_and_featurize(junk, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)
    # non-strict: the same payload takes the documented deterministic fallback
    fb = multimodal.decode_and_featurize(junk).collect()[0]
    assert fb.features == multimodal._fake_features(b"\x00" * 128)


def test_wav_real_decode_path(spark):
    """Drives the REAL stdlib WAV decoder with known samples — constant
    amplitude 8192 ⇒ every RMS feature −0.5, zero crossings ⇒ −1.0."""
    import struct

    from graphforge_spark.operators.multimodal import _wav_header

    samples = struct.pack("<64h", *([8192] * 64))
    payload = _wav_header(len(samples)) + samples
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), {"duration_ms": "8"})],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_and_featurize(media, strict=True).collect()[0]
    # FEATURE_DIM=16 → 8 RMS features then 8 ZCR features
    assert all(abs(v - (-0.5)) < 1e-3 for v in row.features[:8])
    assert all(abs(v - (-1.0)) < 1e-9 for v in row.features[8:16])
    # malformed payloads return None (fallback/strict), not junk
    from graphforge_spark.operators.multimodal import _wav_audio_features

    assert _wav_audio_features(b"RIFFgarbage") is None
    assert _wav_audio_features(b"not audio at all") is None


def test_ppm_real_decode_path(spark):
    """Drives the REAL stdlib decoder with a known raster — no skip, no
    third-party codec: a uniform 4×4 PPM decodes to uniform intensities,
    not digest noise."""
    payload = b"P6\n# comment\n4 4\n255\n" + bytes([200] * 48)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), {"width": "4", "height": "4"})],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_and_featurize(media, strict=True).collect()[0]
    expect = 200 / 128.0 - 1.0
    assert all(abs(v - expect) < 1e-6 for v in row.features)
    # malformed P6 payloads return None (fallback/strict path), not junk
    from graphforge_spark.operators.multimodal import _ppm_image_features

    assert _ppm_image_features(b"P6\n4 4\n255\n" + b"\x00" * 10) is None
    assert _ppm_image_features(b"P5\n4 4\n255\n" + b"\x00" * 48) is None
    assert _ppm_image_features(b"not a ppm") is None


def test_avi_real_decode_path(spark):
    """Drives the REAL stdlib AVI decoder with known frames — uniform
    gray 100 in both frames ⇒ every intensity feature 100/128−1 and
    every motion feature −1.0 (zero inter-frame change)."""
    from graphforge_spark.operators.multimodal import (
        _avi_container,
        _avi_parse,
        _avi_video_features,
    )

    payload = _avi_container([bytes([100] * 48)] * 2, 4, 4)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), {"duration_ms": "80"})],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_and_featurize(media, strict=True).collect()[0]
    expect = 100 / 128.0 - 1.0
    # FEATURE_DIM=16 → 8 intensity features then 8 motion features
    assert all(abs(v - expect) < 1e-6 for v in row.features[:8])
    assert all(abs(v - (-1.0)) < 1e-9 for v in row.features[8:16])
    # distinct frames register motion: frame0 all 0, frame1 all 200
    moving = _avi_video_features(_avi_container([bytes(48), bytes([200] * 48)], 4, 4))
    assert abs(moving[8] - (200 / 128.0 - 1.0)) < 1e-6
    # malformed payloads return None (fallback/strict path), not junk
    assert _avi_parse(b"RIFFgarbage") is None
    assert _avi_parse(b"RIFF\x00\x00\x00\x00AVI junk") is None
    assert _avi_parse(b"not video at all") is None
    assert _avi_video_features(b"\x00" * 128) is None


def test_pil_real_decode_path(spark):
    """Drives the REAL codec branch — skipped (with reason) where PIL is
    not installed, exactly like the Iceberg writer's jar gate."""
    PIL = pytest.importorskip("PIL", reason="PIL not installed in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (32, 32), color=200).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), {"width": "32", "height": "32"})],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_and_featurize(media, strict=True).collect()[0]
    # a uniform image decodes to uniform intensities, not digest noise
    expect = 200 / 128.0 - 1.0
    assert all(abs(v - expect) < 1e-6 for v in row.features)


def test_fake_fallback_only_when_codec_missing(spark):
    """Where PIL is absent a non-PPM image (e.g. PNG bytes) has no
    decoder — strict must refuse it; this asserts the gate decision,
    not the feature values."""
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    from graphforge_spark.operators.multimodal import _pil_image_features

    got = _pil_image_features(b"not-an-image", 8)
    # undecodable payload OR missing codec → None either way
    assert got is None
    if not has_pil:
        # a PNG-magic payload matches neither PPM nor (absent) PIL —
        # the strict gate must refuse it rather than ship a fake
        png_ish = spark.createDataFrame(
            [(7, "image", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64), {})],
            multimodal.MEDIA_SCHEMA,
        )
        with pytest.raises(Exception) as ei:
            multimodal.decode_and_featurize(png_ish, strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)


def test_frame_sample(media, spark):
    # AVI payloads yield REAL container frames: 2 frames of 48 raster bytes
    frames = multimodal.frame_sample(media, every=32, max_frames=4).collect()
    vids = {r.media_id for r in frames}
    assert vids  # some videos exist
    per = sorted((r for r in frames if r.media_id == min(vids)), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in per] == [0, 1]
    assert all(len(bytes(r.frame_bytes)) == 48 for r in per)
    # the sampled bytes ARE the container's frame chunks
    payload = bytes(media.filter(F.col("media_id") == min(vids)).collect()[0].payload)
    _, _, real = multimodal._avi_parse(payload)
    assert [bytes(r.frame_bytes) for r in per] == real
    # opaque payloads take the documented stride fallback
    junk = spark.createDataFrame(
        [(9, "video", bytearray(b"\x07" * 128), {})], multimodal.MEDIA_SCHEMA
    )
    fb = multimodal.frame_sample(junk, every=32, max_frames=4).collect()
    assert [r.frame_idx for r in sorted(fb, key=lambda r: r.frame_idx)] == list(range(4))
    assert all(len(bytes(r.frame_bytes)) == 32 for r in fb)


def test_resize_meta(media):
    rows = multimodal.resize_meta(media, max_side=256).collect()
    for r in rows:
        assert max(r.target_width, r.target_height) <= 256
        # aspect ratio preserved within rounding
        if r.width >= r.height:
            assert r.target_width == min(r.width, 256)


def test_features_feed_ann(media, spark):
    feats = multimodal.decode_and_featurize(media).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    out = similarity.cosine_topk(feats, feats.filter(F.col("vec_id") < 3), k=2)
    rows = out.collect()
    assert len(rows) == 6  # 3 queries × k=2
    assert all(r.neighbor_id != r.query_id for r in rows)
