"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
invalid-payload tolerance, frame-sampling explosion (SURVEY §8
beyond-reference ops; decode is the deterministic IMG1/AUD1 parser — the
real-codec slot is import-gated, see pipeline/multimodal.py)."""

from __future__ import annotations

import pytest

from inspectehr_spark.pipeline import multimodal as M


def _image_df(spark):
    rows = [
        (0, M.encode_image(4, 3, seed=0)),     # 12 bytes payload
        (1, M.encode_image(2, 2, seed=10)),
        (2, b"NOTANIMAGE"),                    # undecodable
        (3, None),                             # null payload
    ]
    return spark.createDataFrame(rows, "doc_id long, image binary")


def test_decode_image_features(spark):
    out = M.decode_image_features(_image_df(spark))
    assert out.schema == M.IMAGE_FEATURES_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert (rows[0]["width"], rows[0]["height"]) == (4, 3)
    # payload = bytes(0..11) → mean 5.5
    assert rows[0]["mean_byte"] == pytest.approx(5.5)
    assert rows[1]["mean_byte"] == pytest.approx(10 + 1.5)
    assert rows[2]["format"] == "invalid" and rows[2]["width"] is None
    assert rows[3]["format"] == "invalid" and rows[3]["n_bytes"] == 0


def test_decode_audio_features(spark):
    df = spark.createDataFrame(
        [(0, M.encode_audio(16000, 32000)), (1, b"junk")],
        "doc_id long, audio binary",
    )
    rows = {r["doc_id"]: r for r in M.decode_audio_features(df).collect()}
    assert rows[0]["sample_rate"] == 16000
    assert rows[0]["duration_sec"] == pytest.approx(2.0)
    assert rows[1]["format"] == "invalid"


def test_sample_frames_explodes(spark):
    # 8 frames of 64 bytes; every 2nd → frames 0,2,4,6
    video = M.encode_image(32, 16, seed=0)  # 512-byte payload after header
    df = spark.createDataFrame([(7, video)], "doc_id long, video binary")
    out = M.sample_frames(df, frame_bytes=64, every_n=2)
    rows = sorted((r["frame_index"], r["frame_bytes"]) for r in out.collect())
    assert rows == [(0, 64), (2, 64), (4, 64), (6, 64)]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="PIL"):
        M.decode_real_image(b"\x89PNG")


def test_size_bucket_partitioning(spark):
    df = M.with_size_buckets(_image_df(spark), "doc_id", 4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 4


def test_real_codec_contract():
    """When PIL is importable, decode_real_image must return the same
    (width, height) tuple shape as the IMG1 parser — so it can be swapped
    into decode_image_features unchanged. PIL is absent from this
    container, so the PIL half is skipped here (documented in VERDICT r2
    #8); the IMG1 half always runs."""
    from inspectehr_spark.pipeline import multimodal as mm

    w, h = 6, 4
    img1 = mm.encode_image(w, h, seed=3)
    pw, ph, pn, pmean = mm._parse_img1(img1)
    assert (pw, ph, pn) == (w, h, len(img1))

    try:
        import io

        from PIL import Image
    except ImportError:
        import pytest

        with pytest.raises(NotImplementedError, match="needs PIL"):
            mm.decode_real_image(img1)
        pytest.skip("PIL absent in this container — PIL half of the contract skipped")

    buf = io.BytesIO()
    Image.new("L", (w, h), color=7).save(buf, format="PNG")
    rw, rh, rn, rmean = mm.decode_real_image(buf.getvalue())
    assert (rw, rh) == (w, h)
    assert rn == len(buf.getvalue())
    assert abs(rmean - 7.0) < 1e-9
