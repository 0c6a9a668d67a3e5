"""Multimodal plumbing tests: the Spark-side pipeline (schema, Arrow
batching, one-to-many expansion) is real; codecs are deterministic
fakes per the stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import multimodal as mm
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    return mm.synthesize_media(docs).cache()


def test_media_schema_and_payloads(media):
    assert set(media.columns) == {"media_id", "kind", "payload", "mime", "meta"}
    row = media.first()
    assert bytes(row["payload"]).startswith(b"\x89PNG")
    assert len(bytes(row["payload"])) == 8 + 16 + 16


def test_feature_extraction(spark, media):
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["sniffed_mime"] == "image/png"
        assert r["n_bytes"] == 40
        assert len(r["digest"]) == 32
    # digest matches an independent computation for one row
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    import hashlib

    r0 = rows[0]
    assert r0["digest"] == hashlib.md5(raw[r0["media_id"]]).hexdigest()


def test_sniff_mime_table():
    assert mm.sniff_mime(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert mm.sniff_mime(b"RIFF....WAVE") == "audio/wav"
    assert mm.sniff_mime(b"\x00\x00\x00\x18ftypmp42") == "video/mp4"
    assert mm.sniff_mime(None) == "application/octet-stream"
    assert mm.sniff_mime(b"plain") == "application/octet-stream"


def test_decode_stub_raises_without_fake(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((Py4JJavaError, PythonException, Exception)) as ei:
        mm.decode_images(media, use_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "image decode requires" in str(ei.value)


def test_decode_fake_shapes(spark, media):
    decoded = mm.decode_images(media, use_fake=True)
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert r["channels"] == 3
        assert len(bytes(r["pixels"])) == 80  # payload * 2
    # deterministic across runs
    again = {r["media_id"]: (r["width"], r["height"]) for r in mm.decode_images(media, use_fake=True).collect()}
    for r in rows:
        assert again[r["media_id"]] == (r["width"], r["height"])


def test_frame_sampling_one_to_many(spark, media):
    frames = mm.sample_frames(media, every_n=1, use_fake=True)
    n = frames.count()
    assert n == 50  # 40 bytes // 32 // 1 → 1 frame each
    r = frames.first()
    assert r["frame_no"] == 0
    assert len(bytes(r["frame"])) == 32


def test_resize_fake_bounded_output(spark, media):
    from e_commerce_lakehouse_spark.operators import multimodal as mm

    decoded = mm.decode_images(media, use_fake=True)
    resized = mm.resize_images(decoded, out_w=8, out_h=8, use_fake=True).collect()
    assert len(resized) == media.count()
    for r in resized:
        assert (r.width, r.height) == (8, 8)
        assert len(r.pixels) == 8 * 8 * r.channels


def test_resize_stub_raises_without_fake(spark, media):
    import pytest
    from e_commerce_lakehouse_spark.operators import multimodal as mm

    decoded = mm.decode_images(media, use_fake=True)
    with pytest.raises(Exception):
        mm.resize_images(decoded, use_fake=False).collect()
