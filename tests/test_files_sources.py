"""File-based sources (sources/files.py): ORC round-trip with
pushdown, binaryFile media ingest feeding the multimodal manifest
end-to-end (real PNG/WAV payloads from the in-repo codecs written as
FILES), glob pruning, and the gated Avro error."""

from __future__ import annotations

import os

import numpy as np
import pytest

from e_commerce_lakehouse_spark.operators import multimodal as MM
from e_commerce_lakehouse_spark.sources import files as FS


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "orc")
    FS.write_orc(spark.range(0, 1000).selectExpr("id", "id % 7 AS k"), p)
    back = FS.read_orc(spark, p)
    assert back.count() == 1000
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter("id < 10").select("id").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "isnotnull" in plan.lower()


def test_media_dir_ingest_to_manifest(spark, tmp_path):
    """Real files on disk -> binaryFile -> media_manifest: dims,
    duration, and mime come back from the actual codec round-trip;
    the glob prunes the stray text file at listing time."""
    d = tmp_path / "media"
    d.mkdir()
    png = MM.encode_png(bytes(range(64)), 8, 8, 1)
    (d / "a.png").write_bytes(png)
    samples = (
        (1000 * np.sin(np.arange(1600) * 0.1)).astype(np.int16)
    )
    (d / "b.wav").write_bytes(MM.encode_wav(samples, 16000))
    (d / "junk.txt").write_text("not media")

    media = FS.read_media_dir(spark, str(d), glob="*.{png,wav}")
    rows = {os.path.basename(r.path): r for r in media.collect()}
    assert set(rows) == {"a.png", "b.wav"}
    assert rows["a.png"].kind == "image" and rows["b.wav"].kind == "audio"

    man = {
        os.path.basename(p): r
        for p, r in zip(
            [r.path for r in media.orderBy("path").collect()],
            FS.ingest_media_manifest(spark, str(d), glob="*.{png,wav}")
            .join(media.select("media_id", "path"), "media_id")
            .orderBy("path")
            .collect(),
        )
    }
    a = man["a.png"]
    assert (a.sniffed_mime, a.width, a.height, a.channels) == ("image/png", 8, 8, 1)
    b = man["b.wav"]
    assert b.sniffed_mime == "audio/wav"
    assert b.duration_ms == 100  # 1600 samples at 16 kHz

    # unfiltered read sees the junk file as an unknown passthrough row
    all_man = FS.ingest_media_manifest(spark, str(d))
    assert all_man.count() == 3
    unknown = all_man.filter("sniffed_mime = 'application/octet-stream'")
    assert unknown.count() == 1


def test_avro_raises_actionably(spark, tmp_path):
    with pytest.raises(RuntimeError, match="spark-avro"):
        FS.read_avro(spark, str(tmp_path / "nope"))
