"""Metadata-only schema evolution (sources/snapshots.py add_column /
rename_column / drop_column + column mapping): Iceberg's ALTER TABLE
column DDL as manifest edits — no data file is touched at any table
size. Files keep STABLE physical names; the entry's logical schema +
logical->physical mapping drive every read. Raw-file ops refuse under
a non-identity mapping; materialize_schema clears it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.sources import deletes as D
from e_commerce_lakehouse_spark.sources import snapshots as S
from e_commerce_lakehouse_spark.sources import sql_dml


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, root):
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "id long, qty long, note string"
    )
    return S.write_snapshot(df, root)


def _data_bytes(root):
    total = 0
    for dirpath, _, files in os.walk(root):
        if "_manifests" in dirpath:
            continue
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def test_add_column_is_metadata_only(spark, root):
    base = _mk(spark, root)
    before = _data_bytes(root)
    sid = S.add_column(root, "score", "double")
    assert _data_bytes(root) == before  # no data written
    got = S.read_snapshot(spark, root)
    assert got.columns == ["id", "qty", "note", "score"]
    assert all(r.score is None for r in got.collect())
    # appends carry values; old rows stay NULL
    S.write_snapshot(
        spark.createDataFrame([(3, 30, "c", 0.5)],
                              "id long, qty long, note string, score double"),
        root, mode="append",
    )
    vals = {r.id: r.score for r in S.read_snapshot(spark, root).collect()}
    assert vals == {1: None, 2: None, 3: 0.5}
    # time travel: before the DDL the column does not exist
    old = S.read_snapshot(spark, root, snapshot_id=base)
    assert old.columns == ["id", "qty", "note"]
    del sid


def test_append_widening_merges_schema(spark, root):
    _mk(spark, root)
    S.write_snapshot(
        spark.createDataFrame([(3, 30, "c", "x")],
                              "id long, qty long, note string, extra string"),
        root, mode="append",
    )
    # widening append IS the evolution; a later NARROW append must not
    # shrink the logical table back
    S.write_snapshot(
        spark.createDataFrame([(4, 40, "d")], "id long, qty long, note string"),
        root, mode="append",
    )
    got = S.read_snapshot(spark, root)
    assert got.columns == ["id", "qty", "note", "extra"]
    vals = {r.id: r.extra for r in got.collect()}
    assert vals == {1: None, 2: None, 3: "x", 4: None}


def test_append_type_conflict_refused(spark, root):
    _mk(spark, root)
    with pytest.raises(ValueError, match="schema conflict"):
        S.write_snapshot(
            spark.createDataFrame([(3, "oops", "c")],
                                  "id long, qty string, note string"),
            root, mode="append",
        )


def test_rename_column_metadata_only(spark, root):
    base = _mk(spark, root)
    before = _data_bytes(root)
    S.rename_column(root, "qty", "quantity")
    assert _data_bytes(root) == before
    got = S.read_snapshot(spark, root)
    assert got.columns == ["id", "quantity", "note"]
    assert {r.id: r.quantity for r in got.collect()} == {1: 10, 2: 20}
    # appends write the new logical name onto the STABLE physical name
    S.write_snapshot(
        spark.createDataFrame([(3, 30, "c")],
                              "id long, quantity long, note string"),
        root, mode="append",
    )
    assert {r.id: r.quantity for r in S.read_snapshot(spark, root).collect()} \
        == {1: 10, 2: 20, 3: 30}
    # the appended FILE stores the physical name 'qty'
    entry = S._load(root)
    assert S._entry(entry, entry["current"])["mapping"] == {"quantity": "qty"}
    # time travel shows the old name
    assert S.read_snapshot(spark, root, snapshot_id=base).columns == [
        "id", "qty", "note",
    ]
    # predicate scan on the NEW name prunes + filters correctly
    assert [r.id for r in
            S.scan_snapshot(spark, root, [("quantity", ">=", 30)]).collect()] \
        == [3]


def test_drop_then_readd_never_resurrects(spark, root):
    _mk(spark, root)
    S.drop_column(root, "note")
    assert S.read_snapshot(spark, root).columns == ["id", "qty"]
    S.add_column(root, "note", "string")
    got = S.read_snapshot(spark, root)
    assert got.columns == ["id", "qty", "note"]
    # the old 'note' payload ('a','b') must NOT come back
    assert all(r.note is None for r in got.collect())
    # and the fresh physical name is recorded in the mapping
    m = S._load(root)
    assert S._entry(m, m["current"])["mapping"]["note"] != "note"


def test_raw_ops_guarded_then_materialize(spark, root):
    _mk(spark, root)
    S.rename_column(root, "qty", "quantity")
    with pytest.raises(ValueError, match="renamed columns"):
        S.replace_where(
            spark,
            root,
            spark.createDataFrame([], "id long, quantity long, note string"),
            [("id", "=", 1)],
        )
    with pytest.raises(ValueError, match="renamed columns"):
        S.compact_files(spark, root)
    with pytest.raises(ValueError, match="renamed columns"):
        D.delete_where_dv(spark, root, [("id", "=", 1)])
    sid = S.materialize_schema(spark, root)
    entry = S._entry(S._load(root), sid)
    assert "mapping" not in entry
    # physical == logical again: raw ops work
    D.delete_where_dv(spark, root, [("id", "=", 1)])
    assert [r.id for r in S.read_snapshot(spark, root).collect()] == [2]


def test_reference_guards(spark, root):
    _mk(spark, root)
    S.set_constraint(root, "qty_pos", "qty >= 0")
    with pytest.raises(ValueError, match="constraint"):
        S.rename_column(root, "qty", "quantity")
    with pytest.raises(ValueError, match="constraint"):
        S.drop_column(root, "qty")
    S.drop_constraint(root, "qty_pos")
    S.rename_column(root, "qty", "quantity")
    with pytest.raises(ValueError, match="already exists"):
        S.add_column(root, "quantity", "long")
    with pytest.raises(KeyError, match="no column"):
        S.drop_column(root, "nope")
    with pytest.raises(ValueError, match="last column"):
        for c in ("quantity", "note", "id"):
            S.drop_column(root, c)


def test_sql_alter_column_ddl_routes(spark, root):
    _mk(spark, root)
    out = sql_dml.execute_dml(
        spark, "ALTER TABLE t ADD COLUMN score double", {"t": root}
    )
    assert out["op"] == "add_column"
    out = sql_dml.execute_dml(
        spark, "ALTER TABLE t RENAME COLUMN qty TO quantity", {"t": root}
    )
    assert out["op"] == "rename_column"
    out = sql_dml.execute_dml(
        spark, "ALTER TABLE t DROP COLUMN score", {"t": root}
    )
    assert out["op"] == "drop_column"
    assert S.read_snapshot(spark, root).columns == ["id", "quantity", "note"]


def test_table_stream_reads_through_mapping(spark, root, tmp_path):
    from e_commerce_lakehouse_spark.streaming.table_source import (
        read_table_stream,
    )

    _mk(spark, root)
    S.rename_column(root, "qty", "quantity")
    S.write_snapshot(
        spark.createDataFrame([(3, 30, "c")],
                              "id long, quantity long, note string"),
        root, mode="append",
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_table_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "quantity", "note"}
    assert {r.id: r.quantity for r in got.collect()} == {1: 10, 2: 20, 3: 30}


def test_rewrite_commits_preserve_evolved_schema(spark, root):
    """replace_where / update_where / compact record a parent-merged
    schema: a metadata-only added column survives the rewrite, and a
    dropped column's physical payload in old files never re-enters the
    logical schema."""
    _mk(spark, root)
    S.add_column(root, "score", "double")
    S.drop_column(root, "note")
    # compact reads the raw files (which still carry 'note' physically
    # and lack 'score'): the committed schema must keep 'score' and
    # must NOT resurrect 'note'
    S.write_snapshot(
        spark.createDataFrame([(9, 90, 0.5)], "id long, qty long, score double"),
        root, mode="append",
    )
    S.compact_files(spark, root, target_bytes=1 << 30)
    got = S.read_snapshot(spark, root)
    assert got.columns == ["id", "qty", "score"]
    assert {r.id: r.score for r in got.collect()} == {1: None, 2: None, 9: 0.5}
    # update_where likewise
    S.update_where(spark, root, [("id", "=", 9)], {"qty": "qty + 1"})
    got = S.read_snapshot(spark, root)
    assert got.columns == ["id", "qty", "score"]
    assert {r.id: r.qty for r in got.collect()}[9] == 91


def test_alter_column_type_widening(spark, root):
    """Metadata-only lossless widening (int->long style): old narrow
    files read back through an up-cast; non-widening changes refuse."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, qty int")
    S.write_snapshot(df, root)
    before = _data_bytes(root)
    sql_dml.execute_dml(
        spark, "ALTER TABLE t ALTER COLUMN qty TYPE bigint", {"t": root}
    )
    assert _data_bytes(root) == before
    got = S.read_snapshot(spark, root)
    assert dict(got.dtypes)["qty"] == "bigint"
    assert {r.id: r.qty for r in got.collect()} == {1: 10, 2: 20}
    # appends at the WIDE type land next to narrow files
    S.write_snapshot(
        spark.createDataFrame([(3, 2**40)], "id long, qty long"),
        root, mode="append",
    )
    assert {r.id: r.qty for r in S.read_snapshot(spark, root).collect()} \
        == {1: 10, 2: 20, 3: 2**40}
    with pytest.raises(ValueError, match="lossless"):
        S.alter_column_type(root, "id", "int")  # narrowing
    with pytest.raises(ValueError, match="already"):
        S.alter_column_type(root, "qty", "long")
    # raw rewrites refuse on mixed physical widths, with the fix named
    with pytest.raises(ValueError, match="materialize_schema"):
        S.compact_files(spark, root)
    S.materialize_schema(spark, root)
    S.compact_files(spark, root)  # re-enabled; everything wide now
    assert {r.id: r.qty for r in S.read_snapshot(spark, root).collect()} \
        == {1: 10, 2: 20, 3: 2**40}


def test_add_column_with_initial_default(spark, root):
    """ADD COLUMN ... DEFAULT: rows that PREDATE the column read the
    default; rows written after read exactly what they wrote, explicit
    NULLs included (Iceberg v3 / Delta initial-default semantics)."""
    _mk(spark, root)
    sql_dml.execute_dml(
        spark, "ALTER TABLE t ADD COLUMN tier string DEFAULT 'basic'",
        {"t": root},
    )
    got = {r.id: r.tier for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "basic", 2: "basic"}
    # a post-ADD append with an explicit NULL keeps the NULL
    S.write_snapshot(
        spark.createDataFrame([(3, 30, "c", "gold"), (4, 40, "d", None)],
                              "id long, qty long, note string, tier string"),
        root, mode="append",
    )
    got = {r.id: r.tier for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "basic", 2: "basic", 3: "gold", 4: None}
    # raw-file ops refuse while a default is live; materialize bakes it
    with pytest.raises(ValueError, match="initial"):
        S.compact_files(spark, root)
    S.materialize_schema(spark, root)
    got = {r.id: r.tier for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "basic", 2: "basic", 3: "gold", 4: None}
    S.compact_files(spark, root)  # re-enabled, values baked
    got = {r.id: r.tier for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "basic", 2: "basic", 3: "gold", 4: None}


def test_default_with_deletion_vectors_read(spark, root):
    """Defaults added AFTER deletion vectors exist: the read applies
    both (the src-dir tag is captured before the DV anti-join)."""
    _mk(spark, root)
    D.set_delete_mode(root, "merge-on-read")
    D.delete_where_dv(spark, root, [("id", "=", 1)])
    S.add_column(root, "tier", "string", default="basic")
    got = {(r.id, r.tier) for r in S.read_snapshot(spark, root).collect()}
    assert got == {(2, "basic")}


def test_table_stream_emits_defaults(spark, root, tmp_path):
    from e_commerce_lakehouse_spark.streaming.table_source import (
        read_table_stream,
    )

    _mk(spark, root)
    S.add_column(root, "tier", "string", default="basic")
    S.write_snapshot(
        spark.createDataFrame([(3, 30, "c", "gold")],
                              "id long, qty long, note string, tier string"),
        root, mode="append",
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_table_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    got = {r.id: r.tier for r in spark.read.parquet(out).collect()}
    assert got == {1: "basic", 2: "basic", 3: "gold"}
