"""Streaming TABLE source (streaming/table_source.py): readStream over
the snapshot commit log via the PySpark Python DataSource API — the
Delta streaming-table-source semantics: initial full snapshot (DVs
applied), append tailing, exactly-once checkpoint restart, loud refusal
of non-append commits, ignoreDeletes/ignoreChanges escape hatches,
commit-version column, throttling, schema evolution."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.sources import deletes as D
from e_commerce_lakehouse_spark.sources import snapshots as S
from e_commerce_lakehouse_spark.streaming.table_source import (
    read_table_stream,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tbl_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk_table(spark, root, n=20, start=0):
    df = spark.range(start, start + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    return S.write_snapshot(df.repartition(2), root, mode="overwrite")


def _append(spark, root, lo, hi):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    return S.write_snapshot(df.repartition(1), root, mode="append")


def _drain(spark, root, out, ckpt, **options):
    q = (
        read_table_stream(spark, root, **options)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)


def _keys(spark, out):
    return sorted(r.k for r in spark.read.parquet(out).select("k").collect())


def test_initial_batch_is_full_snapshot_with_dvs(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=20)
    # DV-delete BEFORE the stream starts: the initial batch must not
    # resurrect the marked rows (read-side parity with read_snapshot)
    D.delete_where_dv(spark, root, [("k", "<", 5)])
    _drain(spark, root, out, ckpt)
    assert _keys(spark, out) == list(range(5, 20))
    got = {
        (r.k, r.v, r.s)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.k, r.v, r.s)
        for r in S.read_snapshot(spark, root).collect()
    }
    assert got == want


def test_tail_appends_exactly_once_across_restart(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    base = _mk_table(spark, root, n=10)
    _drain(spark, root, out, ckpt, withCommitVersion="true")
    s1 = _append(spark, root, 10, 15)
    s2 = _append(spark, root, 15, 18)
    # restart on the SAME checkpoint: only the two new commits replay
    _drain(spark, root, out, ckpt, withCommitVersion="true")
    rows = spark.read.parquet(out).collect()
    assert sorted(r.k for r in rows) == list(range(18))  # no dupes
    versions = {r.k: r._commit_version for r in rows}
    assert all(versions[k] == base for k in range(10))
    assert all(versions[k] == s1 for k in range(10, 15))
    assert all(versions[k] == s2 for k in range(15, 18))


def test_change_commit_refuses_then_ignore_changes(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=10)
    _drain(spark, root, out, ckpt)
    # replace_where rewrites files -> not an append (replacement rows
    # must satisfy the predicate scope)
    repl = spark.range(0, 2).select(
        F.col("id").alias("k"),
        F.lit(0).cast("long").alias("v"),
        F.lit("replaced").alias("s"),
    )
    S.replace_where(spark, root, repl, [("k", "<", 3)])
    q = (
        read_table_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="ignoreChanges"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # same checkpoint + ignoreChanges: the rewrite's added files emit
    # (rewritten survivors re-appear — the documented Delta contract)
    _drain(spark, root, out, ckpt, ignoreChanges="true")
    rows = spark.read.parquet(out).collect()
    # the replacement rows arrived
    assert {(r.k, r.s) for r in rows if r.s == "replaced"} == {
        (0, "replaced"), (1, "replaced"),
    }
    # survivors of the rewritten files re-appear (initial + rewrite) —
    # the documented ignoreChanges duplication
    ks = sorted(r.k for r in rows)
    assert ks.count(3) >= 1


def test_dv_delete_refuses_then_ignore_deletes(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=10)
    _drain(spark, root, out, ckpt)
    D.delete_where_dv(spark, root, [("k", "=", 2)])
    q = (
        read_table_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="ignoreDeletes"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # with the option the DV-only commit contributes nothing new
    _drain(spark, root, out, ckpt, ignoreDeletes="true")
    assert _keys(spark, out) == list(range(10))
    # and a subsequent append still flows on the same checkpoint
    _append(spark, root, 10, 12)
    _drain(spark, root, out, ckpt, ignoreDeletes="true")
    assert _keys(spark, out) == list(range(12))


def test_merge_on_read_upsert_emits_post_states(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=10)
    _drain(spark, root, out, ckpt)
    batch = spark.createDataFrame(
        [(1, 111, "upd-1"), (42, 420, "new-42")], "k long, v long, s string"
    )
    D.merge_upsert_dv(spark, root, batch, ["k"])
    # the MoR commit DV-deletes already-emitted rows -> needs the option
    _drain(spark, root, out, ckpt, ignoreDeletes="true")
    rows = spark.read.parquet(out).collect()
    ks = sorted(r.k for r in rows)
    assert ks == sorted(list(range(10)) + [1, 42])  # post-image + insert
    assert {r.v for r in rows if r.k == 1} == {10, 111}
    assert {r.v for r in rows if r.k == 42} == {420}


def test_starting_snapshot_id_tails_only(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    base = _mk_table(spark, root, n=10)
    _append(spark, root, 10, 13)
    _drain(spark, root, out, ckpt, startingSnapshotId=str(base))
    assert _keys(spark, out) == [10, 11, 12]


def test_max_commits_per_trigger_splits_batches(spark, tmpdir):
    # the throttle applies from the SECOND trigger of a run (the
    # offset API has no admission control — see module docstring), so
    # drain the initial batch first, then land 3 commits under the
    # RUNNING query and check they arrive as 3 one-commit batches
    root = f"{tmpdir}/t"
    _mk_table(spark, root, n=4)
    batches = []

    def sink(df, batch_id):
        batches.append(sorted(r.k for r in df.collect()))

    q = (
        read_table_stream(spark, root, maxCommitsPerTrigger="1")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
        assert batches == [[0, 1, 2, 3]]  # initial full snapshot
        _append(spark, root, 4, 6)
        _append(spark, root, 6, 8)
        _append(spark, root, 8, 10)
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert batches == [[0, 1, 2, 3], [4, 5], [6, 7], [8, 9]]


def test_batch_read_same_format(spark, tmpdir):
    """spark.read.format('snapshot_table') parity: current snapshot
    with DVs applied, or a pinned snapshotId for time travel."""
    from e_commerce_lakehouse_spark.streaming.table_source import (
        TableStreamDataSource,
    )

    root = f"{tmpdir}/t"
    base = _mk_table(spark, root, n=10)
    D.delete_where_dv(spark, root, [("k", "=", 7)])
    spark.dataSource.register(TableStreamDataSource)
    got = sorted(
        r.k for r in
        spark.read.format("snapshot_table").option("path", root).load()
        .collect()
    )
    assert got == [k for k in range(10) if k != 7]
    pinned = sorted(
        r.k for r in
        spark.read.format("snapshot_table").option("path", root)
        .option("snapshotId", str(base)).load().collect()
    )
    assert pinned == list(range(10))


def test_schema_evolution_pads_nulls_for_old_files(spark, tmpdir):
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=4)
    wide = spark.createDataFrame(
        [(50, 500, "row-50", "extra")], "k long, v long, s string, e string"
    )
    S.write_snapshot(wide, root, mode="append")
    _drain(spark, root, out, ckpt)
    rows = {r.k: r.e for r in spark.read.parquet(out).collect()}
    assert rows[50] == "extra"
    assert all(rows[k] is None for k in range(4))


def test_silver_tail_into_gold_merge_sink(spark, tmpdir):
    """Composition: a downstream job tails the SILVER snapshot table
    itself (this round's table source) and MERGEs into a GOLD snapshot
    table through the exactly-once sink — the reference's streaming
    story without re-subscribing to the broker. Gold must equal silver
    after every drain, across a checkpoint restart, and a silver DV
    delete must flow past ignoreDeletes without disturbing gold."""
    from e_commerce_lakehouse_spark.streaming import sinks

    silver, gold, ckpt = (f"{tmpdir}/{d}" for d in ("silver", "gold", "ck"))
    _mk_table(spark, silver, n=10)
    S.write_snapshot(
        spark.createDataFrame([], "k long, v long, s string"), gold
    )

    def drain():
        q = (
            read_table_stream(spark, silver, ignoreDeletes="true")
            .writeStream.foreachBatch(
                sinks.foreach_batch_merge_snapshot(gold, ["k"])
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    drain()
    assert {tuple(r) for r in S.read_snapshot(spark, gold).collect()} == {
        tuple(r) for r in S.read_snapshot(spark, silver).collect()
    }
    # upstream keeps writing; a NEW stream run on the same checkpoint
    # resumes from the committed snapshot offset
    _append(spark, silver, 10, 14)
    D.delete_where_dv(spark, silver, [("k", "=", 3)])  # gold keeps k=3
    _append(spark, silver, 14, 16)
    drain()
    gold_rows = {tuple(r) for r in S.read_snapshot(spark, gold).collect()}
    want = {tuple(r) for r in S.read_snapshot(spark, silver).collect()}
    assert want < gold_rows  # silver minus the DV-deleted row
    assert gold_rows - want == {(3, 30, "row-3")}
    # exactly-once: replaying the drain commits nothing new
    head = S._load(gold)["current"]
    drain()
    assert S._load(gold)["current"] == head


def _mk_single_file_commits(spark, root, n_files, rows_per_file):
    """Exactly ``n_files`` one-file data dirs (repartition(1) per
    commit) so file-count assertions are deterministic; the stream's
    initial snapshot covers them all."""
    for i in range(n_files):
        lo = i * rows_per_file
        df = spark.range(lo, lo + rows_per_file).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
            F.concat(F.lit("row-"), F.col("id")).alias("s"),
        ).repartition(1)
        S.write_snapshot(
            df, root, mode="append" if i else "overwrite"
        )


def test_max_files_per_trigger_slices_initial_snapshot(spark, tmpdir):
    """maxFilesPerTrigger splits the INITIAL snapshot across triggers —
    including the very FIRST one (the fresh-stream engine order
    latestOffset->initialOffset proves the base) — with no row lost or
    duplicated, and tailing resumes whole-commit after the phase."""
    root = f"{tmpdir}/t"
    # exactly 6 files: one single-file commit per 2-row slice (a
    # repartition(6) can leave empty partitions that write no file)
    _mk_single_file_commits(spark, root, n_files=6, rows_per_file=2)
    batches = []

    def sink(bdf, batch_id):
        batches.append(sorted(r.k for r in bdf.collect()))

    q = (
        read_table_stream(spark, root, maxFilesPerTrigger="2")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
        assert len(batches) == 3, batches  # 6 files / 2 per trigger
        assert all(b for b in batches)
        _append(spark, root, 12, 14)
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    flat = sorted(k for b in batches for k in b)
    assert flat == list(range(14))  # exactly once, phase + tail


def test_max_files_per_trigger_restart_mid_phase(spark, tmpdir):
    """A restart in the middle of the sliced initial snapshot resumes
    at the checkpointed file position — exactly once across runs
    (availableNow falls back to one batch per run for this source, so
    each run consumes one slice)."""
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_single_file_commits(spark, root, n_files=5, rows_per_file=2)

    def one_run():
        q = (
            read_table_stream(spark, root, maxFilesPerTrigger="2")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    counts = []
    for _ in range(3):  # 2 + 2 + 1 files
        one_run()
        counts.append(len(_keys(spark, out)))
    assert counts[0] < counts[1] < counts[2] == 10
    assert _keys(spark, out) == list(range(10))


def test_change_feed_emits_inserts_and_deletes(spark, tmpdir):
    """readChangeFeed: appends arrive as 'insert' rows, DV deletes as
    'delete' rows carrying their pre-delete values, a merge-on-read
    upsert as the delete+insert pair — per _commit_version, matching
    the batch snapshot_changes feed on the same commits."""
    root = f"{tmpdir}/t"
    sid0 = _mk_table(spark, root, n=6)
    rows = []

    def sink(bdf, batch_id):
        rows.extend(
            (r.k, r.v, r.s, r._change_type, r._commit_version)
            for r in bdf.collect()
        )

    q = (
        read_table_stream(spark, root, readChangeFeed="true")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
        # initial snapshot: all inserts at sid0
        assert {(t[3], t[4]) for t in rows} == {("insert", sid0)}
        assert sorted(t[0] for t in rows) == list(range(6))
        rows.clear()
        sid1 = _append(spark, root, 6, 8)
        sid2 = D.delete_where_dv(spark, root, [("k", "in", [1, 2])])
        src = spark.createDataFrame(
            [(3, 999, "row-3x"), (8, 80, "row-8")], "k long, v long, s string"
        )
        sid3 = D.merge_upsert_dv(spark, root, src, ["k"])
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    by_ver = {}
    for k, v, s, ct, ver in rows:
        by_ver.setdefault(ver, []).append((k, v, s, ct))
    assert sorted(by_ver[sid1]) == [(6, 60, "row-6", "insert"), (7, 70, "row-7", "insert")]
    # DV delete: pre-delete values with _change_type='delete'
    assert sorted(by_ver[sid2]) == [
        (1, 10, "row-1", "delete"), (2, 20, "row-2", "delete"),
    ]
    # MoR upsert: delete of the old image + insert of both post-states
    assert sorted(by_ver[sid3]) == [
        (3, 30, "row-3", "delete"),
        (3, 999, "row-3x", "insert"),
        (8, 80, "row-8", "insert"),
    ]
    # parity with the batch changelog on the same commit: multisets of
    # (row values, direction) agree modulo pre/post-image naming
    from collections import Counter

    batch = S.snapshot_changes(spark, root, ["k"], sid2, sid3).collect()
    to_dir = {
        "insert": "insert", "update_postimage": "insert",
        "delete": "delete", "update_preimage": "delete",
    }
    want = Counter((r.k, r.v, r.s, to_dir[r._change_type]) for r in batch)
    assert Counter(by_ver[sid3]) == want


def test_change_feed_refuses_rewrites(spark, tmpdir):
    """A file-removing commit has no file-granular changelog: the CDF
    stream fails loudly even with ignoreChanges set."""
    root = f"{tmpdir}/t"
    _mk_table(spark, root, n=6)
    q = (
        read_table_stream(
            spark, root, readChangeFeed="true", ignoreChanges="true"
        )
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
        S.replace_where(
            spark, root,
            spark.createDataFrame([], "k long, v long, s string"),
            [("k", "<", 2)],
        )
        with pytest.raises(Exception, match="changelog|removed"):
            q.processAllAvailable()
            raise AssertionError("stream kept running past a rewrite")
    finally:
        q.stop()
        try:
            q.awaitTermination(30)
        except Exception:
            pass


def test_change_feed_restart_exactly_once(spark, tmpdir):
    """CDF offsets checkpoint like plain tailing: a restart re-emits
    nothing and picks up changes committed while the stream was down."""
    root, ckpt = f"{tmpdir}/t", f"{tmpdir}/ck"
    _mk_table(spark, root, n=4)
    rows = []

    def sink(bdf, batch_id):
        rows.extend(
            (r.k, r._change_type, r._commit_version) for r in bdf.collect()
        )

    def one_run():
        q = (
            read_table_stream(spark, root, readChangeFeed="true")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    one_run()
    n_initial = len(rows)
    assert n_initial == 4
    D.delete_where_dv(spark, root, [("k", "=", 0)])  # while stream is down
    one_run()
    assert len(rows) == n_initial + 1
    assert rows[-1][0] == 0 and rows[-1][1] == "delete"


def test_starting_snapshot_latest_tails_only_new_commits(spark, tmpdir):
    """startingSnapshotId='latest' (Delta startingVersion=latest):
    the table's existing contents never emit; only commits landed
    after the stream started flow, exactly once across restarts."""
    root, ckpt = f"{tmpdir}/t", f"{tmpdir}/ck"
    _mk_table(spark, root, n=6)
    rows = []

    def sink(bdf, batch_id):
        rows.extend(r.k for r in bdf.collect())

    q = (
        read_table_stream(spark, root, startingSnapshotId="latest")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert rows == []  # nothing pre-existing emits
        _append(spark, root, 6, 8)
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert sorted(rows) == [6, 7]
    # restart: the checkpoint owns the position; 'latest' does NOT
    # re-resolve and skip commits made while the stream was down
    _append(spark, root, 8, 9)
    q2 = (
        read_table_stream(spark, root, startingSnapshotId="latest")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination(30)
    assert sorted(rows) == [6, 7, 8]


def test_change_feed_drives_gold_apply_changes(spark, tmpdir):
    """End-to-end medallion CDC: tail the silver table's CHANGELOG
    (readChangeFeed) and apply each micro-batch into a merge-on-read
    gold table via apply_changes_dv — gold converges to silver across
    appends, DV deletes, and MoR upserts, exactly once."""
    silver, gold, ckpt = (f"{tmpdir}/{d}" for d in ("silver", "gold", "ck"))
    _mk_table(spark, silver, n=6)
    S.write_snapshot(
        spark.createDataFrame([], "k long, v long, s string"), gold
    )

    def apply_batch(bdf, batch_id):
        feed = bdf.withColumn(
            "_change_type",
            F.when(F.col("_change_type") == "insert", "update_postimage")
            .otherwise(F.col("_change_type")),
        ).drop("_commit_version")
        if feed.isEmpty():
            return
        D.apply_changes_dv(spark, gold, feed, ["k"], meta={"batch": batch_id})

    q = (
        read_table_stream(spark, silver, readChangeFeed="true")
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _append(spark, silver, 6, 8)
        D.delete_where_dv(spark, silver, [("k", "in", [0, 6])])
        D.merge_upsert_dv(
            spark, silver,
            spark.createDataFrame(
                [(1, 999, "upd"), (9, 90, "row-9")], "k long, v long, s string"
            ),
            ["k"],
        )
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    want = sorted(map(tuple, S.read_snapshot(spark, silver).collect()))
    got = sorted(map(tuple, S.read_snapshot(spark, gold).collect()))
    assert got == want


def test_change_feed_with_max_files_slicing(spark, tmpdir):
    """readChangeFeed composes with maxFilesPerTrigger: the initial
    snapshot arrives as multiple 'insert' slices, then DV deletes
    arrive as 'delete' rows — exactly once overall."""
    root, ckpt = f"{tmpdir}/t", f"{tmpdir}/ck"
    _mk_single_file_commits(spark, root, n_files=4, rows_per_file=2)
    batches = []

    def sink(bdf, batch_id):
        batches.append(
            sorted((r.k, r._change_type) for r in bdf.collect())
        )

    q = (
        read_table_stream(
            spark, root, readChangeFeed="true", maxFilesPerTrigger="2"
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert len(batches) == 2  # 4 files / 2 per trigger
        D.delete_where_dv(spark, root, [("k", "=", 3)])
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    flat = [t for b in batches for t in b]
    assert sorted(t for t in flat if t[1] == "insert") == [
        (k, "insert") for k in range(8)
    ]
    assert [t for t in flat if t[1] == "delete"] == [(3, "delete")]


def test_stream_skips_compact_and_zorder_mid_stream(spark, tmpdir):
    """dataChange=false maintenance (compact_files, optimize_zorder —
    both predicated and whole-table) mid-stream: the tailing source
    skips those commits silently — no refusal, no duplicate, no loss;
    the final row multiset equals the no-maintenance run's."""
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=10)
    _drain(spark, root, out, ckpt)
    _append(spark, root, 10, 14)
    cid = S.compact_files(spark, root)  # rewrites every small file
    assert S._entry(S._load(root), cid).get("data_change") is False
    _append(spark, root, 14, 17)
    zid = S.optimize_zorder(spark, root, ["k"], num_files=2)
    assert S._entry(S._load(root), zid).get("data_change") is False
    _append(spark, root, 17, 20)
    zwid = S.optimize_zorder(
        spark, root, ["k"], num_files=2, predicates=[("k", ">=", 0)]
    )
    assert S._entry(S._load(root), zwid).get("data_change") is False
    # drain across all three maintenance commits: appends only, once
    _drain(spark, root, out, ckpt)
    assert _keys(spark, out) == list(range(20))
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, S.read_snapshot(spark, root).collect()))
    assert got == want


def test_change_feed_skips_maintenance_commits(spark, tmpdir):
    """readChangeFeed across compact + ZORDER: maintenance commits
    produce NO changelog rows (their batch snapshot_changes feed is
    empty too — parity pinned); appended rows arrive exactly once."""
    root, ckpt = f"{tmpdir}/t", f"{tmpdir}/ck"
    sid0 = _mk_table(spark, root, n=6)
    rows = []

    def sink(bdf, batch_id):
        rows.extend(
            (r.k, r._change_type, r._commit_version) for r in bdf.collect()
        )

    q = (
        read_table_stream(spark, root, readChangeFeed="true")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows.clear()
        pre = S._load(root)["current"]
        sid1 = _append(spark, root, 6, 9)
        cid = S.compact_files(spark, root)
        sid2 = _append(spark, root, 9, 11)
        zid = S.optimize_zorder(spark, root, ["k"], num_files=2)
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    # appended rows exactly once, attributed to their append commits;
    # zero rows attributed to the maintenance commits
    assert sorted(rows) == [
        *[(k, "insert", sid1) for k in range(6, 9)],
        *[(k, "insert", sid2) for k in range(9, 11)],
    ]
    assert not [r for r in rows if r[2] in (cid, zid)]
    # batch-changelog parity across each rewrite: key-diffed feed of a
    # row-preserving commit is EMPTY (the stream skipping matches it)
    assert S.snapshot_changes(spark, root, ["k"], sid1, cid).count() == 0
    assert S.snapshot_changes(spark, root, ["k"], sid2, zid).count() == 0
    assert sid0 == 1 and pre >= sid0  # silence lints; ids are monotonic


def test_restart_exactly_once_across_skipped_commit(spark, tmpdir):
    """Checkpoint restart where the NEXT unread commit is a skipped
    maintenance commit: nothing re-emits, nothing is lost."""
    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_table(spark, root, n=8)
    _drain(spark, root, out, ckpt)
    _append(spark, root, 8, 12)
    S.compact_files(spark, root)  # lands AFTER the append, both unread
    _drain(spark, root, out, ckpt)  # restart: replay append, skip compact
    assert _keys(spark, out) == list(range(12))
    S.optimize_zorder(spark, root, ["k"], num_files=2)
    _drain(spark, root, out, ckpt)  # restart where ONLY a skip is pending
    assert _keys(spark, out) == list(range(12))
    _append(spark, root, 12, 14)
    _drain(spark, root, out, ckpt)
    assert _keys(spark, out) == list(range(14))


def test_zorder_after_rename_stays_data_change_true(spark, tmpdir):
    """Whole-table optimize_zorder on a RENAMED table must NOT mark
    dataChange=false: the rewrite clears the column mapping, so a
    stream that skipped it would project stale physical names onto the
    new files (silent nulls). It stays a loud rewrite instead."""
    root = f"{tmpdir}/t"
    _mk_table(spark, root, n=6)
    S.rename_column(root, "v", "val")
    zid = S.optimize_zorder(spark, root, ["k"], num_files=2)
    assert S._entry(S._load(root), zid).get("data_change", True) is True


def test_trigger1_slice_gated_on_probed_spark_version(spark, tmpdir, monkeypatch):
    """The unset-base trigger-1 initial-snapshot slice is sound only
    under the PROBED engine call order; on an unprobed Spark version
    the reader's first latestOffset must fall back to the full
    snapshot (unthrottled — safe) instead of guessing an init slice
    that a restart could plan behind its checkpoint."""
    from e_commerce_lakehouse_spark.streaming import table_source as ts

    root = f"{tmpdir}/t"
    _mk_single_file_commits(spark, root, n_files=4, rows_per_file=2)
    opts = {"path": root, "maxFilesPerTrigger": "2"}
    # pinned version (this container): unset base -> init slice
    assert ts._trigger1_slice_safe() is True
    r = ts._TableStreamReader(opts)
    off = r.latestOffset()  # engine calls this BEFORE initialOffset
    assert off.get("init_files") == 2
    # unprobed version, no checkpoint proof: unset base -> full
    # snapshot, no slice guess — and a one-time observable warning
    # (the silent-cliff ADVICE item)
    import warnings as _w

    monkeypatch.setattr(ts, "_trigger1_slice_safe", lambda: False)
    r2 = ts._TableStreamReader(opts)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        off2 = r2.latestOffset()
        r2._planned = r2._UNKNOWN  # simulate another unknown-base call
        r2.latestOffset()
    assert "init_files" not in off2
    assert off2["snapshot_id"] == S._load(root)["current"]
    warned = [w for w in caught if "slice" in str(w.message)]
    assert len(warned) == 1, "exactly one warning per reader"
    # ...and once the base is KNOWN (initialOffset ran), slicing
    # applies regardless of the version gate
    r3 = ts._TableStreamReader(opts)
    r3.initialOffset()
    off3 = r3.latestOffset()
    assert off3.get("init_files") == 2


def test_trigger1_slice_proven_by_checkpoint_probe(spark, tmpdir, monkeypatch):
    """The version-independent proof path: with the query's
    checkpointLocation duplicated into the reader options, an UNSET
    base resolves by inspecting the offset WAL — an empty checkpoint
    proves a fresh stream (trigger 1 slices even on an unprobed
    Spark), and an existing checkpoint proves the restart position (a
    latestOffset-first restart plans FORWARD from it, never behind —
    the soundness condition the probed-order matrix used to carry
    alone)."""
    from e_commerce_lakehouse_spark.streaming import table_source as ts

    root, ckpt = f"{tmpdir}/t", f"{tmpdir}/ck"
    _mk_single_file_commits(spark, root, n_files=6, rows_per_file=2)
    monkeypatch.setattr(ts, "_trigger1_slice_safe", lambda: False)
    opts = {
        "path": root, "maxFilesPerTrigger": "2",
        "checkpointlocation": ckpt,  # JVM lower-cases option keys
    }
    # (a) no checkpoint dir at all -> PROVEN fresh -> trigger-1 slice
    r = ts._TableStreamReader(opts)
    off = r.latestOffset()
    assert off.get("init_files") == 2
    # (b) run one real sliced batch to create a genuine offset WAL
    out = f"{tmpdir}/out"
    q = (
        read_table_stream(
            spark, root, maxFilesPerTrigger="2", checkpointLocation=ckpt
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    done = len(_keys(spark, out))
    assert 0 < done < 12
    wal = ts._last_checkpoint_offset(ckpt)
    assert isinstance(wal, dict) and wal.get("init_files") == done // 2
    # (c) simulated restart-calls-latestOffset-first: a FRESH reader
    # (no initialOffset, no partitions replay) must plan its offset at
    # or PAST the checkpointed position — and still sliced
    r2 = ts._TableStreamReader(opts)
    off2 = r2.latestOffset()
    assert off2["snapshot_id"] == wal["snapshot_id"]
    assert off2.get("init_files", 6) > wal["init_files"], (off2, wal)
    # (d) the e2e restart drains the remainder exactly-once with the
    # reader-side option present
    for _ in range(4):
        q = (
            read_table_stream(
                spark, root, maxFilesPerTrigger="2", checkpointLocation=ckpt
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
    assert _keys(spark, out) == list(range(12))


def test_maintain_choreography_is_stream_safe(spark, tmpdir):
    """The full nightly maintain() sequence (rewrite_deletes -> compact
    -> vacuum) between stream drains: every step that removes files is
    dataChange=false, so a changelog stream skips them all — no
    refusal, no duplicate delete/insert, and later appends keep
    flowing. The DV delete itself (a real data change) emitted exactly
    once, before maintenance."""
    root, ckpt = f"{tmpdir}/t", f"{tmpdir}/ck"
    _mk_table(spark, root, n=10)
    _append(spark, root, 10, 14)
    rows = []

    def sink(bdf, batch_id):
        rows.extend(
            (r.k, r._change_type, r._commit_version) for r in bdf.collect()
        )

    def drain():
        q = (
            read_table_stream(spark, root, readChangeFeed="true")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    drain()
    assert sorted(t[0] for t in rows) == list(range(14))
    rows.clear()
    D.set_delete_mode(root, "merge-on-read")
    dvid = D.delete_where_dv(spark, root, [("k", "in", [2, 3])])
    drain()  # the DV delete is a data change: emitted as 'delete'
    assert sorted(rows) == [(2, "delete", dvid), (3, "delete", dvid)]
    rows.clear()
    # nightly maintenance: purge DVs, compact, vacuum — all skipped
    out = D.maintain(spark, root, max_dvs=0, purge_min_frac=0.0,
                     keep_last=4, older_than_s=0.0)
    assert "purged_snapshot" in out and "compact_snapshot" in out
    m = S._load(root)
    assert S._entry(m, out["purged_snapshot"]).get("data_change") is False
    assert S._entry(m, out["compact_snapshot"]).get("data_change") is False
    drain()
    assert rows == []  # nothing re-emitted, nothing refused
    sid = _append(spark, root, 14, 16)
    drain()
    assert sorted(rows) == [(14, "insert", sid), (15, "insert", sid)]


def test_max_bytes_per_trigger_slices_by_size(spark, tmpdir):
    """maxBytesPerTrigger: the initial snapshot slices on cumulative
    file BYTES (the meaningful cap under skewed file sizes) — the file
    crossing the budget is included, every trigger advances, and the
    stream emits exactly-once; composes with maxFilesPerTrigger."""
    from e_commerce_lakehouse_spark.streaming import table_source as ts

    root, out, ckpt = (f"{tmpdir}/{d}" for d in ("t", "out", "ck"))
    _mk_single_file_commits(spark, root, n_files=5, rows_per_file=3)
    m = S._load(root)
    units = sorted(S._entry_units(root, m, S._entry(m, m["current"])))
    sizes = [
        __import__("os").path.getsize(
            __import__("os").path.join(root, d, f)
        )
        for d, f in units
    ]
    # budget = just over one file: each trigger takes the file that
    # crosses -> 1-2 files per slice, unit-checked on the reader
    r = ts._TableStreamReader(
        {"path": root, "maxBytesPerTrigger": str(min(sizes) + 1)}
    )
    off1 = r.latestOffset()
    assert off1["init_files"] in (1, 2)
    r._planned = dict(off1)
    off2 = r.latestOffset()
    assert off2.get("init_files", len(units)) > off1["init_files"]
    # a budget below the smallest file still advances one file/trigger
    r2 = ts._TableStreamReader({"path": root, "maxBytesPerTrigger": "1"})
    assert r2.latestOffset()["init_files"] == 1
    # composes with maxFilesPerTrigger (files cap binds here)
    r3 = ts._TableStreamReader({
        "path": root,
        "maxBytesPerTrigger": str(sum(sizes)),
        "maxFilesPerTrigger": "2",
    })
    assert r3.latestOffset()["init_files"] == 2
    # e2e: all rows exactly once across the sliced backfill
    _drain(spark, root, out, ckpt, maxBytesPerTrigger=str(min(sizes) + 1))
    assert _keys(spark, out) == list(range(15))
