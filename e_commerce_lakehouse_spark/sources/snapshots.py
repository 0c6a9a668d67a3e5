"""Snapshot / time-travel table layout (reference table-maintenance
surface: silver_clean_transform.py:77-79 pins Iceberg
``tableProperty("format-version","1")`` — the format whose contract is
snapshot isolation, time travel, and rollback).

The parquet+catalog stand-in elsewhere in this package has no snapshot
story; this module supplies one with Iceberg's METADATA model rather
than data copies:

- a table root holds immutable data directories (``snap-N-<op>/``) and
  one small JSON manifest (``_manifest.json``);
- every snapshot entry lists the data dirs that compose it, so an
  APPEND commit is manifest-entry + one new delta dir — the parent's
  data is never rewritten or copied (Iceberg fast-append);
- OVERWRITE starts a fresh dir list; old snapshots stay readable;
- ROLLBACK is a new manifest entry whose dir list is the target
  snapshot's — a pointer swap, zero data movement;
- EXPIRE retains the last N snapshots and deletes only data dirs no
  retained snapshot references (Iceberg expire_snapshots +
  remove_orphan_files in one step).

The commit point is an atomic ``os.replace`` of the manifest —
single-writer semantics (the reference's Airflow DAG serializes its
writers the same way). Readers never lock: they read the manifest once
and then immutable dirs.

At 100 TB nothing here scales with data size: the manifest carries
directory names, not file lists or row data, and every operation other
than the actual parquet write is O(#snapshots). Schema evolution across
snapshots rides parquet ``mergeSchema`` on read, matching
``catalog.append_evolve`` write-side semantics.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def _load(root: str) -> dict:
    path = _manifest_path(root)
    if not os.path.exists(path):
        return {"current": None, "snapshots": []}
    with open(path) as fh:
        return json.load(fh)


def _commit(root: str, manifest: dict) -> None:
    """Atomic manifest swap — the transaction commit point."""
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _manifest_path(root))


def _entry(manifest: dict, snapshot_id: int) -> dict:
    for s in manifest["snapshots"]:
        if s["id"] == snapshot_id:
            return s
    raise KeyError(f"no snapshot {snapshot_id}")


def write_snapshot(
    df: DataFrame, root: str, mode: str = "overwrite", meta: dict | None = None
) -> int:
    """Commit ``df`` as a new snapshot; returns the snapshot id.

    ``mode="overwrite"`` replaces the visible table contents;
    ``mode="append"`` adds a delta dir on top of the current
    snapshot's dirs (the parent data is referenced, never rewritten).
    Either way every prior snapshot remains time-travel readable until
    expired. ``meta`` (JSON-serializable) rides the manifest entry —
    committed ATOMICALLY with the data at the manifest swap, which is
    what lets sinks store their exactly-once watermark (e.g. a stream
    batch id) in the same transaction as the rows it covers.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(root, exist_ok=True)
    manifest = _load(root)
    snap_id = (manifest["snapshots"][-1]["id"] + 1) if manifest["snapshots"] else 1
    data_dir = f"snap-{snap_id:08d}-{mode}"
    df.write.mode("overwrite").parquet(os.path.join(root, data_dir))
    dirs = [data_dir]
    if mode == "append" and manifest["current"] is not None:
        dirs = _entry(manifest, manifest["current"])["dirs"] + dirs
    manifest["snapshots"].append(
        {
            "id": snap_id,
            "op": mode,
            "ts": time.time(),
            "dirs": dirs,
            "parent": manifest["current"],
            "schema": df.schema.json(),
            "meta": meta or {},
        }
    )
    manifest["current"] = snap_id
    _commit(root, manifest)
    return snap_id


def read_snapshot(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Read the table: latest by default, a pinned ``snapshot_id``, or
    time travel to the newest snapshot committed at/before ``as_of``
    (unix seconds). Schemas are merged across dirs so appends written
    after a column was added read back with nulls in older rows."""
    manifest = _load(root)
    if snapshot_id is None and as_of is not None:
        eligible = [s for s in manifest["snapshots"] if s["ts"] <= as_of]
        if not eligible:
            raise KeyError(f"no snapshot at or before {as_of}")
        snapshot_id = eligible[-1]["id"]
    if snapshot_id is None:
        snapshot_id = manifest["current"]
    if snapshot_id is None:
        raise KeyError(f"table {root} has no snapshots")
    entry = _entry(manifest, snapshot_id)
    paths = [os.path.join(root, d) for d in entry["dirs"]]
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def rollback(root: str, snapshot_id: int) -> int:
    """Roll the table back: a NEW snapshot whose dir list is the
    target's (Iceberg ``rollback_to_snapshot`` — history is preserved,
    the rollback itself is auditable, no data moves)."""
    manifest = _load(root)
    target = _entry(manifest, snapshot_id)
    new_id = manifest["snapshots"][-1]["id"] + 1
    manifest["snapshots"].append(
        {
            "id": new_id,
            "op": f"rollback->{snapshot_id}",
            "ts": time.time(),
            "dirs": list(target["dirs"]),
            "parent": manifest["current"],
            "schema": target["schema"],
        }
    )
    manifest["current"] = new_id
    _commit(root, manifest)
    return new_id


def history(root: str) -> list[dict]:
    """Snapshot log (id, op, ts, parent, meta) — Iceberg's ``.history``
    metadata table, without the dir payload. ``meta`` is the commit's
    sink metadata ({} for plain writes and pre-meta manifests)."""
    return [
        {k: s[k] for k in ("id", "op", "ts", "parent")} | {"meta": s.get("meta", {})}
        for s in _load(root)["snapshots"]
    ]


def expire_snapshots(root: str, keep_last: int = 2) -> list[str]:
    """Retain the newest ``keep_last`` snapshots (the current one is
    always retained) and delete data dirs referenced by NO retained
    snapshot. Returns deleted dir names. The manifest commit happens
    BEFORE dir deletion so a crash mid-expire leaves orphan dirs (safe,
    re-expirable), never a manifest pointing at deleted data."""
    manifest = _load(root)
    snaps = manifest["snapshots"]
    if not snaps:
        return []
    keep = {s["id"] for s in snaps[-keep_last:]} if keep_last > 0 else set()
    keep.add(manifest["current"])
    retained = [s for s in snaps if s["id"] in keep]
    live_dirs = {d for s in retained for d in s["dirs"]}
    dead_dirs = {d for s in snaps for d in s["dirs"]} - live_dirs
    manifest["snapshots"] = retained
    _commit(root, manifest)
    for d in sorted(dead_dirs):
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return sorted(dead_dirs)


def optimize_zorder(
    spark: SparkSession,
    root: str,
    cluster_cols: list[str],
    num_files: int = 8,
    bits: int = 21,
) -> int:
    """Delta/Iceberg ``OPTIMIZE ... ZORDER BY`` for the snapshot
    table: rewrite the CURRENT snapshot's rows in Z-order
    (operators/layout.zorder_layout — every output file bounds a
    Morton hyper-rectangle, so footer stats prune on ANY clustered
    column) and commit the rewrite as a new OVERWRITE snapshot.
    Row-identical by construction (a layout change, not a data
    change); every prior snapshot stays time-travel readable until
    expired — an OPTIMIZE that goes wrong is one :func:`rollback`
    away, the property that makes table maintenance safe to automate.
    Returns the new snapshot id."""
    from ..operators.layout import zorder_layout

    return write_snapshot(
        zorder_layout(
            read_snapshot(spark, root), cluster_cols, num_files=num_files, bits=bits
        ),
        root,
        mode="overwrite",
    )
