"""Snapshot/manifest layer over parquet — the Iceberg-semantics analog
(VERDICT r4 "What's missing" #2).

SURVEY.md §1.3/§4 map the reference's metadata-only load
(src/detector.rs:76) to an Iceberg-style table scan. The sandbox has no
Iceberg jars, so this module provides the *semantics* Iceberg supplies
on a real deployment — snapshot isolation, time travel, rollback,
append/overwrite commits — with stdlib JSON manifests over plain
parquet files. On a cluster this whole module is replaced by
``spark.read.format("iceberg")`` + ``VERSION AS OF``; the API mirrors
that mapping one-to-one so the swap is mechanical.

Layout under a table root:

    <root>/data/<uuid>.parquet ...        immutable data files
    <root>/_snapshots/v<N>.json           manifest per snapshot
    <root>/_snapshots/current             pointer file (atomic rename)

A manifest records ``{snapshot_id, parent_id, sequence, operation,
files[]}``. Commits never delete data files — an overwrite just points
the new manifest at a different file set, so every prior snapshot stays
readable until ``expire()``. The current pointer is replaced with
``os.replace`` (atomic on POSIX), giving last-writer-wins publication
with no torn reads — the same guarantee Iceberg gets from its catalog
pointer swap.

Reads hand Spark the manifest's explicit file list with ``basePath`` set
to the data root, so hive-style partition directories under ``data/``
still surface as partition columns and partition pruning still reaches
the scan (asserted on real scan SQL metrics in
tests/test_snapshots.py).

Snapshot ids are content-derived (sha256 of the sorted file list +
parent + sequence) rather than wall-clock, so tests and replays are
deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotError(ValueError):
    """Unknown snapshot id / empty table / malformed manifest."""


def _snap_dir(root: str) -> str:
    return os.path.join(root, "_snapshots")


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


def _manifest_path(root: str, seq: int) -> str:
    return os.path.join(_snap_dir(root), f"v{seq}.json")


def _read_json(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def current_snapshot(root: str) -> dict | None:
    """The manifest the current pointer names, or None for an empty
    table."""
    ptr = os.path.join(_snap_dir(root), "current")
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        seq = int(f.read().strip())
    return _read_json(_manifest_path(root, seq))


def history(root: str) -> list[dict]:
    """All manifests in sequence order (Iceberg: table.history())."""
    d = _snap_dir(root)
    if not os.path.isdir(d):
        return []
    seqs = sorted(int(n[1:-5]) for n in os.listdir(d)
                  if n.startswith("v") and n.endswith(".json"))
    return [_read_json(_manifest_path(root, s)) for s in seqs]


def _publish(root: str, manifest: dict) -> dict:
    """Write the manifest, then atomically swap the current pointer."""
    os.makedirs(_snap_dir(root), exist_ok=True)
    mpath = _manifest_path(root, manifest["sequence"])
    tmp = mpath + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, mpath)
    ptr_tmp = os.path.join(_snap_dir(root), "current.tmp")
    with open(ptr_tmp, "w", encoding="utf-8") as f:
        f.write(str(manifest["sequence"]))
    os.replace(ptr_tmp, os.path.join(_snap_dir(root), "current"))
    return manifest


def _next_sequence(root: str, parent: dict | None) -> int:
    """Next manifest sequence. Derived from the manifest DIRECTORY, not
    just the current pointer: _publish writes manifest and pointer in
    two atomic steps, so a crash between them (or a deleted pointer)
    leaves manifests on disk with no ``current`` — a pointer-derived
    sequence would then overwrite v1.json (commit) or crash
    (rollback)."""
    manifests = history(root)
    if manifests:
        return manifests[-1]["sequence"] + 1
    return (parent["sequence"] + 1) if parent else 1


def _rel_files(root: str, write_dir: str) -> list[str]:
    out = []
    data_root = _data_dir(root)
    for dirpath, _dirs, names in os.walk(write_dir):
        for n in names:
            if n.endswith(".parquet"):
                full = os.path.join(dirpath, n)
                out.append(os.path.relpath(full, data_root))
    return sorted(out)


def _snapshot_id(files: list[str], parent: str | None, seq: int) -> str:
    h = hashlib.sha256()
    h.update(repr((sorted(files), parent, seq)).encode())
    return h.hexdigest()[:16]


def commit(df: DataFrame, root: str, *, mode: str = "append",
           partition_by: list[str] | None = None) -> dict:
    """Write ``df`` as new immutable data files and publish a snapshot.

    mode="append": new snapshot = parent's files + the new files.
    mode="overwrite": new snapshot = only the new files; the parent's
    files stay on disk and its snapshot stays readable (time travel).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode {mode!r}")
    parent = current_snapshot(root)
    seq = _next_sequence(root, parent)
    write_dir = os.path.join(_data_dir(root), f"c{seq}_{uuid.uuid4().hex}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(write_dir)
    new_files = _rel_files(root, write_dir)
    files = new_files if mode == "overwrite" or parent is None \
        else sorted(parent["files"] + new_files)
    manifest = {
        "snapshot_id": _snapshot_id(files, parent and parent["snapshot_id"],
                                    seq),
        "parent_id": parent["snapshot_id"] if parent else None,
        "sequence": seq,
        "operation": mode,
        "files": files,
    }
    return _publish(root, manifest)


def _resolve(root: str, snapshot_id: str | None) -> dict:
    if snapshot_id is None:
        cur = current_snapshot(root)
        if cur is None:
            raise SnapshotError(f"table {root} has no snapshots")
        return cur
    for m in history(root):
        if m["snapshot_id"] == snapshot_id:
            return m
    raise SnapshotError(f"unknown snapshot {snapshot_id!r} in {root}")


def read(spark: SparkSession, root: str,
         snapshot_id: str | None = None) -> DataFrame:
    """Read the current snapshot, or time-travel to ``snapshot_id``
    (Iceberg: ``VERSION AS OF``). The explicit file list is passed with
    ``basePath`` so hive partition directories still yield partition
    columns and partition pruning reaches the scan."""
    m = _resolve(root, snapshot_id)
    data_root = _data_dir(root)
    paths = [os.path.join(data_root, f) for f in m["files"]]
    if not paths:
        raise SnapshotError(f"snapshot {m['snapshot_id']} has no files")
    return spark.read.option("basePath", data_root).parquet(*paths)


def rollback(root: str, snapshot_id: str) -> dict:
    """Point current back at an earlier snapshot via a new manifest
    (Iceberg: rollback_to_snapshot — history is append-only, so the
    rollback itself is a recorded operation)."""
    target = _resolve(root, snapshot_id)
    parent = current_snapshot(root)
    seq = _next_sequence(root, parent)
    manifest = {
        "snapshot_id": _snapshot_id(target["files"],
                                    parent and parent["snapshot_id"], seq),
        "parent_id": parent["snapshot_id"] if parent else None,
        "sequence": seq,
        "operation": f"rollback:{snapshot_id}",
        "files": target["files"],
    }
    return _publish(root, manifest)


def expire(root: str, *, keep_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by expired snapshots (all but
    the last ``keep_last`` manifests plus whatever current points at).
    Returns the deleted file names (relative). The expired manifests are
    removed too — after this, time travel to them raises SnapshotError,
    exactly like Iceberg's expire_snapshots."""
    manifests = history(root)
    if len(manifests) <= keep_last:
        return []
    cur = current_snapshot(root)
    live = manifests[-keep_last:]
    if cur and all(m["sequence"] != cur["sequence"] for m in live):
        live.append(cur)
    dead = [m for m in manifests if all(m["sequence"] != lv["sequence"]
                                        for lv in live)]
    live_files = {f for m in live for f in m["files"]}
    deleted = []
    data_root = _data_dir(root)
    for m in dead:
        for f in m["files"]:
            if f not in live_files:
                full = os.path.join(data_root, f)
                if os.path.exists(full):
                    os.remove(full)
                    deleted.append(f)
        os.remove(_manifest_path(root, m["sequence"]))
    return sorted(set(deleted))
