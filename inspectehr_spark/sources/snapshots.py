"""Snapshot-manifest tables: Iceberg-style semantics over plain parquet.

The north-rule deployment target is an Iceberg catalog (readers.py gates on
the runtime jar); this module supplies the part of Iceberg the pipeline
actually relies on — ATOMIC snapshot commits, time travel, rollback and
commit history — with nothing but parquet files and a manifest directory,
so the same semantics hold in any environment:

    <root>/data/c<version>-<uuid>/part-*.parquet   (immutable once committed)
    <root>/_manifests/v<version>.json              (file list + summary)

A snapshot = one manifest listing every data directory visible at that
version. Commit protocol (single-writer-wins optimistic concurrency):

1. write the new data directory (invisible — readers only trust manifests),
2. read the current latest manifest, build the next file list,
3. os.open(v<next>.json, O_CREAT|O_EXCL) — the filesystem arbitrates: the
   first committer of a version wins atomically, a concurrent loser gets
   EEXIST, re-reads the (new) latest and retries against it.

Readers list `_manifests/`, pick the max version (or an explicit one) and
read exactly the files it names — a half-written data directory is never
visible, and a reader holding version K is isolated from later commits.
At cluster scale the manifest store must be an atomic-rename filesystem or
a catalog service (HDFS/local rename is atomic; S3 needs a DynamoDB-style
lock — same caveat Iceberg's HadoopCatalog documents).

Reference analog: the reference's drop-then-rewrite output tables
(R/perform_evaluation.R:172-174) are replace() here — but versioned, so a
bad evaluation run is one rollback() away instead of destroyed."""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


class CommitConflict(RuntimeError):
    """Raised when `max_retries` successive commit attempts lost the race."""


def _manifest_dir(root: str) -> str:
    return os.path.join(root, _MANIFESTS)


def _versions(root: str) -> list[int]:
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def _read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(root), f"v{version}.json")) as f:
        return json.load(f)


def latest_version(root: str) -> int | None:
    vs = _versions(root)
    return vs[-1] if vs else None


def history(root: str) -> list[dict]:
    """Commit log, oldest first: version, operation, timestamp, n_dirs."""
    return [
        {
            "version": v,
            "operation": m["operation"],
            "committed_at": m["committed_at"],
            "n_dirs": len(m["dirs"]),
        }
        for v in _versions(root)
        for m in (_read_manifest(root, v),)
    ]


def _try_commit(root: str, manifest: dict, version: int) -> bool:
    os.makedirs(_manifest_dir(root), exist_ok=True)
    path = os.path.join(_manifest_dir(root), f"v{version}.json")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    return True


def _commit(root: str, operation: str, new_dirs: list[str], keep_prior: bool,
            max_retries: int = 10) -> int:
    for _ in range(max_retries):
        cur = latest_version(root)
        dirs = list(new_dirs)
        if keep_prior and cur is not None:
            dirs = _read_manifest(root, cur)["dirs"] + dirs
        nxt = (cur or 0) + 1
        manifest = {
            "operation": operation,
            "committed_at": time.time(),
            "dirs": dirs,
        }
        if _try_commit(root, manifest, nxt):
            return nxt
    raise CommitConflict(f"lost {max_retries} commit races at {root}")


def _write_data(df: DataFrame, root: str, version_hint: int,
                partition_col: str | None) -> str:
    rel = os.path.join(_DATA, f"c{version_hint}-{uuid.uuid4().hex[:12]}")
    w = df.write.mode("error")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(os.path.join(root, rel))
    return rel


def append(df: DataFrame, root: str, partition_col: str | None = None) -> int:
    """Atomically append `df` as a new snapshot; returns the new version."""
    rel = _write_data(df, root, (latest_version(root) or 0) + 1, partition_col)
    return _commit(root, "append", [rel], keep_prior=True)


def replace(df: DataFrame, root: str, partition_col: str | None = None) -> int:
    """Atomically replace table contents (drop-and-rewrite, versioned)."""
    rel = _write_data(df, root, (latest_version(root) or 0) + 1, partition_col)
    return _commit(root, "replace", [rel], keep_prior=False)


def rollback(root: str, to_version: int) -> int:
    """Make an old snapshot current again by committing a NEW version with
    its file list — history is never rewritten (Iceberg rollback)."""
    dirs = _read_manifest(root, to_version)["dirs"]
    return _commit(root, f"rollback(v{to_version})", dirs, keep_prior=False)


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: the latest by default, or time-travel to `version`.
    Reads exactly the data directories that manifest names; uncommitted
    directories on disk are invisible."""
    v = latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshots at {root}")
    dirs = _read_manifest(root, v)["dirs"]
    if not dirs:
        raise FileNotFoundError(f"snapshot v{v} at {root} is empty")
    return spark.read.parquet(*[os.path.join(root, d) for d in dirs])
