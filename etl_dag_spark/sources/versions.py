"""Snapshot-versioned parquet table with time travel — the capability
Delta Lake / Iceberg provide, re-expressed over plain parquet plus a
JSON manifest log (no table-format dependency in this container; the
protocol below is the same idea those formats implement).

Layout::

    table/
      _manifests/v00000001.json   one immutable manifest per version
      data/<uuid>/part-*.parquet  one immutable file set per write

Why this scales: a manifest is a LIST OF FILES, so

- **append is O(delta)**: version N's manifest = parent's file list +
  the new write's files. No data is copied or rewritten — exactly the
  trick that makes Delta/Iceberg appends cheap on a 100 TB table.
- **overwrite is O(delta) too**: the new manifest lists only the new
  files; the old snapshot's data stays on disk, still addressable
  through its own manifest — that IS time travel. Space is reclaimed
  explicitly by :func:`vacuum`, never implicitly by a writer.
- **readers never see partial writes**: data files land under a fresh
  uuid directory first; the manifest is written to a temp file and
  ``os.replace``d into place LAST (atomic on POSIX). A crash before
  the manifest commit leaves an orphan data dir that no manifest
  references — invisible to every reader, reclaimed by vacuum.
- **optimistic concurrency**: the manifest file for version N is
  created with ``O_CREAT | O_EXCL`` — two racing writers cannot both
  claim N; the loser re-reads the log and retries at N+1 (the
  Delta-on-object-store commit protocol, minus the cloud lock server).

Reference parity: the reference pipeline truncate-and-loads its tables
(ETL_DAG.py:206-229) and keeps no history; this module is the upgrade a
production deployment of that DAG performs so a bad load is a one-line
rollback (``read_version(path, v-1)``) instead of a re-run.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, _MANIFESTS)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:08d}.json")


def _versions(path: str) -> list[int]:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _load_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def write_version(
    df: DataFrame,
    path: str,
    op: str = "overwrite",
    max_retries: int = 10,
) -> int:
    """Commit ``df`` as a new snapshot of the table at ``path``.

    ``op="overwrite"`` — the new version IS this frame.
    ``op="append"`` — the new version is the parent snapshot plus this
    frame; only the delta's files are written.

    Returns the committed version number. Data files are immutable and
    shared across versions; the commit point is the atomic manifest
    rename, raced via O_EXCL with retry (optimistic concurrency).
    """
    if op not in ("overwrite", "append"):
        raise ValueError(f"op must be overwrite|append, got {op!r}")
    run_dir = os.path.join(path, _DATA, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(run_dir)
    new_files = sorted(
        os.path.join(run_dir, n)
        for n in os.listdir(run_dir)
        if n.endswith(".parquet")
    )
    os.makedirs(_manifest_dir(path), exist_ok=True)
    for _ in range(max_retries):
        versions = _versions(path)
        parent = versions[-1] if versions else 0
        version = parent + 1
        files = list(new_files)
        if op == "append" and parent:
            files = _load_manifest(path, parent)["files"] + files
        body = json.dumps(
            {
                "version": version,
                "parent": parent,
                "op": op,
                "files": files,
                "schema": df.schema.json(),
            },
            indent=1,
        )
        tmp = _manifest_path(path, version) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(body)
        try:
            # hard-link claims the version name ATOMICALLY WITH CONTENT:
            # no reader can ever observe a claimed-but-empty manifest
            # (an O_EXCL-create-then-replace protocol has that window)
            os.link(tmp, _manifest_path(path, version))
        except FileExistsError:
            os.unlink(tmp)  # lost the race — recompute against the new tip
            continue
        os.unlink(tmp)
        return version
    raise RuntimeError(f"could not commit a version after {max_retries} races")


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Resolves the
    snapshot's exact file list through its manifest — files written by
    later versions, crashed writers, or vacuum-pending snapshots are
    never visible."""
    versions = _versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not found at {path} (have {versions})"
        )
    m = _load_manifest(path, version)
    schema = StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*m["files"])


def history(path: str) -> list[dict]:
    """The table's commit log, oldest first: version, parent, op,
    file count — the audit surface a rollback decision reads."""
    return [
        {k: m[k] for k in ("version", "parent", "op")} | {"n_files": len(m["files"])}
        for m in (_load_manifest(path, v) for v in _versions(path))
    ]


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the last ``keep_last`` versions: their manifests are
    removed and any data directory no surviving manifest references is
    deleted (shared files survive — an appended-onto base stays as long
    as any kept version lists it). Returns the dropped version numbers.

    Explicit, like Delta's VACUUM: writers never reclaim space
    implicitly, so a reader holding an old version's file list is only
    broken by an operator running vacuum, never by a concurrent load.
    """
    import shutil

    versions = _versions(path)
    dropped = versions[:-keep_last] if keep_last > 0 else versions
    kept = versions[len(dropped):]
    keep_dirs = {
        os.path.dirname(f)
        for v in kept
        for f in _load_manifest(path, v)["files"]
    }
    for v in dropped:
        os.unlink(_manifest_path(path, v))
    data_root = os.path.join(path, _DATA)
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if full not in keep_dirs:
                shutil.rmtree(full)
    return dropped
