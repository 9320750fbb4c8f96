"""Structured Streaming SOURCE over the snapshot-versioned table — the
missing half of the Delta streaming contract (VERDICT r12 #3). The
table already had streaming SINKS (stream_versioned_ingest /
stream_merge_ingest / stream_cdc_ingest) and incremental BATCH
consumption (read_version_delta); this module lets a streaming query
SUBSCRIBE to the manifest log itself: every committed snapshot becomes
one micro-batch of exactly the rows that commit added.

Implemented as a PySpark Python Data Source (the Spark 4 public
streaming-source API — offsets, planned input partitions, executor-
side Arrow reads), registered as format ``"versioned_table"``:

    spark.dataSource.register(VersionedTableDataSource)
    df = spark.readStream.format("versioned_table").load(path)

Offsets are VERSION NUMBERS (`{"version": N}` = commits ≤ N consumed),
so restart-exactly-once falls out of Spark's offset checkpointing plus
the manifest log's immutability — the same design as Delta's
reservoir-version offsets. Per micro-batch, each added data file is
one input partition, read executor-side via Arrow (parquet → Arrow
record batches, zero Python-row materialization).

Semantics (mirroring ``read_version_delta``):
- the table's FIRST commit (parent 0) is the initial-snapshot batch;
- ``op="append"`` commits contribute exactly their ``add`` files;
- ``op="optimize"`` commits are ROW-PRESERVING (dataChange=false) and
  are skipped;
- any other op (merge / delete / restore / overwrite mid-stream) makes
  a file diff not a row diff: the stream FAILS with a clear error,
  unless ``ignoreChanges=true`` is set, in which case the commit's
  add-files are emitted as-is (rewritten rows may re-emit — exactly
  Delta's ``ignoreChanges`` contract);
- ``startingVersion=N`` begins after version N (default 0 = from the
  table's beginning, initial snapshot included);
- ``maxVersionsPerTrigger=K`` caps each micro-batch at K commits
  (Delta's ``maxFilesPerTrigger`` role): a new subscriber catching up
  on a long history drains it in bounded batches instead of one giant
  first batch — at 100 TB the difference between a checkpointable
  catch-up and an OOM;
- added-column schema evolution is reconciled by NAME against the
  stream's pinned schema (missing → typed NULLs, extra → dropped);
  a commit that RENAMES columns changes meaning mid-stream and fails
  the stream (Delta also requires a restart on schema change) — but
  only the commit WHERE the rename occurs: manifests carry the
  cumulative legacy→current map forward on every append, so a table
  with a rename in its HISTORY streams cleanly from any
  startingVersion past the rename (r14; the restart-heals contract —
  previously any carried map bricked the table's stream forever).

Scale posture: latestOffset is an O(1) manifest-dir listing;
partitions() resolves O(delta) raw manifests driver-side (file LISTS,
never data); all row bytes move executor-side as Arrow batches, one
task per added file.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from etl_dag_spark.sources.versions import _load_raw, _versions


class VersionedTableDataSource(DataSource):
    """``format("versioned_table")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "versioned_table requires a table path: "
                ".format('versioned_table').load(<path>)"
            )
        return path

    def schema(self) -> StructType:
        path = self._path()
        versions = _versions(path)
        if not versions:
            raise FileNotFoundError(f"no versions at {path}")
        return StructType.fromJson(
            json.loads(_load_raw(path, versions[-1])["schema"])
        )

    def streamReader(self, schema: StructType) -> "VersionedTableStreamReader":
        max_v = self.options.get("maxversionspertrigger")
        return VersionedTableStreamReader(
            self._path(),
            schema,
            starting_version=int(self.options.get("startingversion", 0)),
            ignore_changes=str(
                self.options.get("ignorechanges", "false")
            ).lower()
            == "true",
            max_versions_per_trigger=int(max_v) if max_v else None,
        )


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        starting_version: int = 0,
        ignore_changes: bool = False,
        max_versions_per_trigger: int | None = None,
    ):
        self._path = path
        self._schema = schema
        self._start = starting_version
        self._ignore_changes = ignore_changes
        self._max_versions = max_versions_per_trigger
        self._committed = starting_version

    # -- offsets -------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        versions = _versions(self._path)
        tip = versions[-1] if versions else self._start
        tip = max(tip, self._start)
        if self._max_versions is not None:
            # bounded catch-up: admit at most K commits past the last
            # committed offset per micro-batch (Spark calls commit()
            # after each batch, advancing the floor)
            tip = min(tip, self._committed + self._max_versions)
        return {"version": tip}

    # -- planning (driver-side, manifests only) ------------------------
    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        # pacing floor: a planned batch WILL be processed, so the next
        # latestOffset may admit the next K commits immediately — no
        # dependence on the commit() callback's timing (which races
        # availability polling). Also the restart heal: the
        # checkpointed start is the true floor (a fresh reader instance
        # only knows startingVersion).
        self._committed = max(self._committed, lo, hi)
        versions = _versions(self._path)
        # retention guard (matches read_version_delta): a vacuumed
        # manifest in (lo, hi] means the delta is unrecoverable —
        # fail loudly instead of silently skipping rows (a fresh
        # subscriber with startingVersion=0 on a vacuumed table would
        # otherwise stream a hole and never know)
        have = set(versions)
        gone = [v for v in range(lo + 1, hi + 1) if v not in have]
        if gone:
            raise ValueError(
                f"versions {gone[0]}..{gone[-1]} were vacuumed: restart "
                f"the stream with startingVersion >= {min(have)} after "
                "re-seeding downstream from a full snapshot"
            )
        parts: list[InputPartition] = []
        for v in versions:
            if not (lo < v <= hi):
                continue
            m = _load_raw(self._path, v)
            op = m["op"]
            if op == "optimize":
                continue  # dataChange=false: row-preserving rewrite
            first = m.get("parent", 0) == 0
            if op != "append" and not first and not self._ignore_changes:
                raise ValueError(
                    f"version {v} is {op!r}: a partial/full rewrite is "
                    "not a row delta — restart the stream from a "
                    "snapshot, or set ignoreChanges=true to emit its "
                    "rewritten files (rows may re-emit, Delta's "
                    "ignoreChanges contract)"
                )
            # manifests carry the CUMULATIVE legacy→current rename map
            # forward on every append/merge, so a non-empty map does
            # NOT mean this commit renamed anything — it usually means
            # an ancestor did, possibly before this stream even
            # started, and this commit's added files are written under
            # the current (pinned) names. Fail ONLY when a rename
            # OCCURS at v — its map differs from the map its parent
            # carried (r14, the restart-heals contract: a fresh
            # subscriber past the rename version streams cleanly; the
            # old any-non-empty-map check bricked every rename-history
            # table forever). A vacuumed parent means the rename, if
            # any, happened at or before the retention boundary the
            # subscriber already started past — its map is the
            # baseline, not a change.
            cur_map = dict(m.get("rename") or {})
            parent_v = m.get("parent", 0)
            if parent_v in have:
                pm_raw = _load_raw(self._path, parent_v)
                parent_map = dict(pm_raw.get("rename") or {})
            else:
                parent_map = cur_map
            if cur_map != parent_map:
                raise ValueError(
                    f"version {v} renames columns; a renamed column "
                    "changes meaning mid-stream — restart the stream "
                    f"with a fresh checkpoint and startingVersion >= {v} "
                    "(its new pinned schema will be the tip's)"
                )
            if "add" in m:
                added = list(m["add"])
            else:  # pre-r12 full manifest: parent file-set diff
                from etl_dag_spark.sources.versions import _load_manifest

                parent_files = (
                    set(_load_manifest(self._path, m["parent"])["files"])
                    if m.get("parent")
                    else set()
                )
                added = [f for f in m["files"] if f not in parent_files]
            parts.extend(
                InputPartition((f, m["schema"])) for f in sorted(added)
            )
        return parts

    # -- executor-side Arrow read --------------------------------------
    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        file, _file_schema_json = partition.value
        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(file)
        cols = {}
        for field in target:
            if field.name in tbl.column_names:
                cols[field.name] = tbl.column(field.name).cast(field.type)
            else:  # added-column evolution: older file lacks it
                cols[field.name] = pa.nulls(len(tbl), field.type)
        out = pa.table(cols).cast(target)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; manifests are immutable.
        # Track the committed floor so maxVersionsPerTrigger paces the
        # NEXT batch from here (on restart Spark replants it by calling
        # latestOffset only after re-planning from the checkpoint).
        self._committed = max(self._committed, int(end["version"]))


def read_table_stream(spark, path: str, **options):
    """Convenience wrapper: register the source (idempotent) and open a
    streaming frame over the versioned table at ``path``. Options pass
    through (``startingVersion``, ``ignoreChanges``)."""
    spark.dataSource.register(VersionedTableDataSource)
    reader = spark.readStream.format("versioned_table")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load(path)
