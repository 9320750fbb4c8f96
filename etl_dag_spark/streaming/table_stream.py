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
- ``readChangeFeed=true`` (r14, VERDICT r13 #3 — Delta's streaming
  CDF): the stream emits CHANGE rows instead of snapshot rows — the
  table's columns plus ``_change_type`` ∈ {insert, delete,
  update_preimage, update_postimage} and ``_commit_version`` — exactly
  the batch ``cdc_rows`` classification, derived per commit from the
  manifests (appends stream per-file inserts; merge/delete/update
  commits diff their replaced-vs-added files with a keyed
  outer-merge, hash-bucketed into ``cdcBuckets`` partitions — bounded
  read amplification over the TOUCHED files only). Requires
  ``keyCols=k1[,k2...]`` when the lineage holds rewrite commits; the
  principled alternative to ``ignoreChanges`` re-emission;
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

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def schema(self) -> StructType:
        from pyspark.sql.types import LongType, StringType, StructField

        path = self._path()
        versions = _versions(path)
        if not versions:
            raise FileNotFoundError(f"no versions at {path}")
        base = StructType.fromJson(
            json.loads(_load_raw(path, versions[-1])["schema"])
        )
        if self._cdf():
            return StructType(
                [
                    *base.fields,
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return base

    def streamReader(self, schema: StructType) -> "VersionedTableStreamReader":
        max_v = self.options.get("maxversionspertrigger")
        key_cols = self.options.get("keycols")
        return VersionedTableStreamReader(
            self._path(),
            schema,
            starting_version=int(self.options.get("startingversion", 0)),
            ignore_changes=str(
                self.options.get("ignorechanges", "false")
            ).lower()
            == "true",
            max_versions_per_trigger=int(max_v) if max_v else None,
            read_change_feed=self._cdf(),
            key_cols=(
                [c.strip() for c in key_cols.split(",")] if key_cols else None
            ),
            cdc_buckets=int(self.options.get("cdcbuckets", 4)),
        )


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        starting_version: int = 0,
        ignore_changes: bool = False,
        max_versions_per_trigger: int | None = None,
        read_change_feed: bool = False,
        key_cols: list[str] | None = None,
        cdc_buckets: int = 4,
    ):
        self._path = path
        self._schema = schema
        self._start = starting_version
        self._ignore_changes = ignore_changes
        self._max_versions = max_versions_per_trigger
        self._cdf = read_change_feed
        self._key_cols = key_cols
        self._cdc_buckets = max(1, cdc_buckets)
        self._committed = starting_version
        if read_change_feed:
            base = [
                f.name
                for f in schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
            for k in key_cols or []:
                if k not in base:
                    raise ValueError(
                        f"keyCols column {k!r} not in table schema {base}"
                    )

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
            if op in ("optimize", "alter"):
                continue  # dataChange=false: row-preserving rewrite /
                # metadata-only constraint change
            first = m.get("parent", 0) == 0
            if (
                op != "append"
                and not first
                and not self._ignore_changes
                and not self._cdf
            ):
                raise ValueError(
                    f"version {v} is {op!r}: a partial/full rewrite is "
                    "not a row delta — restart the stream from a "
                    "snapshot, set ignoreChanges=true to emit its "
                    "rewritten files (rows may re-emit, Delta's "
                    "ignoreChanges contract), or subscribe with "
                    "readChangeFeed=true for exact change rows"
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
            if self._cdf:
                parts.extend(self._cdf_partitions(v, m, op, first))
                continue
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

    def _cdf_partitions(
        self, v: int, m: dict, op: str, first: bool
    ) -> list[InputPartition]:
        """Plan one commit's CHANGE rows (readChangeFeed=true — the
        Delta CDF streaming contract, VERDICT r13 #3, derived from the
        manifests like the batch ``cdc_rows``):

        - the initial snapshot and every append emit per-file INSERT
          partitions (one task per added file — the scale path);
        - a merge/delete/update commit emits a keyed diff of its
          REPLACED vs ADDED files: rows only in the old side are
          deletes, only in the new side inserts, both sides with any
          value change an update_preimage/update_postimage pair.
          Data files are immutable and keys unique per snapshot (the
          MERGE contract), so rows in SHARED files appear on neither
          side and the diff is exact while reading O(touched files);
        - overwrite/restore/clone commits diff the two snapshots' full
          file-set difference (same rule as ``cdc_rows``).

        The diff is hash-bucketed into ``cdcBuckets`` partitions by
        key (each bucket re-reads the commit's touched files and keeps
        its key range) — bounded read amplification over the TOUCHED
        files only, never the table."""
        rename = dict(m.get("rename") or {})
        if op == "append" or first:
            if "add" in m:
                added = list(m["add"])
            else:
                from etl_dag_spark.sources.versions import _load_manifest

                parent_files = (
                    set(_load_manifest(self._path, m["parent"])["files"])
                    if m.get("parent")
                    else set()
                )
                added = [f for f in m["files"] if f not in parent_files]
            return [
                InputPartition(("cdf_ins", v, f, None)) for f in sorted(added)
            ]
        if not self._key_cols:
            raise ValueError(
                f"version {v} is {op!r}: readChangeFeed needs "
                "keyCols=<k1,k2,...> to derive exact change rows across "
                "a rewrite commit"
            )
        if op in ("merge", "delete", "update") and "replaced" in m:
            old_files = sorted(m["replaced"])
            new_files = sorted(m.get("add") or [])
        else:  # overwrite / restore / clone: full snapshot diff
            from etl_dag_spark.sources.versions import _resolve_state

            v_files, _ = _resolve_state(self._path, v)
            p_files, _ = (
                _resolve_state(self._path, m["parent"])
                if m.get("parent")
                else ([], {})
            )
            old_files = sorted(set(p_files) - set(v_files))
            new_files = sorted(set(v_files) - set(p_files))
        nb = self._cdc_buckets
        return [
            InputPartition(
                ("cdf_diff", v, old_files, new_files, rename, b, nb)
            )
            for b in range(nb)
        ]

    # -- executor-side Arrow read --------------------------------------
    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        if partition.value[0] in ("cdf_ins", "cdf_diff"):
            yield from self._cdf_read(partition.value)
            return
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

    def _cdf_read(self, val) -> Iterator:
        """Executor-side change-row derivation: Arrow reads, a pandas
        keyed outer-merge for the diff shape, NaN-safe value compare —
        all over ONE commit's touched files (never the table)."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        base = StructType(
            [
                f
                for f in self._schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
        )
        base_arrow = to_arrow_schema(base)
        target = to_arrow_schema(self._schema)

        def load(files: list[str], rename: dict | None) -> pa.Table:
            tbls = []
            for f in files:
                t = pq.read_table(f)
                if rename:
                    t = t.rename_columns(
                        [rename.get(c, c) for c in t.column_names]
                    )
                cols = {}
                for field in base_arrow:
                    if field.name in t.column_names:
                        cols[field.name] = t.column(field.name).cast(
                            field.type
                        )
                    else:  # added-column evolution on an older file
                        cols[field.name] = pa.nulls(len(t), field.type)
                tbls.append(pa.table(cols).cast(base_arrow))
            if not tbls:
                return base_arrow.empty_table()
            return pa.concat_tables(tbls)

        def emit(df: "pd.DataFrame", change: str, v: int) -> pa.Table:
            arrays = [
                pa.Array.from_pandas(df[f.name], type=f.type)
                for f in base_arrow
            ]
            arrays.append(pa.array([change] * len(df), pa.string()))
            arrays.append(pa.array([v] * len(df), pa.int64()))
            return pa.table(
                dict(zip([f.name for f in target], arrays))
            ).cast(target)

        if val[0] == "cdf_ins":
            _, v, f, rename = val
            t = load([f], rename)
            out = t.append_column(
                "_change_type", pa.array(["insert"] * len(t), pa.string())
            ).append_column(
                "_commit_version", pa.array([v] * len(t), pa.int64())
            )
            yield from out.cast(target).to_batches()
            return

        _, v, old_files, new_files, rename, bucket, nb = val
        keys = list(self._key_cols)
        # the cumulative rename map applies to the OLD side only:
        # replaced files may predate a rename in the current schema-
        # debt segment; files added at v are written under current names
        old = load(old_files, rename).to_pandas()
        new = load(new_files, None).to_pandas()
        if nb > 1:

            def pick(df: "pd.DataFrame") -> "pd.DataFrame":
                if not len(df):
                    return df
                h = pd.util.hash_pandas_object(df[keys], index=False)
                return df[(h % nb).to_numpy() == bucket]

            old, new = pick(old), pick(new)
        val_cols = [c for c in old.columns if c not in keys]
        merged = old.merge(
            new,
            on=keys,
            how="outer",
            suffixes=("__old", "__new"),
            indicator=True,
        )
        in_both = merged["_merge"] == "both"
        changed = pd.Series(False, index=merged.index)
        for c in val_cols:
            a, b = merged[f"{c}__old"], merged[f"{c}__new"]
            changed |= ~((a == b) | (a.isna() & b.isna()))

        def side(mask, suffix: str) -> "pd.DataFrame":
            sel = merged[mask]
            out = sel[keys].copy()
            for c in val_cols:
                out[c] = sel[f"{c}{suffix}"]
            return out[[f.name for f in base_arrow]]

        parts = [
            emit(side(merged["_merge"] == "left_only", "__old"), "delete", v),
            emit(side(merged["_merge"] == "right_only", "__new"), "insert", v),
            emit(side(in_both & changed, "__old"), "update_preimage", v),
            emit(side(in_both & changed, "__new"), "update_postimage", v),
        ]
        nonempty = [p for p in parts if len(p)]
        if nonempty:  # a bucket may own no keys of this commit
            yield from pa.concat_tables(nonempty).to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; manifests are immutable.
        # Track the committed floor so maxVersionsPerTrigger paces the
        # NEXT batch from here (on restart Spark replants it by calling
        # latestOffset only after re-planning from the checkpoint).
        self._committed = max(self._committed, int(end["version"]))


def replicate_table_stream(
    spark,
    src_path: str,
    dst_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    **options,
):
    """CDC TABLE REPLICATION (r14): keep a downstream versioned table
    exactly in sync with an upstream one by streaming the upstream's
    CHANGE FEED into :func:`apply_cdc_version` — the Delta→Delta
    replication shape (source CDF → MERGE sink), composed entirely
    from this engine's own primitives:

    - the source is ``readChangeFeed=true`` over ``src_path``: exact
      per-commit change rows, so merges and deletes replicate as
      surgical key operations — never ``ignoreChanges`` re-emission;
    - each micro-batch folds its change rows into ONE CDC batch
      (update_preimage rows drop — the postimage carries the new
      values; deletes map to tombstones) ordered by
      ``_commit_version``, so several upstream commits arriving in one
      trigger apply in commit order per key;
    - the apply is txn-gated by batch_id, so an at-least-once
      foreachBatch redelivery is a manifest no-op — restart
      exactly-once falls out of the offset checkpoint + txn map.

    Returns the StreamingQuery (``availableNow`` trigger: one drain of
    everything committed so far — call again to catch up, or pass
    ``trigger_once=False`` semantics by managing the query yourself
    via read_table_stream)."""
    from pyspark.sql import functions as F

    from etl_dag_spark.sources.versions import apply_cdc_version

    changes = read_table_stream(
        spark,
        src_path,
        readChangeFeed=True,
        keyCols=",".join(key_cols),
        **options,
    )

    def apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cdc = (
            batch_df.where(F.col("_change_type") != "update_preimage")
            .withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", "D").otherwise(
                    "U"
                ),
            )
            .drop("_change_type")
        )
        apply_cdc_version(
            spark,
            dst_path,
            cdc,
            key_cols,
            order_col="_commit_version",
            txn_id=f"replicate-{batch_id}",
            writer_id=f"replicate:{src_path}",
            # _commit_version is transport ordering, not data: the
            # destination schema stays exactly the source's
            drop_order_col=True,
        )

    return (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_table_stream(spark, path: str, **options):
    """Convenience wrapper: register the source (idempotent) and open a
    streaming frame over the versioned table at ``path``. Options pass
    through (``startingVersion``, ``ignoreChanges``)."""
    spark.dataSource.register(VersionedTableDataSource)
    reader = spark.readStream.format("versioned_table")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load(path)
