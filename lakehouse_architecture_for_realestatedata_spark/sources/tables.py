"""Parquet-backed tables with Delta-like write semantics.

The reference stores every table as Delta (Parquet + transaction log) and
leans on three write modes (SURVEY §2.1):
  - S7 append with schema merge  (reference: scripts/load_bronze_to_table.py:158)
  - S8 overwrite(+overwriteSchema) (reference: scripts/load_bronze_to_table.py:161)
  - S9 keyed MERGE upsert: whenMatchedUpdateAll / whenNotMatchedInsertAll
       (reference: scripts/normalize_bronze_columns.py:145-148)

Delta jars are not in this image, so ``ParquetTable`` re-creates the
*semantics* on plain parquet with a tiny manifest log — the same
file-additive design as the Delta transaction log:

    <root>/data/<uuid>/part-*.parquet   immutable data directory (one per write)
    <root>/v=<n>.manifest               JSON list of the data dirs in snapshot n
    <root>/_latest                      text file holding n (commit = atomic rename)

A snapshot is a *list of references* to immutable data directories, so:
  - APPEND writes only the new rows into a fresh data dir and commits a
    manifest of [old dirs..., new dir] — O(new data) I/O, like Delta's
    file-additive append, NOT a read-union-rewrite of the table (on a 100 TB
    bronze table a daily 1 TB append must cost 1 TB, not 101 TB);
  - prior snapshot files are reused byte-identical (never copied);
  - readers resolve ``_latest`` → manifest → scan exactly those dirs, which
    gives snapshot isolation (a writer never mutates a directory a reader may
    be scanning) and makes every write idempotent-retryable. This also
    removes the reference's need to restart its Thrift server to invalidate
    caches (reference: airflow/dags/end_to_end_pipeline.py:209-244): a
    re-read simply resolves the new pointer.

Concurrency: optimistic, Delta-style. A commit CLAIMS its version by
hard-linking the manifest into place — ``link(2)`` is create-exclusive, so
exactly one writer wins ``v=n+1`` and every loser gets
``ConcurrentCommitError`` (the same protocol as Delta's
put-if-absent ``n.json``). Blind writes rebase and retry automatically:
append re-reads the winner's file list (its own data dir is already on
disk, so the retry is a metadata-only recommit), overwrite just claims the
next slot. Read-modify-write ops (merge / delete_where / compact) CANNOT
silently rebase — their output was computed against a snapshot that is no
longer latest — so they abort with ``ConcurrentCommitError`` for the caller
to re-run, exactly Delta's ConcurrentAppendException contract. Readers are
always safe (they only ever see fully-committed manifests).

Scale notes (100 TB):
  - MERGE is implemented as left_anti(target, source) ∪ source — one shuffle
    on the merge key, same join Delta itself plans for a full-table merge.
    With a partition predicate (``merge(..., prune=...)``) untouched
    partitions are carried by the plan but still rewritten; file-level
    rewrite avoidance applies to append, the hot path.
  - ``partition_by`` lays out data for partition pruning on read; the
    reference never partitions its tables (SURVEY §4 calls this out as perf
    left on the table) — we do.
  - appends accumulate data dirs; ``file_stats`` → ``compact`` bin-packs
    them back into one dir (Delta OPTIMIZE analogue).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LATEST = "_latest"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the version this transaction targeted.

    Raised by read-modify-write ops (merge, delete_where, compact) whose
    computed output is stale — re-run them against the new snapshot. Blind
    append/overwrite never surface this: they rebase and retry internally.
    """


class ParquetTable:
    """A named, versioned parquet table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str, partition_by: list[str] | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.partition_by = partition_by or []

    # ---------------------------------------------------------------- meta
    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.root, _LATEST))

    def version(self) -> int:
        """Current snapshot number, -1 if the table does not exist. The
        pointer file *is* the table, mirroring the reference's Delta-log
        presence check (scripts/load_bronze_to_table.py:103-108)."""
        try:
            with open(os.path.join(self.root, _LATEST)) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return -1

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}.manifest")

    def data_dirs(self, version: int | None = None) -> list[str]:
        """Absolute paths of the immutable data directories snapshot
        ``version`` references."""
        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"table {self.root} does not exist")
        with open(self._manifest_path(v)) as fh:
            rel = json.load(fh)["dirs"]
        return [os.path.join(self.root, d) for d in rel]

    def _next_version(self) -> int:
        """First unclaimed version slot: one past the max of the pointer and
        any manifest already on disk. Scanning manifests (not just the
        pointer) lets a loser make progress even in the window where the
        winner has linked its manifest but not yet swapped the pointer."""
        latest = self.version()
        if os.path.isdir(self.root):
            for entry in os.listdir(self.root):
                if entry.startswith("v=") and entry.endswith(".manifest"):
                    latest = max(latest, int(entry[len("v=") : -len(".manifest")]))
        return latest + 1

    def _commit(self, version: int, rel_dirs: list[str], schema_json: str) -> None:
        """Claim ``version`` with create-exclusive semantics, then advance
        the pointer. The manifest is written to a temp name and hard-linked
        to its final name: link(2) fails with EEXIST if another writer
        already owns the slot → ConcurrentCommitError, nothing clobbered.
        A crash between link and pointer swap leaves a claimed-but-unpointed
        manifest; the next writer's _next_version skips past it. The schema
        rides in the manifest so an all-rows-deleted table still reads back
        empty with its columns intact."""
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(self.root, f".manifest.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"dirs": rel_dirs, "schema": schema_json}, fh)
        try:
            os.link(tmp, self._manifest_path(version))  # CAS: exactly one winner
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} of {self.root} was committed by another "
                f"writer"
            ) from None
        finally:
            os.remove(tmp)
        # Monotonic pointer advance: never move _latest backwards even if an
        # earlier writer's swap lands after a later writer's. A momentarily
        # stale pointer is harmless — readers see the previous snapshot,
        # which is exactly snapshot isolation.
        if self.version() < version:
            tmp = os.path.join(self.root, f"._latest.{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                fh.write(str(version))
            os.replace(tmp, os.path.join(self.root, _LATEST))  # atomic swap

    # ---------------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        """Union of the snapshot's data-dir scans. Each dir self-describes
        its partition layout, filters/pruning push into every scan, and
        ``unionByName(allowMissingColumns)`` realizes mergeSchema semantics
        across appends that widened the schema."""
        dirs = self.data_dirs(version)
        if not dirs:  # zero-row snapshot: schema comes from the manifest
            v = self.version() if version is None else version
            with open(self._manifest_path(v)) as fh:
                schema = StructType.fromJson(json.loads(json.load(fh)["schema"]))
            return self.spark.createDataFrame([], schema)
        dfs = [self.spark.read.parquet(d) for d in dirs]
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)

    # --------------------------------------------------------------- write
    def _write_data(self, df: DataFrame) -> str | None:
        """Write ``df`` into a fresh immutable data dir; returns its
        root-relative path, or None if the frame was empty (parquet emits no
        readable files for zero rows — an empty write must not poison the
        manifest with an unreadable dir)."""
        rel = os.path.join("data", uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        path = os.path.join(self.root, rel)
        writer.parquet(path)
        # A zero-row write still emits a (schema-only) parquet file; reading
        # the freshly-written footers back is a cheap metadata probe, and
        # dropping the dir keeps idempotent no-op appends from growing the
        # manifest by one empty dir per re-run.
        has_rows = any(
            f.endswith(".parquet")
            for dirpath, _dirs, files in os.walk(path)
            for f in files
        ) and not self.spark.read.parquet(path).isEmpty()
        if has_rows:
            return rel
        shutil.rmtree(path, ignore_errors=True)
        return None

    def overwrite(self, df: DataFrame) -> None:
        """S8: full replace, new schema wins (overwriteSchema semantics).
        A blind write: on commit conflict it just claims the next slot —
        the data dir is already on disk, so a retry is metadata-only."""
        rel = self._write_data(df)
        while True:
            try:
                self._commit(self._next_version(), [rel] if rel else [], df.schema.json())
                break
            except ConcurrentCommitError:
                continue
        self._vacuum(keep=2)

    def append(self, df: DataFrame, merge_schema: bool = True) -> None:
        """S7: file-additive append — writes ONLY the new rows (O(new data)
        I/O); the new snapshot's manifest references every prior data dir
        byte-identical. With ``merge_schema`` new columns null-fill old rows
        at read time (Delta ``mergeSchema`` semantics); without it a schema
        mismatch raises instead of silently widening."""
        if not self.exists():
            return self.overwrite(df)
        if not merge_schema:
            cur = {f.name: f.dataType for f in self.read().schema.fields}
            new = {f.name: f.dataType for f in df.schema.fields}
            if cur != new:
                raise ValueError(
                    f"append schema mismatch without merge_schema: table has "
                    f"{sorted(cur)}, frame has {sorted(new)}"
                )
        rel = self._write_data(df)
        while True:
            # Rebase onto whatever snapshot is newest RIGHT NOW: carry its
            # file list plus our (already-written) data dir. Losing the CAS
            # race costs one metadata re-read, never a data rewrite.
            base = self._next_version() - 1
            prior = [os.path.relpath(d, self.root) for d in self.data_dirs(base)]
            merged_schema = (
                self.read(base).unionByName(df, allowMissingColumns=True).schema.json()
                if merge_schema
                else df.schema.json()
            )
            try:
                self._commit(base + 1, prior + ([rel] if rel else []), merged_schema)
                break
            except ConcurrentCommitError:
                continue
        self._vacuum(keep=2)

    def _overwrite_expecting(self, df: DataFrame, base: int) -> None:
        """Commit ``df`` as ``base + 1`` or abort. For read-modify-write ops:
        ``df`` was computed against snapshot ``base``, so if any other writer
        has claimed ``base + 1`` the output is stale — surface
        ConcurrentCommitError (Delta's ConcurrentAppendException analogue)
        instead of silently dropping the other writer's rows."""
        rel = self._write_data(df)
        try:
            self._commit(base + 1, [rel] if rel else [], df.schema.json())
        except ConcurrentCommitError:
            if rel:  # drop the orphaned output dir before re-raising
                shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
            raise
        self._vacuum(keep=2)

    def merge(
        self,
        source: DataFrame,
        key: str | list[str],
        when_matched: str = "update_all",
        prune: Column | None = None,
    ) -> None:
        """S9: keyed upsert — update-all matched rows, insert-all new rows.

        Requires the source to be unique per key (the reference pre-dedups
        with a row_number window before every merge — enforce upstream with
        ``operators.dedup.dedup_latest``; a duplicate-key source makes
        "update-all" ill-defined, which is exactly why Delta errors on it).

        ``prune``: optional predicate limiting which target rows can match
        (partition-prune analogue); rows failing ``prune`` are carried over
        untouched without joining.

        Unlike append, merge rewrites the table (one new data dir): rewriting
        only the files containing matched keys would need per-file key stats
        — documented as the remaining gap vs Delta's file-level merge.
        """
        keys = [key] if isinstance(key, str) else list(key)
        if not self.exists():
            return self.overwrite(source)
        base = self._next_version() - 1
        target = self.read(base)

        if prune is not None:
            frozen = target.filter(~prune)
            target = target.filter(prune)

        if when_matched == "update_all":
            kept = target.join(source.select(*keys), on=keys, how="left_anti")
        elif when_matched == "keep_target":  # insert-only merge
            source = source.join(target.select(*keys), on=keys, how="left_anti")
            kept = target
        else:
            raise ValueError(f"unknown when_matched={when_matched!r}")

        out = kept.unionByName(source, allowMissingColumns=True)
        if prune is not None:
            out = frozen.unionByName(out, allowMissingColumns=True)
        self._overwrite_expecting(out, base)

    def delete_where(self, predicate: Column) -> None:
        base = self._next_version() - 1
        self._overwrite_expecting(self.read(base).filter(~predicate), base)

    # -------------------------------------------------------------- hygiene
    def file_stats(self) -> dict:
        """File-level health of the current snapshot: count, bytes, and the
        small-file ratio. At 100 TB the failure mode this guards is the
        many-tiny-files table (per-file open/footer cost dominates the scan
        and the driver chokes on listing); file-additive appends drift there
        naturally, so ``file_stats`` → ``compact`` is the maintenance loop —
        the analogue of Delta OPTIMIZE's bin-packing."""
        v = self.version()
        sizes: list[int] = []
        for d in self.data_dirs(v):
            for dirpath, _dirs, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        sizes.append(os.path.getsize(os.path.join(dirpath, f)))
        total = sum(sizes)
        return {
            "version": v,
            "n_files": len(sizes),
            "n_data_dirs": len(self.data_dirs(v)),
            "total_bytes": total,
            "avg_bytes": total // len(sizes) if sizes else 0,
            "max_bytes": max(sizes) if sizes else 0,
        }

    def compact(self, target_bytes: int = 128 << 20) -> dict:
        """Bin-pack the current snapshot into ~``target_bytes`` files in ONE
        data dir (Delta OPTIMIZE analogue) — also re-merges the data-dir list
        that appends grow. Snapshot isolation makes this safe online: the
        rewrite lands in a new data dir and readers flip on commit.

        Partitioned tables repartition on the partition columns so each
        output directory is written by as few tasks as its size demands;
        unpartitioned tables use a size-derived round-robin repartition.
        Returns post-compaction ``file_stats``.
        """
        stats = self.file_stats()
        base = self._next_version() - 1
        df = self.read(base)
        n = max(1, -(-stats["total_bytes"] // target_bytes))  # ceil
        if self.partition_by:
            df = df.repartition(n, *self.partition_by)
        else:
            df = df.repartition(n)
        # Abort-on-conflict: a concurrent append between our read and commit
        # would otherwise be silently dropped by the rewritten snapshot.
        self._overwrite_expecting(df, base)
        return self.file_stats()

    def _vacuum(self, keep: int = 2) -> None:
        """Drop manifests older than the last ``keep`` versions and the data
        dirs that only those dropped manifests referenced (Delta VACUUM
        analogue). Deliberately GCs ONLY dirs some expired manifest
        referenced: a dir referenced by NO manifest may be another writer's
        in-flight write that has not committed yet — deleting it would break
        the optimistic-concurrency protocol (Delta's tombstone-based vacuum
        has the same never-touch-unknown-files rule; its retention window
        covers crashed-writer orphans, which we leave in place)."""
        cur = self.version()
        if not os.path.isdir(self.root):
            return
        referenced: set[str] = set()
        expired: set[str] = set()
        for entry in os.listdir(self.root):
            if not entry.startswith("v=") or not entry.endswith(".manifest"):
                continue
            v = int(entry[len("v=") : -len(".manifest")])
            with open(os.path.join(self.root, entry)) as fh:
                dirs = json.load(fh)["dirs"]
            if v <= cur - keep:
                expired.update(dirs)
                os.remove(os.path.join(self.root, entry))
            else:
                referenced.update(dirs)
        for rel in expired - referenced:
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)

    # ------------------------------------------------------------- helpers
    def high_water_mark(self, ts_col: str, default: str = "1970-01-01") -> Column:
        """Incremental watermark literal: max(ts) over the current snapshot,
        with an epoch default for the empty/first run (P7 semantics —
        reference: dbt/models/staging/stg_properties.sql:13-16). Collected on
        the driver as a scalar: one cheap agg over table stats, not a
        per-row subquery."""
        if not self.exists():
            return F.to_timestamp(F.lit(default))
        row = self.read().agg(F.max(ts_col).alias("hwm")).collect()[0]
        hwm = row["hwm"]
        return F.to_timestamp(F.lit(str(hwm) if hwm is not None else default))
