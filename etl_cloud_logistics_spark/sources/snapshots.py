"""Versioned lake table with a transaction log — the production-shaped
storage path for the keyed sinks (SURVEY.md §2.1 S4/S6/S8, §4).

The reference leans on warehouse-native table services: Snowflake Time
Travel / zero-copy clones (``scripts/03_snowflake_setup.sql``) and DynamoDB
point upserts (``scripts/07_lambda_functions.py:108-120``).  Spark has no
built-in versioned table, so this module implements the public
transaction-log design (Delta Lake, VLDB 2020; Apache Iceberg spec) over
plain parquet:

    table_dir/
      _log/00000000000000000000.json   one manifest per committed version
      data/v0-<op>/part-*.parquet      immutable data directories

- A manifest names the data directories composing that version, plus
  bookkeeping (operation, parent).  Committed data is never mutated, so a
  reader that has picked a manifest sees an immutable snapshot — reads are
  snapshot-isolated with no locks, and any historical version stays
  readable until vacuumed (time travel).
- Commit protocol: the manifest is fully written to a temp name (+fsync),
  then ``os.link``-ed to its final version-numbered name.  ``link`` is
  atomic and FAILS if the destination exists, which is the optimistic
  concurrency check — two writers racing to the same version cannot both
  win; the loser raises ``ConcurrentWriteError`` and must rebase.  This is
  exactly Delta's "mutual exclusion on log-record creation" (paper §3.2),
  expressed with local-fs primitives; on S3 the same slot-claim runs via a
  conditional PUT / DynamoDB lock table.
- MERGE is copy-on-write: read the current snapshot, resolve
  last-writer-wins per key with one ``max_by`` hash-agg (no window sort),
  write the result as a new data directory, commit a manifest that points
  only at it.  A crash anywhere before the final link leaves the previous
  version intact and visible.

Scale notes (100 TB):
- The log is tiny (one small JSON per commit) regardless of table size;
  readers list one directory and read one file before any data I/O.
- Copy-on-write rewrites the whole table per merge, which is right for
  dimension/state tables (orders of magnitude smaller than facts) — the
  fact path appends instead (``mode="append"`` adds a data dir without
  touching existing files).  File-level CoW (rewrite only files containing
  matched keys, as Delta does via per-file stats) is the next refinement
  and slots in at ``merge`` without changing the log format.
- ``vacuum`` unreferences old versions explicitly; nothing is deleted at
  commit time, so concurrent readers of older snapshots never break.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .upsert import _merge_latest

_LOG_DIR = "_log"
_DATA_DIR = "data"
_MANIFEST_WIDTH = 20


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer raced for."""


def _manifest_name(version: int) -> str:
    return f"{version:0{_MANIFEST_WIDTH}d}.json"


class SnapshotTable:
    """A versioned parquet table rooted at ``path`` (see module docstring)."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")
        self.log_dir = os.path.join(self.path, _LOG_DIR)
        self.data_dir = os.path.join(self.path, _DATA_DIR)

    # ------------------------------------------------------------- log I/O
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            stem, ext = os.path.splitext(name)
            if ext == ".json" and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def latest_version(self) -> int | None:
        versions = self._versions()
        return versions[-1] if versions else None

    def _read_manifest(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, _manifest_name(version))) as fh:
            return json.load(fh)

    def _commit(self, version: int, manifest: dict) -> None:
        """Atomically claim ``version``: full temp write + fsync, then a
        hard link to the final name (atomic, fails-if-exists)."""
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = os.path.join(self.log_dir, f"_tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, os.path.join(self.log_dir, _manifest_name(version)))
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {version} of {self.path} was committed by another writer"
            ) from None
        finally:
            os.unlink(tmp)

    # --------------------------------------------------------------- write
    def _write_data(self, df: DataFrame, version: int, operation: str) -> str:
        rel = f"{_DATA_DIR}/v{version}-{operation}-{uuid.uuid4().hex[:8]}"
        df.write.mode("error").parquet(os.path.join(self.path, rel))
        return rel

    def write(self, df: DataFrame, mode: str = "overwrite", operation: str | None = None) -> int:
        """Commit ``df`` as the next version.  ``overwrite`` replaces the
        file set; ``append`` adds a data directory and keeps the prior ones
        (the fact-table path: no existing file is read or touched)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        parent = self.latest_version()
        version = 0 if parent is None else parent + 1
        files = [] if (mode == "overwrite" or parent is None) else list(self._read_manifest(parent)["files"])
        files.append(self._write_data(df, version, operation or mode))
        self._commit(version, {
            "version": version,
            "parent": parent,
            "operation": operation or mode,
            "files": files,
        })
        return version

    # ---------------------------------------------------------------- read
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read.  ``version=None`` → latest; an explicit version is
        a time-travel read and stays valid until that version is vacuumed."""
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"{self.path} has no committed version")
        pick = latest if version is None else version
        manifest = self._read_manifest(pick)
        paths = [os.path.join(self.path, rel) for rel in manifest["files"]]
        return spark.read.parquet(*paths)

    def history(self) -> list[dict]:
        """All committed manifests, oldest first (operation, parent, files)."""
        return [self._read_manifest(v) for v in self._versions()]

    # --------------------------------------------------------------- merge
    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        keys: list[str],
        version_col: str,
    ) -> int:
        """Copy-on-write MERGE: last-writer-wins-by-``version_col`` per key
        against the current snapshot (same resolution as
        ``upsert.upsert_parquet``), committed as a new version.  Retries are
        safe: a lost race raises ``ConcurrentWriteError`` before anything
        becomes visible, and the orphaned data directory is swept by
        ``vacuum``."""
        existing = None if self.latest_version() is None else self.read(spark)
        merged = _merge_latest(existing, updates, keys, version_col)
        parent = self.latest_version()
        version = 0 if parent is None else parent + 1
        rel = self._write_data(merged, version, "merge")
        self._commit(version, {
            "version": version,
            "parent": parent,
            "operation": "merge",
            "files": [rel],
        })
        return version

    def restore(self, version: int) -> int:
        """Roll back by committing a NEW version that points at an old
        version's file set — no data is copied or deleted, and the rolled-
        back-over versions remain in history (Delta's RESTORE semantics)."""
        manifest = self._read_manifest(version)
        parent = self.latest_version()
        new_version = (parent or 0) + 1
        self._commit(new_version, {
            "version": new_version,
            "parent": parent,
            "operation": f"restore-v{version}",
            "files": list(manifest["files"]),
        })
        return new_version

    # -------------------------------------------------------------- vacuum
    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions and
        delete data directories no retained version references (including
        orphans from crashed/lost-race writers).  Returns removed paths."""
        versions = self._versions()
        keep = versions[-keep_last:] if keep_last > 0 else versions
        referenced = set()
        for v in keep:
            referenced.update(self._read_manifest(v)["files"])
        removed = []
        for v in versions:
            if v not in keep:
                os.unlink(os.path.join(self.log_dir, _manifest_name(v)))
        if os.path.isdir(self.data_dir):
            for name in sorted(os.listdir(self.data_dir)):
                rel = f"{_DATA_DIR}/{name}"
                if rel not in referenced:
                    shutil.rmtree(os.path.join(self.path, rel))
                    removed.append(rel)
        return removed


def foreach_batch_merge(
    table: SnapshotTable, keys: list[str], version_col: str
) -> Callable[[DataFrame, int], None]:
    """``writeStream.foreachBatch`` adapter: each micro-batch MERGEs into the
    versioned state table (ST5 over the transaction-log path — the durable
    twin of ``upsert.foreach_batch_upsert``; checkpoint replay of a batch
    re-merges idempotently because resolution is by ``version_col``, not
    arrival order)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(batch_df.sparkSession, batch_df, keys, version_col)

    return sink
