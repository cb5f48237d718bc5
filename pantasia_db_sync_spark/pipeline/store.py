"""Versioned parquet table store with atomic repoint + snapshot/restore.

Replaces the reference's two write-side mechanisms:

- transactional batch commit (``conn.commit()`` per period,
  /root/reference/app/main.py:379): each table write lands in a new
  ``v{n}`` directory and becomes visible only when the tiny ``_VERSION``
  pointer file is atomically replaced — readers never see partial data,
  and a crashed commit leaves the previous version intact;
- ``pg_dump``/``pg_restore`` + rename swap
  (``scripts/backup_restore.py:53-208``): ``snapshot()`` records the
  current version pointers under a tag, ``restore()`` repoints to them —
  no data copying, O(#tables) metadata ops even at 100 TB.

Multi-table atomicity (SURVEY.md §4 item 2): ``commit_many`` stages all
table versions first, then flips all pointers; ``sync_checkpoint`` (the
tip) is written last, so replay-after-crash re-processes the last
period idempotently rather than observing a half-commit.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, base_dir: str) -> None:
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # --- version bookkeeping -------------------------------------------------

    def _tdir(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_VERSION")

    def current_version(self, table: str) -> int | None:
        try:
            with open(self._pointer(table)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _data_dir(self, table: str, version: int) -> str:
        return os.path.join(self._tdir(table), f"v{version}")

    # --- read / write --------------------------------------------------------

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        v = self.current_version(table)
        if v is None:
            return None
        return spark.read.parquet(self._data_dir(table, v))

    def stage(self, table: str, df: DataFrame) -> int:
        """Write a new version directory without repointing."""
        v = (self.current_version(table) or 0) + 1
        path = self._data_dir(table, v)
        if os.path.exists(path):
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)
        return v

    def repoint(self, table: str, version: int) -> None:
        os.makedirs(self._tdir(table), exist_ok=True)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(table))  # atomic on POSIX

    def commit_many(self, staged: dict[str, tuple[int, DataFrame]]) -> None:
        """Stage-then-flip: all writes land before any pointer moves."""
        for table, (version, _) in staged.items():
            self.repoint(table, version)

    # --- append-only fact tables ---------------------------------------------
    # Facts never rewrite history: each period commit adds one
    # commit={id} partition; the pointer names the highest committed id,
    # so readers filter out partial writes and a failed commit is simply
    # re-written in place. At 100 TB this is O(new data) per period,
    # while the versioned dims above stay O(dim size) (they are small).

    def append_dir(self, table: str, commit_id: int) -> str:
        return os.path.join(self._tdir(table), "data", f"commit={commit_id}")

    def append(self, table: str, df: DataFrame, commit_id: int) -> None:
        df.write.mode("overwrite").parquet(self.append_dir(table, commit_id))

    def commit_append(self, table: str, commit_id: int) -> None:
        self.repoint(table, commit_id)

    def read_facts(self, spark: SparkSession, table: str) -> DataFrame | None:
        ptr = self.current_version(table)
        if ptr is None:
            return None
        from pyspark.sql import functions as F

        data = os.path.join(self._tdir(table), "data")
        df = spark.read.option("basePath", data).parquet(data)
        return df.where(F.col("commit") <= ptr).drop("commit")

    # --- checkpoint (sync tip) ----------------------------------------------

    def write_checkpoint(self, payload: dict) -> None:
        tmp = os.path.join(self.base_dir, "_CHECKPOINT.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(self.base_dir, "_CHECKPOINT"))

    def read_checkpoint(self) -> dict | None:
        try:
            with open(os.path.join(self.base_dir, "_CHECKPOINT")) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # --- snapshot / restore (A10) --------------------------------------------

    def _snap_path(self, tag: str) -> str:
        return os.path.join(self.base_dir, f"_SNAPSHOT_{tag}.json")

    def snapshot(self, tag: str) -> dict:
        tables = [
            t
            for t in os.listdir(self.base_dir)
            if os.path.isdir(self._tdir(t)) and self.current_version(t) is not None
        ]
        manifest = {
            "versions": {t: self.current_version(t) for t in tables},
            "checkpoint": self.read_checkpoint(),
        }
        with open(self._snap_path(tag), "w") as f:
            json.dump(manifest, f)
        return manifest

    def restore(self, tag: str) -> None:
        with open(self._snap_path(tag)) as f:
            manifest = json.load(f)
        for table, version in manifest["versions"].items():
            self.repoint(table, version)
        if manifest.get("checkpoint") is not None:
            self.write_checkpoint(manifest["checkpoint"])

    def read_at(self, spark: SparkSession, table: str, tag: str) -> DataFrame | None:
        """Time-travel read: the table as of snapshot ``tag``, without
        repointing anything (the snapshot is just version pointers, so
        this is O(1) metadata — no data was copied at snapshot time).
        Fact tables replay to the snapshot's commit watermark."""
        with open(self._snap_path(tag)) as f:
            manifest = json.load(f)
        version = manifest["versions"].get(table)
        if version is None:
            return None
        if os.path.isdir(os.path.join(self._tdir(table), "data")):
            from pyspark.sql import functions as F

            data = os.path.join(self._tdir(table), "data")
            df = spark.read.option("basePath", data).parquet(data)
            return df.where(F.col("commit") <= version).drop("commit")
        return spark.read.parquet(self._data_dir(table, version))

    # --- retention ----------------------------------------------------------

    def _snapshot_tags(self) -> list[str]:
        return [
            f[len("_SNAPSHOT_"):-len(".json")]
            for f in os.listdir(self.base_dir)
            if f.startswith("_SNAPSHOT_") and f.endswith(".json")
        ]

    def vacuum(self, keep_last: int = 1) -> dict[str, list[str]]:
        """Reclaim unreferenced storage from a long-running sync.

        A version directory is PROTECTED if it is (a) the current
        pointer, (b) recorded by any snapshot, or (c) among the
        ``keep_last`` most recent versions; everything else is deleted.
        Fact append-partitions above the commit watermark are orphans
        from aborted commits (the stage-then-flip protocol never
        exposed them to readers) and are removed too. Pure metadata +
        directory deletes that never touch the current version's data.
        Retention caveat (inherent to version-pointer stores, same as
        Delta/Iceberg VACUUM): an external reader that resolved an OLD
        version pointer just before a repoint can lose its directory
        mid-scan if that version falls outside ``keep_last`` — size
        ``keep_last`` to cover the longest expected reader, or pause
        vacuuming around long ad-hoc scans.
        """
        protected: dict[str, set[int]] = {}
        for tag in self._snapshot_tags():
            with open(self._snap_path(tag)) as f:
                for t, v in json.load(f)["versions"].items():
                    protected.setdefault(t, set()).add(v)

        removed: dict[str, list[str]] = {}
        for table in os.listdir(self.base_dir):
            tdir = self._tdir(table)
            if not os.path.isdir(tdir):
                continue
            current = self.current_version(table)
            if current is None:
                continue
            keep = protected.get(table, set()) | {current}
            versions = sorted(
                int(d[1:])
                for d in os.listdir(tdir)
                if d.startswith("v") and d[1:].isdigit()
            )
            if keep_last > 0:  # versions[-0:] would be the WHOLE list
                keep.update(versions[-keep_last:])
            for v in versions:
                if v not in keep:
                    shutil.rmtree(self._data_dir(table, v))
                    removed.setdefault(table, []).append(f"v{v}")
            data = os.path.join(tdir, "data")
            if os.path.isdir(data):
                # orphans = commits above EVERY watermark anyone could
                # read: the live pointer and any snapshot's pointer (a
                # restore may move the watermark forward again)
                watermark = max(keep)
                for d in os.listdir(data):
                    if d.startswith("commit="):
                        cid = int(d.split("=", 1)[1])
                        if cid > watermark:
                            shutil.rmtree(os.path.join(data, d))
                            removed.setdefault(table, []).append(d)
        return removed
