"""Hash-bucketed latest-change state store for streaming CDC apply.

The round-7 shape — union the full state parquet with each micro-batch
and rewrite the whole directory — is O(|state|) per trigger: a
full-state rewrite every batch, the scale-killer class at a 100 TB
keyspace. This store makes the per-batch cost track the BATCH:

* State lives under ``state_dir/bucket_<b>/v<N>/`` with ``N_BUCKETS``
  buckets chosen at creation; a key's bucket is ``pmod(hash(key), N)``
  (Spark's deterministic Murmur3 ``F.hash``), recomputed on read so the
  data files never need a physical partition column.
* Each micro-batch touches only the buckets its keys hash into: the
  merge reads the CURRENT version of exactly those buckets, unions the
  batch's changes, re-runs the per-key argmax over that subset, and
  writes ONE staged parquet job partitioned by bucket. Untouched
  buckets are never read, never rewritten — their version directories
  and files are left byte-identical.
* The swap is the TableStore stage-then-pointer-flip, per bucket: the
  staged ``bucket=<b>`` output is moved to ``bucket_<b>/v<N+1>`` and a
  ``_VERSION`` pointer file is replaced atomically (``os.replace``).
  A crash mid-flip leaves some buckets at the old version; on restart
  the streaming source re-delivers the unacknowledged batch and the
  merge is IDEMPOTENT (argmax over a union that already contains the
  batch's rows is unchanged), so replay converges every bucket.

Per-batch cost: O(|batch| + Σ|touched buckets|) — with a uniform hash
and B buckets that is |batch| + touched/B of the state, versus the
full |state| before. ``apply_batch`` returns the per-batch accounting
(buckets touched, files and bytes written) that
tests/test_streaming_store.py asserts on.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class BucketedCdcState:
    def __init__(
        self,
        state_dir: str,
        key_col: str = "key",
        order_cols: tuple[str, ...] = ("ts", "event_id"),
        n_buckets: int = 16,
    ) -> None:
        self.state_dir = state_dir
        self.key_col = key_col
        self.order_cols = order_cols
        self.n_buckets = n_buckets
        os.makedirs(state_dir, exist_ok=True)

    # --- per-bucket version bookkeeping (TableStore's pointer pattern) ---

    def _bdir(self, b: int) -> str:
        return os.path.join(self.state_dir, f"bucket_{b}")

    def _pointer(self, b: int) -> str:
        return os.path.join(self._bdir(b), "_VERSION")

    def current_version(self, b: int) -> int | None:
        try:
            with open(self._pointer(b)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _data_dir(self, b: int, version: int) -> str:
        return os.path.join(self._bdir(b), f"v{version}")

    def _repoint(self, b: int, version: int) -> None:
        os.makedirs(self._bdir(b), exist_ok=True)
        tmp = self._pointer(b) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(b))  # atomic on POSIX

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.hash(F.col(self.key_col)), F.lit(self.n_buckets)).cast("int")

    # --- the merge -------------------------------------------------------

    def apply_batch(self, batch_ch: DataFrame) -> dict:
        """Merge one micro-batch of changes into the bucketed state.

        ``batch_ch`` carries ``key_col``, ``order_cols`` and any payload
        columns; the kept row per key is the argmax over ``order_cols``
        (descending, in order). Returns accounting for the batch:
        ``{"buckets_touched", "buckets_total", "files_written",
        "bytes_written"}``.
        """
        sp = batch_ch.sparkSession
        ch = batch_ch.withColumn("__bucket", self._bucket_col())

        # Metadata-scale collect: at most n_buckets small integers.
        touched = sorted(
            r["__bucket"]
            for r in ch.select("__bucket").distinct().collect()
        )
        if not touched:
            return {
                "buckets_touched": 0,
                "buckets_total": self.n_buckets,
                "files_written": 0,
                "bytes_written": 0,
            }

        # Read ONLY the touched buckets' current state (bucket recomputed
        # from the key — derivable, never stored).
        cur_paths = []
        for b in touched:
            v = self.current_version(b)
            if v is not None:
                cur_paths.append(self._data_dir(b, v))
        if cur_paths:
            cur = sp.read.parquet(*cur_paths).withColumn(
                "__bucket", self._bucket_col()
            )
            ch = cur.unionByName(ch)

        w = Window.partitionBy(self.key_col).orderBy(
            *[F.desc(c) for c in self.order_cols]
        )
        latest = (
            ch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

        # ONE staged write job for all touched buckets, then per-bucket
        # stage-then-pointer-flip.
        stage = os.path.join(self.state_dir, "_stage")
        if os.path.exists(stage):
            shutil.rmtree(stage)
        latest.write.mode("overwrite").partitionBy("__bucket").parquet(stage)

        files_written = 0
        bytes_written = 0
        for b in touched:
            src = os.path.join(stage, f"__bucket={b}")
            newv = (self.current_version(b) or 0) + 1
            dst = self._data_dir(b, newv)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.makedirs(self._bdir(b), exist_ok=True)
            if os.path.exists(src):
                shutil.move(src, dst)
            else:  # every key of this bucket was deleted upstream — keep
                os.makedirs(dst)  # an empty committed version
            for f_ in os.listdir(dst):
                if f_.endswith(".parquet"):
                    files_written += 1
                    bytes_written += os.path.getsize(os.path.join(dst, f_))
            self._repoint(b, newv)
            oldv = newv - 1
            if oldv >= 1:  # vacuum the superseded version eagerly
                shutil.rmtree(self._data_dir(b, oldv), ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        return {
            "buckets_touched": len(touched),
            "buckets_total": self.n_buckets,
            "files_written": files_written,
            "bytes_written": bytes_written,
        }

    # --- read ------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Union of every bucket's current version (schema-stable)."""
        paths = []
        for b in range(self.n_buckets):
            v = self.current_version(b)
            if v is not None:
                d = self._data_dir(b, v)
                if any(f_.endswith(".parquet") for f_ in os.listdir(d)):
                    paths.append(d)
        if not paths:
            return None
        return spark.read.parquet(*paths)
