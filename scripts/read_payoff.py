"""Read-side payoff of sort-on-write clustering + manifest pruning.

VERDICT r7 #7: `cluster_facts_by` and `read_facts_pruned` are built and
layout-tested, but the actual READ speedup was never measured. This
script syncs the 10x fixture corpus into two stores — one plain, one
with `cluster_facts_by="tx_time"` — using day-long periods (~23 fact
commits), then times a 2-hour time-range aggregate three ways:

  full-scan   read_facts + filter           (no metadata help)
  pruned      read_facts_pruned             (commit-manifest pruning)
  clustered   read_facts_pruned on the clustered store (manifest
              pruning + disjoint per-file tx_time ranges inside each
              kept commit → parquet row-group skipping)

Reported per variant: wall (median of 3), files/bytes handed to the
reader (the manifest-level skip), rows returned. Since the round-8
per-file zone maps landed in the commit manifests, the clustered
store's payoff ALSO shows in the file/byte counts: disjoint per-file
ranges let read_facts_pruned drop files inside the kept commit at
planning time, on top of the row-group skipping at decode time.

Usage: python scripts/read_payoff.py [scale]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datetime import timedelta

from pyspark.sql import functions as F

from pantasia_db_sync_spark.pipeline import fixtures
from pantasia_db_sync_spark.pipeline.store import TableStore
from pantasia_db_sync_spark.pipeline.sync import SyncEngine
from pantasia_db_sync_spark.session import get_spark


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    spark = get_spark(app_name="read-payoff")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="read_payoff_")
    src = os.path.join(work, "src")
    fixtures.generate(src, scale=scale, seed=42)

    stores = {}
    for mode, cluster in (("plain", None), ("clustered", "tx_time")):
        sink = os.path.join(work, mode)
        engine = SyncEngine(
            spark, src, TableStore(sink),
            time_interval_minutes=1440,  # day periods → ~23 commits at 10x
            cluster_facts_by=cluster,
        )
        t0 = time.perf_counter()
        stats = engine.run_sync()
        print(
            f"# sync [{mode}]: {time.perf_counter() - t0:.1f}s, "
            f"{len(stats)} periods, "
            f"{sum(s['records'] for s in stats)} records",
            flush=True,
        )
        stores[mode] = TableStore(sink)

    # 2-hour window in the middle of the history: narrower than one
    # period, so manifest pruning keeps ~1 commit and within-commit
    # clustering decides how much of that commit is decoded.
    lo = fixtures.GENESIS + timedelta(days=11)
    hi = lo + timedelta(hours=2)

    def files_bytes(df) -> tuple[int, int]:
        fs = df.inputFiles()
        return len(fs), sum(os.path.getsize(f.replace("file:", "")) for f in fs)

    def timed_agg(mk) -> tuple[float, int]:
        walls, n = [], 0
        mk().agg(F.count("*"), F.sum("quantity")).collect()  # warm
        for _ in range(3):
            t0 = time.perf_counter()
            row = mk().agg(
                F.count("*").alias("n"), F.sum("quantity").alias("q")
            ).collect()[0]
            walls.append(time.perf_counter() - t0)
            n = row["n"]
        return statistics.median(walls), n

    variants = {
        "full-scan (plain store)": lambda: stores["plain"]
        .read_facts(spark, "asset_tx")
        .where(F.col("tx_time").between(F.lit(lo), F.lit(hi))),
        "manifest-pruned (plain store)": lambda: stores["plain"]
        .read_facts_pruned(spark, "asset_tx", "tx_time", lo, hi),
        "manifest-pruned (clustered store)": lambda: stores["clustered"]
        .read_facts_pruned(spark, "asset_tx", "tx_time", lo, hi),
    }
    print(f"\nrange: {lo} .. {hi}")
    print("| variant | wall (median of 3) | files listed | bytes listed | rows |")
    print("|---|---|---|---|---|")
    for name, mk in variants.items():
        nf, nb = files_bytes(mk())
        wall, rows = timed_agg(mk)
        print(f"| {name} | {wall:.3f}s | {nf} | {nb/1e6:.1f} MB | {rows} |",
              flush=True)

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
