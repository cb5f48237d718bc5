"""Probe-pruning payoff of MERGE INTO on a clustered fact history.

`TableStore.merge_into` (round 9) classifies source rows as
matched/unmatched with ONE semi/anti join against the target's keys —
and when the merge key is a single clustered column, it first narrows
the target side with `read_facts_pruned` to the source's [min, max] key
range. This script measures what that narrowing is worth on a many-
commit clustered history: a merge whose source touches ~1% of the key
space should classify against that 1%'s files, not the table.

Setup: a fact table of N rows keyed by `k`, appended as 20 clustered
commits (disjoint-ish per-file k ranges + per-file zone maps in the
commit manifests). Probe: a delete+insert merge whose source keys span
one narrow k range. Variants:

  pruned   merge_into as shipped (read_facts_pruned probe)
  full     the same merge with the range narrowing disabled
           (monkeypatching read_facts_pruned to None-out, so the probe
           joins against the full read_facts frame)

Reported: probe wall (median of 3), files handed to the probe's scan,
and the staged result equality (both variants must stage identical
tombstones + appends — pruning is a performance fact, never a
semantics fact).

Usage: python scripts/merge_probe_payoff.py [n_rows]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pantasia_db_sync_spark.pipeline.store import TableStore
from pantasia_db_sync_spark.session import get_spark


def build(spark, base: str, n_rows: int, n_commits: int = 20) -> TableStore:
    store = TableStore(base)
    per = n_rows // n_commits
    for c in range(n_commits):
        df = spark.range(c * per, (c + 1) * per).select(
            F.col("id").alias("k"),
            (F.col("id") * 7 % 1000).alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        store.append("facts", df, commit_id=c + 1, cluster_by="k",
                     cluster_partitions=4)
        store.commit_append("facts", c + 1)
    return store


def probe_files(store, spark, lo, hi) -> int:
    pruned = store.read_facts_pruned(spark, "facts", "k", lo, hi)
    return len([f for f in pruned.inputFiles() if f.endswith(".parquet")])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="merge-probe-payoff")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="merge_probe_")
    try:
        store = build(spark, os.path.join(work, "store"), n_rows)
        total_files = len(
            [
                f
                for f in store.read_facts(spark, "facts").inputFiles()
                if f.endswith(".parquet")
            ]
        )
        lo, hi = n_rows // 2, n_rows // 2 + n_rows // 100  # ~1% key span
        src = spark.range(lo, hi + 1).select(
            F.col("id").alias("k"),
            F.lit(-1).cast("bigint").alias("v"),
            F.lit("merged").alias("payload"),
        )
        src = src.localCheckpoint(eager=True)  # keep source cost out

        def run_probe(use_pruning: bool) -> tuple[float, dict]:
            orig = store.read_facts_pruned
            if not use_pruning:
                store.read_facts_pruned = lambda *a, **k: None  # type: ignore
            try:
                walls = []
                res = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    cur = store.read_facts(spark, "facts")
                    if use_pruning:
                        b = src.agg(
                            F.min("k").alias("lo"), F.max("k").alias("hi")
                        ).collect()[0]
                        pruned = store.read_facts_pruned(
                            spark, "facts", "k", b["lo"], b["hi"]
                        )
                        if pruned is not None:
                            cur = pruned
                    cur_keys = cur.select("k").distinct()
                    res = {
                        "matched": src.join(cur_keys, ["k"], "left_semi").count(),
                        "unmatched": src.join(cur_keys, ["k"], "left_anti").count(),
                    }
                    walls.append(time.perf_counter() - t0)
                return statistics.median(walls), res
            finally:
                store.read_facts_pruned = orig  # type: ignore

        w_full, r_full = run_probe(False)
        w_pruned, r_pruned = run_probe(True)
        pf = probe_files(store, spark, lo, hi)
        assert r_full == r_pruned, (r_full, r_pruned)
        print(
            f"rows={n_rows} commits=20 total_files={total_files} "
            f"probe_span=1%\n"
            f"full   probe: {w_full:.2f}s  (scans {total_files} files)\n"
            f"pruned probe: {w_pruned:.2f}s  (scans {pf} files)\n"
            f"speedup: {w_full / w_pruned:.2f}x, files skipped: "
            f"{total_files - pf}/{total_files}\n"
            f"classification identical: {r_full == r_pruned} "
            f"(matched={r_pruned['matched']}, unmatched={r_pruned['unmatched']})"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
