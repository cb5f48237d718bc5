"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized through the noop sink (full plan execution,
all columns, no disk) after a session warm-up, so timings measure the
engine, not JVM startup. Headliners cover the flagship extraction,
heavy joins/aggs/windows, and the LLM-data operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "flagship_extraction",
    "agg_pricing_summary",
    "join_broadcast_dims",
    "join_inner_facts",
    "window_latest_state",
    "window_dense_ids",
    "join_asof",
    "latest_owner_update",
    "tumbling_window_agg",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality_score",
    "text_tfidf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from pantasia_db_sync_spark.session import get_spark
    from pantasia_db_sync_spark.plans import QUERIES

    spark = get_spark(app_name="pantasia-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm-up: one full unrecorded pass so JVM JIT, codegen caches,
    # parquet footers, and broadcast machinery are hot — the recorded
    # pass then measures steady-state engine throughput, not startup.
    for name in HEADLINE:
        materialize(QUERIES[name](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # Sync-pipeline throughput: one batch sync over fresh fixtures
    # (generation excluded from the timing). Records/s goes to stderr;
    # the wall time rides the JSON so round-over-round regressions in
    # the pipeline itself — not just the queries — are visible.
    import tempfile

    from pantasia_db_sync_spark.pipeline import fixtures
    from pantasia_db_sync_spark.pipeline.store import TableStore
    from pantasia_db_sync_spark.pipeline.sync import SyncEngine

    # scale 1.0 ≈ 40k records: large enough that per-job overhead
    # amortizes and rec/s reflects pipeline throughput (~3k rec/s).
    # Together with the 10x run below the sync segment measures ~40s
    # (13.7s at 1x + ~23s at 10x, round-3 numbers).
    def run_sync_at(scale: float) -> tuple[float, float]:
        with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as sink:
            fixtures.generate(src, scale=scale, seed=42)
            engine = SyncEngine(
                spark, src, TableStore(sink), time_interval_minutes=10**6
            )
            t0 = time.perf_counter()
            stats = engine.run_sync()
            dt = time.perf_counter() - t0
            n_records = sum(s["records"] for s in stats)
            print(
                f"# sync_pipeline: {dt:.3f}s, {n_records} records, "
                f"{n_records / dt:.0f} rec/s (scale={scale})",
                file=sys.stderr,
            )
            return round(dt, 3), round(n_records / dt, 1)

    sync_scale = float(os.environ.get("SPARK_GRAFT_SYNC_SCALE", "1.0"))
    sync_wall, sync_rps = run_sync_at(sync_scale)
    # 10x run: shows throughput where per-job overhead amortizes (the
    # scale trend a 100 TB deployment cares about); skippable via env.
    sync10_wall, sync10_rps = (None, None)
    if os.environ.get("SPARK_GRAFT_SYNC_10X", "1") == "1":
        sync10_wall, sync10_rps = run_sync_at(10 * sync_scale)

    # The headline total sums ONLY the query suite (comparable to round
    # 1's definition); the pipeline rides as separate metrics AND as a
    # `queries` entry so per-name round-over-round diffs still work.
    total = round(sum(timings.values()), 3)
    timings["sync_pipeline"] = sync_wall
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "sync_pipeline_sec": sync_wall,
                "sync_pipeline_records_per_sec": sync_rps,
                "sync_pipeline_scale": sync_scale,
                "sync_pipeline_10x_sec": sync10_wall,
                "sync_pipeline_10x_records_per_sec": sync10_rps,
            }
        )
    )


if __name__ == "__main__":
    main()
