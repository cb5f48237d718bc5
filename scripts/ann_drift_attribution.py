"""Round-11 verdict #2: attribute the ~20% k-means-fit ANN drift.

Two measured modes over the three drifted queries
(ann_ivf_index_topk, ann_ivfadc_topk, corpus_semantic_dedup):

  isolated  — each query in its OWN fresh SparkSession (warm pass +
              3 reps), the cleanest possible host-normalized number.
  aged      — one session that first materializes the five round-11
              headline additions (dedup_span_scrub,
              store_incremental_agg, corpus_decontaminate_spans,
              graph_modularity, quality_gopher_rules) REPS times, the
              exact suite prefix that moved between r9 and r11, then
              measures the three queries in bench order.

If isolated medians sit back inside the r9 band while aged ones drift
up, the regression is session aging / suite order, not operator code
(none of operators/similarity.py, ivf_index.py changed in r10/r11).
Calibration normalizes both modes for host drift.

Usage: python3 scripts/ann_drift_attribution.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = ["ann_ivfadc_topk", "ann_ivf_index_topk", "corpus_semantic_dedup"]
R11_PREFIX = [
    "dedup_span_scrub",
    "store_incremental_agg",
    "corpus_decontaminate_spans",
    "graph_modularity",
    "quality_gopher_rules",
]
REPS = 3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def calibration(spark) -> float:
    def work():
        materialize(
            spark.range(0, 50_000_000, 1, 32)
            .selectExpr("id % 9973 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
        )

    work()
    return round(statistics.median(sorted(timed(work) for _ in range(3))), 3)


def fresh_session():
    from pantasia_db_sync_spark.session import get_spark

    spark = get_spark(app_name="ann-drift")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_isolated() -> dict:
    out = {}
    for name in TARGETS:
        from pantasia_db_sync_spark.plans import QUERIES

        spark = fresh_session()
        cal = calibration(spark)
        materialize(QUERIES[name](spark, SF_DIR))  # warm
        runs = sorted(
            timed(lambda: materialize(QUERIES[name](spark, SF_DIR)))
            for _ in range(REPS)
        )
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "min": round(runs[0], 3),
            "max": round(runs[-1], 3),
            "calibration_sec": cal,
        }
        spark.stop()
    return out


def run_aged() -> dict:
    from pantasia_db_sync_spark.plans import QUERIES

    spark = fresh_session()
    cal = calibration(spark)
    # replicate the bench prefix: warm + measured passes of the five
    # r11 additions that now run before the ANN family
    for name in R11_PREFIX + TARGETS:
        materialize(QUERIES[name](spark, SF_DIR))
    for name in R11_PREFIX:
        for _ in range(REPS):
            materialize(QUERIES[name](spark, SF_DIR))
    out = {}
    for name in TARGETS:
        spark.sparkContext._jvm.System.gc()
        runs = sorted(
            timed(lambda: materialize(QUERIES[name](spark, SF_DIR)))
            for _ in range(REPS)
        )
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "min": round(runs[0], 3),
            "max": round(runs[-1], 3),
        }
    out["calibration_sec"] = cal
    spark.stop()
    return out


if __name__ == "__main__":
    res = {
        "sf_dir": SF_DIR,
        "isolated": run_isolated(),
        "aged_after_r11_prefix": run_aged(),
    }
    print(json.dumps(res, indent=1))
