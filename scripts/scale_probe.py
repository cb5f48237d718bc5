"""Core-scaling probe at 10x fixtures (VERDICT r16 next-round #7).

At sf0.1 the whole suite is fixture/overhead-bound: the round-16
driver measured an 8-core vs 32-core suite ratio of 1.10, so shuffle/
parallelism work has no signal at that scale. This probe rebuilds the
top-wall queries' inputs at 10x (replicas deterministic and DISJOINT —
ids offset per replica, names prefixed, graphs shifted — so answers
grow ~linearly and operator cost, not answer growth, is measured) and
times them at the CURRENT process core count. Run it twice:

    SPARK_GRAFT_CPUS=32 python3 scripts/scale_probe.py > /tmp/p32.json
    SPARK_GRAFT_CPUS=8  python3 scripts/scale_probe.py > /tmp/p8.json

and merge the two JSON lines into SCALE_PROBE_r17.json. A data-bound
query should show a core ratio approaching 4; a fixed-cost-bound one
(per-iteration plan compile, commit I/O) will not, and that is the
finding, not a harness bug.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale_probe"

PROBE_QUERIES = [
    "dedup_levenshtein2_names",
    "dedup_levenshtein2_blocked",
    "graph_betweenness_sampled",
    "ann_ivf_index_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "corpus_decontaminate_bloom",
]


def build_probe_corpus(spark, replicas: int = 5) -> str:
    """10x documents/embeddings via scale_experiment.build_corpus plus
    10x customer (distinct per-replica name prefixes keep FastSS pairs
    within replicas) and 10x lineitem (orderkey/suppkey offset per
    replica keeps the co-purchase graphs disjoint)."""
    from pyspark.sql import functions as F

    from pantasia_db_sync_spark.sources.catalog import load_table
    from scale_experiment import build_corpus

    src = build_corpus(spark, replicas)  # documents + embeddings
    out_dir = os.path.join(OUT, f"x{replicas}")
    os.makedirs(out_dir, exist_ok=True)
    for t in ("documents", "embeddings"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{t}.parquet"), dst)
    cust_path = os.path.join(out_dir, "customer.parquet")
    if not os.path.exists(cust_path):
        c = load_table(spark, BASE_SF, "customer")
        parts = [
            c.select(
                (F.col("c_custkey") + k * 10_000_000).alias("c_custkey"),
                (
                    F.concat(F.lit(f"r{k}"), F.col("c_name"))
                    if k
                    else F.col("c_name")
                ).alias("c_name"),
                *[
                    F.col(x)
                    for x in c.columns
                    if x not in ("c_custkey", "c_name")
                ],
            )
            for k in range(replicas)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(8).write.mode("overwrite").parquet(cust_path)
    li_path = os.path.join(out_dir, "lineitem.parquet")
    if not os.path.exists(li_path):
        li = load_table(spark, BASE_SF, "lineitem")
        parts = [
            li.select(
                (F.col("l_orderkey") + k * 100_000_000).alias("l_orderkey"),
                (F.col("l_suppkey") + k * 1_000_000).alias("l_suppkey"),
                *[
                    F.col(x)
                    for x in li.columns
                    if x not in ("l_orderkey", "l_suppkey")
                ],
            )
            for k in range(replicas)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(li_path)
    return out_dir


def main() -> None:
    replicas = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "5"))
    reps = int(os.environ.get("REPS", "2"))

    from pantasia_db_sync_spark.plans import QUERIES
    from pantasia_db_sync_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build_probe_corpus(spark, replicas)

    baseline_ids: set = set()
    it0 = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    while it0.hasNext():
        baseline_ids.add(it0.next())

    def cleanup() -> None:
        import gc as _pygc

        _pygc.collect()
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if e.getKey() not in baseline_ids:
                e.getValue().unpersist(False)
        spark.sparkContext._jvm.System.gc()

    timings = {}
    for name in PROBE_QUERIES:
        spark.sparkContext.setJobDescription(f"scale-probe:{name}")
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        runs = []
        for _ in range(reps):
            cleanup()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        print(f"# {name}: {timings[name]:.2f}s (n={reps})", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0),
                "replicas": replicas,
                "reps": reps,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
