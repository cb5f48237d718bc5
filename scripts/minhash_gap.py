"""Instrument the dedup_minhash_lsh 1x→10x throughput gap (round-5
punch #6): is candidate-pair growth superlinear (banding problem), or
is the wall dominated by a fixed-cost stage (verify/signatures)?

Measures, at 1x and 10x corpus, for the registered 16/4 banding and the
auto `recommended_minhash_params(0.5)` = 64/16 banding:
  - n_docs, candidate pairs (post-band join, pre-verify), verified pairs
  - wall of the candidates-only plan vs the full verified plan

Usage: python scripts/minhash_gap.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pantasia_db_sync_spark.session import get_spark  # noqa: E402
from pantasia_db_sync_spark.sources.catalog import load_table  # noqa: E402
from pantasia_db_sync_spark.operators.dedup import (  # noqa: E402
    minhash_band_structs,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_frame,
)

BASE_SF = "/root/testdata/sf0.1"


def candidates_only(docs, num_hashes: int, bands: int):
    sig = minhash_signatures(
        shingle_frame(docs, "doc_id", "text", 3), "doc_id", num_hashes
    )
    banded = sig.select(
        F.col("doc_id"), F.explode(minhash_band_structs(num_hashes, bands)).alias("b")
    ).select("doc_id", F.col("b.band_idx"), F.col("b.band_val"))
    left = banded.select(F.col("doc_id").alias("id_a"), "band_idx", "band_val")
    right = banded.select(F.col("doc_id").alias("id_b"), "band_idx", "band_val")
    return (
        left.join(right.hint("shuffle_hash"), ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def main() -> None:
    spark = get_spark(app_name="minhash-gap")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_experiment import build_corpus

    dirs = {1: BASE_SF, 10: build_corpus(spark, 10)}
    rows = []
    for scale, d in dirs.items():
        docs = load_table(spark, d, "documents")
        n_docs = docs.count()
        for label, (nh, nb) in {"16/4": (16, 4), "auto 64/16": (64, 16)}.items():
            cand = candidates_only(docs, nh, nb)
            cand.count()  # warm
            t0 = time.perf_counter()
            n_cand = cand.count()
            t_cand = time.perf_counter() - t0
            full = minhash_lsh_pairs(
                docs, "doc_id", "text", n=3, num_hashes=nh, bands=nb, threshold=0.5
            )
            full.count()  # warm
            t0 = time.perf_counter()
            n_ver = full.count()
            t_full = time.perf_counter() - t0
            rows.append((scale, n_docs, label, n_cand, n_ver, t_cand, t_full))
            print(
                f"x{scale:<3} docs={n_docs:<7} band={label:<11} "
                f"cand={n_cand:<8} verified={n_ver:<7} "
                f"t_cand={t_cand:6.2f}s t_full={t_full:6.2f}s",
                flush=True,
            )
    print("\n| scale | docs | banding | candidates | verified | t_cand | t_full |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r[0]}x | {r[1]} | {r[2]} | {r[3]} | {r[4]} "
            f"| {r[5]:.2f} | {r[6]:.2f} |"
        )


if __name__ == "__main__":
    main()
