"""Scale-growth experiment: how do the dedup/ANN operators behave as
the corpus grows 10x and 50x beyond the shipped fixtures?

Builds enlarged corpora by replicating the sf0.1 documents/embeddings
with deterministic perturbations that keep replicas from being
near-dups of each other (every 3rd token is rewritten per replica;
embeddings are circularly shifted), so the near-dup structure grows
LINEARLY with the corpus — the right regime for measuring operator
scaling, since a quadratically growing answer would hide the
operators' own behavior.

Usage: python scripts/scale_experiment.py [replica counts...]
Writes corpora under /tmp/spark_graft_scale/ and prints one timing
table. Results recorded in README.md §scale-design.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pantasia_db_sync_spark.session import get_spark  # noqa: E402
from pantasia_db_sync_spark.sources.catalog import load_table  # noqa: E402
from pantasia_db_sync_spark.plans import QUERIES  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale"
QUERY_NAMES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "dedup_embedding_cosine",
    "ann_lsh_topk",
]


def build_corpus(spark, replicas: int) -> str:
    out_dir = os.path.join(OUT, f"x{replicas}")
    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(docs_path) and os.path.exists(emb_path):
        return out_dir
    d = load_table(spark, BASE_SF, "documents")
    e = load_table(spark, BASE_SF, "embeddings")
    doc_parts, emb_parts = [], []
    for k in range(replicas):
        if k == 0:
            doc_parts.append(d)
            emb_parts.append(e)
            continue
        toks = F.split(F.trim("text"), " ")
        # rewrite every 3rd token per replica: kills ~all shared
        # 3-gram shingles and flips ~1/3 of simhash votes, so replicas
        # of the same doc are NOT near-dups of each other
        perturbed = F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(
                    i % 3 == F.lit(k % 3), F.concat(F.lit(f"r{k}_"), t)
                ).otherwise(t),
            ),
            " ",
        )
        doc_parts.append(
            d.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                perturbed.alias("text"),
                "lang",
                "source",
                F.length(perturbed).alias("n_chars"),
            )
        )
        shift = (k % 63) + 1  # circular shift → cosine vs original ~random
        emb_parts.append(
            e.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                F.concat(
                    F.slice("embedding", shift + 1, 64 - shift),
                    F.slice("embedding", 1, shift),
                ).alias("embedding"),
                "label",
            )
        )
    docs = doc_parts[0]
    for p in doc_parts[1:]:
        docs = docs.unionByName(p)
    embs = emb_parts[0]
    for p in emb_parts[1:]:
        embs = embs.unionByName(p)
    docs.repartition(32).write.mode("overwrite").parquet(docs_path)
    embs.repartition(8).write.mode("overwrite").parquet(emb_path)
    return out_dir


def main() -> None:
    replicas = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    from pantasia_db_sync_spark.operators.similarity import cosine_near_dup_pairs

    def cosine_scaled(spark_, sf_dir_):
        # The LSH bucket-granularity knob in action: 2^(bits/bands)
        # buckets per band must grow with the corpus, else per-bucket
        # candidate counts grow linearly and the verify stage goes
        # quadratic. 60/6 → 1024 buckets/band (vs the fixture-sized
        # registered query's 32/8 → 16).
        e = load_table(spark_, sf_dir_, "embeddings")
        return cosine_near_dup_pairs(e, threshold=0.4445555, bits=60, n_bands=6)

    rows = []
    for r in replicas:
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        n_docs = load_table(spark, sf_dir, "documents").count()
        # SPARK_GRAFT_SCALE_QUERIES: comma list to subset the run (the
        # fixture-banded cosine intentionally degrades at 50x — skip it
        # when only refreshing the linear rows). "cosine_scaled" names
        # the rebanded 60/6 variant.
        only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
        names = only.split(",") if only else QUERY_NAMES
        cases = [(n, QUERIES[n]) for n in names if n in QUERIES]
        if only is None or "cosine_scaled" in names:
            cases.append(("dedup_embedding_cosine[60b/6band]", cosine_scaled))
        for name, fn in cases:
            mat(fn(spark, sf_dir))  # warm
            t0 = time.perf_counter()
            n_out = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            rows.append((r, n_docs, name, dt, n_out))
            print(
                f"x{r:<3} docs={n_docs:<7} {name:<34} {dt:7.2f}s  rows={n_out}",
                flush=True,
            )
    print("\n| replicas | docs | query | sec | out rows |")
    print("|---|---|---|---|---|")
    for r, n, q, dt, n_out in rows:
        print(f"| {r}x | {n} | {q} | {dt:.2f} | {n_out} |")


if __name__ == "__main__":
    main()
