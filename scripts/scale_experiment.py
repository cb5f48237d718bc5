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


def build_skew_corpus(spark, replicas: int) -> str:
    """Adversarial-skew twin of ``build_corpus`` (round-6 punch #5):
    one SHINGLE appears in ~30% of documents (a fixed 3-token phrase
    appended) and one sign-LSH BAND VALUE owns ~20% of vectors (every
    5th embedding is a common direction plus a tiny per-row jitter on
    one dimension, so its signature bits — hence every band — collide).
    This is the regime where an unguarded inverted-index join goes
    quadratic in the hot key: hot-shingle pairs alone are
    (0.3n)²/2 ≈ 4.5% of n² — the cliff `max_df` / banding must absorb.
    """
    base = build_corpus(spark, replicas)
    out_dir = os.path.join(OUT, f"skew_x{replicas}")
    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(docs_path) and os.path.exists(emb_path):
        return out_dir
    d = load_table(spark, base, "documents")
    e = load_table(spark, base, "embeddings")
    hot_text = F.when(
        F.col("doc_id") % 10 < 3,
        F.concat(F.col("text"), F.lit(" zqx wvu jkp")),
    ).otherwise(F.col("text"))
    d.select(
        "doc_id", hot_text.alias("text"), "lang", "source",
        F.length(hot_text).alias("n_chars"),
    ).repartition(32).write.mode("overwrite").parquet(docs_path)
    # hot direction: alternating ±1 pattern; jitter one dimension by a
    # minuscule per-row epsilon so vectors aren't literal duplicates
    hot_vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(i % 2 == 0, 1.0).otherwise(-1.0)
        + F.when(i == F.col("vec_id") % 64, (F.col("vec_id") % 97) * 1e-6).otherwise(
            0.0
        ),
    )
    e.select(
        "vec_id",
        F.when(F.col("vec_id") % 5 == 0, hot_vec)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    ).repartition(8).write.mode("overwrite").parquet(emb_path)
    return out_dir


def skew_main() -> None:
    """Measure the band joins under adversarial key skew, with and
    without their guards. Usage:
    python scripts/scale_experiment.py --skew [replicas]"""
    import time as _time

    from pantasia_db_sync_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from pantasia_db_sync_spark.operators.similarity import cosine_near_dup_pairs

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<52} {dt:7.2f}s  rows={n}", flush=True)
        return dt, n

    for r in (1, replicas):
        sf_dir = build_skew_corpus(spark, r)
        docs = load_table(spark, sf_dir, "documents")
        embs = load_table(spark, sf_dir, "embeddings")
        print(
            f"skew corpus x{r}: {docs.count()} docs, {embs.count()} vectors",
            flush=True,
        )
        # The UNGUARDED hot-shingle join is quadratic in the hot docs
        # ((0.3n)^2/2 candidate pairs, each paying an array_intersect
        # verify) — at x10 (50k docs, 112M hot pairs) it did not finish
        # inside a 580s budget, so it only runs at x1 by default
        # (SPARK_GRAFT_SKEW_UNGUARDED=1 forces it at full scale).
        if r == 1 or os.environ.get("SPARK_GRAFT_SKEW_UNGUARDED") == "1":
            run(f"x{r} jaccard max_df=None (UNGUARDED hot shingle)",
                lambda: ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                            threshold=0.5))
        run(f"x{r} jaccard max_df=50 (guarded)",
            lambda: ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                        threshold=0.5, max_df=50))
        # prefix filtering needs NO guard on this corpus AND stays
        # exact: the hot shingles sort last by global df and fall out
        # of (almost) every prefix, so the candidate join never sees
        # the (0.3n)^2/2 hot pairs the unguarded full index pays for
        run(f"x{r} jaccard prefix-filter (EXACT, no guard)",
            lambda: prefix_filter_jaccard_pairs(docs, "doc_id", "text",
                                                n=3, threshold=0.5))
        run(f"x{r} cosine auto params (hot band value)",
            lambda: cosine_near_dup_pairs(embs, threshold=0.4445555))
        run(f"x{r} cosine fixture 32/8 (hot band value)",
            lambda: cosine_near_dup_pairs(embs, threshold=0.4445555, bits=32,
                                          n_bands=8))


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

    def cosine_auto(spark_, sf_dir_):
        # the DEFAULT path: bits/n_bands derived inside the operator
        # from an approx_count_distinct probe (recommended_lsh_params).
        # This is the configuration that must stay linear at 100k
        # vectors — the fixture-pinned 32/8 OOMs there.
        e = load_table(spark_, sf_dir_, "embeddings")
        return cosine_near_dup_pairs(e, threshold=0.4445555)

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
        if only is None or "cosine_auto" in names:
            cases.append(("dedup_embedding_cosine[auto]", cosine_auto))
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





def r7_main() -> None:
    """Round-7 operator scale shapes at 1x vs 10x. Usage:
    python scripts/scale_experiment.py --r7 [replicas]

    - containment: the inverted-index overlap join on replicated docs
      (linear answer structure, like the jaccard row).
    - FastSS levenshtein: synthetic fixed-width name table (the variant
      index is O(n*L); candidate groups bounded by the alphabet).
    - interval overlap: synthetic intervals over a key grid (candidates
      per (key, bin) stay constant as n grows with the key space).
    - PQ / IVFADC: replicated embeddings (fit cost k*dim scalars,
      ADC one combinable aggregation).
    """
    import time as _time

    from pantasia_db_sync_spark.operators.dedup import (
        containment_pairs,
        levenshtein_pairs_fastss,
    )
    from pantasia_db_sync_spark.operators.similarity import ivfadc_topk, pq_topk

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r7-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<52} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    def names_df(n):
        return spark.range(n).select(
            F.col("id").alias("cid"),
            F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("name"),
        )

    def intervals_df(n, keys):
        # deterministic pseudo-random starts over ~2 years, len <= 15d
        return spark.range(n).select(
            (F.col("id") % keys).alias("k"),
            F.col("id").alias("uid"),
            ((F.col("id") * 2654435761) % 730).alias("s"),
        ).select("k", "uid", "s", (F.col("s") + 1 + F.col("uid") % 14).alias("e"))

    def overlap_count(iv):
        binned = iv.select(
            "k", "uid", "s", "e",
            F.explode(F.sequence(F.floor(F.col("s") / 16), F.floor(F.col("e") / 16))).alias("bin"),
        )
        a = binned.select("k", "bin", F.col("uid").alias("ua"), F.col("s").alias("sa"), F.col("e").alias("ea"))
        b = binned.select("k", "bin", F.col("uid").alias("ub"), F.col("s").alias("sb"), F.col("e").alias("eb"))
        return (
            a.join(b.hint("shuffle_hash"), ["k", "bin"])
            .where(F.col("ua") < F.col("ub"))
            .select("k", "ua", "ub", "sa", "ea", "sb", "eb").distinct()
            .where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
            .groupBy("k").count()
        )

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        docs = load_table(spark, sf_dir, "documents")
        embs = load_table(spark, sf_dir, "embeddings")
        nd, ne = docs.count(), embs.count()
        print(f"x{r}: {nd} docs, {ne} vectors", flush=True)
        run(f"x{r} containment_pairs (inverted index)",
            lambda: containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8971))
        run(f"x{r} levenshtein FastSS ({20_000 * r} names)",
            lambda: levenshtein_pairs_fastss(names_df(20_000 * r), "cid", "name"))
        # keys scale with n so per-(key,bin) density stays fixed
        run(f"x{r} interval_overlap ({600_000 * r} intervals)",
            lambda: overlap_count(intervals_df(600_000 * r, 1000 * r)))
        run(f"x{r} pq_topk ADC ({ne} vectors)",
            lambda: pq_topk(embs, "vec_id", "embedding", m=4, k=8, iters=2,
                            query_pred=F.col("q_id") < 10, topk=5))
        run(f"x{r} ivfadc_topk ({ne} vectors)",
            lambda: ivfadc_topk(embs, "vec_id", "embedding",
                                query_pred=F.col("q_id") < 10, topk=5))


def r7b_main() -> None:
    """Late-round-7 operator scale shapes at 1x vs 10x. Usage:
    python scripts/scale_experiment.py --r7b [replicas]

    - image dHash near-dup: real BMP decode + perceptual hash + banded
      hamming join over synthetic patterned images. The pattern period
      grows with n so near-dup group size is FIXED (3) and the true
      pair count grows linearly — any superlinear wall is operator
      cost, not answer growth.
    - spatial grid NN: point field area grows with n so density per
      grid cell is fixed — the scale regime of a real geo workload.
    """
    import time as _time

    from pantasia_db_sync_spark.operators.multimodal import (
        image_phash_pairs,
        synthetic_patterned_bmp,
    )

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r7b-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<52} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    def phash(n):
        # NOT synthetic_patterned_bmp: its linear pixel arithmetic
        # collapses mod 256 (only 256 distinct patterns), which makes
        # dup-group size grow with n — a quadratic TRUE answer that
        # would masquerade as operator cost. A multiply-shift mix keeps
        # patterns distinct per group seed, so groups stay size 3.
        import pandas as _pd

        from pantasia_db_sync_spark.operators.multimodal import encode_bmp_gray

        period = n // 3
        ids = spark.range(n).select(F.col("id").alias("doc_id"))

        def gen(batches):
            for pdf in batches:
                content = []
                M = (1 << 64) - 1
                for i in pdf["doc_id"]:
                    s0 = int(i) % period
                    grid = []
                    for y in range(8):
                        row = []
                        for x in range(9):
                            # splitmix-style per-cell mix: a purely
                            # linear pattern leaves every row on one
                            # +shift orbit (measured: 63 distinct
                            # hashes from 1000 seeds)
                            v = (s0 * 6364136223846793005
                                 + (y * 9 + x) * 1442695040888963407) & M
                            v ^= v >> 31
                            v = (v * 2654435761) & M
                            v ^= v >> 29
                            row.append(v % 256)
                        grid.append(row)
                    content.append(encode_bmp_gray(grid))
                yield _pd.DataFrame({"doc_id": pdf["doc_id"].values, "content": content})

        imgs = ids.mapInPandas(gen, schema="doc_id bigint, content binary")
        return image_phash_pairs(imgs, "doc_id", "content", max_hamming=3)

    def spatial_nn(n, L):
        # xxhash64-scattered coordinates (no oracle here, so no need
        # for the registered query's portable arithmetic, whose two
        # linear mixes put every point on one lattice line — at some
        # field sizes that lattice has NO close pairs at all)
        pts = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(L)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(L)).alias("y"),
        )
        W = 15
        a = pts.where(F.col("event_id") % 2 == 0)
        b = pts.where(F.col("event_id") % 2 == 1).select(
            F.col("event_id").alias("b_id"), F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.floor(F.col("x") / W).alias("cx"), F.floor(F.col("y") / W).alias("cy"),
        )
        shifts = F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
        a_c = a.select(
            F.col("event_id").alias("a_id"), "x", "y", F.explode(shifts).alias("s")
        ).select(
            "a_id", "x", "y",
            (F.floor(F.col("x") / W) + F.col("s.dx")).alias("cx"),
            (F.floor(F.col("y") / W) + F.col("s.dy")).alias("cy"),
        )
        d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
            F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
        cand = a_c.join(b, ["cx", "cy"]).withColumn("d2", d2).where(F.col("d2") <= W * W)
        return cand.groupBy("a_id").agg(F.min(F.struct("d2", "b_id")).alias("m"))

    def knn_cells(n, n_cells):
        from pantasia_db_sync_spark.operators.similarity import knn_graph_mutual

        vecs = spark.range(n).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_cells).alias("label"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: ((F.col("id") * 37 + i * 101) % 97).cast("double") / 97.0,
            ).alias("embedding"),
        )
        return knn_graph_mutual(vecs, k=5, cell_col="label")

    for r in (1, replicas):
        # cells scale with n so |cell| is fixed -> Σ|cell|² linear in n
        run(f"x{r} knn_graph cell-local ({2_000 * r} vectors)",
            lambda: knn_cells(2_000 * r, 100 * r))
        n_img = 3_000 * r
        run(f"x{r} image_phash_pairs ({n_img} real BMPs)", lambda: phash(n_img))
        n_pts = 100_000 * r
        L = int(1000 * (r ** 0.5))
        run(f"x{r} spatial_grid_nn ({n_pts} pts, {L}x{L} field)",
            lambda: spatial_nn(n_pts, L))


def ivskew_main() -> None:
    """Adversarial hot-key skew for the interval-overlap family. Usage:
    python scripts/scale_experiment.py --ivskew [replicas] [--binned-hot-big]

    Corpus: n intervals over `keys` suppliers, except supplier 1 owns
    HOT_SHARE = 20% of ALL intervals while the time spread stays the
    same 730 days — so the hot supplier's per-(key, bin) density grows
    linearly with n and its candidate volume QUADRATICALLY (46 bins ×
    (0.2n/46)² comparisons). Measures the binned PAIR join (the shape
    that must explode) against the sweep-line COUNT
    (operators/rangejoin.py interval_overlap_counts — O(m log m) per
    key, no pair rows) on uniform and hot corpora. The binned hot run
    at full replicas is opt-in (`--binned-hot-big`, expect DNF: at 10x
    the arithmetic is 46 × (1.2M/46)² ≈ 31G candidate pairs)."""
    import time as _time

    from pantasia_db_sync_spark.operators.rangejoin import interval_overlap_counts

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 10
    spark = get_spark(app_name="ivskew-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<52} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    def intervals(n, keys, hot_share=0.0):
        base = spark.range(n).select(
            F.col("id").alias("uid"),
            ((F.col("id") * 2654435761) % 730).alias("s"),
            (F.col("id") % keys).alias("k0"),
        )
        if hot_share:
            every = int(round(1 / hot_share))
            base = base.select(
                F.when(F.col("uid") % every == 0, F.lit(1))
                .otherwise(F.col("k0")).alias("k"), "uid", "s",
            )
        else:
            base = base.select(F.col("k0").alias("k"), "uid", "s")
        return base.select(
            "k", "uid", "s", (F.col("s") + 1 + F.col("uid") % 14).alias("e")
        )

    def binned_count(iv):
        binned = iv.select(
            "k", "uid", "s", "e",
            F.explode(
                F.sequence(F.floor(F.col("s") / 16), F.floor(F.col("e") / 16))
            ).alias("bin"),
        )
        a = binned.select("k", "bin", F.col("uid").alias("ua"),
                          F.col("s").alias("sa"), F.col("e").alias("ea"))
        b = binned.select("k", "bin", F.col("uid").alias("ub"),
                          F.col("s").alias("sb"), F.col("e").alias("eb"))
        return (
            a.join(b.hint("shuffle_hash"), ["k", "bin"])
            .where(F.col("ua") < F.col("ub"))
            .where(F.floor(F.greatest("sa", "sb") / 16) == F.col("bin"))
            .where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
            .groupBy("k").count()
        )

    N, KEYS = 600_000, 1000
    for r in (1, replicas):
        n, keys = N * r, KEYS * r  # uniform density fixed per (key, bin)
        run(f"x{r} binned uniform ({n} iv, {keys} keys)",
            lambda: binned_count(intervals(n, keys)))
        run(f"x{r} sweep  uniform ({n} iv, {keys} keys)",
            lambda: interval_overlap_counts(intervals(n, keys)))
        if r == 1 or "--binned-hot-big" in sys.argv:
            run(f"x{r} binned HOT 20% ({n} iv)",
                lambda: binned_count(intervals(n, keys, hot_share=0.2)))
        else:
            print(f"x{r} binned HOT 20% ({n} iv): skipped "
                  f"(~46×(0.2n/46)² ≈ {int(46 * (0.2 * n / 46) ** 2 / 1e9)}G "
                  f"candidates — opt in with --binned-hot-big)", flush=True)
        run(f"x{r} sweep  HOT 20% ({n} iv)",
            lambda: interval_overlap_counts(intervals(n, keys, hot_share=0.2)))


def r8_main() -> None:
    """Round-8 operator scale shapes at 1x vs Rx. Usage:
    python scripts/scale_experiment.py --r8 [replicas]

    - semantic dedup: cell-local cosine pairs + components over the
      replicated corpus. The registered query pins the fixture's 8
      sign-grid cells; at scale the cell count must grow with n to
      hold |cell| fixed (the operator's 100 TB guidance), so this run
      sizes the sign grid to ceil(log2(n/250)) dims — Σ|cell|² stays
      linear in n.
    - BM25: linear by construction (explode restricted to the 3 query
      terms + row-local doc lengths).
    - skyline_2d: synthetic uniform points; frontier of a uniform
      cloud is O(log n), so wall growth is the scan, not the answer.
    """
    import math
    import time as _time

    from pantasia_db_sync_spark.operators.components import connected_components
    from pantasia_db_sync_spark.operators.similarity import (
        as_double_vec,
        dot_col,
        norm_col,
    )
    from pantasia_db_sync_spark.operators.skyline import skyline_2d
    from pantasia_db_sync_spark.plans import QUERIES
    from pantasia_db_sync_spark.plans.registry import fround

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r8-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<52} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    def semantic_dedup_scaled(sf_dir, n_vecs):
        dims = max(3, math.ceil(math.log2(max(n_vecs, 500) / 250)))
        d = load_table(spark, sf_dir, "documents")
        e = load_table(spark, sf_dir, "embeddings")
        v = as_double_vec("embedding")
        cell = sum(
            F.when(F.element_at(v, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(dims)
        )
        n = e.select(
            "vec_id", v.alias("v"), cell.cast("int").alias("cell")
        ).withColumn("nrm", norm_col(F.col("v")))
        a = n.select(
            F.col("vec_id").alias("id_a"), "cell",
            F.col("v").alias("va"), F.col("nrm").alias("na"),
        )
        b = n.select(
            F.col("vec_id").alias("id_b"), "cell",
            F.col("v").alias("vb"), F.col("nrm").alias("nb"),
        )
        pairs = (
            a.join(b.hint("shuffle_hash"), "cell")
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                fround(
                    dot_col(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb")),
                    6,
                )
                >= 0.4
            )
            .select("id_a", "id_b")
        )
        comp = connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            d.select(F.col("doc_id").alias("node")),
        )
        return comp.where(F.col("node") == F.col("component_id"))

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        ne = load_table(spark, sf_dir, "embeddings").count()
        run(f"x{r} semantic_dedup ({ne} vecs, scaled cells)",
            lambda: semantic_dedup_scaled(sf_dir, ne))
        run(f"x{r} text_bm25_topk", lambda: QUERIES["text_bm25_topk"](spark, sf_dir))
        n_pts = 1_000_000 * r
        pts = spark.range(n_pts).select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 1000003).cast("double").alias("x"),
            ((F.col("id") * 40503) % 999983).cast("double").alias("y"),
        )
        run(f"x{r} skyline_2d ({n_pts} pts)",
            lambda: skyline_2d(pts, "x", "y"))
        # incremental batch-vs-corpus dedup: the replicated corpus keeps
        # near-dup structure linear, so candidates (and the answer) must
        # grow linearly while per-batch cost stays O(batch + candidates)
        from pantasia_db_sync_spark.operators.dedup import (
            incremental_minhash_dedup,
        )

        docs = load_table(spark, sf_dir, "documents")
        run(f"x{r} incremental_dedup (odd batch vs even corpus)",
            lambda: incremental_minhash_dedup(
                docs.where(F.col("doc_id") % 2 == 1),
                docs.where(F.col("doc_id") % 2 == 0),
                "doc_id", "text", n=3, num_hashes=16, bands=4,
                threshold=0.5,
            ).where(F.col("is_dup")))


def r9_main() -> None:
    """Round-9 operator scale shapes at 1x vs Rx. Usage:
    python scripts/scale_experiment.py --r9 [replicas]

    - bpe_train: the corpus pass (explode + groupBy(word)) grows with
      the data, but every learning iteration runs over the FROZEN
      distinct-word frame — the replicated corpus barely grows the
      vocabulary, so wall should be scan-bound, far below linear.
    - stats_ks_two_sample: per-value counts + the distributed prefix
      sum — one range shuffle over distinct values, linear at worst.
    - merge_into probe: delete+insert merge into a 20-commit clustered
      store whose size scales with r; the source stays fixed (~1% key
      span), so the PRUNED probe wall should stay ~flat while the
      table grows (the manifest skip is the whole point).
    """
    import time as _time

    from pantasia_db_sync_spark.operators.bpe import bpe_train
    from pantasia_db_sync_spark.plans import QUERIES

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r9-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<52} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    def ensure_events(sf_dir: str, r: int) -> None:
        # build_corpus replicates documents/embeddings only; KS needs
        # events — replicate with per-replica value jitter so the
        # distinct-value frame (the prefix-sum input) grows r-fold too
        path = os.path.join(sf_dir, "events.parquet")
        if os.path.exists(path):
            return
        e = load_table(spark, BASE_SF, "events")
        parts = [
            e.select(
                (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
                "ts", "user_id", "event_type",
                (F.col("value") * (1 + F.lit(k) * 1e-7)).alias("value"),
                "props",
            )
            for k in range(r)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(16).write.mode("overwrite").parquet(path)

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        if r > 1:
            ensure_events(sf_dir, r)
        docs = load_table(spark, sf_dir, "documents")
        nd = docs.count()
        run(f"x{r} bpe_train 6 merges ({nd} docs)",
            lambda: bpe_train(docs, "text", num_merges=6))
        run(f"x{r} stats_ks_two_sample",
            lambda: QUERIES["stats_ks_two_sample"](spark, sf_dir))

    # merge probe: table grows r-fold, source fixed → pruned probe flat
    import shutil as _shutil
    import tempfile as _tempfile

    from pantasia_db_sync_spark.pipeline.store import TableStore

    for r in (1, replicas):
        n_rows = 200_000 * r
        work = _tempfile.mkdtemp(prefix=f"r9_merge_{r}_")
        try:
            store = TableStore(work)
            per = n_rows // 20
            for c in range(20):
                df = spark.range(c * per, (c + 1) * per).select(
                    F.col("id").alias("k"), (F.col("id") % 997).alias("v")
                )
                store.append("facts", df, commit_id=c + 1, cluster_by="k",
                             cluster_partitions=4)
                store.commit_append("facts", c + 1)
            src = spark.range(100_000, 102_000).select(
                F.col("id").alias("k"),
                F.lit(-1).cast("bigint").alias("v"),
            ).localCheckpoint(eager=True)
            t0 = _time.perf_counter()
            res = store.merge_into(
                spark, "facts", src, ["k"], commit_id=21,
                when_matched="delete", when_not_matched="insert",
            )
            dt = _time.perf_counter() - t0
            print(
                f"x{r} merge_into probe ({n_rows} rows, fixed 2k src)"
                f"{'':<8} {dt:7.2f}s  {res}",
                flush=True,
            )
        finally:
            _shutil.rmtree(work, ignore_errors=True)


def r9b_main() -> None:
    """Audio VAD segmentation scale shape (round-10; the one new
    mapInPandas family member without a 1x->Rx row). Usage:
    python scripts/scale_experiment.py --r9b [replicas]

    Clips are rendered and segmented in the same Arrow-batched
    mapInPandas pass — no shuffle, no join, per-clip work constant —
    so the wall should scale ~linearly in clip count (i.e. FLAT
    per-clip cost), the embarrassingly-parallel decode shape phash
    already demonstrated."""
    import time as _time

    from pantasia_db_sync_spark.operators.multimodal import (
        audio_segments_features,
        synthetic_gapped_wav_frame,
    )

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r9b-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    base = 300  # the registered query's clip count (doc_id < 300)
    for r in (1, replicas):
        n = base * r
        clips = spark.range(0, n, 1, 32).select(F.col("id").alias("doc_id"))

        def vad():
            return audio_segments_features(
                synthetic_gapped_wav_frame(clips), "doc_id", "content"
            )

        vad().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        cnt = vad().count()
        dt = _time.perf_counter() - t0
        print(
            f"x{r} audio_vad_segments ({n} clips) {dt:7.2f}s  rows={cnt}  "
            f"{n / dt:,.0f} clips/s",
            flush=True,
        )


def r10_main() -> None:
    """Round-10 span-dedup scale shapes. Usage:
    python scripts/scale_experiment.py --r10 [replicas]

    - dedup_span_extend 1x->Rx on the replicated corpus: stride-1
      window fan-out grows linearly; the dup-membership groupBy is
      map-side combined, so wall should track the scan, not blow up.
    - HOT-SPAN adversarial: every document shares one boilerplate
      8-token header (the license-header case). The span occurrence
      count collapses map-side (one row per partition for the hot
      span); the semi-join back is one key. A count-over-window
      formulation would funnel every copy of the hot span through a
      single sort task — this measurement is why the operator uses
      groupBy + semi-join instead."""
    import time as _time

    from pantasia_db_sync_spark.plans import QUERIES

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r10-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        n = fn().count()
        dt = _time.perf_counter() - t0
        print(f"{label:<58} {dt:7.2f}s  rows={n}", flush=True)
        return dt

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        nd = load_table(spark, sf_dir, "documents").count()
        run(f"x{r} dedup_span_extend ({nd} docs)",
            lambda: QUERIES["dedup_span_extend"](spark, sf_dir))

    # hot-span adversarial: N docs, each = shared 8-token header +
    # unique tail -> the header's windows appear N times (one span key
    # holds N rows), every doc reports exactly one 8-token segment
    import tempfile as _tempfile

    header = " ".join(f"hdr{i}" for i in range(8))
    for n_docs in (5_000, 50_000):
        work = _tempfile.mkdtemp(prefix=f"r10_hot_{n_docs}_")
        docs = spark.range(0, n_docs, 1, 32).selectExpr(
            "id AS doc_id",
            f"concat('{header}', ' u', id, 'a u', id, 'b u', id, 'c u', id,"
            " 'd u', id, 'e u', id, 'f u', id, 'g u', id, 'h') AS text",
        )
        docs.write.mode("overwrite").parquet(work + "/documents.parquet")
        run(f"hot-span x{n_docs // 5000} ({n_docs} docs share one header)",
            lambda: QUERIES["dedup_span_extend"](spark, work))


def r11_main() -> None:
    """Round-11 span-SCRUB scale shapes. Usage:
    python scripts/scale_experiment.py --r11 [replicas]

    - dedup_span_scrub 1x->Rx on the replicated corpus: same stride-1
      fan-out as extend plus the canonical min-struct groupBy, the cut
      islands, and the token-array rewrite — wall should track extend,
      not multiply it.
    - HOT-SPAN adversarial: every doc shares one boilerplate header;
      canonical detection is groupBy(span).agg(min(struct), count) —
      map-side combined like extend's count, so the 50k-copy span
      still collapses to one row per partition before the shuffle.
      The oracle's row_number-over-span would funnel all copies
      through one sort task; this measurement is why the operator
      picks min-struct + join instead."""
    import time as _time

    from pantasia_db_sync_spark.plans import QUERIES

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r11-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        # time the NOOP WRITE (all columns materialized) — a .count()
        # here would let Catalyst prune the scrubbed_text rewrite and
        # the interval join feeding it, timing a different plan
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = _time.perf_counter() - t0
        print(f"{label:<58} {dt:7.2f}s", flush=True)
        return dt

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        nd = load_table(spark, sf_dir, "documents").count()
        run(f"x{r} dedup_span_scrub ({nd} docs)",
            lambda: QUERIES["dedup_span_scrub"](spark, sf_dir))

    import tempfile as _tempfile

    header = " ".join(f"hdr{i}" for i in range(8))
    for n_docs in (5_000, 50_000):
        work = _tempfile.mkdtemp(prefix=f"r11_hot_{n_docs}_")
        docs = spark.range(0, n_docs, 1, 32).selectExpr(
            "id AS doc_id",
            f"concat('{header}', ' u', id, 'a u', id, 'b u', id, 'c u', id,"
            " 'd u', id, 'e u', id, 'f u', id, 'g u', id, 'h') AS text",
        )
        docs.write.mode("overwrite").parquet(work + "/documents.parquet")
        run(f"hot-span scrub x{n_docs // 5000} ({n_docs} docs, one header)",
            lambda: QUERIES["dedup_span_scrub"](spark, work))

    # decontamination + modularity on the replicated corpus: the
    # benchmark-span broadcast and the label-frame joins must stay flat
    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        nd = load_table(spark, sf_dir, "documents").count()
        run(f"x{r} corpus_decontaminate_spans ({nd} docs)",
            lambda: QUERIES["corpus_decontaminate_spans"](spark, sf_dir))
    run("graph_modularity (sf0.1 purchase graph)",
        lambda: QUERIES["graph_modularity"](spark, BASE_SF))


def r12_main() -> None:
    """Round-12 scale shapes (VERDICT r11 #7). Usage:
    python scripts/scale_experiment.py --r12 [base_multiplier]

    - INCREMENTAL MV REFRESH vs FULL RECOMPUTE at 1x -> Rx base
      history (store_incremental_agg's claim is refresh = O(changes),
      not O(history)): a TableStore fact table seeded with N base rows
      plus two fixed-size delta commits (20k-row upsert, 20k-key
      delete). The MV base aggregate is MATERIALIZED once (7 grouped
      rows — in production it IS the stored MV), so the timed
      incremental path is exactly the refresh: O(changed commits) feed
      read + one broadcast pre-image join + a combinable groupBy over
      (|groups| + |changes|) rows. Expectation: full recompute grows
      ~linearly with N, incremental stays flat.
    - multimodal_decode_mixed at 1x -> 10x corpus: the heterogeneous
      decode is mapInPandas over range-partitioned ids with zero
      shuffle, so wall should scale ~linearly in rows / flat per-core
      until cores saturate."""
    import time as _time

    from pantasia_db_sync_spark.pipeline.store import TableStore

    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r12-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, fn):
        fn()  # warm
        t0 = _time.perf_counter()
        fn()
        dt = _time.perf_counter() - t0
        print(f"{label:<58} {dt:7.2f}s", flush=True)
        return dt

    import shutil as _shutil
    import tempfile as _tempfile

    grp = F.pmod(F.col("o_orderkey"), 7).cast("int")
    for n_base in (600_000, 600_000 * mult):
        d = _tempfile.mkdtemp(prefix=f"r12_mv_{n_base}_")
        try:
            store = TableStore(d)
            seed = spark.range(0, n_base, 1, 32).selectExpr(
                "id AS o_orderkey", "id AS val"
            )
            store.append("f", seed, commit_id=1)
            store.commit_append("f", 1)
            # fixed-size deltas regardless of base size
            upd = spark.range(0, 20_000, 1, 8).selectExpr(
                "id * 3 AS o_orderkey", "id * 30 AS val"
            )
            store.upsert_facts("f", upd, ["o_orderkey"], commit_id=2)
            store.commit_append("f", 2)
            # delete keys =1 mod 3: DISJOINT from the commit-2 updated
            # keys (multiples of 3) — the registered query's documented
            # invariant (no key modified twice after the MV snapshot),
            # which lets delete pre-images join the commit-1 snapshot
            store.delete_facts(
                "f",
                spark.range(0, 20_000, 1, 8).selectExpr(
                    "id * 3 + 1 AS o_orderkey"
                ),
                commit_id=3,
            )
            store.commit_append("f", 3)

            base = store.read_facts_at_commit(spark, "f", 1)
            mv_rows = (
                base.groupBy(grp.alias("grp"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("dn"),
                    F.sum("val").cast("long").alias("dv"),
                )
                .collect()
            )
            mv = spark.createDataFrame(mv_rows, "grp int, dn long, dv long")

            def incremental():
                feed = store.read_facts_changes(spark, "f", since=1)
                ins = feed.where(F.col("_change_type") == "insert").select(
                    grp.alias("grp"),
                    F.lit(1).cast("long").alias("dn"),
                    F.col("val").cast("long").alias("dv"),
                )
                dels = (
                    feed.where(F.col("_change_type") == "delete")
                    .select("o_orderkey")
                    .join(base, "o_orderkey")
                    .select(
                        grp.alias("grp"),
                        F.lit(-1).cast("long").alias("dn"),
                        (-F.col("val")).cast("long").alias("dv"),
                    )
                )
                return (
                    mv.unionByName(ins).unionByName(dels)
                    .groupBy("grp")
                    .agg(F.sum("dn").alias("n"), F.sum("dv").alias("val_sum"))
                    .where(F.col("n") > 0)
                )

            def full():
                return (
                    store.read_facts(spark, "f")
                    .groupBy(grp.alias("grp"))
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("val").alias("val_sum"),
                    )
                )

            inc_rows = sorted(map(tuple, incremental().collect()))
            full_rows = sorted(map(tuple, full().collect()))
            assert inc_rows == full_rows, "incremental != full recompute"
            timed(f"MV refresh INCREMENTAL (base {n_base:,})",
                  lambda: incremental().write.format("noop")
                  .mode("overwrite").save())
            timed(f"MV refresh FULL RECOMPUTE (base {n_base:,})",
                  lambda: full().write.format("noop")
                  .mode("overwrite").save())
        finally:
            _shutil.rmtree(d, ignore_errors=True)

    # heterogeneous decode at 1x -> 10x rows (fixtures built in-flight
    # inside the same mapInPandas pass the registered query uses)
    from pantasia_db_sync_spark.operators.multimodal import (
        decode_bmp_features,  # noqa: F401 — parity of import style
    )

    def mixed_decode(n_rows: int):
        from pantasia_db_sync_spark.operators.multimodal import (
            encode_bmp,
            encode_jpeg_gray,
            encode_png,
            real_image_decode,
        )

        src = spark.range(0, n_rows, 1, 32).selectExpr("id AS doc_id")

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    w, h = i % 21 + 1, i % 13 + 1
                    rgb = ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)
                    if i % 3 == 0:
                        content = encode_bmp(w, h, rgb)
                    elif i % 3 == 1:
                        content = encode_png(w, h, rgb)
                    else:
                        content = encode_jpeg_gray(w, h, (i * 11) % 256)
                    dec = real_image_decode(content)
                    rows.append(
                        (i, dec["width"], dec["height"],
                         float(dec.get("mean_r", dec.get("mean_gray"))))
                    )
                yield pd.DataFrame(
                    rows, columns=["doc_id", "width", "height", "mean_c0"]
                )

        return src.mapInPandas(
            gen,
            schema="doc_id bigint, width int, height int, mean_c0 double",
        )

    for n_rows in (3_000, 30_000):
        timed(f"mixed decode x{n_rows // 3000} ({n_rows} images)",
              lambda: mixed_decode(n_rows).write.format("noop")
              .mode("overwrite").save())


def r12b_main() -> None:
    """Round-12 NEW-OPERATOR scale shapes. Usage:
    python scripts/scale_experiment.py --r12b [replicas]

    - corpus_dsir_sample at 1x -> Rx documents: two combinable
      passes over token counts + a 256-row broadcast — wall should
      track the corpus scan, not the pair space.
    - dedup_sorted_neighborhood at 1x -> 10x customers: one range
      shuffle (sample-strategy dense ids) + one equi hash join; the
      candidate set is O(n*w) BY CONSTRUCTION, so growth is linear.
    - stats_logistic_irls at 1x -> 10x events: 4 scan-bound
      aggregation jobs with 10-value driver probes — wall should be
      nearly flat until the scans dominate the fixed per-job cost."""
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from pantasia_db_sync_spark.plans import QUERIES

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r12b-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = _time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = _time.perf_counter() - t0
        print(f"{label:<58} {dt:7.2f}s", flush=True)
        return dt

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        nd = load_table(spark, sf_dir, "documents").count()
        run(f"x{r} corpus_dsir_sample ({nd} docs)",
            lambda: QUERIES["corpus_dsir_sample"](spark, sf_dir))

    for n in (15_000, 15_000 * replicas):
        work = _tempfile.mkdtemp(prefix=f"r12b_cust_{n}_")
        try:
            spark.range(0, n, 1, 32).selectExpr(
                "id AS c_custkey",
                "printf('Customer#%09d', id * 7 % 1000000000) AS c_name",
            ).write.mode("overwrite").parquet(work + "/customer.parquet")
            run(f"dedup_sorted_neighborhood ({n} names)",
                lambda: QUERIES["dedup_sorted_neighborhood"](spark, work))
        finally:
            _shutil.rmtree(work, ignore_errors=True)

    e = load_table(spark, BASE_SF, "events")
    for r in (1, replicas):
        work = _tempfile.mkdtemp(prefix=f"r12b_ev_{r}_")
        try:
            parts = [e]
            for k in range(1, r):
                parts.append(
                    e.selectExpr(
                        f"event_id + {k} * 100000000 AS event_id",
                        f"ts + INTERVAL {k} HOURS AS ts",
                        f"user_id + {k} * 100000000 AS user_id",
                        "event_type",
                        f"value * {1 + k * 0.01} AS value",
                        "props",
                    )
                )
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            big.repartition(32).write.mode("overwrite").parquet(
                work + "/events.parquet"
            )
            n_ev = load_table(spark, work, "events").count()
            run(f"x{r} stats_logistic_irls ({n_ev} events)",
                lambda: QUERIES["stats_logistic_irls"](spark, work))
        finally:
            _shutil.rmtree(work, ignore_errors=True)


def r12c_main() -> None:
    """Round-12 session-2 operator scale shapes. Usage:
    python scripts/scale_experiment.py --r12c [replicas]

    - multi-source BFS (graph_harmonic_centrality's core) vs the
      naive |seeds| sequential bfs_distances chains on the SAME
      edges: the composite-key loop should cost ~one chain, not five.
    - events_seasonal_decompose / stats_theil_sen /
      events_kaplan_meier at 1x -> Rx events: each reduces the fact
      table with one combinable pass into a CALENDAR-bounded frame
      (hours / days), so wall should track the scan, not the frame.
    - multimodal_exif_parse at 1x -> Rx documents: map-only Arrow
      batches, linear and embarrassingly parallel."""
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from pantasia_db_sync_spark.operators.components import (
        bfs_distances,
        multi_bfs_distances,
    )
    from pantasia_db_sync_spark.plans import QUERIES

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r12c-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn()  # warm
        t0 = _time.perf_counter()
        fn()
        dt = _time.perf_counter() - t0
        print(f"{label:<58} {dt:7.2f}s", flush=True)
        return dt

    # --- multi-source BFS vs sequential chains (same graph, 5 seeds)
    li = load_table(spark, BASE_SF, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    edges = (
        a.join(b, "k").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    edges = edges.localCheckpoint(eager=True)  # freeze: both variants read it
    seeds = [
        int(r[0])
        for r in edges.select(F.explode(F.array("u", "v")).alias("n"))
        .distinct().orderBy("n").limit(5).collect()
    ]

    def seq_bfs():
        outs = [
            bfs_distances(edges, src=s0, hops=4).where(F.col("dist").isNotNull())
            for s0 in seeds
        ]
        big = outs[0]
        for o in outs[1:]:
            big = big.unionByName(o)
        return big.count()

    run(f"sequential bfs_distances x{len(seeds)} seeds", seq_bfs)
    run(
        f"multi_bfs_distances ({len(seeds)} seeds, one chain)",
        lambda: multi_bfs_distances(edges, seeds=seeds, hops=4).count(),
    )

    # --- calendar-bounded reductions at 1x -> Rx events
    e = load_table(spark, BASE_SF, "events")
    for r in (1, replicas):
        work = _tempfile.mkdtemp(prefix=f"r12c_ev_{r}_")
        try:
            parts = [e]
            for k in range(1, r):
                parts.append(
                    e.selectExpr(
                        f"event_id + {k} * 100000000 AS event_id",
                        "ts",
                        f"user_id + {k} * 100000000 AS user_id",
                        "event_type",
                        f"value * {1 + k * 0.01} AS value",
                        "props",
                    )
                )
            big = parts[0]
            for p2 in parts[1:]:
                big = big.unionByName(p2)
            big.repartition(32).write.mode("overwrite").parquet(
                work + "/events.parquet"
            )
            n_ev = load_table(spark, work, "events").count()
            for q in (
                "events_seasonal_decompose",
                "stats_theil_sen",
                "events_kaplan_meier",
            ):
                run(f"x{r} {q} ({n_ev} events)",
                    lambda q=q: QUERIES[q](spark, work)
                    .write.format("noop").mode("overwrite").save())
        finally:
            _shutil.rmtree(work, ignore_errors=True)

    # --- map-only EXIF parse at 1x -> Rx documents (operator driven
    # directly so the registered query's doc_id<300 fixture cap does
    # not mask the scale shape)
    from pantasia_db_sync_spark.operators.multimodal import (
        decode_exif_features,
        synthetic_exif_blob,
    )

    for r in (1, replicas):
        sf_dir = BASE_SF if r == 1 else build_corpus(spark, r)
        docs = load_table(spark, sf_dir, "documents")
        nd = docs.count()
        run(f"x{r} exif encode+parse ({nd} docs, uncapped)",
            lambda docs=docs: decode_exif_features(
                synthetic_exif_blob(docs), "doc_id", "content"
            ).write.format("noop").mode("overwrite").save())


def r13_main() -> None:
    """Round-13 straggler scale shapes (r12 verdict item 6). Usage:
    python scripts/scale_experiment.py --r13 [replicas]

    - events_peak_detection at 1x -> Rx events: the hourly groupBy
      reduces the fact table to the calendar-bounded frame; wall
      should track the scan.
    - store_tpch_refresh shape at 1x -> Rx lineitem history: RF1
      append, RF2 tombstone, and the merged Q1 read each timed —
      refresh cost must track the DELTA, the read the history.
    - stream_cms_heavyhitters state across 100 triggers: per-trigger
      sketch cells are bounded by d*w = 2048 and the RUNNING MERGED
      sketch stays <= 2048 cells flat, independent of trigger count.
    """
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from pantasia_db_sync_spark.plans import QUERIES

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r13-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn()  # warm
        t0 = _time.perf_counter()
        fn()
        dt = _time.perf_counter() - t0
        print(f"{label:<62} {dt:8.2f}s", flush=True)
        return dt

    # --- events_peak_detection at 1x -> Rx events
    e = load_table(spark, BASE_SF, "events")
    for r in (1, replicas):
        work = _tempfile.mkdtemp(prefix=f"r13_ev_{r}_")
        try:
            parts = [e]
            for k in range(1, r):
                parts.append(
                    e.selectExpr(
                        f"event_id + {k} * 100000000 AS event_id",
                        "ts",
                        f"user_id + {k} * 100000000 AS user_id",
                        "event_type",
                        f"value * {1 + k * 0.01} AS value",
                        "props",
                    )
                )
            big = parts[0]
            for p2 in parts[1:]:
                big = big.unionByName(p2)
            big.repartition(32).write.mode("overwrite").parquet(
                work + "/events.parquet"
            )
            n_ev = load_table(spark, work, "events").count()
            run(
                f"x{r} events_peak_detection ({n_ev} events)",
                lambda: QUERIES["events_peak_detection"](spark, work)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
        finally:
            _shutil.rmtree(work, ignore_errors=True)

    # --- store_tpch_refresh shape at 1x -> Rx lineitem history:
    # RF1 append / RF2 tombstone / merged Q1 read timed separately so
    # the refresh's O(delta) vs the read's O(history) is visible
    from pantasia_db_sync_spark.pipeline.store import TableStore

    li1 = load_table(spark, BASE_SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus",
    )
    for r in (1, replicas):
        parts = [li1]
        for k in range(1, r):
            parts.append(
                li1.selectExpr(
                    f"l_orderkey + {k} * 100000000 AS l_orderkey",
                    "l_linenumber", "l_quantity", "l_extendedprice",
                    "l_returnflag", "l_linestatus",
                )
            )
        li = parts[0]
        for p2 in parts[1:]:
            li = li.unionByName(p2)
        li = li.localCheckpoint(eager=True)
        n_li = li.count()
        d = _tempfile.mkdtemp(prefix=f"r13_rf_{r}_")
        try:
            store = TableStore(d)
            base = li.where(F.col("l_orderkey") % 4 < 3)
            store.append("lineitem_f", base, commit_id=1)
            store.commit_append("lineitem_f", 1)
            rf1 = li.where(F.col("l_orderkey") % 4 == 3).localCheckpoint(
                eager=True
            )
            run(
                f"x{r} RF1 append ({n_li} hist rows, delta={rf1.count()})",
                lambda rf1=rf1, store=store: (
                    store.append("lineitem_f", rf1, commit_id=2),
                    store.commit_append("lineitem_f", 2),
                ),
            )
            keys = (
                li.where(F.col("l_orderkey") % 10 == 0)
                .select("l_orderkey")
                .localCheckpoint(eager=True)
            )
            run(
                f"x{r} RF2 tombstone (delete keys={keys.count()})",
                lambda keys=keys, store=store: (
                    store.delete_facts("lineitem_f", keys, commit_id=3),
                    store.commit_append("lineitem_f", 3),
                ),
            )
            cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast(
                "bigint"
            )
            run(
                f"x{r} merged Q1 read over refreshed history",
                lambda store=store, cents=cents: store.read_facts(
                    spark, "lineitem_f"
                )
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    F.sum(cents).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
        finally:
            _shutil.rmtree(d, ignore_errors=True)

    # --- stream_cms_heavyhitters state across 100 triggers
    from pantasia_db_sync_spark.functions.text import tokens_col
    from pantasia_db_sync_spark.plans.llmdata import cms_buckets

    docs = load_table(spark, BASE_SF, "documents")
    n_triggers = 100
    work = _tempfile.mkdtemp(prefix="r13_cms_")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    sliced = docs.withColumn(
        "slice", (F.col("doc_id") % n_triggers).cast("int")
    )
    sliced.repartition(1).write.partitionBy("slice").mode(
        "overwrite"
    ).parquet(os.path.join(work, "parts"))
    import glob as _glob

    for i, f in enumerate(
        sorted(_glob.glob(os.path.join(work, "parts", "slice=*", "*.parquet")))
    ):
        _shutil.copy(f, os.path.join(src_dir, f"documents-{i:03d}.parquet"))

    merged: dict = {}  # (j, bucket) -> count — the RUNNING sketch
    per_trigger_cells: list = []

    def merge(batch_df, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(tokens_col("text")).alias("tok")
        ).where(F.col("tok") != "")
        rows = (
            toks.select(F.explode(cms_buckets(F.col("tok"))).alias("b"))
            .groupBy("b.j", "b.bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .collect()
        )
        per_trigger_cells.append(len(rows))
        for row in rows:
            k = (int(row["j"]), int(row["bucket"]))
            merged[k] = merged.get(k, 0) + int(row["c"])

    # partitionBy-written part files omit the partition column, so the
    # copied slice files carry exactly the documents schema
    read_schema = docs.schema
    t0 = _time.perf_counter()
    q = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1200):
        q.stop()
        raise RuntimeError("cms stream did not finish")
    dt = _time.perf_counter() - t0
    _shutil.rmtree(work, ignore_errors=True)
    print(
        f"cms 100-trigger stream: {dt:8.2f}s total "
        f"({dt / max(1, len(per_trigger_cells)):.3f}s/trigger, "
        f"{len(per_trigger_cells)} triggers)",
        flush=True,
    )
    print(
        f"cms state: per-trigger cells min={min(per_trigger_cells)} "
        f"max={max(per_trigger_cells)} (bound d*w=2048); RUNNING merged "
        f"sketch={len(merged)} cells — FLAT, independent of trigger count",
        flush=True,
    )


def r14_main() -> None:
    """Round-14 scale shapes (VERDICT r13 item 7 + the round's new
    operators). Usage:
    python scripts/scale_experiment.py --r14 [replicas]

    - brandes_dependency_multi K=5 seeds (HUB INCLUDED) on the planted-
      hub graph at 1x/10x edges, plus the K-sequential-chains
      comparison at 1x — quantifying the composite-key chaining win the
      registered graph_betweenness_sampled rides on.
    - hyperanf_rounds rounds=3 on the same hub graph at 1x/10x: the
      sketch loop's wall must track |E|, state O(|V|) sketches.
    - multimodal_mp4_mjpeg_frames decode at 1x -> Rx documents:
      map-only Arrow batches, expect linear.
    - r13 session-2 ops measured 1x -> Rx: events_ab_cuped (events),
      multimodal_mp4_meta (documents), graph_hits_micro
      (orders+lineitem replicas = disjoint bipartite copies).
    - stream_sliding_window state across 100 triggers: per-trigger
      stateOperators numRowsTotal must stay bounded by the
      watermark-open window set, independent of trigger count.
    """
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from pantasia_db_sync_spark.operators.components import (
        brandes_dependency,
        brandes_dependency_multi,
        hyperanf_rounds,
    )

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r14-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn()  # warm
        t0 = _time.perf_counter()
        out = fn()
        dt = _time.perf_counter() - t0
        print(f"{label:<62} {dt:8.2f}s  (out={out})", flush=True)
        return dt

    # --- hub-graph rows: multi-seed Brandes (hub among seeds) + HyperANF
    n1 = 30_000
    for scale in (1, replicas):
        edf, n_nodes, hub_deg = _hub_graph(spark, n1 * scale)
        ne = edf.count()
        print(
            f"\n-- x{scale}: {ne} edges, hub degree {hub_deg} "
            f"({hub_deg * 100 // ne}% of edges)",
            flush=True,
        )
        seeds = [0, 1, 2, 3, 4]  # node 0 IS the hub
        run(
            f"x{scale} brandes_multi K=5 seeds hops=3 (hub among seeds)",
            lambda e=edf, s=seeds: brandes_dependency_multi(
                e, seeds=s, hops=3
            ).count(),
        )
        if scale == 1:
            run(
                "x1  brandes K=5 SEQUENTIAL single-seed chains (baseline)",
                lambda e=edf, s=seeds: sum(
                    brandes_dependency(e, seed=x, hops=3).count() for x in s
                ),
            )
        run(
            f"x{scale} hyperanf rounds=3 (HLL t-ball sketches)",
            lambda e=edf: hyperanf_rounds(e, rounds=3).count(),
        )

    # --- replicated-table rows: r13 session-2 ops + the MJPEG decode
    def replicate_events(r: int) -> str:
        work = _tempfile.mkdtemp(prefix=f"r14_ev_{r}_")
        e = load_table(spark, BASE_SF, "events")
        parts = [e]
        for k in range(1, r):
            parts.append(
                e.selectExpr(
                    f"event_id + {k} * 100000000 AS event_id",
                    "ts",
                    f"user_id + {k} * 100000000 AS user_id",
                    "event_type",
                    f"value * {1 + k * 0.01} AS value",
                    "props",
                )
            )
        big = parts[0]
        for p2 in parts[1:]:
            big = big.unionByName(p2)
        big.repartition(32).write.mode("overwrite").parquet(
            work + "/events.parquet"
        )
        return work

    def replicate_docs(r: int) -> str:
        # doc_id is kept UNCHANGED across replicas: the mp4 queries cap
        # their fixture at doc_id < 300, so shifted ids would scale the
        # scan but not the DECODE — duplicated ids scale the decode
        # work itself r-fold, which is the map-only linearity claim
        # under test (the decoders never require unique ids)
        work = _tempfile.mkdtemp(prefix=f"r14_doc_{r}_")
        d = load_table(spark, BASE_SF, "documents")
        parts = [d for _ in range(r)]
        big = parts[0]
        for p2 in parts[1:]:
            big = big.unionByName(p2)
        big.repartition(32).write.mode("overwrite").parquet(
            work + "/documents.parquet"
        )
        return work

    def replicate_bipartite(r: int) -> str:
        work = _tempfile.mkdtemp(prefix=f"r14_bi_{r}_")
        o = load_table(spark, BASE_SF, "orders")
        li = load_table(spark, BASE_SF, "lineitem")
        op = [o] + [
            o.withColumn("o_orderkey", F.col("o_orderkey") + k * 100_000_000)
            .withColumn("o_custkey", F.col("o_custkey") + k * 100_000_000)
            for k in range(1, r)
        ]
        lp = [li] + [
            li.withColumn("l_orderkey", F.col("l_orderkey") + k * 100_000_000)
            .withColumn("l_suppkey", F.col("l_suppkey") + k * 1_000_000)
            for k in range(1, r)
        ]
        bo, bl = op[0], lp[0]
        for p2 in op[1:]:
            bo = bo.unionByName(p2)
        for p2 in lp[1:]:
            bl = bl.unionByName(p2)
        bo.repartition(8).write.mode("overwrite").parquet(work + "/orders.parquet")
        bl.repartition(32).write.mode("overwrite").parquet(
            work + "/lineitem.parquet"
        )
        return work

    def noopq(name, sf_dir):
        return (
            QUERIES[name](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    for r in (1, replicas):
        work = BASE_SF if r == 1 else replicate_events(r)
        try:
            run(
                f"x{r} events_ab_cuped",
                lambda w=work: noopq("events_ab_cuped", w),
            )
        finally:
            if r != 1:
                _shutil.rmtree(work, ignore_errors=True)
    for r in (1, replicas):
        work = BASE_SF if r == 1 else replicate_docs(r)
        try:
            run(
                f"x{r} multimodal_mp4_meta",
                lambda w=work: noopq("multimodal_mp4_meta", w),
            )
            run(
                f"x{r} multimodal_mp4_mjpeg_frames",
                lambda w=work: noopq("multimodal_mp4_mjpeg_frames", w),
            )
        finally:
            if r != 1:
                _shutil.rmtree(work, ignore_errors=True)
    for r in (1, replicas):
        work = BASE_SF if r == 1 else replicate_bipartite(r)
        try:
            run(
                f"x{r} graph_hits_micro",
                lambda w=work: noopq("graph_hits_micro", w),
            )
        finally:
            if r != 1:
                _shutil.rmtree(work, ignore_errors=True)

    # --- stream_sliding_window state across 100 triggers
    from pantasia_db_sync_spark.streaming import events_stream
    from pantasia_db_sync_spark.streaming.sync_stream import (
        sliding_window_counts,
    )

    e = load_table(spark, BASE_SF, "events")
    n_triggers = 100
    work = _tempfile.mkdtemp(prefix="r14_ssw_")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    sliced = e.withColumn("slice", (F.col("event_id") % n_triggers).cast("int"))
    sliced.repartition(1).write.partitionBy("slice").mode("overwrite").parquet(
        os.path.join(work, "parts")
    )
    for i, f in enumerate(
        sorted(_glob.glob(os.path.join(work, "parts", "slice=*", "*.parquet")))
    ):
        _shutil.copy(f, os.path.join(src_dir, f"events-{i:03d}.parquet"))
    q = (
        sliding_window_counts(
            events_stream(spark, src_dir, max_files_per_trigger=1)
        )
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    t0 = _time.perf_counter()
    if not q.awaitTermination(1200):
        q.stop()
        raise RuntimeError("sliding-window stream did not finish")
    dt = _time.perf_counter() - t0
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    _shutil.rmtree(work, ignore_errors=True)
    print(
        f"sliding-window 100-trigger stream: {dt:8.2f}s total, "
        f"{len(state_rows)} progress snapshots",
        flush=True,
    )
    if state_rows:
        print(
            f"sliding-window state rows: first={state_rows[0]} "
            f"max={max(state_rows)} final={state_rows[-1]} — bounded by "
            "the watermark-open window set (fixture spans a fixed time "
            "range), NOT by trigger count",
            flush=True,
        )


def _hub_graph(spark, n_edges: int, hub_share: float = 0.2):
    """Deterministic power-law graph with ONE max-degree hub owning
    ``hub_share`` of all edges — the adversarial shape for every
    per-node graph operator (social/web graphs look like this; the
    uniform-ish co-purchase fixtures do not). Non-hub endpoints are
    Zipf(1.3)-distributed over ~n_edges/5 nodes, so there is a whole
    degree TAIL of secondary hubs, not just the one planted spike.
    Returns (edges_df, n_nodes, hub_degree); edges are canonical
    u < v, distinct, localCheckpoint'ed."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_nodes = max(n_edges // 5, 64)
    hub_deg = int(n_edges * hub_share)
    # hub = node 0; distinct neighbors 1..hub_deg
    hub_u = np.zeros(hub_deg, dtype=np.int64)
    hub_v = np.arange(1, hub_deg + 1, dtype=np.int64)
    # power-law bulk: Zipf exponent 1.3, folded into the node range
    m = n_edges - hub_deg
    u = rng.zipf(1.3, size=2 * m) % n_nodes
    v = rng.zipf(1.3, size=2 * m) % n_nodes
    keep = u != v
    u, v = u[keep][:m], v[keep][:m]
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "u": np.concatenate([hub_u, lo]),
            "v": np.concatenate([hub_v, hi]),
        }
    ).drop_duplicates()
    edf = (
        spark.createDataFrame(pdf)
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    return edf, n_nodes, hub_deg


def gskew_main() -> None:
    """Adversarial-graph scale table for the WHOLE graph family (r12
    judge items 1-2). Usage:
    python scripts/scale_experiment.py --gskew [edges_1x] [grow]

    Times every graph operator shape on a power-law graph with one hub
    owning 20% of edges, at 1x and grow-x edge counts, including the
    clustering-coefficient CLIFF DEMO: the retired symmetrized
    wedge-per-center plan (Sigma d^2 through the hub's single join
    key) vs the shipped degree-oriented compact-forward plan (hub
    pivots zero wedges). Results recorded in README.md."""
    import time as _time

    from pantasia_db_sync_spark.operators.components import (
        connected_components,
        kcore,
        multi_bfs_distances,
        pagerank,
    )
    from pantasia_db_sync_spark.plans.extras import _per_node_triangles

    n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    grow = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="gskew-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn, budget_sec=900.0):
        fn()  # warm
        t0 = _time.perf_counter()
        out = fn()
        dt = _time.perf_counter() - t0
        print(f"{label:<62} {dt:8.2f}s  (out={out})", flush=True)
        return dt

    def clustering_old(e):
        """The RETIRED r12 plan, kept here only as the cliff exhibit:
        symmetrized edges, wedges enumerated per CENTER via
        s1.join(s2, 'center') — the hub funnels hub_deg^2/2 candidate
        rows through one join key before the close."""
        sym = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
            e.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        s1 = sym.select(F.col("a").alias("center"), F.col("b").alias("x"))
        s2 = sym.select(F.col("a").alias("center"), F.col("b").alias("y"))
        wedge = s1.join(s2, "center").where(F.col("x") < F.col("y"))
        tri = (
            wedge.join(e, (e["u"] == wedge["x"]) & (e["v"] == wedge["y"]))
            .groupBy("center")
            .agg(F.count(F.lit(1)).alias("t"))
        )
        return tri.count()

    def clustering_new(e):
        return _per_node_triangles(e).count()

    scales = (1, 4, grow) if grow > 4 else (1, grow)
    for scale in scales:
        n_edges = n1 * scale
        edf, n_nodes, hub_deg = _hub_graph(spark, n_edges)
        ne = edf.count()
        print(
            f"\n-- x{scale}: {ne} edges, {n_nodes} nodes, hub degree "
            f"{hub_deg} ({hub_deg * 100 // ne}% of edges)",
            flush=True,
        )
        nodes = (
            edf.select(F.col("u").alias("node"))
            .unionAll(edf.select(F.col("v").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        seeds = [int(r[0]) for r in nodes.orderBy("node").limit(5).collect()]
        run(
            f"x{scale} clustering NEW (degree-oriented compact-forward)",
            lambda e=edf: clustering_new(e),
        )
        if scale == 1 or hub_deg <= 40_000:
            run(
                f"x{scale} clustering OLD (symmetrized wedge-per-center)",
                lambda e=edf: clustering_old(e),
            )
        else:
            print(
                f"x{scale} clustering OLD skipped: hub_deg^2/2 = "
                f"{hub_deg * hub_deg // 2} wedge rows through ONE key",
                flush=True,
            )
        run(
            f"x{scale} pagerank rounds=3",
            lambda e=edf: pagerank(e, rounds=3).count(),
        )
        run(
            f"x{scale} kcore k=4 rounds=4",
            lambda e=edf: kcore(e, k=4, rounds=4).count(),
        )
        run(
            f"x{scale} connected_components",
            lambda e=edf, nn=nodes: connected_components(
                e, nn, src_col="u", dst_col="v"
            ).count(),
        )
        run(
            f"x{scale} multi_bfs 5 seeds hops=3",
            lambda e=edf, s=seeds: multi_bfs_distances(
                e, seeds=s, hops=3
            ).count(),
        )
        from pantasia_db_sync_spark.operators.components import (
            brandes_dependency,
            ktruss,
            personalized_pagerank,
        )

        run(
            f"x{scale} ktruss k=4 rounds=2 (degree-oriented supports)",
            lambda e=edf: ktruss(e, k=4, rounds=2).count(),
        )
        run(
            f"x{scale} personalized_pagerank 4 rounds (sparse, hub seed)",
            lambda e=edf: personalized_pagerank(
                e, seed=0, rounds=4
            ).count(),
        )
        run(
            f"x{scale} brandes_dependency hops=3 (hub seed)",
            lambda e=edf: brandes_dependency(e, seed=0, hops=3).count(),
        )
        # link prediction: candidate volume IS Sigma d(witness)^2 by
        # semantics (one row per witnessed pair) — uncapped only while
        # the hub keeps it bounded; the witness-degree cap is the
        # 100 TB knob (same treatment as dedup's max_df).
        und = edf.unionAll(
            edf.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

        def linkpred(cap=None):
            src = und
            if cap is not None:
                wdeg = und.groupBy("v").agg(F.count(F.lit(1)).alias("wd"))
                src = und.join(
                    wdeg.where(F.col("wd") <= cap).select("v"), "v"
                )
            x, y = src.alias("x"), src.alias("y")
            cn = (
                x.join(
                    y,
                    (F.col("x.v") == F.col("y.v"))
                    & (F.col("x.u") < F.col("y.u")),
                )
                .groupBy(F.col("x.u").alias("a"), F.col("y.u").alias("b"))
                .agg(F.count(F.lit(1)).alias("common"))
            )
            return cn.where(F.col("common") >= 2).count()

        if hub_deg <= 10_000:
            run(f"x{scale} link_prediction uncapped", lambda: linkpred())
        else:
            print(
                f"x{scale} link_prediction uncapped skipped: output is "
                f">= hub_deg^2/2 = {hub_deg * hub_deg // 2} pairs by "
                "semantics",
                flush=True,
            )
        run(
            f"x{scale} link_prediction witness-degree cap 1000",
            lambda: linkpred(cap=1000),
        )


def r15_main() -> None:
    """Round-15 scale shapes for the new operators. Usage:
    python scripts/scale_experiment.py --r15 [replicas]

    - H.264 container->pixels (both MB families) at 1x -> Rx
      documents: Arrow-batched map-only decode, expect linear walls.
    - FastSS radius-2 on synthetic zero-padded serial names at
      1x -> Rx: the templated-key hot-bucket shape the operator
      docstring analyzes — candidates grow with the TRUE pair count
      (serials are pairwise close), the blocking itself stays an
      equi-join.
    - Winnowing ingest filter (the stream_winnowing_hits plan as its
      batch-equivalent frame: per-row mapInPandas fingerprints +
      broadcast semi-join) over build_corpus replicas: expect linear
      with corpus size, zero shuffle on the stream side.
    - Sketch-only HyperANF/HyperBall (the graph_hyperanf_nf_sketch /
      graph_hyperball_harmonic_sketch plans) on the planted-hub graph
      at 1x/Rx edges: O(rounds) passes, O(|V|) sketch state.
    """
    import time as _time

    import pyspark.sql.functions as _F

    from pantasia_db_sync_spark.functions.text import (
        HASH_PRIME,
        portable_hash_mod,
    )
    from pantasia_db_sync_spark.operators.components import (
        hyperanf_rounds,
        hyperball_harmonic,
    )
    from pantasia_db_sync_spark.operators.dedup import (
        _shingle_parts,
        levenshtein_pairs_fastss,
        winnow_fingerprints_pandas,
    )
    from pantasia_db_sync_spark.operators.multimodal import (
        decode_mp4_frame_features,
        synthetic_avc_mp4_frame,
    )

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="r15-scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, fn):
        fn()  # warm
        t0 = _time.perf_counter()
        out = fn()
        dt = _time.perf_counter() - t0
        print(f"{label:<62} {dt:8.2f}s  (out={out})", flush=True)
        return dt

    # --- H.264 decode throughput (map-only) ---
    for scale in (1, replicas):
        n_docs = 300 * scale
        ids = spark.range(n_docs).select(_F.col("id").alias("doc_id"))
        for coding in ("i16x16", "i4x4"):
            run(
                f"x{scale} avc {coding} container->pixels ({n_docs} docs)",
                lambda d=ids, c=coding: decode_mp4_frame_features(
                    synthetic_avc_mp4_frame(d, coding=c), "doc_id", "content"
                ).count(),
            )

    # --- FastSS radius-2 on templated serials ---
    for scale in (1, replicas):
        n = 1_500 * scale
        names = spark.range(n).select(
            _F.col("id").alias("nid"),
            _F.format_string("User#%09d", _F.col("id")).alias("name"),
        )
        run(
            f"x{scale} fastss radius-2 ({n} serial names)",
            lambda d=names: levenshtein_pairs_fastss(
                d, "nid", "name", max_dist=2
            ).count(),
        )

    # --- winnowing ingest filter over corpus replicas ---
    for scale in (1, replicas):
        sf = build_corpus(spark, scale) if scale > 1 else BASE_SF
        docs = load_table(spark, sf, "documents")
        ref = docs.where(
            _F.col("text").isNotNull() & (_F.col("doc_id") % 50 == 0)
        )
        toks, sh = _shingle_parts(ref, "doc_id", "text", 3)
        from pyspark.sql import Window as _W

        kg = toks.select(
            "doc_id", _F.posexplode(sh).alias("pos", "s")
        ).select(
            "doc_id",
            _F.col("pos").cast("bigint").alias("pos"),
            portable_hash_mod("s").alias("h"),
        )
        win = _W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
        ref_fps = (
            kg.select(
                _F.count(_F.lit(1)).over(win).alias("wn"),
                _F.max(
                    _F.struct(
                        (_F.lit(HASH_PRIME) - _F.col("h")).alias("neg"),
                        _F.col("pos").alias("p"),
                        _F.col("h").alias("hh"),
                    )
                ).over(win).alias("sel"),
            )
            .where(_F.col("wn") == 4)
            .select(_F.col("sel.hh").alias("h"))
            .distinct()
        )
        incoming = docs.where(
            _F.col("text").isNotNull() & (_F.col("doc_id") % 50 != 0)
        )
        run(
            f"x{scale} winnowing ingest filter ({incoming.count()} docs)",
            lambda i=incoming, r=ref_fps: winnow_fingerprints_pandas(
                i, "doc_id", "text"
            )
            .join(_F.broadcast(r), "h", "left_semi")
            .count(),
        )

    # --- sketch-only neighborhood functions on the planted-hub graph
    n1 = 30_000
    for scale in (1, replicas):
        edf, n_nodes, hub_deg = _hub_graph(spark, n1 * scale)
        ne = edf.count()
        print(f"\n-- x{scale}: {ne} edges, hub degree {hub_deg}", flush=True)
        run(
            f"x{scale} hyperanf_rounds rounds=3 (sketch only)",
            lambda e=edf: hyperanf_rounds(e, rounds=3).count(),
        )
        run(
            f"x{scale} hyperball_harmonic sixths (sketch only)",
            lambda e=edf: hyperball_harmonic(
                e, rounds=3, integer_sixths=True
            ).count(),
        )


def sync100_main() -> None:
    """Round-15 100x sync-pipeline scale probe (VERDICT r14 next-round
    #4): python scripts/scale_experiment.py --sync100 [max_scale]

    Runs the FULL batch sync (fixtures -> extraction -> dims ->
    upserts -> store commits) at scales 1, 10 and 100 (~40k, ~400k,
    ~3.9M records) over fresh fixture dirs, timing the sync alone.
    10x is measured every round by bench.py; this exposes any stage
    whose cost only goes superlinear PAST 10x — the usual suspects
    being the surrogate-id offset collect, the argmax window, and
    commit fan-in. Expect rec/s to RISE with scale while per-job
    overhead amortizes, then flatten; a falling 100x rec/s would mark
    the superlinear stage this probe exists to catch."""
    import tempfile
    import time as _time

    from pantasia_db_sync_spark.pipeline import fixtures
    from pantasia_db_sync_spark.pipeline.store import TableStore
    from pantasia_db_sync_spark.pipeline.sync import SyncEngine

    max_scale = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print("| scale | records | wall (s) | rec/s |")
    print("|---|---|---|---|")
    scale = 1.0
    while scale <= max_scale:
        reps = 2 if scale <= 10 else 1
        walls = []
        n_records = 0
        with tempfile.TemporaryDirectory() as src:
            fixtures.generate(src, scale=scale, seed=42)
            for _ in range(reps):
                spark.sparkContext._jvm.System.gc()
                with tempfile.TemporaryDirectory() as sink:
                    engine = SyncEngine(
                        spark,
                        src,
                        TableStore(sink),
                        time_interval_minutes=10**6,
                    )
                    t0 = _time.perf_counter()
                    stats = engine.run_sync()
                    walls.append(_time.perf_counter() - t0)
                    n_records = sum(s["records"] for s in stats)
        wall = min(walls)
        print(
            f"| {scale:g}x | {n_records} | {wall:.1f} "
            f"| {n_records / wall:.0f} |",
            flush=True,
        )
        scale *= 10


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--r15":
        r15_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--sync100":
        sync100_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r7":
        r7_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r7b":
        r7b_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivskew":
        ivskew_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r8":
        r8_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r9":
        r9_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r9b":
        r9b_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r10":
        r10_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r11":
        r11_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r12":
        r12_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r12b":
        r12b_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r12c":
        r12c_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--gskew":
        gskew_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r14":
        r14_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r13":
        r13_main()
    else:
        main()
