"""End-to-end training-data curation on the bundled fixtures.

    python examples/curation_pipeline.py [sf_dir]

The pipeline a 100 TB pretraining corpus actually runs, stage by
stage — every operator here is the same oracle-verified code the query
registry exposes, composed the way a production job would chain them:

  1. quality gates   — heuristic score, logistic classifier, bigram-LM
                       perplexity (CCNet-style)
  2. exact dedup     — content-fingerprint groupBy
  3. near dedup      — MinHash+LSH banding + exact-Jaccard verify
  4. semantic dedup  — SemDeDup k-means cells over embeddings
  5. incremental     — dedupe a "new day" batch against the stored index
  6. DSIR selection  — importance-resample toward a target slice
  7. split           — leakage-safe, keyed by dup-cluster id
  8. packing         — fixed-budget training sequences
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.operators import curation as CU  # noqa: E402
from kerf_spark.operators import dedup as DD  # noqa: E402
from kerf_spark.operators import packing as PK  # noqa: E402
from kerf_spark.operators import sampling as SMP  # noqa: E402
from kerf_spark.operators import similarity as SIM  # noqa: E402
from kerf_spark.operators import text as TX  # noqa: E402
from kerf_spark.sources.io import read_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("kerf_spark_curation_example")
    docs = read_table(spark, sf, "documents")
    emb = read_table(spark, sf, "embeddings")
    n0 = docs.count()
    print(f"corpus: {n0} docs from {sf}")

    # 1 — quality gates: cheap heuristics first, model scores after
    staged = docs.select(
        "*",
        F.transform(TX.word_tokens("text"), lambda w: F.lower(w)).alias("__tok"),
    )
    clf = TX.quality_classifier_score("text", tokens=F.col("__tok"))
    gated = (
        staged.select(
            "doc_id", "text", "lang", "source",
            TX.quality_score("text", tokens=F.col("__tok")).alias("q_heur"),
            clf["score"].alias("q_clf"),
        )
        .where((F.col("q_heur") >= 0.2) & (F.col("q_clf") >= 0.3))
    )
    ppl = TX.bigram_lm_score(docs).where(F.col("ppl") <= 500)
    gated = gated.join(ppl.select("doc_id"), "doc_id", "left_semi")
    n1 = gated.count()
    print(f"1. quality gates        : {n1} kept ({n0 - n1} dropped)")

    # 2 — exact dedup (fingerprint winners)
    survivors = DD.exact_dedup(gated, on="text").select("doc_id")
    exact = gated.join(survivors, "doc_id", "left_semi")
    n2 = exact.count()
    print(f"2. exact dedup          : {n2} kept ({n1 - n2} dropped)")

    # 3 — near dedup: MinHash/LSH candidates, exact-Jaccard verified
    pairs = DD.minhash_dedup(exact, threshold=0.8)
    near = DD.dedup_survivors(exact, pairs)
    n3 = near.count()
    print(f"3. near dedup (MinHash) : {n3} kept ({n2 - n3} dropped)")

    # 4 — semantic dedup over the embedding table (SemDeDup cells)
    sem_keep = SIM.semantic_dedup_survivors(emb, n_cells=4, threshold=0.3)
    print(f"4. semantic dedup       : {sem_keep.count()} of {emb.count()} embeddings kept")

    # 5 — incremental: treat the top-id decile of the PRE-near-dedup
    # corpus as "tomorrow's crawl" — its near-dups of the index must be
    # rejected at the gate instead of by a corpus-wide re-pair
    cut = int(exact.agg(F.expr("percentile(doc_id, 0.9)")).head()[0])
    index, batch = exact.where(F.col("doc_id") < cut), exact.where(F.col("doc_id") >= cut)
    admitted = DD.incremental_new_docs(batch, index, threshold=0.5)
    print(f"5. incremental ingest   : {admitted.count()} of {batch.count()} new docs admitted")

    # 6 — DSIR: resample toward an 'en' high-quality target slice
    target = near.where(F.col("lang") == "en")
    k = max(n3 // 2, 1)
    picked = CU.dsir_select(near, target, k=k)
    print(f"6. DSIR selection       : {picked.count()} docs drawn (k={k})")

    # 7 — leakage-safe split keyed by dup-cluster id
    all_pairs = DD.prefix_jaccard_pairs(near, prefix_len=32, shingle_n=3, threshold=0.5)
    clusters = DD.dup_clusters(all_pairs.select("id_a", "id_b"))
    keyed = (
        near.join(picked.select("doc_id"), "doc_id", "left_semi")
        .join(clusters, "doc_id", "left")
        .select("doc_id", "text", F.coalesce("cluster", F.col("doc_id")).alias("cluster"))
    )
    split = SMP.train_val_test_split(keyed, "cluster")
    print("7. leakage-safe split   :",
          {r["split"]: r["n"] for r in
           split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()})

    # 8 — pack the train split into fixed-budget sequences
    train = split.where(F.col("split") == "train").select(
        "doc_id", TX.token_count("text").alias("n_tokens")
    )
    packed = PK.sequence_pack(train, "doc_id", "n_tokens", budget=512, shards=4)
    print(f"8. sequence packing     : {packed.select('pack_id').distinct().count()} packs "
          f"for {packed.count()} docs")

    spark.stop()


if __name__ == "__main__":
    main()
