"""Runnable tour of the persisted-index surfaces: ANN indexes with
build/append/stream/compact lifecycle, and the inverted text index
with boolean, BM25, and phrase retrieval.

    python examples/persisted_indexes.py [sf_dir]

The ANN half is FAISS's architecture done as Spark table layouts —
IVF cells become parquet partitions (partition pruning IS the nprobe),
PQ codes become a narrow stored table, and maintenance follows the
LSM shape: frozen-quantizer appends, a streaming delta tree, one
compaction.  The text half is the classic inverted file: bucket-
partitioned postings, Robertson BM25, positional phrase intersection.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.operators import annindex as AI  # noqa: E402
from kerf_spark.operators import textindex as TI  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("persisted_indexes", master="local[8]")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = tempfile.mkdtemp(prefix="kerf_idx_demo_")

    # ---- IVF-PQ: the composed production ANN index, persisted -------
    ivfpq = os.path.join(root, "ivfpq")
    meta = AI.build_ivfpq_index(emb, ivfpq, n_cells=8, m=8, n_codewords=16)
    print(f"ivfpq index: {meta['rows']} rows, {meta['n_cells']} cells")
    q = emb.where(F.col("vec_id") < 4)
    AI.ivfpq_topk_indexed(spark, ivfpq, q, k=3, nprobe=4).show()

    # ---- lifecycle: build half, stream the rest, compact ------------
    ivf = os.path.join(root, "ivf")
    even = emb.where(F.col("vec_id") % 2 == 0)
    odd = emb.where(F.col("vec_id") % 2 == 1)
    AI.build_ivf_index(even, ivf, n_cells=8)
    AI.index_stream_sink(ivf)(odd, 0)  # a micro-batch lands in the delta
    print("delta query (base ∪ stream):")
    AI.ivf_topk_indexed(spark, ivf, q, k=3, nprobe=4).show(6)
    meta = AI.compact_index(spark, ivf)
    print(f"compacted: rows={meta['rows']} compactions={meta['compactions']}")

    # ---- inverted text index: boolean, BM25, phrase ------------------
    ti = os.path.join(root, "text")
    TI.build_text_index(docs, ti, n_buckets=32)
    terms = ["merge", "stream", "vector"]
    n_and = TI.keyword_search(spark, ti, terms, "and").count()
    n_or = TI.keyword_search(spark, ti, terms, "or").count()
    print(f"boolean retrieval: AND={n_and} OR={n_or} for {terms}")
    print("BM25 top-5:")
    TI.bm25_topk(spark, ti, terms, k=5).show()
    print('phrase "fast table":')
    TI.phrase_search(spark, ti, ["fast", "table"]).orderBy(
        F.col("hits").desc(), "doc_id"
    ).show(5)

    # ---- text-index lifecycle: stream new docs in, compact ----------
    ti2 = os.path.join(root, "text_half")
    even = docs.where(F.col("doc_id") % 2 == 0)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    TI.build_text_index(even, ti2)
    TI.text_index_stream_sink(ti2)(odd, 0)  # a micro-batch lands
    n_delta = TI.bm25_topk(spark, ti2, terms, k=3).count()
    meta = TI.compact_text_index(spark, ti2)
    n_comp = TI.bm25_topk(spark, ti2, terms, k=3).count()
    print(
        f"text lifecycle: delta-query rows={n_delta}, compacted "
        f"rows={n_comp}, docs={meta['n_docs']}, "
        f"compactions={meta['compactions']}"
    )


if __name__ == "__main__":
    main()
