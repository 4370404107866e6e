"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

Complements `dedup.dup_clusters` (iterative min-label propagation —
connected components) with the other classic fixed-point graph kernel.
The reference has no graph surface; this extends the engine for
pipeline uses like domain-authority weighting of a crawled corpus.

Scale design (per iteration):

* transition probabilities are precomputed ONCE (edge weight / source
  out-weight) and the edge table persisted — iterations reuse the same
  shuffle-partitioned edges;
* one shuffle joins ranks to edges on ``src``, one keyed shuffle
  re-aggregates mass per ``dst``; the rank vector (|V| rows) is always
  the small side and never collects to the driver;
* dangling mass (sinks) is a 1-row aggregate broadcast back — the
  textbook uniform redistribution;
* the rank frame is persisted each iteration because two consumers
  (the dangling aggregate and the contribution join) would otherwise
  recompute the whole lineage twice per iteration — exponential in the
  iteration count.  For deep iteration counts pass
  ``checkpoint_every`` to also truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Weighted PageRank after ``iters`` synchronous iterations.

    Returns (node, rank) with ranks summing to 1 over all nodes that
    appear in ``edges`` (either endpoint).  Deterministic: the result
    is a pure function of the edge multiset — no sampling, no
    convergence heuristics — so a SQL oracle can replay the exact
    iteration count.
    """
    w = (F.col(weight) if weight else F.lit(1.0)).cast("double")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    trans = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("wout")).alias("p"))
        .persist()
    )
    nodes = (
        e.select("src")
        .unionByName(e.select(F.col("dst").alias("src")))
        .distinct()
        .withColumnRenamed("src", "node")
        .persist()
    )
    sinks = nodes.join(
        trans.select("src").distinct().withColumnRenamed("src", "node"),
        "node",
        "left_anti",
    ).persist()
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    d = float(damping)
    for i in range(int(iters)):
        ranks = ranks.persist()
        dmass = sinks.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        contribs = (
            ranks.withColumnRenamed("node", "src")
            .join(trans, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dmass))
            .select(
                "node",
                (
                    F.lit((1.0 - d)) / F.col("n")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("mass"), F.lit(0.0))
                        + F.col("dmass") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
