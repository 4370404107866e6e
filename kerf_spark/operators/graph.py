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
* the rank frame is persisted each iteration ONLY when dangling
  handling is on — there the two consumers (the sink aggregate and the
  contribution join) would otherwise recompute the whole lineage twice
  per iteration, exponential in the iteration count.  With
  ``handle_dangling=False`` ranks has a single consumer and the
  iterations chain as one lazy plan (no materialization barriers).
  For deep iteration counts pass ``checkpoint_every`` to truncate
  lineage.
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
    handle_dangling: bool = True,
    symmetric: bool = False,
) -> DataFrame:
    """Weighted PageRank after ``iters`` synchronous iterations.

    Returns (node, rank) with ranks summing to 1 over all nodes that
    appear in ``edges`` (either endpoint).  Deterministic: the result
    is a pure function of the edge multiset — no sampling, no
    convergence heuristics — so a SQL oracle can replay the exact
    iteration count.

    ``handle_dangling=False`` skips the per-iteration sink aggregate
    (a join + 1-row agg + broadcast, three extra stages each round).
    Pass it when the graph provably has no sinks — e.g. any
    symmetrized/bidirectional edge list — where the dangling mass is
    identically zero.

    ``symmetric=True`` additionally ASSUMES (caller-guaranteed, not
    checked — a check would cost the very join it removes) that every
    node has in-edges, true for any bidirectional edge list: the
    per-iteration left join against the node universe is then
    redundant — the mass aggregation itself already produces one row
    per node — removing one shuffle join per iteration.  Violating the
    assumption silently drops in-edge-less nodes from the result and
    their mass from the total.
    """
    w = (F.col(weight) if weight else F.lit(1.0)).cast("double")
    # hash-partition the edge list on src ONCE: the out-weight groupBy,
    # the normalization join, and every iteration's rank->edge join all
    # key on src, so they inherit this partitioning instead of
    # re-exchanging the (large) edge side each round — only the small
    # rank vector moves per iteration
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).repartition("src")
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
    cached = [trans, nodes]
    sinks = None
    if handle_dangling:
        sinks = nodes.join(
            trans.select("src").distinct().withColumnRenamed(
                "src", "node"
            ),
            "node",
            "left_anti",
        ).persist()
        cached.append(sinks)
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    d = float(damping)
    for i in range(int(iters)):
        if handle_dangling:
            # two consumers (sink aggregate + contribution join) —
            # without the persist each iteration would recompute the
            # whole rank lineage twice, exponential in iters
            ranks = ranks.persist()
            cached.append(ranks)
        contribs = (
            ranks.withColumnRenamed("node", "src")
            .join(trans, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
            .withColumnRenamed("dst", "node")
        )
        if symmetric:
            nxt = contribs.crossJoin(F.broadcast(n_df))
        else:
            nxt = nodes.join(contribs, "node", "left").crossJoin(
                F.broadcast(n_df)
            )
        if handle_dangling:
            dmass = sinks.join(ranks, "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
            )
            nxt = nxt.crossJoin(F.broadcast(dmass))
            spread = (
                F.coalesce(F.col("mass"), F.lit(0.0))
                + F.col("dmass") / F.col("n")
            )
        else:
            spread = F.coalesce(F.col("mass"), F.lit(0.0))
        ranks = nxt.select(
            "node",
            (F.lit(1.0 - d) / F.col("n") + F.lit(d) * spread).alias(
                "rank"
            ),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    # materialize the result (|V| rows, lineage truncated), then free
    # every intermediate cache — CacheManager entries live until
    # explicit unpersist, and the intermediates are function-local so
    # no caller could ever release them (same discipline as
    # dedup.dup_clusters)
    out = ranks.localCheckpoint(eager=True)
    for frame in cached:
        frame.unpersist()
    return out
