"""Scale-up fixture generator for bench slope measurement.

Builds an N× copy of a TESTDATA.md fixture directory by unioning N
key-shifted copies of each fact table (dims ``region``/``nation`` stay
fixed — their cardinality is constant in TPC-H no matter the SF).  The
point is a *falsifiable scaling slope*: run the headline suite at sf and
at N·sf and compare each query's time ratio against linear.

Shift discipline (keeps every join relationship intact within a copy):

* star keys (orderkey/custkey/suppkey/partkey, doc_id/vec_id,
  event_id/user_id) shift by ``i * OFFSET`` in copy i;
* ``events.ts`` is left unshifted — N× events per time window is the
  realistic densification (heavier windows, same span);
* ``documents.text`` gets a per-copy vocabulary suffix on every word, so
  shingle sets are disjoint ACROSS copies: near-dup structure inside a
  copy is preserved exactly, and the candidate-pair count scales
  linearly instead of quadratically (copies of one doc are artifacts of
  the generator, not data the engine should flag);
* embeddings are value-identical across copies (corpus grows N×, the
  probe set stays fixed — the ANN work scales linearly by design).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OFFSET = 100_000_000

_FIXED = ("region", "nation")

# key columns to shift per table (all bigint in the fixtures)
_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _copy(df: DataFrame, table: str, i: int) -> DataFrame:
    if i == 0:
        return df
    cols = []
    for c in df.columns:
        if c in _SHIFTS.get(table, ()):
            cols.append((F.col(c) + F.lit(i * OFFSET)).alias(c))
        elif table == "documents" and c == "text":
            # disjoint vocabulary per copy: every word suffixed _i
            cols.append(
                F.regexp_replace(F.col(c), r"(\S+)", r"$1_" + str(i)).alias(c)
            )
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def gen_scaled_fixture(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> str:
    """Materialize ``factor``× ``src_dir`` at ``dst_dir`` (idempotent:
    a _SCALED marker short-circuits repeat runs)."""
    marker = os.path.join(dst_dir, "_SCALED")
    if os.path.exists(marker):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    tables = [
        f[: -len(".parquet")]
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    ]
    for t in tables:
        src = spark.read.parquet(f"{src_dir}/{t}.parquet")
        if t in _FIXED:
            out = src
        else:
            out = _copy(src, t, 0)
            for i in range(1, factor):
                out = out.unionByName(_copy(src, t, i))
        out.write.mode("overwrite").parquet(f"{dst_dir}/{t}.parquet")
    with open(marker, "w") as f:
        f.write(f"factor={factor} src={src_dir}\n")
    return dst_dir
