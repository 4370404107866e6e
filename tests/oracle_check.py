"""Driver-style oracle comparison: run every queries() entry on Spark
and its oracle_sql() on DuckDB, compare row count, column names,
pandas dtypes, and order-insensitive values BITWISE.

STRICT BY DESIGN (r5 verdict item 2): the previous 12-significant-digit
canon with ``-0.0 -> "0"`` folding said "ok" for queries the driver's
pandas hasher rejects.  This sweep must fail whenever the driver would:

* float cells compare by their IEEE-754 bit pattern (``-0.0`` differs
  from ``+0.0``; any last-ulp engine divergence fails here exactly as
  it fails at the driver);
* every cell is kind-tagged (``i:`` / ``f:`` / ...), so an
  integer-vs-float representation drift is a value mismatch;
* each oracle additionally runs as ``LIMIT 0`` through duckdb's
  ``.df()`` and its pandas dtypes are checked against the Spark schema
  (the DuckDB-HUGEINT artifact: an un-cast ``sum(BIGINT)`` lands as
  float64 and hash-mismatches Spark's int64 even when bitwise
  value-identical — r3 session_windows, r5 bpe_pair_counts and
  merge_event_intervals).

Usage: python tests/oracle_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import datetime as dt
import math
import struct
import sys

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    """Canonicalize one value, kind-tagged and float-bitwise."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return "f:" + struct.pack(">d", v).hex()
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)


def rows_canon(cols, rows):
    """Sort columns by name, canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def dtype_drift(con, sql: str, schema) -> list[str]:
    """Oracle-vs-Spark numeric-kind drift via a LIMIT-0 ``.df()``."""
    from pyspark.sql import types as T

    kind = {}
    for f in schema.fields:
        if isinstance(
            f.dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            kind[f.name] = "i"
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            kind[f.name] = "f"
    odf = con.execute(f"SELECT * FROM ({sql}) __t LIMIT 0").df()
    bad = []
    for col, d in odf.dtypes.items():
        want = kind.get(col)
        if want == "i" and d.kind == "f":
            bad.append(f"{col}: spark integral vs oracle {d}")
        elif want == "f" and d.kind in "iu":
            bad.append(f"{col}: spark fractional vs oracle {d}")
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import duckdb

    import __spark_entry__ as E
    from kerf_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if sf_dir.rstrip("/") != "/root/testdata/sf0.01":
        # learned-literal oracles (IVF/PQ/PCA/SemDeDup/BPE fits) are
        # built against the driver's gate scale at import; re-derive
        # them for this fixture so every scale is fully checkable
        from kerf_spark.queries import refit_oracles

        refit_oracles(sf_dir)

    qs, oracles = E.queries(), E.oracle_sql()
    if len(filters) == 1 and filters[0].startswith("first:"):
        # driver-window preflight: exactly the first N registry rows,
        # the prefix the external driver will evaluate
        names = list(qs)[: int(filters[0].split(":", 1)[1])]
    else:
        names = [
            n for n in qs if not filters or any(f in n for f in filters)
        ]
    passed = failed = weak = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:200]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(srows)} rows)")
            weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {str(ex)[:200]}")
            failed += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            failed += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            failed += 1
            continue
        drift = dtype_drift(con, oracles[name], sdf.schema)
        if drift:
            print(f"FAIL {name}: oracle dtype drift: {drift}")
            failed += 1
            continue
        a = rows_canon(scols, srows)
        b = rows_canon(ocols, orows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            failed += 1
            continue
        print(f"ok   {name} ({len(srows)} rows)")
        passed += 1
    print(f"\n{passed} ok, {weak} rows-only, {failed} FAILED of {len(names)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
