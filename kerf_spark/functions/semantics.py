"""Kerf null / NaN / infinity / truthiness semantics adapter.

The reference encodes nulls and infinities as in-band sentinels
(kerf.h:211-229: INT64_MIN is int-null ``IN``, INT64_MAX is int-inf
``II``; floats use NaN as null) and gives them specific semantics:

* NaN == NaN is TRUE and NaN sorts smallest
  (kerf.h:39 FLOAT_NANS_COMPARE_AS_SMALLEST, grade.cc:15-26,
  test.cc:102-108 "NANs are equal in Kerf").
* int-null matches float-null cross-type (test.cc:81-109).
* truthiness: 0, '\\0', nil are falsy; null-ish adds IN/NaN
  (slop.h:919-944).

Spark/ANSI semantics differ on every point (NULL != NULL, NaN sorts
greatest, NaN != NULL).  The engine's rule: **normalize at the edge,
never leak sentinels inward**.  ``nan_to_null`` at ingest makes Spark
NULL the one null representation, after which kerf-equality is
``eqNullSafe`` and kerf-ordering is Spark's NULLS FIRST default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def nan_to_null(col: Column | str) -> Column:
    """Normalize float NaN to NULL (kerf: NaN *is* the float null)."""
    c = _c(col)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def normalize_floats(df: DataFrame) -> DataFrame:
    """Apply ``nan_to_null`` to every float/double column of a frame.

    The ingest-time edge of the adapter: after this, NaN-equality and
    NaN-smallest ordering hold automatically under Spark NULL rules
    (with NULLS FIRST, Spark's ascending default).
    """
    exprs = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            exprs.append(nan_to_null(f.name).alias(f.name))
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs)


#: kerf.h:211-229 — in-band int sentinels of kerf-style producers.
INT_NULL = -(2**63)          # IN: INT64_MIN is the int null
INT_INF = 2**63 - 1          # II: INT64_MAX is the int infinity
INT_CLAMP_MAX = INT_INF - 1  # clamp-on-append ceiling (kerf.h:37-38)


def int_sentinels_to_null(
    col: Column | str, clamp_inf: bool = True
) -> Column:
    """Decode kerf int sentinels on one column: IN (INT64_MIN) → NULL;
    II (INT64_MAX) → clamp to INT64_MAX-1 (kerf's clamp-on-append,
    kerf.h:37-38) or NULL when ``clamp_inf=False``."""
    c = _c(col)
    inf_val = F.lit(INT_CLAMP_MAX) if clamp_inf else F.lit(None)
    return (
        F.when(c == F.lit(INT_NULL), F.lit(None))
        .when(c == F.lit(INT_INF), inf_val)
        .otherwise(c)
    )


def normalize_int_sentinels(
    df: DataFrame,
    cols: list[str] | None = None,
    clamp_inf: bool = True,
    flag: bool = False,
) -> DataFrame:
    """Ingest-edge adapter for data arriving from kerf-style producers
    (SURVEY §1.2: "NULL + optional flag column, or clamp").

    The int twin of :func:`normalize_floats`: IN=INT64_MIN decodes to
    Spark NULL (so int-null == float-null cross-type, test.cc:81-109),
    II=INT64_MAX clamps (default, mirroring kerf's clamp-on-append) or
    nulls out.  With ``flag=True`` every affected column ``c`` gains a
    ``c__was_inf`` boolean so the ∞ marker survives the decode losslessly.
    Zero-shuffle projection; apply optionally at ingest — fixture data
    never contains sentinels, so this is NOT in the default read path.
    """
    targets = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.LongType)
        and (cols is None or f.name in cols)
    ]
    exprs = []
    for f in df.schema.fields:
        if f.name in targets:
            exprs.append(
                int_sentinels_to_null(f.name, clamp_inf).alias(f.name)
            )
        else:
            exprs.append(F.col(f.name))
    if flag:
        for name in targets:
            exprs.append(
                (F.col(name) == F.lit(INT_INF)).alias(f"{name}__was_inf")
            )
    return df.select(*exprs)


def match(a: Column | str, b: Column | str) -> Column:
    """Kerf ``match``: structural equality where null==null (and, after
    normalize_floats, NaN==NaN).  grade.cc:45-118 / slop.h:963-975."""
    return _c(a).eqNullSafe(_c(b))


def kerf_eq(a: Column | str, b: Column | str) -> Column:
    """Element equality under kerf rules: NaN==NaN, null==null.

    Unlike raw ``==`` (which yields NULL when either side is NULL) this
    always yields a boolean.
    """
    an, bn = nan_to_null(_c(a)), nan_to_null(_c(b))
    return an.eqNullSafe(bn)


def truthy(col: Column | str, dtype: T.DataType | str | None = None) -> Column:
    """Kerf truthiness (slop.h:919-933): numeric 0/NaN, char '\\0', the
    empty string, and NULL are falsy; everything else truthy — including
    the non-empty *string* "0" (only numeric zero is falsy).  Always
    returns a non-null bool.

    Truthiness is type-directed in the reference, so pass the column's
    ``dtype`` (a DataType or DDL string); without it numeric semantics
    are assumed.  Use :func:`truthy_in` to resolve the type from a frame.
    """
    c = _c(col)
    if isinstance(dtype, str):
        dtype = T._parse_datatype_string(dtype)
    if isinstance(dtype, T.BooleanType):
        return F.coalesce(c, F.lit(False))
    if isinstance(dtype, T.StringType):
        return F.coalesce(
            (F.length(c) > 0) & (c != F.lit("\0")), F.lit(False)
        )
    if isinstance(dtype, (T.ArrayType, T.MapType)):
        return F.coalesce(F.size(c) > 0, F.lit(False))
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return F.coalesce(
            F.when(F.isnan(c), F.lit(False)).otherwise(c != F.lit(0.0)),
            F.lit(False),
        )
    # integral / decimal / unknown: numeric zero test
    return F.coalesce(c != F.lit(0), F.lit(False))


def truthy_in(df: DataFrame, name: str) -> Column:
    """`truthy` with the dtype resolved from ``df``'s schema."""
    return truthy(name, df.schema[name].dataType)


def nullish(col: Column | str) -> Column:
    """Kerf nullish test (slop.h:935-944): NULL or NaN."""
    c = _c(col)
    try:
        return F.isnull(c) | F.isnan(c)
    except Exception:
        return F.isnull(c)


def coalesce0(col: Column | str) -> Column:
    """Null -> additive identity, the common agg-input normalization."""
    return F.coalesce(_c(col), F.lit(0))


def sort_key_kerf(col: Column | str) -> Column:
    """Ascending sort key matching kerf's total order: NaN/null smallest
    (grade.cc:15-26).  Use ``df.orderBy(sort_key_kerf(c).asc_nulls_first())``."""
    return nan_to_null(col)
