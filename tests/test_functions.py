"""Unit goldens for the scalar/temporal/semantics function layer —
kerf-style inline asserts (the reference's test strategy, test.cc)."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kerf_spark.functions import scalars as S
from kerf_spark.functions import semantics as K
from kerf_spark.functions import temporal as TM


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()[0]


# ------------------------------------------------------------- temporal
def test_span_literals():
    assert TM.span_ns(1, "s") == 1_000_000_000
    assert TM.span_ns(5, "m") == 300 * 10**9
    assert TM.span_ns(2, "d") == 2 * 86400 * 10**9


def test_ns_round_trip(spark):
    # 2024-01-01T00:09:58.778549829 — sub-µs digits survive in ns domain
    ns = 1704067798778549829
    row = spark.range(1).select(
        TM.year(F.lit(ns)).alias("y"),
        TM.minute(F.lit(ns)).alias("mi"),
        TM.second(F.lit(ns)).alias("ss"),
        TM.millisecond(F.lit(ns)).alias("ms"),
        TM.microsecond(F.lit(ns)).alias("us"),
        TM.nanosecond(F.lit(ns)).alias("nsp"),
        TM.ns_to_us(F.lit(ns)).alias("us_epoch"),
    ).head()
    assert (row.y, row.mi, row.ss) == (2024, 9, 58)
    assert row.ms == 778
    assert row.us == 778549
    assert row.nsp == 778549829
    assert row.us_epoch == 1704067798778549


def test_xbar_floor(spark):
    ns = 1704067798778549829
    bar = one(spark, TM.xbar(F.lit(ns), TM.span_ns(5, "m")))
    assert bar % TM.span_ns(5, "m") == 0
    assert bar <= ns < bar + TM.span_ns(5, "m")


def test_xbar_pre_epoch_floors_down(spark):
    # Spark % takes the dividend's sign: xbar(-100, 60) must be -120
    # (floor-to-multiple), never -60 (round toward zero)
    assert one(spark, TM.xbar(F.lit(-100), 60)) == -120
    assert one(spark, TM.xbar(F.lit(-120), 60)) == -120
    # pre-epoch part extractors stay in-range
    ns = -1_500_000_000  # 1969-12-31T23:59:58.5
    assert one(spark, TM.millisecond(F.lit(ns))) == 500
    assert 0 <= one(spark, TM.nanosecond(F.lit(ns))) < 10**9


def test_divfloor_exact_at_ns_magnitude(spark):
    # double division would round 1704317316813992501/1000 upward
    ns = 1704317316813992501
    assert one(spark, TM.ns_to_us(F.lit(ns))) == 1704317316813992


def test_add_months_preserves_subus(spark):
    ns = 1704067798778549829
    shifted = one(spark, TM.add_months_ns(F.lit(ns), 1))
    assert shifted % 1000 == ns % 1000  # sub-µs digits carried
    assert one(spark, TM.month(F.lit(shifted))) == 2


# ------------------------------------------------------------- semantics
def test_nan_is_null(spark):
    df = spark.createDataFrame([(1.0,), (float("nan"),), (None,)], "x double")
    got = [r[0] for r in df.select(K.nan_to_null("x")).collect()]
    assert got[0] == 1.0 and got[1] is None and got[2] is None


def test_match_null_safe(spark):
    df = spark.createDataFrame([(None, None), (1.0, 1.0), (1.0, None)], "a double, b double")
    got = [r[0] for r in df.select(K.match("a", "b")).collect()]
    assert got == [True, True, False]


def test_kerf_eq_nan_equals_nan(spark):
    # test.cc:102-108 "NANs are equal in Kerf"
    df = spark.createDataFrame([(float("nan"), float("nan"))], "a double, b double")
    assert df.select(K.kerf_eq("a", "b")).head()[0] is True


def test_truthiness(spark):
    # slop.h:919-933: only numeric 0 is falsy — the STRING "0" is truthy
    df = spark.createDataFrame(
        [(0, "x"), (1, ""), (2, "0"), (3, "hi"), (4, None)], "id long, s string"
    )
    got = {r.id: r.t for r in df.select("id", K.truthy_in(df, "s").alias("t")).collect()}
    assert got == {0: True, 1: False, 2: True, 3: True, 4: False}


def test_truthiness_numeric_and_bool(spark):
    df = spark.createDataFrame(
        [(0, 0.0, False), (1, float("nan"), True), (2, 2.5, None)],
        "i long, x double, b boolean",
    )
    rows = df.select(
        K.truthy_in(df, "i").alias("ti"),
        K.truthy_in(df, "x").alias("tx"),
        K.truthy_in(df, "b").alias("tb"),
    ).collect()
    assert [r.ti for r in rows] == [False, True, True]
    assert [r.tx for r in rows] == [False, False, True]  # NaN falsy
    assert [r.tb for r in rows] == [False, True, False]


def test_normalize_floats_sorts_nan_first(spark):
    df = spark.createDataFrame([(3.0,), (float("nan"),), (1.0,)], "x double")
    got = [r[0] for r in K.normalize_floats(df).orderBy(F.asc_nulls_first("x")).collect()]
    assert got[0] is None and got[1:] == [1.0, 3.0]


def test_int_sentinels_decode_and_clamp(spark):
    # kerf.h:211-229: IN=INT64_MIN is int-null, II=INT64_MAX is int-inf
    df = spark.createDataFrame(
        [(0, K.INT_NULL), (1, K.INT_INF), (2, 7), (3, -5)], "id long, v long"
    )
    got = {r.id: r.v for r in K.normalize_int_sentinels(df).collect()}
    assert got[0] is None                 # IN -> NULL
    assert got[1] == K.INT_CLAMP_MAX      # II clamps (kerf.h:37-38)
    assert got[2] == 7 and got[3] == -5   # ordinary values untouched
    got2 = {
        r.id: r.v
        for r in K.normalize_int_sentinels(df, clamp_inf=False).collect()
    }
    assert got2[1] is None                # II -> NULL when not clamping


def test_int_sentinels_flag_column(spark):
    df = spark.createDataFrame([(0, K.INT_INF), (1, 7)], "id long, v long")
    rows = {
        r.id: (r.v, r.v__was_inf)
        for r in K.normalize_int_sentinels(df, cols=["v"], flag=True).collect()
    }
    assert rows[0] == (K.INT_CLAMP_MAX, True)
    assert rows[1] == (7, False)


def test_int_null_matches_float_null(spark):
    # test.cc:81-109: int-null == float-null after edge normalization
    df = spark.createDataFrame(
        [(K.INT_NULL, float("nan"))], "i long, x double"
    )
    out = K.normalize_floats(K.normalize_int_sentinels(df))
    assert out.select(K.match("i", "x").cast("boolean")).head()[0] is True


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=20))
@settings(max_examples=20, deadline=None)
def test_int_sentinel_roundtrip_preserves_ordinary_values(xs):
    # pure-python mirror of the column expression: ordinary values are
    # untouched, sentinels never survive the decode
    def decode(v):
        if v == K.INT_NULL:
            return None
        if v == K.INT_INF:
            return K.INT_CLAMP_MAX
        return v

    for v in xs:
        d = decode(v)
        assert d is None or (K.INT_NULL < d <= K.INT_CLAMP_MAX)
        if v not in (K.INT_NULL, K.INT_INF):
            assert d == v


# ------------------------------------------------------------- scalars
def test_divide_by_zero_is_null(spark):
    df = spark.createDataFrame([(1.0, 0.0), (6.0, 2.0)], "a double, b double")
    got = [r[0] for r in df.select(S.divide("a", "b")).collect()]
    assert got == [None, 3.0]


def test_mod_sign_follows_divisor(spark):
    df = spark.createDataFrame([(-7, 3)], "a int, b int")
    assert df.select(S.mod("a", "b")).head()[0] == 2  # floored mod


def test_take_cyclic(spark):
    df = spark.range(1).select(F.array(F.lit(1), F.lit(2), F.lit(3)).alias("a"))
    assert df.select(S.take_cyclic(5, "a")).head()[0] == [1, 2, 3, 1, 2]


def test_array_verbs(spark):
    df = spark.range(1).select(F.array(F.lit(10), F.lit(20), F.lit(30)).alias("a"))
    row = df.select(
        S.first_("a").alias("f"),
        S.last_("a").alias("l"),
        S.reverse_("a").alias("r"),
        S.count_("a").alias("n"),
        S.find_("a", F.lit(20)).alias("pos"),
    ).head()
    assert (row.f, row.l, row.n, row.pos) == (10, 30, 3, 2)
    assert row.r == [30, 20, 10]


def test_map_amend_lookup(spark):
    df = spark.range(1).select(
        F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)).alias("m")
    )
    amended = df.select(S.map_amend("m", "b", F.lit(9)).alias("m"))
    assert amended.select(S.map_lookup("m", "b")).head()[0] == 9
    assert amended.select(S.map_lookup("m", "zz")).head()[0] is None


def test_sqrt_negative_null(spark):
    df = spark.createDataFrame([(-4.0,), (4.0,)], "x double")
    got = [r[0] for r in df.select(S.sqrt("x")).collect()]
    assert got == [None, 2.0]


def test_wavg_wsum(spark):
    # wavg(w, x) = sum(w*x)/sum(w); null x rows drop out of both sums
    df = spark.createDataFrame(
        [(1.0, 10.0), (3.0, 20.0), (2.0, None)], "w double, x double"
    )
    row = df.agg(S.wavg("w", "x").alias("a"), S.wsum("w", "x").alias("s")).head()
    assert row["a"] == pytest.approx((1 * 10 + 3 * 20) / 4.0)
    assert row["s"] == pytest.approx(70.0)


# ------------------------------------------------------------- error taxonomy
def test_error_taxonomy_kinds():
    """jump.h:144-198: failures name the semantic contract that broke."""
    import pytest as _pytest

    from kerf_spark import errors as E
    from kerf_spark.plans.kerfsql import translate

    with _pytest.raises(E.ParseIncompleteError, match="Incomplete parse group error"):
        translate("select a, b")  # no from clause
    with _pytest.raises(E.LexError, match="Unknown token error"):
        translate("explode the database")
    with _pytest.raises(E.ArgsError, match="Argument error"):
        translate("select d: deltas(x) from t")  # ordered verb, no order by
    with _pytest.raises(E.TimeError, match="Time error"):
        TM.span_ns(5, "fortnights")
    # taxonomy refines builtins: existing except-clauses keep working
    assert issubclass(E.ParseError, ValueError)
    assert issubclass(E.KerfTypeError, TypeError)
    assert issubclass(E.FileError, OSError)


def test_error_taxonomy_catalog_and_asof(spark, tmp_path):
    import pytest as _pytest

    from kerf_spark import errors as E
    from kerf_spark.operators.asof import asof_join
    from kerf_spark.sources.catalog import Workspace

    ws = Workspace(spark, str(tmp_path))
    ws.save("t", spark.createDataFrame([(1,)], "a long"))
    with _pytest.raises(E.ColumnError, match="Column error"):
        ws.append("t", spark.createDataFrame([(1, 2)], "a long, b long"))
    df = spark.createDataFrame([(1, 10)], "k long, ts long")
    with _pytest.raises(E.ArgsError):
        asof_join(df, df, on="ts", by="k", direction="sideways")


def test_zorder_key_matches_python_interleave(spark):
    from kerf_spark.functions.scalars import zorder_key
    import pyspark.sql.functions as F

    def morton(x, y, bits=16):
        out = 0
        for j in range(bits):
            out |= ((x >> j) & 1) << (2 * j)
            out |= ((y >> j) & 1) << (2 * j + 1)
        return out

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == morton(x, y), (x, y)
    # locality: one-step neighbors differ only in low key bits
    assert morton(2, 3) // 16 == morton(3, 3) // 16


def test_bigint_decimal38_overflow_raises_not_null(spark):
    """The BIGINT_UNIT boundary (enums.h:230, SURVEY §1.2): DecimalType
    (38,0) arithmetic past 38 digits must raise a typed
    SparkArithmeticException — never silently NULL (ANSI mode is pinned
    in ENGINE_CONFS; this pins the pin)."""
    import pytest
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    big = F.lit("9" * 38).cast("decimal(38,0)")
    # in-range arithmetic is exact at full width
    ok = spark.range(1).select(
        (big - F.lit(1).cast("decimal(38,0)")).cast("string").alias("v")
    ).collect()
    assert ok[0]["v"] == "9" * 37 + "8"
    # one digit past the boundary errors, loudly and typed
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        spark.range(1).select(
            (big * F.lit(10).cast("decimal(38,0)")).alias("x")
        ).collect()


def test_zorder_key_n_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from kerf_spark.functions.scalars import zorder_key, zorder_key_n

    def morton_n(vals, bits):
        k, out = len(vals), 0
        for j in range(bits):
            for i, v in enumerate(vals):
                out |= ((v >> j) & 1) << (j * k + i)
        return out

    rows = [(1, 2, 3), (0, 0, 0), (1023, 7, 511), (255, 255, 255)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {
        (r["x"], r["y"], r["z"]): r["m"]
        for r in df.select(
            "x", "y", "z",
            zorder_key_n(["x", "y", "z"], bits=10).alias("m"),
        ).collect()
    }
    for v in rows:
        assert got[v] == morton_n(list(v), 10), v
    # k=2 degenerates to the classic 2-column key
    two = df.select(
        (zorder_key_n(["x", "y"], bits=12)
         == zorder_key("x", "y", bits=12)).alias("eq")
    ).collect()
    assert all(r["eq"] for r in two)
    import pytest

    with pytest.raises(ValueError, match="62"):
        zorder_key_n(["x", "y", "z", "x"], bits=16)  # 64 > 62


def test_workspace_zorder_three_columns_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from kerf_spark.sources.catalog import Workspace

    ws = Workspace(spark, str(tmp_path))
    df = spark.range(512).select(
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8).cast("long") % 8).alias("b"),
        (F.col("id") / 64).cast("long").alias("c"),
        F.col("id").alias("v"),
    )
    ws.save("g3", df, zorder_by=("a", "b", "c"), zorder_partitions=8)
    back = ws.load("g3")
    assert back.count() == 512
    assert sorted(r.v for r in back.collect()) == list(range(512))
    assert ws.manifest["tables"]["g3"]["zorder_by"] == ["a", "b", "c"]
