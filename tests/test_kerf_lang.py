"""Unit tests for the kerf language front-end (plans/kerf_lang.py).

Local-plane semantics run without Spark; table-plane tracing is checked
at the SQL-text level (the oracle queries kerf_lang_* cover the full
Spark round-trip).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from kerf_spark.errors import (
    ArgsError,
    ArityError,
    KerfIndexError,
    KerfTypeError,
    ParseError,
    RankError,
    ReferenceError_,
)
from kerf_spark.plans import kerf_lang as KL


class _FakeSpark:
    pass


def run(src, env=None):
    interp = KL.Interp(_FakeSpark())
    root = KL.Env()
    for k, v in (env or {}).items():
        root.set_local(k, v)
    ret = None
    for st in KL.split_statements(src):
        ret = interp.exec_stmt(st, root)
    return ret


# ---------------------------------------------------------- expressions

def test_arithmetic_precedence():
    assert run("1 + 2 * 3") == 7
    assert run("(1 + 2) * 3") == 9
    assert run("10 / 4") == 2.5  # kerf divide is true division
    assert run("7 % 3") == 1


def test_comparison_and_logic():
    assert run("3 < 4") is np.True_ or run("3 < 4") is True
    assert bool(run("1 < 2 & 3 < 2")) is False
    assert bool(run("1 < 2 | 3 < 2")) is True
    assert bool(run("2 = 2")) is True
    assert bool(run("2 != 2")) is False


def test_strand_vector_literals():
    np.testing.assert_array_equal(run("2 3 4 * 10"), [20, 30, 40])
    # dash-grab (parser.h:280-340): minus after a number is subtraction
    assert run("1 -2") == -1
    np.testing.assert_array_equal(run("[5, 1, 4]"), [5, 1, 4])


def test_temporal_literals_are_ns_stamps():
    day = 86_400 * 10**9
    assert run("2024-01-15") == 1_705_276_800 * 10**9
    assert run("2024.01.15 + 1d") == 1_705_276_800 * 10**9 + day
    assert run("2024-01-07T12:30:00 - 2024-01-07") == 45_000 * 10**9
    assert run("10:00:00 + 30m") == 37_800 * 10**9
    assert run("1.5h") == 5_400 * 10**9
    assert bool(run("2h > 90m")) is True
    assert run("500ms + 500us + 500ns") == 500_500_500


def test_reserved_literals():
    assert run("null") is None
    assert run("true") is True
    assert math.isinf(run("inf"))
    assert math.isnan(run("nan"))


def test_json_map_literal():
    m = run('{alpha: 1, "beta": 2 + 3}')
    assert m == {"alpha": 1, "beta": 5}
    assert run('m: {a: 1}; m["a"]') == 1


def test_string_escapes():
    assert run(r'"a\tb"') == "a\tb"
    assert run('upper("abc")') == "ABC"


def test_backtick_symbols():
    assert run("`ibm") == "ibm"
    assert run('`"two words"') == "two words"
    assert bool(run('`aapl = "aapl"')) is True


# ---------------------------------------------------------- lambdas

def test_lambda_call_both_forms():
    assert run("f: {[x,y] x + y}; f(3, 4)") == 7
    assert run("f: {[x,y] x + y}; f[3, 4]") == 7


def test_lambda_arity_checked():
    with pytest.raises(ArityError):
        run("f: {[x,y] x + y}; f(3)")


def test_lambda_return_short_circuits():
    assert run("g: {[x] return x + 1; 99}; g(5)") == 6


def test_lambda_self_recursion():
    # lexer.h:572-573: `self` refers to the enclosing lambda
    assert run("f: {[n] if (n < 2) { return 1 }; return n * self(n - 1)}; f(6)") == 720
    assert run("fib: {[n] if (n < 2) { return n }; return self(n-1) + self(n-2)}; fib(10)") == 55


def test_lambda_self_depth_guard():
    # unbounded recursion dies at the interpreter's ERROR_DEPTH guard
    # (jump.h:147) as a typed DepthError, never a raw RecursionError
    from kerf_spark.errors import DepthError

    with pytest.raises(DepthError):
        run("f: {[n] self(n + 1)}; f(0)")


def test_def_function_self_and_named_recursion_agree():
    assert run(
        "def f(n) { if (n < 2) { return 1 }; return n * f(n - 1) }; f(5)"
    ) == run("g: {[n] if (n < 2) { return 1 }; return n * self(n - 1)}; g(5)")


def test_lambda_closure_reads_globals():
    assert run("k: 10; f: {[x] x * k}; f(3)") == 30


def test_lambda_local_scope_isolated():
    assert run("a: 1; f: {[x] a: x; a}; f(5)") == 5
    # kerf assignment rebinds the enclosing name when it exists
    assert run("a: 1; f: {[x] a: x; a}; f(5); a") == 5


def test_sql_plane_trace():
    out = run(
        "sq: {[x] x * x}; sq",
    )
    interp = KL.Interp(_FakeSpark())
    traced = out(interp, [KL.SqlExpr("(c)")])
    assert traced.text == "((c) * (c))"


def test_sql_plane_builtin_and_ifelse():
    f = run("f: {[a] ifelse(a > 0, ln(a), 0 - 1)}; f")
    interp = KL.Interp(_FakeSpark())
    t = f(interp, [KL.SqlExpr("x")]).text
    assert "CASE WHEN (x > 0) THEN ln(x) ELSE" in t


# ---------------------------------------------------------- adverbs

def test_mapdown_fold_unfold_mapback():
    np.testing.assert_array_equal(
        run("sq: {[x] x*x}; sq mapdown til(4)"), [0, 1, 4, 9]
    )
    assert run("+ fold 1 2 3 4") == 10
    np.testing.assert_array_equal(run("+ unfold 1 2 3 4"), [1, 3, 6, 10])
    np.testing.assert_array_equal(run("- mapback 1 3 6 10"), [1, 2, 3, 4])


def test_mapleft_mapright_call_forms():
    np.testing.assert_array_equal(
        run("mapleft({[a,b] a*b}, 1 2 3, 10)"), [10, 20, 30]
    )
    np.testing.assert_array_equal(
        run("mapright({[a,b] a-b}, 10, 1 2 3)"), [9, 8, 7]
    )


def test_verb_reference_in_adverb_phrase():
    assert run("* fold 1 2 3 4") == 24


# ---------------------------------------------------------- builtins

def test_vector_builtins():
    np.testing.assert_array_equal(run("reverse(1 2 3)"), [3, 2, 1])
    np.testing.assert_array_equal(run("asc([3, 1, 2])"), [1, 2, 3])
    np.testing.assert_array_equal(run("take(5, 1 2 3)"), [1, 2, 3, 1, 2])
    np.testing.assert_array_equal(run("drop(1, 1 2 3)"), [2, 3])
    np.testing.assert_array_equal(run("where(0 1 0 1)"), [1, 3])
    np.testing.assert_array_equal(run("deltas(1 3 6 10)"), [1, 2, 3, 4])
    assert run("sum(til(10))") == 45
    assert run("count([4, 5, 6])") == 3


def test_tick_verb_builtins():
    np.testing.assert_array_equal(
        run("xbar(7 12 25, 10)"), [0, 10, 20]
    )
    assert run("xbar(0 - 100, 60)") == -120  # floored, not toward zero
    assert run("wavg(1 1 2, 10 20 30)") == 22.5
    assert run("wsum(2 3, 10 10)") == 50.0
    interp = KL.Interp(_FakeSpark())
    env = KL.Env()
    f = KL.KerfLambda(["t"], ["xbar(t, 3600)"], env, "b")
    assert "pmod" in f(interp, [KL.SqlExpr("ts")]).text


def test_length_mismatch_raises():
    with pytest.raises(RankError):
        run("1 2 3 + 1 2")


def test_undefined_name_raises():
    with pytest.raises(ReferenceError_):
        run("nosuchname + 1")


def test_not_callable_raises():
    with pytest.raises(KerfTypeError):
        run("x: 5; x(3)")


# ---------------------------------------------------------- control flow

def test_if_else_chain():
    src = "x: 5; if (x > 10) { y: 1 } else if (x > 3) { y: 2 } else { y: 3 }; y"
    assert run(src) == 2


def test_while_and_compound_assign():
    assert run("n: 0; while (n < 5) { n +: 2 }; n") == 6


def test_for_loop():
    assert run("t: 0; for(i:0; i<4; i+:1) { t +: i }; t") == 6


def test_do_while():
    assert run("n: 9; do { n +: 1 } while (n < 5); n") == 10


def test_def_function_statement():
    assert run("def f(x, y) { return x * y }; f(6, 7)") == 42
    assert run("function g(x) { x + 1 }; g(1)") == 2


def test_indexed_amend():
    np.testing.assert_array_equal(
        run("v: 1 2 3; v[1]: 99; v"), [1, 99, 3]
    )


def test_truthiness_in_conditionals():
    assert run('if ("") { r: 1 } else { r: 2 }; r') == 2
    assert run("if (0.0) { r: 1 } else { r: 2 }; r") == 2
    assert run('if ("x") { r: 1 } else { r: 2 }; r') == 1


# ---------------------------------------------------------- statements

def test_split_statements_depth_aware():
    stmts = KL.split_statements("a: 1\nf: {[x]\n x + 1\n}\nf(a)")
    assert len(stmts) == 3


def test_comments_stripped():
    assert run("// nothing\n1 + 1 /* mid */ + 1") == 3


def test_parse_errors_are_typed():
    with pytest.raises(ParseError):
        run("if x > 1 { }")
    with pytest.raises(ParseError):
        run("1 + + ")


# ---------------------------------------------------------- sql helpers

def test_inline_vars_respects_strings_and_keywords():
    interp = KL.Interp(_FakeSpark())
    env = KL.Env()
    env.set_local("cut", 30)
    sql = interp._inline_vars(
        "select n: count(*) from t where a < cut and b like 'cut%'", env
    )
    assert "a < 30" in sql
    assert "'cut%'" in sql


def test_table_literal_builds_dataframe(spark):
    df = KL.run_df(
        spark,
        't: {{sym: ["a","b","c"], px: 1.5 2.5 3.5, lot: 100}}\n'
        "select n: count(*), s: round(sum(px), 2) from t where lot = 100",
    )
    row = df.collect()[0]
    assert (row.n, row.s) == (3, 7.5)


def test_table_literal_scalar_broadcast_and_ragged_error(spark):
    interp = KL.Interp(spark)
    out = interp.make_table({"a": __import__("numpy").arange(3), "b": 7})
    assert [r.b for r in out.collect()] == [7, 7, 7]
    with pytest.raises(RankError):
        interp.make_table(
            {"a": __import__("numpy").arange(3), "b": __import__("numpy").arange(2)}
        )


def test_property_arithmetic_matches_python():
    """Random integer arithmetic ASTs evaluate like Python (true
    division; C-like precedence)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    atoms = st.integers(min_value=-50, max_value=50)

    def render(depth):
        if depth == 0:
            return atoms.map(lambda v: (f"({v})" if v < 0 else str(v), v))
        sub = render(depth - 1)
        ops = st.sampled_from([("+", lambda a, b: a + b),
                               ("-", lambda a, b: a - b),
                               ("*", lambda a, b: a * b)])
        return st.tuples(sub, ops, sub).map(
            lambda t: (
                f"({t[0][0]}) {t[1][0]} ({t[2][0]})",
                t[1][1](t[0][1], t[2][1]),
            )
        ) | sub.map(lambda s: (f"({s[0]})", s[1]))

    @settings(max_examples=60, deadline=None)
    @given(render(3))
    def check(case):
        src, expected = case
        assert run(src) == expected

    check()


def test_inline_vector_var_becomes_in_list():
    interp = KL.Interp(_FakeSpark())
    env = KL.Env()
    env.set_local("modes", np.array(["AIR", "RAIL"], dtype=object))
    sql = interp._inline_vars(
        "select n: count(*) from t where l_shipmode in modes", env
    )
    assert "in ('AIR', 'RAIL')" in sql


def test_expand_lambdas_traces_to_sql():
    interp = KL.Interp(_FakeSpark())
    env = KL.Env()
    env.set_local(
        "disc", KL.KerfLambda(["p", "d"], ["p * (1 - d)"], env, "disc")
    )
    sql = interp._expand_lambdas(
        "select s: sum(disc(px, dc)) from t", env
    )
    assert sql == "select s: sum(((px) * (1 - (dc)))) from t"


def test_table_verbs_aj_wj(spark):
    from kerf_spark.errors import ArityError, KerfTypeError
    from kerf_spark.plans.kerf_lang import run_df, run

    import pytest

    trades = spark.createDataFrame(
        [("A", 100, 1), ("A", 205, 2), ("B", 150, 3)],
        "sym string, ts long, tid long",
    )
    quotes = spark.createDataFrame(
        [("A", 90, 1.0), ("A", 200, 3.0), ("B", 160, 9.0)],
        "sym string, ts long, bid double",
    )
    t = {"t": trades, "q": quotes}
    out = run_df(spark, 'aj(t, q, "sym", "ts")', tables=t)
    got = {r["tid"]: r["bid"] for r in out.collect()}
    assert got == {1: 1.0, 2: 3.0, 3: None}
    # wj: interval matches per key (script composes with assignment)
    out2 = run_df(
        spark, 'r: wj(t, q, 0 - 60, 0, "sym", "ts")\nr', tables=t
    )
    assert {(r["tid"], r["bid"]) for r in out2.collect()} == {
        (1, 1.0), (2, 3.0)
    }
    # error taxonomy
    with pytest.raises(ArityError):
        run(spark, 'aj(t, q)', tables=t)
    with pytest.raises(KerfTypeError):
        run(spark, 'aj(1, 2, "sym", "ts")', tables=t)


def test_script_select_speaks_fby(spark):
    """The kdb fby idiom flows through scripts too (select routes via
    plans.kerfsql): each group keeps exactly its above-group-mean rows."""
    from kerf_spark.plans.kerf_lang import run_df

    t = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(30)], "g long, v double"
    )
    rows = run_df(
        spark, "select g, v from t where v > avg(v) fby g", tables={"t": t}
    ).collect()
    # per group g: values g, g+3, ..., g+27 — mean g+13.5, 5 rows above
    assert len(rows) == 15
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.v)
    for g, vs in by_g.items():
        assert sorted(vs) == [float(g + 15), float(g + 18), float(g + 21),
                              float(g + 24), float(g + 27)]


def test_fby_token_inside_string_literal_is_not_an_operator(spark):
    """`fby` appearing inside a quoted literal must survive as data —
    the rewriter scans a quote-masked view of the predicate (ADVICE
    r5: kerfsql.py _expand_fby mangled `where note = 'x fby y'`)."""
    from kerf_spark.plans.kerf_lang import run_df

    t = spark.createDataFrame(
        [("x fby y", 1.0), ("plain", 2.0), ("x fby y", 3.0)],
        "note string, v double",
    )
    rows = run_df(
        spark, "select note, v from t where note = 'x fby y'", tables={"t": t}
    ).collect()
    assert sorted(r.v for r in rows) == [1.0, 3.0]
    # ...and a REAL fby in the same predicate still rewrites: the
    # literal is masked, the operator is not
    rows2 = run_df(
        spark,
        "select note, v from t where v > avg(v) fby note and note = 'x fby y'",
        tables={"t": t},
    ).collect()
    assert [(r.note, r.v) for r in rows2] == [("x fby y", 3.0)]


def test_rand_det_three_planes_agree(spark):
    """The deterministic rand twin gives the SAME draw for the same
    (seed, key) in the local plane, the SQL/column plane, and the
    functions.scalars Column API — the reproducible-stream contract
    of the reference's seeded RNG (rng.h:7-46), which layout-seeded
    F.rand cannot give."""
    from kerf_spark.functions.scalars import rand_det
    from kerf_spark.plans.kerf_lang import run, run_df
    from pyspark.sql import functions as F

    # local plane: vector draw over til
    local = run(spark, "rand_det(42, til(5))")
    # column plane through a select
    t = spark.createDataFrame([(i,) for i in range(5)], "k long")
    sql_plane = [
        r.u for r in run_df(
            spark, "select k, rand_det(42, k) as u from t", tables={"t": t}
        ).orderBy("k").collect()
    ]
    api = [
        r.u for r in t.select("k", rand_det(42, "k").alias("u"))
        .orderBy("k").collect()
    ]
    assert list(local) == sql_plane == api
    assert all(0.0 < u < 1.0 for u in api)


def test_rand_det_null_key_draws_null_in_every_plane(spark):
    """ADVICE r6: the SQL-plane expansions used concat_ws, which
    silently skips NULL arguments — a NULL key got a real draw from
    md5(seed#) while the Column plane (concat, null-propagating)
    returned NULL.  All front-ends must agree: NULL key -> NULL."""
    from kerf_spark.functions.scalars import rand_det
    from kerf_spark.plans.kerf_lang import run_df
    from kerf_spark.plans.kerfsql import kerf_sql

    t = spark.createDataFrame([(1,), (None,)], "k long")
    api = {r.k: r.u for r in t.select(
        "k", rand_det(42, "k").alias("u")).collect()}
    lang = {r.k: r.u for r in run_df(
        spark, "select k, rand_det(42, k) as u from t", tables={"t": t}
    ).collect()}
    t.createOrReplaceTempView("__rdnull_t")
    try:
        ksql = {r.k: r.u for r in kerf_sql(
            spark,
            "select k, rand_det(42, k) as u from __rdnull_t order by k",
        ).collect()}
    finally:
        spark.catalog.dropTempView("__rdnull_t")
    for plane, got in [("column", api), ("kerf_lang", lang),
                       ("kerfsql", ksql)]:
        assert got[None] is None, plane
        assert got[1] is not None and 0.0 < got[1] < 1.0, plane
    assert api[1] == lang[1] == ksql[1]


def test_fby_parens_inside_string_arguments(spark):
    """Review regression: parens and quotes inside the aggregate's own
    string arguments must not derail the balanced-paren extraction —
    the structural scans run on the quote-masked text."""
    from kerf_spark.plans.kerf_lang import run_df

    t = spark.createDataFrame(
        [(")", 1.0), ("x", 2.0), (")", 3.0), ("x", 4.0)],
        "note string, v double",
    )
    rows = run_df(
        spark,
        "select note, v from t where "
        "sum(case when note = ')' then 1 else 0 end) fby note > 0",
        tables={"t": t},
    ).collect()
    assert sorted((r.note, r.v) for r in rows) == [(")", 1.0), (")", 3.0)]


def test_try_protected_eval_yields_error_values(spark):
    """Errors as first-class VALUES (presented.h:386-389 A_ERROR,
    jump.h:144-198 kinds): try(...) captures any failure as an
    inspectable value — protected selection of a missing column gives
    a Column error value, a protected undefined name a Reference
    error value — while the UNPROTECTED forms still raise."""
    import pytest

    from kerf_spark.errors import KerfErrorValue, ReferenceError_
    from kerf_spark.plans.kerf_lang import run

    t = spark.createDataFrame([(1, 2.0)], "k long, v double")
    # protected SQL: missing column -> Column error value
    got = run(
        spark,
        'e: try(select nope / 2 as x from t); [is_error(e), e["kind"]]',
        tables={"t": t},
    )
    assert list(got) == [1, "Column error"]
    # protected expression: undefined name -> Reference error value
    got = run(spark, 'e: try(1 + no_such); [is_error(e), e["kind"]]')
    assert list(got) == [1, "Reference error"]
    # message field carries the detail
    ev = run(spark, "try(1 + no_such)")
    assert isinstance(ev, KerfErrorValue) and "no_such" in ev["message"]
    # a non-error passes through untouched and is_error says so
    assert list(run(spark, "e: try(2 + 3); [is_error(e), e]")) == [0, 5]
    # unprotected forms still raise (the taxonomy exception path)
    with pytest.raises(ReferenceError_):
        run(spark, "1 + no_such")
    with pytest.raises(Exception):
        run(spark, "select nope from t", tables={"t": t})


def test_try_is_shadowable_and_error_value_indexing_guards(spark):
    """`try` is only a special form when unbound — a user variable
    named try keeps working; unknown error-value fields raise the
    taxonomy's Index error."""
    import pytest

    from kerf_spark.errors import KerfIndexError
    from kerf_spark.plans.kerf_lang import run

    assert run(spark, "try: 7; try + 1") == 8
    with pytest.raises(KerfIndexError):
        run(spark, 'e: try(1 + no_such); e["nope"]')


def test_try_protects_sql_with_quoted_literals(spark):
    """Review regression (r7): the protected form must accept the most
    common SQL shape — a WHERE clause with a single-quoted string
    literal (the kerf lexer now carries '…' spans as sqlstr tokens
    instead of failing to lex), including parens/colons INSIDE the
    literal, which must not derail the try-span capture."""
    import pytest

    from kerf_spark.plans.kerf_lang import run

    t = spark.createDataFrame([(1, "x:y"), (2, "z")], "n long, note string")
    ok = run(
        spark,
        "r: try(select n from t where note = 'z'); r",
        tables={"t": t},
    )
    assert [r.n for r in ok.collect()] == [2]
    # paren + colon inside the literal; no match -> empty table, NOT
    # an error and NOT a span-capture failure
    v = run(
        spark,
        "e: try(select n from t where note = ':x)'); is_error(e)",
        tables={"t": t},
    )
    assert v == 0
    # a bare SQL string literal is still not a kerf expression
    with pytest.raises(Exception):
        run(spark, "x: 'abc'")


def test_sql_literals_with_backslash_escaped_quotes(spark):
    """Review regression (r7, 2nd pass): Spark's default string parser
    accepts backslash-escaped quotes ('don\\'t'); the kerf statement
    splitter / lexer / span matcher must scan them, protected or not."""
    from kerf_spark.plans.kerf_lang import run

    t = spark.createDataFrame(
        [(1, "don't"), (2, "plain")], "n long, note string"
    )
    got = run(
        spark,
        "r: try(select n from t where note = 'don\\'t'); r",
        tables={"t": t},
    )
    assert [r.n for r in got.collect()] == [1]
    got2 = run(
        spark,
        "select n from t where note = 'don\\'t'",
        tables={"t": t},
    )
    assert [r.n for r in got2.collect()] == [1]


# --------------------------------------- kerf1 vector-structure verbs (r8)

def test_cut_vector_indices_and_chunks():
    parts = run("cut(0 2 3, 10 20 30 40 50)")
    assert [list(p) for p in parts] == [[10, 20], [30], [40, 50]]
    chunks = run("cut(2, 10 20 30 40 50)")
    assert [list(p) for p in chunks] == [[10, 20], [30, 40], [50]]
    with pytest.raises(ArgsError):
        run("cut(0, 1 2 3)")
    with pytest.raises(ArgsError):
        run("cut(3 1, 1 2 3)")  # not ascending


def test_rotate_both_directions_and_empty():
    assert list(run("rotate(2, 1 2 3 4 5)")) == [3, 4, 5, 1, 2]
    assert list(run("rotate(-1, 1 2 3)")) == [3, 1, 2]
    assert list(run("rotate(7, 1 2 3)")) == [2, 3, 1]  # wraps mod len
    assert len(run("rotate(2, til(0))")) == 0


def test_bin_binary_search():
    assert run("bin(10 20 30 40 50, 35)") == 2
    assert run("bin(10 20 30 40 50, 10)") == 0
    assert run("bin(10 20 30 40 50, 5)") == -1   # below first
    assert list(run("bin(10 20 30, 5 10 25 99)")) == [-1, 0, 1, 2]


def test_flip_rectangular_and_refusals():
    m = run("flip(cut(2, 1 2 3 4))")
    assert [list(r) for r in m] == [[1, 3], [2, 4]]
    # involution on rectangular input
    mm = run("flip(flip(cut(2, 1 2 3 4)))")
    assert [list(r) for r in mm] == [[1, 2], [3, 4]]
    with pytest.raises(ArgsError):
        run("flip(cut(2, 1 2 3 4 5))")  # ragged
    with pytest.raises(ArgsError):
        run("flip(1 2 3)")  # not a matrix


def test_grade_up_down_stable_ties():
    assert list(run("grade_up(30 10 20)")) == [1, 2, 0]
    assert list(run("grade_down(30 10 20)")) == [0, 2, 1]
    # ties keep first-appearance order in BOTH directions (k semantics:
    # grade_down is NOT reversed grade_up)
    assert list(run("grade_up(5 1 5 1)")) == [1, 3, 0, 2]
    assert list(run("grade_down(5 1 5 1)")) == [0, 2, 1, 3]
    # grade of grade: x[grade_up(x)] is sorted
    v = run("x: 3 1 4 1 5; x[grade_up(x)]")
    if v is not None:  # indexing-by-vector supported on the local plane
        assert list(v) == [1, 1, 3, 4, 5]


def test_verbs_compose_with_adverbs():
    lens = run("count mapdown cut(2, 10 20 30 40 50)")
    assert list(lens) == [2, 2, 1]
    assert run("sum(count mapdown cut(2, til(7)))") == 7


# ------------------------------------ kerf1 uniform + set verbs (r8, #2)

def test_moving_verbs_expanding_head():
    # q's head rule: windows of min(i+1, n) items
    assert list(run("mavg(2, 2 4 6 4 10)")) == [2.0, 3.0, 5.0, 5.0, 7.0]
    assert list(run("msum(3, 2 4 6 4 10)")) == [2, 6, 12, 14, 20]
    assert list(run("mmin(2, 2 4 6 4 10)")) == [2, 2, 4, 4, 4]
    assert list(run("mmax(3, 2 4 6 4 10)")) == [2, 4, 6, 6, 10]
    assert list(run("mcount(2, 1 2 3 2 1)")) == [1, 2, 2, 2, 2]
    with pytest.raises(ArgsError):
        run("mavg(0, 1 2 3)")


def test_cumulative_verbs():
    # q's running forms: sums/avgs/mins/maxs
    assert list(run("sums(2 4 6 4)")) == [2, 6, 12, 16]
    assert list(run("prds(2 3 4)")) == [2, 6, 24]
    assert list(run("avgs(2 4 6 4)")) == [2.0, 3.0, 4.0, 4.0]
    assert list(run("mins(3 1 4 1 5)")) == [3, 1, 1, 1, 1]
    assert list(run("maxs(3 1 4 1 5)")) == [3, 3, 4, 4, 5]
    assert len(run("sums(til(0))")) == 0


def test_differ_xprev_rank_verbs():
    import numpy as np

    # differ: first element 1, then change flags
    assert list(run("differ(1 1 2 2 2 3)")) == [1, 0, 1, 0, 0, 1]
    assert len(run("differ(til(0))")) == 0
    # xprev: n-back shift, NaN head; negative n looks forward
    xp = run("xprev(2, 10 20 30 40)")
    assert np.isnan(xp[0]) and np.isnan(xp[1]) and list(xp[2:]) == [
        10.0, 20.0,
    ]
    xn = run("xprev(-1, 10 20 30)")
    assert list(xn[:2]) == [20.0, 30.0] and np.isnan(xn[2])
    assert list(run("xprev(0, 5 6)")) == [5.0, 6.0]
    # rank = grade of grade: position in the sorted order, stable ties
    assert list(run("rank(30 10 20 10)")) == [3, 0, 2, 1]
    # xrank: n equal-size rank buckets (q semantics: floor(n*rank/cnt))
    assert list(run("xrank(2, 30 10 20 10)")) == [1, 0, 1, 0]
    assert list(run("xrank(4, 1 2 3 4)")) == [0, 1, 2, 3]


def test_mdev_cov_scov_cor_verbs():
    import math

    from kerf_spark.errors import LengthError

    # mdev: moving POPULATION std with q's expanding head
    got = run("mdev(2, 2 4 6 4)")
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 1.0
    # cov population vs scov sample (q's documented split)
    assert run("cov(1 2 3, 2 4 6)") == pytest.approx(4.0 / 3.0)
    assert run("scov(1 2 3, 2 4 6)") == pytest.approx(2.0)
    assert run("cor(1 2 3, 2 4 6)") == pytest.approx(1.0)
    assert run("cor(1 2 3, 6 4 2)") == pytest.approx(-1.0)
    # constant vector: undefined correlation -> null, not a crash
    assert math.isnan(run("cor(1 1 1, 2 4 6)"))
    with pytest.raises(LengthError):
        run("cov(1 2 3, 1 2)")


def test_ema_recursive_smoother():
    assert list(run("ema(0.5, 2 4 6 4 10)")) == [2.0, 3.0, 4.5, 4.25, 7.125]
    assert list(run("ema(1.0, 3 1 4)")) == [3.0, 1.0, 4.0]  # alpha=1: identity


def test_prev_next_null_convention():
    import numpy as np

    pv = run("prev(2 4 6)")
    assert np.isnan(pv[0]) and list(pv[1:]) == [2.0, 4.0]
    nx = run("next(2 4 6)")
    assert list(nx[:2]) == [4.0, 6.0] and np.isnan(nx[2])
    assert len(run("prev(til(0))")) == 0


def test_fills_forward_fill_and_leading_null():
    import numpy as np

    f = run("fills([1.5, nan, 3.5, nan, 2.5])")
    assert list(f) == [1.5, 1.5, 3.5, 3.5, 2.5]
    lead = run("fills([nan, 2.0, nan])")
    assert np.isnan(lead[0]) and list(lead[1:]) == [2.0, 2.0]


def test_ratios_multiplicative_mapback():
    assert list(run("ratios(2 4 6 4 10)")) == [2.0, 2.0, 1.5, 4 / 6, 2.5]
    # deltas/ratios duality: ratios of a geometric series is constant
    assert list(run("ratios(1 2 4 8)")) == [1.0, 2.0, 2.0, 2.0]


def test_set_verbs_stable_orders():
    assert list(run("union(1 2 3 2 1, 2 3 5)")) == [1, 2, 3, 5]
    assert list(run("intersect(1 2 3 2 1, 2 3 5)")) == [2, 3, 2]
    assert list(run("except(1 2 3 2 1, 2 3 5)")) == [1, 1]
    assert list(run("in(1 2 3 2 1, 2 3 5)")) == [0, 1, 1, 1, 0]
    assert list(run("within(1 2 3 2 1, 2, 3)")) == [0, 1, 1, 1, 0]


def test_enlist_raze_roundtrip():
    assert run("count(enlist(1 2 3))") == 1
    assert list(run("raze(enlist(1 2 3))")) == [1, 2, 3]
    assert list(run("raze(cut(2, 1 2 3 2 1))")) == [1, 2, 3, 2, 1]
    assert list(run("raze(1 2 3)")) == [1, 2, 3]  # flat passes through


# ------------------------------------------------ r9 verb batch #3
def test_group_verb_map_valued():
    """kerf ``group``: distinct value -> index vector, first-appearance
    order (k semantics)."""
    g = run("group(1 2 1 3 2 1)")
    assert list(g) == [1, 2, 3]  # first-appearance key order
    assert list(g[1]) == [0, 2, 5]
    assert list(g[2]) == [1, 4]
    assert list(g[3]) == [3]
    gs = run('group(["x", "y", "x"])')
    assert list(gs["x"]) == [0, 2] and list(gs["y"]) == [1]


def test_amend_at_value_function_and_dyadic():
    """@[x;i;v] / @[x;i;f] / @[x;i;f;y] — functional, copy-on-write."""
    assert list(run("@[10 20 30 40; 1 3; 0]")) == [10, 0, 30, 0]
    assert list(run("@[10 20 30 40; 1 3; 7 9]")) == [10, 7, 30, 9]
    assert list(run("@[1 2 3 4; 0; {[x] x + 100}]")) == [101, 2, 3, 4]
    got = list(run("@[1.0 2.0 3.0; 1 2; {[x, y] x * y}; 10 100]"))
    assert got == [1.0, 20.0, 300.0]
    # semicolon AND comma separators both parse (the reference's
    # bound-square amend uses ';', parser.h:471-486)
    assert list(run("@[10 20 30, 1, 5]")) == [10, 5, 30]
    # copy-on-write: the source vector is untouched
    env = {}
    out = run("v: 1 2 3\nw: @[v; 0; 99]\nv[0]", env)
    assert out == 1
    # int vector amended with a float widens (kerf promotion)
    assert list(run("@[1 2 3; 1; 2.5]")) == [1.0, 2.5, 3.0]
    # dict amend by key
    m = run('@[{"a": 1, "b": 2}; "b"; {[x] x * 10}]')
    assert m == {"a": 1, "b": 20}


def test_amend_deep_path():
    """.[x;p;f] — nested amend down a path of subscripts."""
    v = run(".[[1 2 3, 4 5 6]; 1 0; 99]")
    assert [list(r) for r in v] == [[1, 2, 3], [99, 5, 6]]
    m = run('.[{"u": {"v": 5}}; ["u", "v"]; {[x] x * 7}]')
    assert m == {"u": {"v": 35}}
    # the original nested value is untouched
    out = run('m: {"u": {"v": 5}}\nw: .[m; ["u", "v"]; 1]\nm["u"]["v"]')
    assert out == 5


def test_amend_errors_are_typed():
    with pytest.raises(KerfIndexError):
        run("@[1 2 3; 9; 0]")
    with pytest.raises(ArityError):
        run("@[1 2 3; 1; 5; 6]")  # 4-arg form needs a FUNCTION
    with pytest.raises(ArityError):
        run("@[1 2 3; 1]")


def test_amend_negative_index_is_domain_error():
    # k/kerf amend has NO Python end-relative indexing: a negative
    # position is a domain error, not vector[-1]
    with pytest.raises(KerfIndexError):
        run("@[1 2 3; 0 - 1; 9]")
    with pytest.raises(KerfIndexError):
        run(".[[1 2 3, 4 5 6]; [1, 0 - 2]; 9]")


def test_amend_vector_operand_must_conform():
    # replacement vector shorter/longer than the index vector is a
    # LENGTH error up front (jump.h:144-198), never a raw IndexError
    from kerf_spark.errors import LengthError

    with pytest.raises(LengthError):
        run("@[10 20 30 40; 1 3; 7 9 11]")
    with pytest.raises(LengthError):
        run("@[10 20 30 40; 1 2 3; 7 9]")
    with pytest.raises(LengthError):
        run("@[1.0 2.0 3.0; 1 2; {[x, y] x * y}; 10 100 1000]")
    # scalars still broadcast
    assert list(run("@[10 20 30 40; 1 3; 0]")) == [10, 0, 30, 0]


def test_sv_vs_string_verbs():
    assert run('sv("-", vs(",", "a,b,c"))') == "a-b-c"
    assert list(run('vs(",", "x,y")')) == ["x", "y"]
    assert run('sv(", ", ["p", "q"])') == "p, q"


def test_like_and_ss_verbs():
    assert list(run('like(["ab1", "zb2", "ab3"], "ab?")')) == [1, 0, 1]
    assert run('like("hello", "h*o")') == 1
    assert run('like("hello", "h?o")') == 0
    assert list(run('ss("banana", "ana")')) == [1, 3]  # overlapping
    assert list(run('ss("banana", "zz")')) == []
    with pytest.raises(ArgsError):
        run('ss("x", "")')


def test_xkey_ij_lj_update_join_semantics(spark):
    """q ij/lj against an xkey-keyed right table: UPDATE-join — on a
    name clash the right value replaces the left for MATCHED rows;
    lj keeps left's value on unmatched rows, ij keeps only matches."""
    t1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, x double"
    )
    t2 = spark.createDataFrame(
        [(1, "one", 99.0), (3, "three", 77.0)],
        "k long, name string, x double",
    )
    out = KL.run(
        spark,
        'l: select * from t1\nr0: select * from t2\n'
        'j: lj(l, xkey(r0, "k"))\nxasc(j, "k")',
        {"t1": t1, "t2": t2},
    ).collect()
    assert [(r["k"], r["x"], r["name"]) for r in out] == [
        (1, 99.0, "one"), (2, 20.0, None), (3, 77.0, "three")
    ]
    inner = KL.run(
        spark,
        'l: select * from t1\nr0: select * from t2\n'
        'j: ij(l, xkey(r0, "k"))\nxasc(j, "k")',
        {"t1": t1, "t2": t2},
    ).collect()
    assert [(r["k"], r["x"], r["name"]) for r in inner] == [
        (1, 99.0, "one"), (3, 77.0, "three")
    ]
    # explicit key columns work without xkey; unkeyed right refuses
    ex = KL.run(
        spark,
        'l: select * from t1\nr0: select * from t2\nij(l, r0, "k")',
        {"t1": t1, "t2": t2},
    )
    assert ex.count() == 2
    with pytest.raises(ArgsError):
        KL.run(
            spark,
            "l: select * from t1\nr0: select * from t2\nlj(l, r0)",
            {"t1": t1, "t2": t2},
        )


def test_ej_equi_join_q_arg_order(spark):
    """q ``ej[c; t1; t2]``: inner equi-join on explicit columns, right
    side replacing clashes — no keyed right table required."""
    t1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, x double"
    )
    t2 = spark.createDataFrame(
        [(1, "one", 99.0), (3, "three", 77.0)],
        "k long, name string, x double",
    )
    out = KL.run(
        spark,
        'l: select * from t1\nr0: select * from t2\n'
        'j: ej("k", l, r0)\nxasc(j, "k")',
        {"t1": t1, "t2": t2},
    ).collect()
    assert [(r["k"], r["x"], r["name"]) for r in out] == [
        (1, 99.0, "one"), (3, 77.0, "three")
    ]


def test_uj_union_superset(spark):
    a = spark.createDataFrame([(1, 1.0)], "k long, x double")
    b = spark.createDataFrame([(2, 5.0)], "k long, y double")
    out = KL.run(
        spark,
        "a0: select k, x from a\nb0: select k, y from b\n"
        'u: uj(a0, b0)\nxasc(u, "k")',
        {"a": a, "b": b},
    ).collect()
    assert [(r["k"], r["x"], r["y"]) for r in out] == [
        (1, 1.0, None), (2, None, 5.0)
    ]


def test_xcol_cols_tmeta(spark):
    """q xcol (rename first n columns — pure projection), cols (name
    vector), tmeta (name→type map, schema-only)."""
    df = spark.createDataFrame([(1, 2.0, "z")], "a long, b double, c string")
    out = KL.run(
        spark,
        't: select * from d\nxcol(t, "x", "y")',
        {"d": df},
    )
    assert out.columns == ["x", "y", "c"]
    names = KL.run(spark, "t: select * from d\ncols(t)", {"d": df})
    assert list(names) == ["a", "b", "c"]
    m = KL.run(spark, "t: select * from d\ntmeta(t)", {"d": df})
    assert m == {"a": "bigint", "b": "double", "c": "string"}
    from kerf_spark.errors import LengthError

    with pytest.raises(LengthError):
        KL.run(spark, 't: select * from d\nxcol(t, "p","q","r","s")',
               {"d": df})


def test_ungroup_explodes_array_columns_in_lockstep(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, x double")
    out = KL.run(
        spark,
        "t: select k, array(1, 2) as idx, array(x, x * 2) as vals from a\n"
        'u: ungroup(t)\nxasc(u, "k", "idx")',
        {"a": df},
    ).collect()
    assert [(r["k"], r["idx"], r["vals"]) for r in out] == [
        (1, 1, 10.0), (1, 2, 20.0), (2, 1, 20.0), (2, 2, 40.0)
    ]
    # no array column is a typed refusal
    with pytest.raises(ArgsError):
        KL.run(spark, "t: select k from a\nungroup(t)", {"a": df})


def test_xasc_xdesc_route_to_catalyst(spark):
    df = KL.run(spark, '''
t: {{a: 3 1 2, b: 30 10 20}}
xdesc(t, "a")
''')
    assert [r["a"] for r in df.collect()] == [3, 2, 1]
    df2 = KL.run(spark, '''
t: {{a: 3 1 2, b: 30 10 20}}
xasc(t, "a")
''')
    assert [r["b"] for r in df2.collect()] == [10, 20, 30]
    # a Sort lands in the plan — Catalyst, not a driver-side order
    assert "Sort" in df2._jdf.queryExecution().optimizedPlan().toString()
    with pytest.raises(KerfTypeError):
        run('xasc(1 2 3, "a")')


def test_small_verb_batch_ssr_stats_eval():
    assert run('ssr("banana", "an", "AN")') == "bANANa"
    assert list(run('ssr(["ab", "bb"], "b", "X")')) == ["aX", "XX"]
    assert run("med(1 2 3 4)") == 2.5
    assert run("var(1 2 3 4)") == 1.25     # population variance
    assert run("dev(1 2 3 4)") == 1.25 ** 0.5
    assert list(run("mod(5 6 7, 3)")) == [2, 0, 1]
    assert list(run("neg(1 2 3)")) == [-1, -2, -3]
    assert list(run("signum(-5 0 9)")) == [-1, 0, 1]
    assert run("string(42)") == "42"
    # eval: a source string evaluated in the CURRENT env (kerf1 eval)
    assert run('a: 40\neval("a + 2")') == 42
    with pytest.raises(ArityError):
        run("eval(1, 2)")
    # a user variable named eval shadows the special form
    assert run("eval: 7\neval + 1") == 8


def test_bound_square_call_accepts_semicolons():
    """f[x;y] — the k call-bracket convention the reference parses —
    works alongside f[x,y] and plain indexing."""
    assert run("f: {[x, y] x + y}\nf[40; 2]") == 42
    assert run("f: {[x, y] x + y}\nf[40, 2]") == 42
    assert list(run("v: 10 20 30\nv[1 2]")) == [20, 30]
