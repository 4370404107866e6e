"""Kerf-Tree persistence (sources.tree): the reference round-trips the
WHOLE value tree through the filesystem (file.h:34-36 write_k_to_path /
read_k_from_path; test.cc:825-900 saves nested SLOP(11,22,33,
SLOP(44,55,...)) structures) — here the console environment (scalars,
vectors, maps, nested lists, lambdas, tables) survives a save/load,
with lambdas re-parsed from source against the reloaded globals."""

from __future__ import annotations

import io
import math

import numpy as np
import pytest

from kerf_spark.sources.tree import has_tree, load_tree, save_tree

SF = "/root/testdata/sf0.001"


def _env():
    from kerf_spark.plans.kerf_lang import Env

    return Env()


def test_nested_value_tree_roundtrip(spark, tmp_path):
    """The test.cc:825-900 shape: a nested list of ints with a nested
    sublist, plus string/float/map/vector mixes, compare structurally
    equal after reload."""
    root = str(tmp_path / "ws")
    env = _env()
    env.set_local("nested", [11, 22, 33, [44, 55, [66]]])
    env.set_local("v", np.array([1.5, 2.5, math.nan]))
    env.set_local("iv", np.array([7, 8, 9]))
    env.set_local("sv", np.array(["a", "bb", "ccc"]))
    env.set_local("m", {"a": 1, "b": [2, 3], "c": {"d": 4.25}})
    env.set_local("s", "héllo")
    env.set_local("x", 42)
    env.set_local("f", -0.0)
    env.set_local("t", True)
    env.set_local("z", None)
    env.set_local("raw", b"\x00\xffkerf")
    save_tree(spark, root, env)
    assert has_tree(root)

    got = load_tree(spark, root)
    assert got.get("nested") == [11, 22, 33, [44, 55, [66]]]
    v = got.get("v")
    assert v.dtype == np.float64
    assert v[0] == 1.5 and v[1] == 2.5 and math.isnan(v[2])
    assert got.get("iv").dtype == np.int64
    assert list(got.get("iv")) == [7, 8, 9]
    assert list(got.get("sv")) == ["a", "bb", "ccc"]
    assert got.get("m") == {"a": 1, "b": [2, 3], "c": {"d": 4.25}}
    assert got.get("s") == "héllo"
    assert got.get("x") == 42
    f = got.get("f")
    assert f == 0.0 and math.copysign(1.0, f) == -1.0  # -0.0 exact
    assert got.get("t") is True
    assert got.get("z") is None
    assert got.get("raw") == b"\x00\xffkerf"


def test_lambda_reparses_and_closes_over_reloaded_globals(spark, tmp_path):
    """Lambdas persist as SOURCE and re-parse at load (the reference's
    trick); a closure over a global sees the RELOADED global — and
    keeps tracking it if reassigned after load, exactly like a
    re-parsed reference lambda."""
    from kerf_spark.plans.kerf_lang import Interp

    root = str(tmp_path / "ws")
    interp = Interp(spark)
    env = _env()
    interp.exec_stmt("rate: 0.25", env)
    interp.exec_stmt("f: {[x] x * (1 - rate)}", env)
    interp.exec_stmt("g: {[a, b] a + f(b)}", env)  # lambda calling lambda
    assert interp.exec_stmt("f(100.0)", env) == 75.0
    save_tree(spark, root, env)

    got = load_tree(spark, root)
    i2 = Interp(spark)
    assert i2.exec_stmt("f(100.0)", got) == 75.0
    assert i2.exec_stmt("g(1.0, 100.0)", got) == 76.0
    # the closure is over the reloaded global env, not a snapshot
    i2.exec_stmt("rate: 0.5", got)
    assert i2.exec_stmt("f(100.0)", got) == 50.0


def test_tables_persist_through_workspace_and_stay_lazy(spark, tmp_path):
    """DataFrames ride Workspace.save (parquet, executor-parallel);
    reload returns a lazy scan whose rows equal the original."""
    root = str(tmp_path / "ws")
    env = _env()
    df = (
        spark.read.parquet(f"{SF}/region.parquet")
        .select("r_regionkey", "r_name")
    )
    env.set_local("reg", df)
    env.set_local("k", 2)
    info = save_tree(spark, root, env)
    assert "__tree__reg" in info["tables"]

    got = load_tree(spark, root)
    out = got.get("reg")
    rows = {(r["r_regionkey"], r["r_name"]) for r in out.collect()}
    want = {(r["r_regionkey"], r["r_name"]) for r in df.collect()}
    assert rows == want
    assert got.get("k") == 2


def test_error_values_and_verb_refs_roundtrip(spark, tmp_path):
    from kerf_spark.errors import KerfErrorValue
    from kerf_spark.plans.kerf_lang import _Builtin, _VerbRef

    root = str(tmp_path / "ws")
    env = _env()
    env.set_local("e", KerfErrorValue("Type error", "boom"))
    env.set_local("plus", _VerbRef("+"))
    env.set_local("b", _Builtin("til"))
    save_tree(spark, root, env)
    got = load_tree(spark, root)
    e = got.get("e")
    assert e.kind == "Type error" and e.message == "boom"
    assert got.get("plus").op == "+"
    assert got.get("b").name == "til"


def test_unpersistable_value_fails_loudly(spark, tmp_path):
    env = _env()
    env.set_local("bad", object())
    with pytest.raises(TypeError, match="cannot persist"):
        save_tree(spark, str(tmp_path / "ws"), env)


def test_console_save_load_session(spark, tmp_path):
    """End-to-end console flow: define state, \\s DIR, fresh session,
    \\l DIR, state is back (including a lambda and a table-typed
    variable usable in SQL)."""
    from kerf_spark.repl import Repl

    root = str(tmp_path / "ws")
    out = io.StringIO()
    r1 = Repl(spark=spark)
    r1.handle_line("n: 3", out)
    r1.handle_line("sq: {[x] x * x}", out)
    r1.handle_line(f"\\l {SF}", out)
    r1.handle_line(f"\\s {root}", out)
    assert "saved:" in out.getvalue()

    out2 = io.StringIO()
    r2 = Repl(spark=spark)
    r2.handle_line(f"\\l {root}", out2)
    assert "loaded:" in out2.getvalue()
    r2.handle_line("sq(n)", out2)
    assert "9" in out2.getvalue().splitlines()[-1]
    r2.handle_line("select count(*) as c from region", out2)
    assert "5" in out2.getvalue().splitlines()[-1]
