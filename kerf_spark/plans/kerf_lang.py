"""Kerf language front-end: scripts, lambdas, adverbs, control flow.

The reference lexes and parses the full kerf language — lambdas
``{[x,y] ...}`` (parser.h:471-486, lexer.h:85 TOKEN_GROUP_LAMBDA_ARGS),
control flow ``def/if/do/while/for`` (lexer.h:572-581 The_Reserved),
verb/adverb phrases (parser.h:442-507, adverbs.h:33-120 fold/unfold),
reserved literals ``inf/nan/nil/null/true/false`` (lexer.h:101-102) and
embedded SQL statements (lexer.h:103-104) — but its kerf2 interpreter
is a stub that prints the parse tree and returns NIL (interpreter.h:8-24).
Executable semantics therefore follow kerf1's published surface: C/JSON
syntax, ``name: expr`` assignment, standard arithmetic precedence,
space-separated vector strands, JSON array/map literals, and infix
adverbs (``f mapdown v``, ``+ fold v``).

Spark-first split — the point of this module is that *nothing* here
puts table data on the Python slow path:

* **table plane**: expressions that touch table columns are carried as
  SQL text fragments (:class:`SqlExpr`) and land in Catalyst via
  ``plans.kerfsql``.  A user lambda applied to a column is *traced*:
  its body is evaluated once with the parameters bound to SQL
  fragments, producing a pure SQL expression — a Catalyst expression,
  never a Python UDF.  Script variables referenced inside a query are
  inlined as literals at translate time (kerf1 queries read local
  vars).  At 100 TB the script is driver-side control; every scan,
  join and aggregate it issues is a plain Spark SQL plan.
* **local plane**: scalars and small vectors (numpy) evaluate on the
  driver, exactly like the reference's in-memory interpreter; they
  exist to parameterize queries, not to hold data.

Example::

    disc: {[p, d] p * (1 - d)}          // lambda -> Catalyst expr
    caps: 2 3 4 * 10                    // strand + vector arithmetic
    cut: + fold caps                    // fold adverb -> 90
    r: select rev: sum(disc(l_extendedprice, l_discount))
       by l_returnflag from lineitem where l_quantity < cut / 3
    r
"""

from __future__ import annotations

import math
import re
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..errors import (
    ArityError,
    ArgsError,
    DepthError,
    KerfErrorValue,
    KerfIndexError,
    KerfTypeError,
    LengthError,
    LexError,
    LexIncompleteError,
    ParseError,
    ParseIncompleteError,
    ParseUnmatchedError,
    RankError,
    ReferenceError_,
)
from .kerfsql import kerf_sql

# --------------------------------------------------------------- lexer

_SQL_STARTS = ("select", "update", "insert", "upsert", "delete")
_ADVERBS = ("mapdown", "mapback", "mapleft", "mapright", "fold", "unfold",
            "mapcores", "each")  # mapcores/each alias mapdown (adverbs.h:33)
_KEYWORDS = ("if", "else", "while", "for", "do", "def", "function",
             "return")
_RESERVED_LITS = {
    "true": True, "false": False, "null": None, "nil": None,
    "inf": math.inf, "infinity": math.inf, "nan": math.nan,
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<dt>\d{4}[.-]\d{2}[.-]\d{2}T\d{1,2}:\d{2}(?::\d{2}(?:\.\d+)?)?)
  | (?P<date>\d{4}[.-]\d{2}[.-]\d{2})
  | (?P<time>\d{1,2}:\d{2}:\d{2}(?:\.\d+)?)
  | (?P<span>\d+(?:\.\d+)?(?:ns|us|ms|[smhd])(?![A-Za-z0-9_]))
  | (?P<amend>[@.](?=\s*\[))
  | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:\\.|[^"\\])*")
  | (?P<sqlstr>'(?:''|\\.|[^'\\])*')
  | (?P<sym>`[A-Za-z_]\w*|`"(?:\\.|[^"\\])*")
  | (?P<name>[A-Za-z_]\w*)
  | (?P<verb><=|>=|==|!=|<>|[-+*/%<>=&|!])
  | (?P<punct>[(){}\[\],;:\n])
    """,
    re.VERBOSE | re.DOTALL,
)

_SPAN_NS = {
    "ns": 1, "us": 10**3, "ms": 10**6, "s": 10**9,
    "m": 60 * 10**9, "h": 3600 * 10**9, "d": 86400 * 10**9,
}


def _temporal_ns(kind: str, text: str) -> int:
    """Temporal literal -> int64 nanoseconds, the engine-wide stamp
    representation (reference STAMP/SPAN are ns; lexer.h:43-48 lexes
    ABS_DATE/ABS_TIME/ABS_DATETIME/REL_DATETIME token kinds).  Dates
    accept both kerf dots (2024.01.15) and dashes (2024-01-15,
    lexer.h DATES_ALLOW_DASHED)."""
    import datetime as _dt

    if kind == "span":
        m = re.fullmatch(r"(\d+(?:\.\d+)?)(ns|us|ms|[smhd])", text)
        assert m
        return int(float(m.group(1)) * _SPAN_NS[m.group(2)])
    if kind == "time":
        parts = text.split(":")
        sec = float(parts[2]) if len(parts) > 2 else 0.0
        return int(
            (int(parts[0]) * 3600 + int(parts[1]) * 60) * 10**9
            + round(sec * 10**9)
        )
    norm = text.replace(".", "-", 2)
    if kind == "date":
        d = _dt.datetime.strptime(norm, "%Y-%m-%d")
        return int(d.replace(tzinfo=_dt.timezone.utc).timestamp()) * 10**9
    day, clock = norm.split("T")
    d = _dt.datetime.strptime(day, "%Y-%m-%d")
    base = int(d.replace(tzinfo=_dt.timezone.utc).timestamp()) * 10**9
    return base + _temporal_ns("time", clock)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "0": "\0"}


class Tok:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind, self.text, self.pos = kind, text, pos

    def __repr__(self):  # pragma: no cover
        return f"{self.kind}:{self.text!r}"


def lex(src: str) -> list[Tok]:
    """Tokenize one statement's expression text (kerf classes per
    lexer.h:27-60: numbers, strings, names, verb symbols, adverb words,
    separators; the dash-grab rule of parser.h:280-340 — ``-`` merges
    into a following number literal only when nothing bindable precedes
    — is applied so strands like ``1 -2 3`` subtract while ``f(-2)``
    negates)."""
    toks: list[Tok] = []
    i, n = 0, len(src)
    while i < n:
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise LexError(f"unlexable character {src[i]!r} at {i} in kerf source")
        i = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        text = m.group()
        if m.lastgroup == "sym":
            # backtick symbol (TOKENS_BACKTICK, lexer.h:338-341) —
            # interned strings in the reference; plain strings here
            body = text[1:]
            if body.startswith('"'):
                body = body[1:-1]
            toks.append(Tok("str", body, m.start()))
        elif m.lastgroup in ("dt", "date", "time", "span"):
            toks.append(Tok("num", str(_temporal_ns(m.lastgroup, text)), m.start()))
        elif m.lastgroup == "num":
            # dash-grab (parser.h:280-340): unary minus folds into the
            # literal when the previous token can't be a left operand
            if (
                toks
                and toks[-1].kind == "verb"
                and toks[-1].text == "-"
                and (
                    len(toks) < 2
                    or toks[-2].kind in ("verb", "adverb")
                    or (toks[-2].kind == "punct" and toks[-2].text in "([{,;:\n")
                )
            ):
                toks.pop()
                toks.append(Tok("num", "-" + text, m.start() - 1))
            else:
                toks.append(Tok("num", text, m.start()))
        elif m.lastgroup == "sqlstr":
            # single-quoted SQL literal: legal only inside an embedded
            # SQL span (try(select … 'x') captures raw source, but the
            # surrounding statement still has to LEX).  The parser
            # rejects it anywhere an expression is expected.
            toks.append(Tok("sqlstr", text, m.start()))
        elif m.lastgroup == "str":
            body = text[1:-1]
            out, j = [], 0
            while j < len(body):
                if body[j] == "\\" and j + 1 < len(body):
                    out.append(_ESCAPES.get(body[j + 1], body[j + 1]))
                    j += 2
                else:
                    out.append(body[j])
                    j += 1
            toks.append(Tok("str", "".join(out), m.start()))
        elif m.lastgroup == "amend":
            # bound-square amend heads @[x;i;v] / .[x;p;v] — the
            # reference PARSES these (parser.h:471-486); kerf1 executes
            # them as functional amend (copy-on-write, k semantics)
            toks.append(Tok("amend", text, m.start()))
        elif m.lastgroup == "name":
            low = text.lower()
            if low in _ADVERBS:
                toks.append(Tok("adverb", low, m.start()))
            elif low in _KEYWORDS:
                toks.append(Tok("kw", low, m.start()))
            else:
                toks.append(Tok("name", text, m.start()))
        elif m.lastgroup == "verb":
            toks.append(Tok("verb", text, m.start()))
        elif text == "\n":
            continue  # statement-level newlines are split before lexing
        else:
            toks.append(Tok("punct", text, m.start()))
    toks.append(Tok("eof", "", n))
    return toks


# ----------------------------------------------------- statement split

_OPENS, _CLOSES = "([{", ")]}"


def split_statements(src: str, seps: str = ";\n") -> list[str]:
    """Split a script into top-level statements on ``;`` and newlines,
    depth-aware (braces/brackets/parens, strings, comments survive
    intact — TOKEN_GROUP_SEPARATION in lexer.h:83).  ``seps=";"``
    gives SQL batch semantics — a normally-formatted multi-line SQL
    statement stays ONE statement (kerf-SQL transaction batches use
    this; ADVICE r12 low, kerfsql.py:792)."""
    stmts, cur, depth = [], [], 0
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch == '"':
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            if j >= n:
                raise LexIncompleteError("unterminated string in kerf source")
            cur.append(src[i: j + 1])
            i = j + 1
            continue
        if ch == "'":
            # single-quoted SQL literal inside an embedded select
            # statement ('' doubling AND Spark's default backslash
            # escapes, e.g. 'don\\'t') — parens/; /newlines inside it
            # must not count as structure
            j = i + 1
            while j < n:
                if src[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if src[j] == "'":
                    if j + 1 < n and src[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                raise LexIncompleteError("unterminated string in kerf source")
            cur.append(src[i: j + 1])
            i = j + 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise LexIncompleteError("unterminated /* comment in kerf source")
            i = j + 2
            continue
        if ch in _OPENS:
            depth += 1
        elif ch in _CLOSES:
            depth -= 1
            if depth < 0:
                raise ParseUnmatchedError(f"unmatched {ch!r} in kerf source")
        if depth == 0 and ch in seps:
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    if depth:
        raise ParseIncompleteError("unclosed bracket in kerf source")
    s = "".join(cur).strip()
    if s:
        stmts.append(s)
    # re-attach `else` continuations split by a newline after `}`
    out: list[str] = []
    for s in stmts:
        if out and re.match(r"(?i)^else\b", s):
            out[-1] += " " + s
        else:
            out.append(s)
    return out


# ------------------------------------------------------------ values

class SqlExpr:
    """A table-plane expression carried as SQL text (lands in Catalyst
    through plans.kerfsql; never a Python UDF)."""

    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text

    def __repr__(self):  # pragma: no cover
        return f"SqlExpr({self.text})"


class KerfLambda:
    """``{[x,y] body}`` (parser.h:471-486).  Callable on local values
    (interpreted) or on SqlExpr args (traced to one SQL expression).

    ``self`` inside the body refers to the lambda itself
    (lexer.h:572-573 reserves it) — anonymous recursion.  Evaluation is
    driver-side and bounded at :data:`MAX_CALL_DEPTH` (the reference's
    ERROR_DEPTH, jump.h:147); a recursive lambda applied to a traced
    SqlExpr column would expand without bound and dies at the same
    guard with a typed DepthError.
    """

    #: interpreter-wide call depth budget (reference stack guard analogue)
    MAX_CALL_DEPTH = 500
    _depth = 0
    _saved_limit: int | None = None

    def __init__(self, params: list[str], body: list[str], env: "Env",
                 name: str = "lambda"):
        self.params, self.body, self.env, self.name = params, body, env, name

    def __call__(self, interp: "Interp", args: list[Any]) -> Any:
        import sys

        if len(args) != len(self.params):
            raise ArityError(
                f"{self.name} takes {len(self.params)} args, got {len(args)}"
            )
        if KerfLambda._depth >= KerfLambda.MAX_CALL_DEPTH:
            raise DepthError(
                f"{self.name}: call depth exceeds {KerfLambda.MAX_CALL_DEPTH}"
            )
        KerfLambda._depth += 1
        try:
            if KerfLambda._depth == 1:
                # one kerf call ≈ tens of Python frames; size the Python
                # stack so OUR DepthError fires first, never
                # RecursionError.  Scoped, not process-wide: the
                # outermost call saves the limit INSIDE the try (so any
                # exception path reaches the restoring finally) and the
                # bump never leaks to other driver code (single-threaded
                # interpreter).
                KerfLambda._saved_limit = sys.getrecursionlimit()
                sys.setrecursionlimit(
                    max(
                        KerfLambda._saved_limit,
                        KerfLambda.MAX_CALL_DEPTH * 60,
                    )
                )
            local = Env(parent=self.env)
            local.set_local("self", self)
            for p, a in zip(self.params, args):
                local.set_local(p, a)
            ret = None
            for stmt in self.body:
                ret = interp.exec_stmt(stmt, local)
                if local.returned:
                    return local.return_value
            return ret
        finally:
            KerfLambda._depth -= 1
            if KerfLambda._depth == 0 and KerfLambda._saved_limit is not None:
                sys.setrecursionlimit(KerfLambda._saved_limit)
                KerfLambda._saved_limit = None


class Env:
    """Lexically scoped variable chain (lambda locals over globals)."""

    def __init__(self, parent: "Env | None" = None):
        self.vars: dict[str, Any] = {}
        self.parent = parent
        self.returned = False
        self.return_value: Any = None

    def get(self, name: str) -> Any:
        e: Env | None = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise ReferenceError_(f"undefined name: {name}")

    def has(self, name: str) -> bool:
        e: Env | None = self
        while e is not None:
            if name in e.vars:
                return True
            e = e.parent
        return False

    def set_local(self, name: str, value: Any) -> None:
        self.vars[name] = value

    def assign(self, name: str, value: Any) -> None:
        """kerf scoping: assignment binds in the innermost scope unless
        the name already exists in an enclosing one."""
        e: Env | None = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        self.vars[name] = value


def _truthy(v: Any) -> bool:
    """Local-plane kerf truthiness (slop.h:919-933): numeric 0/NaN,
    NULL, empty string/vector are falsy."""
    if v is None:
        return False
    if isinstance(v, np.generic):  # numpy scalar (np.bool_ is not bool)
        v = v.item()
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return len(v) > 0 and v != "\0"
    if isinstance(v, np.ndarray):
        return v.size > 0
    if isinstance(v, (list, dict)):
        return len(v) > 0
    if isinstance(v, SqlExpr):
        raise KerfTypeError(
            "table-plane expression in a driver-side conditional; use "
            "ifelse(cond, a, b) inside lambdas applied to columns"
        )
    return True


def _sql_lit(v: Any) -> str:
    """Render a local value as a SQL literal (for tracing lambdas and
    inlining script variables into queries)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return repr(float(v))
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, np.ndarray):
        return "(" + ", ".join(_sql_lit(x) for x in v.tolist()) + ")"
    if isinstance(v, (list, tuple)):
        return "(" + ", ".join(_sql_lit(x) for x in v) + ")"
    raise KerfTypeError(f"cannot inline {type(v).__name__} into SQL")


# ------------------------------------------------------------- verbs

def _np(v):
    return np.asarray(v) if isinstance(v, (list, tuple)) else v


def _conform(a, b):
    aa, ba = isinstance(a, np.ndarray), isinstance(b, np.ndarray)
    if aa and ba and a.shape != b.shape:
        raise RankError(
            f"length mismatch: {a.shape[0]} vs {b.shape[0]}"
        )


_BIN_SQL = {
    "+": "+", "-": "-", "*": "*", "/": "/", "%": "%",
    "<": "<", "<=": "<=", ">": ">", ">=": ">=",
    "=": "=", "==": "=", "!=": "<>", "<>": "<>",
    "&": "AND", "|": "OR",
}


def _bin(op: str, a: Any, b: Any) -> Any:
    """Dyadic verb dispatch: SqlExpr operand -> SQL text; else numpy/
    scalar arithmetic with kerf verbs (`/` true division, `%` mod)."""
    if isinstance(a, SqlExpr) or isinstance(b, SqlExpr):
        at = a.text if isinstance(a, SqlExpr) else _sql_lit(a)
        bt = b.text if isinstance(b, SqlExpr) else _sql_lit(b)
        return SqlExpr(f"({at} {_BIN_SQL[op]} {bt})")
    a, b = _np(a), _np(b)
    _conform(a, b)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b  # kerf divide is true division
    if op == "%":
        return np.mod(a, b) if isinstance(a, np.ndarray) or isinstance(b, np.ndarray) else a % b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    if op in ("=", "=="):
        return a == b
    if op in ("!=", "<>"):
        return a != b
    if op == "&":
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return np.logical_and(a, b)
        return _truthy(a) and _truthy(b)
    if op == "|":
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return np.logical_or(a, b)
        return _truthy(a) or _truthy(b)
    raise KerfTypeError(f"unknown verb {op}")  # pragma: no cover


def _unary(op: str, a: Any) -> Any:
    if isinstance(a, SqlExpr):
        return SqlExpr(f"(-{a.text})" if op == "-" else f"(NOT {a.text})")
    if op == "-":
        return -_np(a)
    v = _np(a)
    if isinstance(v, np.ndarray):
        return np.logical_not(v)
    return not _truthy(v)


# builtin verbs: name -> (local impl, sql rendering or None)
def _loc_count(x):
    if isinstance(x, DataFrame):
        return x.count()
    return len(x) if hasattr(x, "__len__") else 1


def _loc_cut(idx, x):
    """kerf1 ``cut``: a VECTOR of ascending start positions cuts ``x``
    at those indices (``x[i0:i1], x[i1:i2], …, x[ik:]``); a SCALAR n
    cuts ``x`` into consecutive chunks of n (the kerf1/q convenience).
    Returns a vector of subvectors (FLIPPED-style nested value)."""
    v = _np(x)
    if np.ndim(idx) == 0:
        n = int(idx)
        if n <= 0:
            raise ArgsError(f"cut chunk size must be positive, got {n}")
        starts = list(range(0, max(len(v), 1), n))
    else:
        starts = [int(i) for i in _np(idx)]
        if starts != sorted(starts):
            raise ArgsError("cut indices must be ascending")
        if starts and (starts[0] < 0 or starts[-1] > len(v)):
            raise ArgsError("cut indices out of range")
    bounds = starts + [len(v)]
    out = np.empty(len(starts), dtype=object)
    for j in range(len(starts)):
        out[j] = v[bounds[j]:bounds[j + 1]]
    return out


def _loc_rotate(n, x):
    """kerf1 ``rotate``: cyclic LEFT shift by n (negative n rotates
    right) — ``rotate(2, 1 2 3 4 5)`` is ``3 4 5 1 2``."""
    v = _np(x)
    if len(v) == 0:
        return v
    return np.roll(v, -int(n))


def _loc_bin(xs, y):
    """kerf1/k ``bin``: binary search — for each y, the index of the
    RIGHTMOST element of sorted ``xs`` that is <= y; -1 when y sorts
    before everything.  Vectorized over scalar or vector y."""
    v = _np(xs)
    pos = np.searchsorted(v, _np(y), side="right") - 1
    return pos


def _loc_flip(x):
    """kerf1 ``flip``: transpose a rectangular list-of-vectors (the
    FLIPPED/TRANSPOSED object, enums.h:260).  Table-plane transposes
    go through operators.relational.transpose_vectors (distributed) —
    a driver-side flip of a DataFrame would be an unbounded collect,
    so it refuses here."""
    if isinstance(x, DataFrame):
        raise KerfTypeError(
            "flip of a table is a distributed reshape — use "
            "relational.transpose_vectors, not the script verb"
        )
    v = _np(x)
    if v.dtype == object:
        rows = [_np(r) for r in v]
        if not rows:
            return v
        w = len(rows[0])
        if any(len(r) != w for r in rows):
            raise ArgsError("flip needs rectangular rows (ragged input)")
        return np.array([[r[j] for r in rows] for j in range(w)])
    if v.ndim != 2:
        raise ArgsError(f"flip needs a matrix, got ndim={v.ndim}")
    return v.T.copy()


def _loc_grade_up(x):
    """kerf1 ``grade_up``: the STABLE ascending permutation (argsort;
    ties keep first-appearance order) — ``x[grade_up(x)]`` sorts x."""
    return np.argsort(_np(x), kind="stable")


def _loc_differ(x):
    """q/kerf ``differ``: 1 where the value differs from its
    predecessor; the FIRST element is 1 (nothing before it to equal).
    Works on any dtype (object-safe elementwise compare)."""
    v = _np(x)
    if len(v) == 0:
        return np.array([], dtype=np.int64)
    out = np.ones(len(v), dtype=np.int64)
    out[1:] = (v[1:] != v[:-1]).astype(np.int64)
    return out


def _loc_xprev(n, x):
    """q ``xprev``: the value n positions back (generalizing
    ``prev``); the first n slots are null (NaN — integers widen to
    float64, the script plane's null convention).  Negative n looks
    FORWARD (q's documented behavior via xprev with negative n)."""
    n = int(n)
    v = _np(x).astype(np.float64)
    out = np.full(len(v), np.nan)
    if n == 0 or len(v) == 0:
        return v if n == 0 else out
    if n > 0:
        out[n:] = v[:-n]
    else:
        out[:n] = v[-n:]
    return out


def _loc_rank(x):
    """q ``rank``: position each item would take in the sorted order
    — ``grade_up(grade_up(x))``; ties resolve by first appearance
    (stability twice over)."""
    return np.argsort(np.argsort(_np(x), kind="stable"), kind="stable")


def _loc_cov(sample: bool):
    """q ``cov``/``scov``: covariance of two conforming vectors —
    population (cov) or sample (scov) denominator, q's documented
    split.  Pairs with a null (NaN) component drop, matching SQL's
    covar_pop/covar_samp null handling."""

    def run(x, y):
        a = _np(x).astype(np.float64)
        b = _np(y).astype(np.float64)
        if len(a) != len(b):
            raise LengthError(
                f"cov operands must conform: {len(a)} vs {len(b)}"
            )
        ok = ~(np.isnan(a) | np.isnan(b))
        a, b = a[ok], b[ok]
        n = len(a)
        if n == 0 or (sample and n < 2):
            return float("nan")
        # two-pass centered form (not E[xy]-E[x]E[y]: that one
        # cancels catastrophically when |mean| >> spread)
        c = float(np.mean((a - np.mean(a)) * (b - np.mean(b))))
        return c * n / (n - 1) if sample else c

    return run


def _loc_cor(x, y):
    """q ``cor``: Pearson correlation (population moments — the
    n's cancel, so population vs sample is immaterial here)."""
    a = _np(x).astype(np.float64)
    b = _np(y).astype(np.float64)
    if len(a) != len(b):
        raise LengthError(
            f"cor operands must conform: {len(a)} vs {len(b)}"
        )
    ok = ~(np.isnan(a) | np.isnan(b))
    a, b = a[ok], b[ok]
    if len(a) == 0:
        return float("nan")
    ca, cb = a - np.mean(a), b - np.mean(b)
    sa, sb = float(np.std(a)), float(np.std(b))
    if sa == 0.0 or sb == 0.0:
        return float("nan")
    return float(np.mean(ca * cb) / (sa * sb))


def _loc_moving(agg, needs_float: bool = False):
    """kerf1/q moving-window verbs ``m{avg,sum,min,max,count}(n, x)``:
    the window EXPANDS over the first ``n-1`` positions (windows of
    ``min(i+1, n)`` items — q's documented head behavior), then slides.
    Script-plane values are driver-bounded literals, so the O(n·w)
    slice walk is fine; the distributed spellings are
    operators.windows.moving_* / chunked_moving."""

    def run(n, x):
        n = int(n)
        if n <= 0:
            raise ArgsError(f"moving window must be positive, got {n}")
        v = _np(x)
        out = [agg(v[max(0, i - n + 1): i + 1]) for i in range(len(v))]
        return np.array(out, dtype=np.float64 if needs_float else None)

    return run


def _loc_ema(alpha, x):
    """kerf1 ``ema``: y0 = x0, yi = a·xi + (1-a)·y(i-1) — the
    recursive exponential smoother (the windows.ema_exact twin)."""
    a = float(alpha)
    v = _np(x).astype(np.float64)
    out = np.empty(len(v))
    for i in range(len(v)):
        out[i] = v[i] if i == 0 else a * v[i] + (1.0 - a) * out[i - 1]
    return out


def _loc_prev(x):
    """kerf1 ``prev``: shift right, null (NaN) in front — integer
    input widens to float64, the script plane's null convention."""
    v = _np(x).astype(np.float64)
    if len(v) == 0:
        return v
    out = np.empty(len(v))
    out[0], out[1:] = np.nan, v[:-1]
    return out


def _loc_next(x):
    """kerf1 ``next``: shift left, null (NaN) at the back."""
    v = _np(x).astype(np.float64)
    if len(v) == 0:
        return v
    out = np.empty(len(v))
    out[-1], out[:-1] = np.nan, v[1:]
    return out


def _loc_fills(x):
    """kerf1 ``fills``: forward-fill nulls (NaN); leading nulls stay
    (nothing to carry) — the windows.ffill twin."""
    v = _np(x).astype(np.float64)
    mask = np.isnan(v)
    idx = np.where(~mask, np.arange(len(v)), 0)
    np.maximum.accumulate(idx, out=idx)
    return v[idx]


def _loc_ratios(x):
    """kerf1 ``ratios``: first element unchanged, then x[i]/x[i-1]
    (the multiplicative mapback — deltas' sibling)."""
    v = _np(x).astype(np.float64)
    if len(v) == 0:
        return v
    return np.concatenate(([v[0]], v[1:] / v[:-1]))


def _loc_union(x, y):
    """kerf1 ``union``: distinct elements, first-appearance order
    across x then y (NOT np.unique's sorted order)."""
    a = np.concatenate([np.atleast_1d(_np(x)), np.atleast_1d(_np(y))])
    _, idx = np.unique(a, return_index=True)
    return a[np.sort(idx)]


def _loc_enlist(x):
    """kerf1 ``enlist``: wrap in a 1-item list (vectors nest)."""
    v = _np(x)
    if np.ndim(v) == 0:
        return np.array([v])
    out = np.empty(1, dtype=object)
    out[0] = v
    return out


def _loc_raze(x):
    """kerf1 ``raze``: flatten ONE level of nesting; a flat vector
    passes through."""
    v = _np(x)
    if v.dtype == object:
        parts = [np.atleast_1d(_np(e)) for e in v]
        return (
            np.concatenate(parts) if parts else np.array([], dtype=np.int64)
        )
    return v


def _loc_grade_down(x):
    """kerf1 ``grade_down``: descending permutation with ties in
    first-appearance order (k semantics) — NOT reversed grade_up,
    which would flip tie order.  Python's reverse sort is tie-stable,
    so sorted(..., reverse=True) gives exactly this."""
    v = _np(x)
    return np.array(
        sorted(range(len(v)), key=lambda i: v[i], reverse=True),
        dtype=np.int64,
    )


#: missing-argument sentinel for the 3-arg amend forms
_NOARG = object()


def _amend_pick(v: Any, j: int, many: bool) -> Any:
    """Itemwise argument alignment for vector amends: a vector ``y``
    (or replacement vector) pairs element j with index j; scalars
    broadcast."""
    if v is _NOARG:
        return v
    if many and isinstance(v, (np.ndarray, list)) and np.ndim(v) >= 1:
        out = v[j]
        return out.item() if isinstance(out, np.generic) else out
    return v


def _amend_conform(v: Any, n: int, many: bool, what: str) -> None:
    """A vector operand of a vector amend must CONFORM to the index
    vector — k length discipline (ERROR_LENGTH, jump.h:144-198): a
    replacement/right-operand vector shorter or longer than ``i``
    is a length error up front, never a stray IndexError mid-write."""
    if v is _NOARG or not many:
        return
    if isinstance(v, (np.ndarray, list)) and np.ndim(v) >= 1 and len(v) != n:
        raise LengthError(
            f"amend: {what} vector of length {len(v)} does not conform "
            f"to index vector of length {n}"
        )


def _loc_ssr(x, sub, rep):
    """kerf1/q ``ssr``: string search-replace (non-overlapping, left
    to right).  Vectorizes over a vector of strings."""
    if isinstance(x, (np.ndarray, list)):
        return np.array(
            [str(v).replace(str(sub), str(rep)) for v in x], dtype=object
        )
    return str(x).replace(str(sub), str(rep))


def _loc_folio(addrs, src):
    """Script spelling of the DISTRIBUTED FOLIO (presented.h:427-430
    — the folio of socket-mapped remote tables, queried as one table):
    ``folio(["host:port", ...], "select ...")`` runs the statement on
    every server concurrently and returns the unioned DataFrame of
    their Arrow-frame results.  Addresses are strings so the folio is
    an ordinary kerf VALUE (a vector of members)."""
    from pyspark.sql import SparkSession

    from ..server import folio_remote

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise KerfTypeError("folio needs an active SparkSession")
    if isinstance(addrs, np.ndarray):
        addrs = addrs.tolist()
    if isinstance(addrs, str):
        addrs = [addrs]
    parsed = []
    for a in addrs:
        host, _, port = str(a).rpartition(":")
        if not host or not port.isdigit():
            raise ArgsError(f"folio member must be 'host:port', got {a!r}")
        parsed.append((host, int(port)))
    return folio_remote(spark, parsed, str(src))


def _loc_folio_select(addrs, src):
    """``folio_select(members, "select sum(x) as s by k from t")`` —
    the AGGREGATE auto-split over a distributed folio ("a folio of
    tables should behave like a table", presented.h:409): algebraic
    aggregates rewrite into member partials + a local final merge
    (avg → sum/count, never an average of averages; variance via
    anchored centered partials), holistic median/percentile/count
    DISTINCT rebuild EXACTLY from merged member histograms, ordered
    last/first/max_by/min_by split as member arg-max partials, and
    approx_median/approx_count_distinct ride mergeable KLL/HLL
    sketches; genuinely order-dependent aggregates refuse with a
    typed error.  See server.folio_select."""
    from pyspark.sql import SparkSession

    from ..server import folio_select

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise KerfTypeError("folio_select needs an active SparkSession")
    if isinstance(addrs, np.ndarray):
        addrs = addrs.tolist()
    if isinstance(addrs, str):
        addrs = [addrs]
    parsed = []
    for a in addrs:
        host, _, port = str(a).rpartition(":")
        if not host or not port.isdigit():
            raise ArgsError(f"folio member must be 'host:port', got {a!r}")
        parsed.append((host, int(port)))
    return folio_select(spark, parsed, str(src))


def _parse_folio_addrs(addrs):
    if isinstance(addrs, np.ndarray):
        addrs = addrs.tolist()
    if isinstance(addrs, str):
        addrs = [addrs]
    parsed = []
    for a in addrs:
        host, _, port = str(a).rpartition(":")
        if not host or not port.isdigit():
            raise ArgsError(f"folio member must be 'host:port', got {a!r}")
        parsed.append((host, int(port)))
    return parsed


def _loc_folio_reshard(
    addrs, table, key, out_name, persist=None, via=None, shared_dir=None
):
    """``folio_reshard(members, "orders", "o_custkey", "orders_rs")``
    — the RESHARD exchange (DISTRIBUTED_ARRAY_FOLIO at full strength,
    enums.h:263 + presented.h:427-430): every member hash-buckets its
    shard by the key, keeps its own bucket, SHIPS the rest directly
    to its peers (member→member, the coordinator carries only
    addresses), stages kept ∪ received, row-conservation-checks the
    staged relations, and only then flips the new name visible on
    every member — a failure anywhere before the flip publishes
    nothing anywhere.  An optional fifth argument persists each
    member's staged shard to ``<dir>/<out>_m<j>`` parquet before the
    flip, so the exchange survives member restarts.  Returns the
    stats map ({"rows", "moved", "persisted"}).  See
    server.folio_reshard."""
    from ..server import folio_reshard

    return folio_reshard(
        _parse_folio_addrs(addrs),
        str(table),
        str(key),
        str(out_name),
        persist=None if persist is None else str(persist),
        via="arrow" if via is None else str(via),
        shared_dir=None if shared_dir is None else str(shared_dir),
    )


def _loc_folio_window(addrs, src, shard_key, publish=None, persist=None):
    """``folio_window(members, "select k, ts, msum(3, v) as m by k
    from t order by ts", "k")`` — member-complete WINDOW analytics
    over a folio sharded by the third argument (the ordered half of
    presented.h:409's folio-behaves-like-a-table; aggregates ride
    folio_select): every OVER clause (kerf ordered verbs expand to
    OVER first) must partition by the shard key, the gathered frames'
    key sets are checked pairwise-disjoint, and a statement-level
    order by re-applies to the merged union.  An optional fourth
    argument publishes each member's windowed shard server-side
    instead of gathering (returns the counts map).  See
    server.folio_window."""
    from pyspark.sql import SparkSession

    from ..server import folio_window

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise KerfTypeError("folio_window needs an active SparkSession")
    return folio_window(
        spark,
        _parse_folio_addrs(addrs),
        str(src),
        str(shard_key),
        publish=None if publish is None else str(publish),
        persist=None if persist is None else str(persist),
    )


def _loc_folio_asof(addrs, src, publish=None, persist=None):
    """``folio_asof(members, "select ... from t asof join q on
    keys..., ts")`` — the distributed temporal join over a CO-SHARDED
    folio: verifies both tables' equi-key sets are member-disjoint
    (a mis-sharded folio fails loud toward folio_reshard), then runs
    the as-of/window join member-locally and unions the frames; an
    optional third argument publishes each member's joined shard
    server-side instead of gathering.  See server.folio_asof."""
    from pyspark.sql import SparkSession

    from ..server import folio_asof

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise KerfTypeError("folio_asof needs an active SparkSession")
    return folio_asof(
        spark,
        _parse_folio_addrs(addrs),
        str(src),
        publish=None if publish is None else str(publish),
        persist=None if persist is None else str(persist),
    )


def _loc_folio_topk(addrs, src):
    """``folio_topk(members, "select ... from t order by x desc limit
    k")`` — distributed top-k rows: each member computes its local
    top-k (bounding the wire to |members|*k rows), the final re-sorts
    the union and takes k.  Correct on any member layout — no
    co-sharding needed.  See server.folio_topk."""
    from pyspark.sql import SparkSession

    from ..server import folio_topk

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise KerfTypeError("folio_topk needs an active SparkSession")
    return folio_topk(spark, _parse_folio_addrs(addrs), str(src))


def _loc_group(x):
    """kerf1 ``group``: MAP from each distinct value to the index
    vector of its occurrences, first-appearance order (k semantics) —
    the script-plane twin of groupBy+collect_list(index)."""
    v = _np(x)
    out: dict = {}
    for j in range(len(v)):
        k = v[j]
        k = k.item() if isinstance(k, np.generic) else k
        out.setdefault(k, []).append(j)
    return {k: np.array(ix, dtype=np.int64) for k, ix in out.items()}


def _loc_xsort(desc: bool):
    """kerf1/q ``xasc``/``xdesc``: TABLE sort by columns — the script
    plane holds tables as DataFrames, so this is a Catalyst Sort,
    never a driver-side order."""

    def run(t, *cols):
        if not isinstance(t, DataFrame):
            raise KerfTypeError(
                f"xasc/xdesc sort a table, got {type(t).__name__}"
            )
        if not cols:
            raise ArityError("xasc/xdesc need at least one column name")
        from pyspark.sql import functions as _F

        order = [
            _F.desc(str(c)) if desc else _F.asc(str(c)) for c in cols
        ]
        return t.orderBy(*order)

    return run


def _loc_xkey(t, *cols):
    """q ``xkey``: declare key columns on a TABLE value — keys move to
    the front and the key list rides the value (script-plane metadata,
    the q keyed-table analogue) so ``ij``/``lj`` join on it.  The
    engine's durable keyed tables are Workspace.save(key=...); this is
    the in-flight form."""
    if not isinstance(t, DataFrame):
        raise KerfTypeError(f"xkey keys a table, got {type(t).__name__}")
    if not cols:
        raise ArityError("xkey needs at least one column name")
    keys = [str(c) for c in cols]
    missing = [c for c in keys if c not in t.columns]
    if missing:
        raise ArgsError(f"xkey: columns not in table: {missing}")
    rest = [c for c in t.columns if c not in keys]
    out = t.select(*keys, *rest)
    out.__kerf_key__ = keys  # type: ignore[attr-defined]
    return out


def _loc_keyed_join(how: str):
    """q ``ij``/``lj``: join against a KEYED right table with q's
    UPDATE-JOIN semantics — on a column-name clash the right side's
    value replaces the left's for MATCHED rows (lj keeps the left's
    value on unmatched rows; ij keeps only matches).  The right side
    must be keyed (``xkey``) or the key passed explicitly:
    ``lj(t, kt)`` / ``lj(t, r, "k")``."""

    def run(left, right, *cols):
        from pyspark.sql import functions as _F

        if not isinstance(left, DataFrame) or not isinstance(
            right, DataFrame
        ):
            raise KerfTypeError(f"{how} joins two tables")
        keys = (
            [str(c) for c in cols]
            if cols
            else getattr(right, "__kerf_key__", None)
        )
        if not keys:
            raise ArgsError(
                f"{how}: right table is not keyed — xkey it or pass "
                f"the key columns"
            )
        missing = [
            c for c in keys
            if c not in left.columns or c not in right.columns
        ]
        if missing:
            raise ArgsError(f"{how}: key columns missing: {missing}")
        nonkey = [c for c in right.columns if c not in keys]
        r = right.select(
            *keys,
            _F.lit(True).alias("__kj_m"),
            *[_F.col(c).alias(f"__kj_{c}") for c in nonkey],
        )
        j = left.join(
            r, on=keys, how="left" if how == "lj" else "inner"
        )
        for c in nonkey:
            if c in left.columns:
                # clash: right's value for matched rows (even null —
                # q replaces the record), left's otherwise
                j = j.withColumn(
                    c,
                    _F.when(
                        _F.coalesce(_F.col("__kj_m"), _F.lit(False)),
                        _F.col(f"__kj_{c}"),
                    ).otherwise(_F.col(c)),
                )
            else:
                j = j.withColumn(c, _F.col(f"__kj_{c}"))
        return j.drop("__kj_m", *[f"__kj_{c}" for c in nonkey])

    return run


def _loc_ej(cols, left, right):
    """q ``ej``: equi-join on EXPLICIT columns (q argument order
    ``ej[c; t1; t2]``) — ij's semantics (inner, right side replaces
    clashing columns) without requiring a keyed right table."""
    if isinstance(cols, np.ndarray):
        cols = [str(c) for c in cols.tolist()]
    elif isinstance(cols, str):
        cols = [cols]
    else:
        cols = [str(c) for c in cols]
    return _loc_keyed_join("ej")(left, right, *cols)


def _loc_uj(a, b):
    """q ``uj``: union join — the column SUPERSET, absent columns
    null-filled (unionByName allowMissingColumns)."""
    if not isinstance(a, DataFrame) or not isinstance(b, DataFrame):
        raise KerfTypeError("uj unions two tables")
    return a.unionByName(b, allowMissingColumns=True)


def _loc_xcol(t, *names):
    """q ``xcol``: rename the FIRST n columns to the given names
    (``xcol(t, "a", "b")``) — a pure projection, zero data motion."""
    from pyspark.sql import functions as _F

    if not isinstance(t, DataFrame):
        raise KerfTypeError(f"xcol renames a table, got {type(t).__name__}")
    names = [str(n) for n in names]
    if len(names) > len(t.columns):
        raise LengthError(
            f"xcol: {len(names)} names for {len(t.columns)} columns"
        )
    return t.select(
        *[
            _F.col(c).alias(names[i]) if i < len(names) else _F.col(c)
            for i, c in enumerate(t.columns)
        ]
    )


def _loc_cols(t):
    """q ``cols``: the table's column names as a string vector."""
    if not isinstance(t, DataFrame):
        raise KerfTypeError(f"cols takes a table, got {type(t).__name__}")
    return np.array(t.columns, dtype=object)


def _loc_tmeta(t):
    """q ``meta``-alike (``tmeta`` — ``meta`` stays free for user
    bindings): MAP from column name to Spark type string, schema-only
    (no job runs)."""
    if not isinstance(t, DataFrame):
        raise KerfTypeError(f"tmeta takes a table, got {type(t).__name__}")
    return {c: ty for c, ty in t.dtypes}


def _loc_ungroup(t):
    """q ``ungroup``: explode a table's ARRAY columns in lockstep
    (element i of every array column forms row i — arrays_zip keeps
    the pairing; ragged arrays null-fill like q).  The inverse of the
    grouped-vector select (collect_list)."""
    if not isinstance(t, DataFrame):
        raise KerfTypeError(f"ungroup takes a table, got {type(t).__name__}")
    from pyspark.sql import functions as _F

    arr = [c for c, ty in t.dtypes if ty.startswith("array")]
    if not arr:
        raise ArgsError("ungroup: table has no array columns")
    plain = [c for c in t.columns if c not in arr]
    z = t.withColumn("__ug", _F.explode(_F.arrays_zip(*arr)))
    return z.select(
        *plain, *[_F.col(f"__ug.{c}").alias(c) for c in arr]
    )


def _loc_sv(sep, parts):
    """kerf1/q ``sv`` (string-from-vector): join string parts with the
    separator."""
    if isinstance(parts, np.ndarray):
        parts = parts.tolist()
    if not isinstance(parts, (list, tuple)):
        raise KerfTypeError("sv joins a vector of strings")
    return str(sep).join(str(p) for p in parts)


def _loc_vs(sep, s):
    """kerf1/q ``vs`` (vector-from-string): split on the separator."""
    return np.array(str(s).split(str(sep)), dtype=object)


def _loc_like(s, pat):
    """kerf1/q ``like``: glob match (``*`` any run, ``?`` one char,
    ``[abc]`` class — q's pattern alphabet, translated to an anchored
    regex).  Vectorizes over a vector of strings -> int 0/1."""
    import fnmatch

    rx = re.compile(fnmatch.translate(str(pat)))

    def one(v):
        return int(rx.match(str(v)) is not None)

    if isinstance(s, (np.ndarray, list)):
        return np.array([one(v) for v in s], dtype=np.int64)
    return one(s)


def _loc_ss(s, sub):
    """kerf1/q ``ss`` (string search): start indices of every
    (possibly overlapping) occurrence of ``sub`` in ``s``."""
    s, sub = str(s), str(sub)
    if not sub:
        raise ArgsError("ss needs a non-empty needle")
    out, j = [], s.find(sub)
    while j != -1:
        out.append(j)
        j = s.find(sub, j + 1)
    return np.array(out, dtype=np.int64)


_BUILTINS: dict[str, tuple[Any, str | None]] = {
    # first-class error introspection (presented.h:386-389 A_ERROR
    # is_error()); the error VALUE itself comes from the try(...) form
    "is_error": (lambda x: int(isinstance(x, KerfErrorValue)), None),
    "abs": (lambda x: np.abs(_np(x)), "abs({0})"),
    "floor": (lambda x: np.floor(_np(x)), "floor({0})"),
    "ceil": (lambda x: np.ceil(_np(x)), "ceiling({0})"),
    "sqrt": (lambda x: np.sqrt(_np(x)), "sqrt({0})"),
    "exp": (lambda x: np.exp(_np(x)), "exp({0})"),
    "ln": (lambda x: np.log(_np(x)), "ln({0})"),
    "log": (lambda x: np.log(_np(x)), "ln({0})"),
    "round": (lambda x, n=0: np.round(_np(x), int(n)), "round({0}, {1})"),
    "pow": (lambda x, y: np.power(_np(x), _np(y)), "power({0}, {1})"),
    "sum": (lambda x: np.sum(_np(x)), "sum({0})"),
    "avg": (lambda x: np.mean(_np(x)), "avg({0})"),
    "mean": (lambda x: np.mean(_np(x)), "avg({0})"),
    "min": (lambda x: np.min(_np(x)), "min({0})"),
    "max": (lambda x: np.max(_np(x)), "max({0})"),
    # med/var/dev: population moments, the kerf1 stats verbs (the
    # table plane's var_pop/stddev_pop twins)
    "med": (lambda x: float(np.median(_np(x))), "median({0})"),
    "var": (lambda x: float(np.var(_np(x))), "var_pop({0})"),
    "dev": (lambda x: float(np.std(_np(x))), "stddev_pop({0})"),
    "mod": (lambda x, y: np.mod(_np(x), _np(y)), "pmod({0}, {1})"),
    "neg": (lambda x: -_np(x), "(-({0}))"),
    "signum": (lambda x: np.sign(_np(x)), "sign({0})"),
    "count": (_loc_count, "count({0})"),
    "len": (_loc_count, "length({0})"),
    "first": (lambda x: _np(x)[0], "first({0})"),
    "last": (lambda x: _np(x)[-1], "last({0})"),
    "reverse": (lambda x: _np(x)[::-1], "reverse({0})"),
    "distinct": (lambda x: np.unique(_np(x)), None),
    "unique": (lambda x: np.unique(_np(x)), None),
    "asc": (lambda x: np.sort(_np(x)), None),
    "desc": (lambda x: np.sort(_np(x))[::-1], None),
    "til": (lambda n: np.arange(int(n)), None),
    "range": (lambda n: np.arange(int(n)), None),
    "take": (lambda n, x: np.resize(_np(x), int(n)), None),  # cyclic take
    "drop": (lambda n, x: _np(x)[int(n):] if n >= 0 else _np(x)[: int(n)], None),
    "where": (lambda b: np.nonzero(_np(b))[0], None),
    "deltas": (lambda x: np.concatenate(([_np(x)[0]], np.diff(_np(x)))), None),
    "lower": (lambda s: s.lower(), "lower({0})"),
    "upper": (lambda s: s.upper(), "upper({0})"),
    "trim": (lambda s: s.strip(), "trim({0})"),
    "ifelse": (lambda c, a, b: a if _truthy(c) else b,
               "(CASE WHEN {0} THEN {1} ELSE {2} END)"),
    # kerf1 vector-structure verbs (VERDICT r7 next #4): the operators
    # existed (windows.grade, relational.transpose_vectors) — these are
    # their local-plane script spellings
    "cut": (_loc_cut, None),
    "rotate": (_loc_rotate, None),
    "bin": (_loc_bin, None),
    "flip": (_loc_flip, None),
    "grade_up": (_loc_grade_up, None),
    "grade_down": (_loc_grade_down, None),
    # kerf1/q uniform verbs (moving windows, shifts, fills) — local
    # spellings of operators.windows; q's expanding-head window rule
    "mavg": (_loc_moving(np.mean, needs_float=True), None),
    "msum": (_loc_moving(np.sum), None),
    "mmin": (_loc_moving(np.min), None),
    "mmax": (_loc_moving(np.max), None),
    "mcount": (
        _loc_moving(lambda w: np.count_nonzero(~np.isnan(
            w.astype(np.float64)))),
        None,
    ),
    "mdev": (_loc_moving(np.std, needs_float=True), None),
    # q/kerf1 uniform-verb batch #5: cumulative forms, ordered shifts,
    # ranking, and the two-vector moments (population cov, sample
    # scov, q's documented split)
    "sums": (lambda x: np.cumsum(_np(x)), None),
    "prds": (lambda x: np.cumprod(_np(x)), None),
    "avgs": (
        lambda x: np.cumsum(_np(x).astype(np.float64))
        / np.arange(1, len(_np(x)) + 1),
        None,
    ),
    "mins": (lambda x: np.minimum.accumulate(_np(x)), None),
    "maxs": (lambda x: np.maximum.accumulate(_np(x)), None),
    "differ": (_loc_differ, None),
    "xprev": (_loc_xprev, None),
    "rank": (_loc_rank, None),
    # q xrank: partition into n buckets by rank — floor(n*rank/count);
    # equal-size buckets (±1) whatever the value distribution
    "xrank": (
        lambda n, x: (int(n) * _loc_rank(x)) // len(_np(x)),
        None,
    ),
    "cov": (_loc_cov(False), "covar_pop({0}, {1})"),
    "scov": (_loc_cov(True), "covar_samp({0}, {1})"),
    "cor": (_loc_cor, "corr({0}, {1})"),
    "ema": (_loc_ema, None),
    "prev": (_loc_prev, None),
    "next": (_loc_next, None),
    "fills": (_loc_fills, None),
    "ratios": (_loc_ratios, None),
    # the distributed folio as a language value (presented.h:427-430)
    "folio": (_loc_folio, None),
    "folio_select": (_loc_folio_select, None),
    "folio_reshard": (_loc_folio_reshard, None),
    "folio_window": (_loc_folio_window, None),
    "folio_asof": (_loc_folio_asof, None),
    "folio_topk": (_loc_folio_topk, None),
    # kerf1 grouping / table-sort / string verbs (VERDICT r8 next #4)
    "group": (_loc_group, None),
    "xasc": (_loc_xsort(False), None),
    "xdesc": (_loc_xsort(True), None),
    # q table verbs batch #4 (VERDICT r9 next #5)
    "xkey": (_loc_xkey, None),
    "ij": (_loc_keyed_join("ij"), None),
    "lj": (_loc_keyed_join("lj"), None),
    "ej": (_loc_ej, None),
    "uj": (_loc_uj, None),
    "xcol": (_loc_xcol, None),
    "cols": (_loc_cols, None),
    "tmeta": (_loc_tmeta, None),
    "ungroup": (_loc_ungroup, None),
    "sv": (_loc_sv, None),
    "vs": (_loc_vs, None),
    "ssr": (_loc_ssr, "replace({0}, {1}, {2})"),
    "string": (lambda x: (
        np.array([str(v) for v in x], dtype=object)
        if isinstance(x, (np.ndarray, list)) else str(x)
    ), "cast({0} as string)"),
    "like": (_loc_like, None),  # glob alphabet (*?) != SQL LIKE (%_)
    "ss": (_loc_ss, None),
    # kerf1 set/list verbs (stable orders, k semantics)
    "union": (_loc_union, None),
    "intersect": (
        lambda x, y: _np(x)[np.isin(_np(x), _np(y))], None),
    "except": (
        lambda x, y: _np(x)[~np.isin(_np(x), _np(y))], None),
    "in": (
        lambda x, y: np.isin(_np(x), _np(y)).astype(np.int64),
        "({0} IN {1})",
    ),
    "within": (
        lambda x, lo, hi: (
            (_np(x) >= _np(lo)) & (_np(x) <= _np(hi))
        ).astype(np.int64),
        "({0} BETWEEN {1} AND {2})",
    ),
    "enlist": (_loc_enlist, None),
    "raze": (_loc_raze, None),
    # tick verbs, same floored-bucket semantics as functions/temporal.xbar
    # (pmod keeps pre-epoch stamps correct; np.mod floors identically)
    "xbar": (lambda x, w: _np(x) - np.mod(_np(x), w),
             "(CAST({0} AS BIGINT) - pmod(CAST({0} AS BIGINT), {1}))"),
    "wavg": (lambda w, x: float(np.sum(_np(w) * _np(x)) / np.sum(_np(w))),
             "(sum(({0}) * ({1})) / sum({0}))"),
    "wsum": (lambda w, x: float(np.sum(_np(w) * _np(x))),
             "sum(({0}) * ({1}))"),
    # table verbs (kerf/kdb aj and wj): DataFrame-plane only — the
    # script holds tables as first-class values, so `aj(t, q, "sym",
    # "ts")` routes straight to operators.asof (last key = time key)
    "aj": (lambda *a: _aj(*a), None),
    "wj": (lambda *a: _wj(*a), None),
    # deterministic rand twin (rng.h:7-46): counter-based md5 uniform,
    # identical on any layout / engine / plane — kerf's reproducible
    # seeded stream has no layout-stable Spark twin, so the language
    # exposes the counter construction (functions.scalars.rand_det)
    # concat (not concat_ws) so a NULL key draws NULL in every plane,
    # matching scalars.rand_det's documented contract
    "rand_det": (lambda s, x: _loc_rand_det(s, x),
                 "((cast(conv(substring(md5(concat("
                 "cast({0} as string), '#', cast({1} as string))), "
                 "1, 8), 16, 10) as double) + 1.0) / 4294967297.0)"),
}


def _loc_rand_det(seed, x):
    """Local-plane twin of scalars.rand_det: md5-counter uniform in
    (0,1) per element, matching the Column/SQL planes bit-for-bit for
    integer keys (local values render via str(int), the same text
    Spark's cast-to-string produces)."""
    import hashlib

    def one(v):
        key = f"{int(seed)}#{int(v)}".encode()
        h = hashlib.md5(key).hexdigest()
        return (int(h[:8], 16) + 1) / 4294967297.0

    arr = _np(x)
    if np.ndim(arr) == 0:
        return one(arr)
    return np.array([one(v) for v in arr])


def _table_verb_args(verb: str, args, n_tables: int = 2):
    from pyspark.sql import DataFrame as _DF

    if len(args) < n_tables + 1:
        raise ArityError(
            f"{verb} takes (left, right, key..., timecol) — got "
            f"{len(args)} args"
        )
    for t in args[:n_tables]:
        if not isinstance(t, _DF):
            raise KerfTypeError(
                f"{verb} operand is {type(t).__name__}, not a table"
            )
    keys = [str(k) for k in args[n_tables:]]
    return list(args[:n_tables]), keys


def _aj(*args):
    from ..operators.asof import asof_join

    (left, right), keys = _table_verb_args("aj", args)
    return asof_join(left, right, on=keys[-1], by=keys[:-1])


def _wj(*args):
    from ..operators.asof import window_join

    if len(args) < 5:
        raise ArityError("wj takes (left, right, lo_ns, hi_ns, key..., timecol)")
    try:
        lo, hi = int(args[2]), int(args[3])
    except (TypeError, ValueError):
        raise KerfTypeError(
            f"wj bounds must be integers, got {args[2]!r}, {args[3]!r}"
        ) from None
    left, right = args[0], args[1]
    (left, right), keys = _table_verb_args("wj", (left, right, *args[4:]))
    if hi < lo:
        raise ArgsError(f"wj bounds out of order: {lo} > {hi}")
    return window_join(
        left, right, on=keys[-1], lo_ns=lo, hi_ns=hi, by=keys[:-1],
        bucket_ns=max(hi - lo, 1),
    )


# ------------------------------------------------------------- parser

class _ExprParser:
    """Pratt parser over the token list for a single expression."""

    def __init__(self, src: str, toks: list[Tok], interp: "Interp", env: Env):
        self.src = src
        self.toks, self.i = toks, 0
        self.interp, self.env = interp, env

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise ParseError(
                f"expected {text or kind}, got {t.text!r} in kerf expression"
            )
        return t

    # precedence climbing: | < & < (=,!=) < (<,<=,>,>=) < (+,-) < (*,/,%)
    _LEVELS = [("|",), ("&",), ("=", "==", "!=", "<>"),
               ("<", "<=", ">", ">="), ("+", "-"), ("*", "/", "%")]

    def parse(self) -> Any:
        v = self._level(0)
        return v

    def _level(self, lv: int) -> Any:
        if lv == len(self._LEVELS):
            return self._unary()
        left = self._level(lv + 1)
        while (
            self.peek().kind == "verb"
            and self.peek().text in self._LEVELS[lv]
            # a verb followed by an adverb is a verb *reference* operand
            # (`x + - mapback v` stays (x + ((-) mapback v)))
            and self.toks[self.i + 1].kind != "adverb"
        ):
            op = self.next().text
            right = self._level(lv + 1)
            left = _bin(op, left, right)
        return left

    def _unary(self) -> Any:
        t = self.peek()
        if t.kind == "verb" and t.text in ("-", "!"):
            if self.toks[self.i + 1].kind == "adverb":
                return self._postfix(self._primary())
            self.next()
            return _unary(t.text, self._unary())
        return self._postfix(self._primary())

    def _postfix(self, v: Any) -> Any:
        while True:
            t = self.peek()
            if t.kind == "punct" and t.text == "(" and not isinstance(v, DataFrame):
                if not self._callable(v):
                    raise KerfTypeError(
                        f"value of type {type(v).__name__} is not callable"
                    )
                self.next()
                args = self._args(")")
                v = self.interp.call(v, args)
            elif t.kind == "punct" and t.text == "[":
                self.next()
                # bound-square brackets accept ';' separators too —
                # the k call convention f[x;y] the reference parses
                args = self._args_flex("]")
                if self._callable(v):
                    v = self.interp.call(v, args)  # f[x,y] / f[x;y]
                else:
                    v = self.interp.index(v, args)
            elif t.kind == "adverb":
                adv = self.next().text
                operand = self._unary()
                v = self.interp.adverb(adv, v, operand)
            else:
                return v

    @staticmethod
    def _callable(v: Any) -> bool:
        return isinstance(v, (KerfLambda, _Builtin, _VerbRef))

    def _args_flex(self, close: str) -> list[Any]:
        """Argument list accepting ';' (the amend separator the
        reference parses, parser.h:471-486) as well as ','."""
        args: list[Any] = []
        if self.peek().kind == "punct" and self.peek().text == close:
            self.next()
            return args
        while True:
            args.append(self._level(0))
            t = self.next()
            if t.kind == "punct" and t.text == close:
                return args
            if not (t.kind == "punct" and t.text in (",", ";")):
                raise ParseUnmatchedError(
                    f"expected ',', ';' or {close!r}, got {t.text!r}"
                )

    def _args(self, close: str) -> list[Any]:
        args: list[Any] = []
        if self.peek().kind == "punct" and self.peek().text == close:
            self.next()
            return args
        while True:
            args.append(self._level(0))
            t = self.next()
            if t.kind == "punct" and t.text == close:
                return args
            if not (t.kind == "punct" and t.text == ","):
                raise ParseUnmatchedError(
                    f"expected ',' or {close!r}, got {t.text!r}"
                )

    def _primary(self) -> Any:
        t = self.next()
        if t.kind == "num":
            v = self._number(t.text)
            # strand: consecutive number literals form a vector
            if self.peek().kind == "num":
                vals = [v]
                while self.peek().kind == "num":
                    vals.append(self._number(self.next().text))
                return np.array(vals)
            return v
        if t.kind == "str":
            return t.text
        if t.kind == "name":
            low = t.text.lower()
            if low in _RESERVED_LITS:
                return _RESERVED_LITS[low]
            if (
                low == "try"
                and not self.env.has(t.text)
                and self.peek().kind == "punct"
                and self.peek().text == "("
            ):
                return self._try_form()
            if (
                low == "eval"
                and not self.env.has(t.text)
                and self.peek().kind == "punct"
                and self.peek().text == "("
            ):
                # kerf1 eval: evaluate a SOURCE STRING in the current
                # environment (the un-protected sibling of try)
                self.next()
                args = self._args(")")
                if len(args) != 1 or not isinstance(args[0], str):
                    raise ArityError("eval takes one source string")
                return self.interp.eval_expr(args[0], self.env)
            if self.env.has(t.text):
                return self.env.get(t.text)
            if low in _BUILTINS:
                return _Builtin(low)
            raise ReferenceError_(f"undefined name: {t.text}")
        if t.kind == "verb":
            # prefix verb reference: `+ fold v`, `- mapback v`, `+(1,2)`
            nxt = self.peek()
            if nxt.kind == "adverb" or (
                nxt.kind == "punct" and nxt.text in "(["
            ):
                return _VerbRef(t.text)
            raise ParseError(
                f"verb {t.text!r} needs an adverb or argument list here"
            )
        if t.kind == "amend":
            self.expect("punct", "[")
            args = self._args_flex("]")
            if len(args) not in (3, 4):
                raise ArityError(
                    f"{t.text}[...] amend takes 3 or 4 arguments, got "
                    f"{len(args)}"
                )
            return self.interp.amend(t.text, args)
        if t.kind == "punct" and t.text == "(":
            v = self._level(0)
            self.expect("punct", ")")
            return v
        if t.kind == "punct" and t.text == "[":
            items = self._args("]")
            if items and all(isinstance(x, (int, float, np.integer, np.floating))
                             and not isinstance(x, bool) for x in items):
                return np.array(items)
            return items
        if t.kind == "punct" and t.text == "{":
            return self._brace(t.pos)
        if t.kind == "adverb" and t.text in ("mapleft", "mapright"):
            return _Builtin(t.text)  # call form: mapleft(f, xs, y)
        raise ParseError(f"unexpected token {t.text!r} in kerf expression")

    def _try_form(self) -> Any:
        """Protected eval (jump.h:144-198 taxonomy as VALUES): evaluate
        the parenthesized expression — or SQL statement — and on any
        failure yield a first-class :class:`KerfErrorValue` instead of
        unwinding, mirroring the reference's error slabs
        (presented.h:386-389).  The span is captured as raw source so
        an inner parse error is caught too, and a protected SQL
        statement's ANALYSIS failures (missing column/view) surface as
        values while unprotected statements still raise."""
        open_t = self.expect("punct", "(")
        end = _match_delim(self.src, open_t.pos, "(", ")")
        inner = self.src[open_t.pos + 1: end]
        while self.toks[self.i].kind != "eof" and self.toks[self.i].pos <= end:
            self.i += 1
        head = re.match(r"\s*([A-Za-z_]\w*)", inner)
        # pyspark's Python-side SQLQueryContextLogger dumps a multi-KB
        # ERROR blob for every analysis failure even when caught — for
        # a PROTECTED eval the failure is the expected result, so the
        # blob is pure noise; quiet it for the span of the evaluation
        import logging

        qlog = logging.getLogger("SQLQueryContextLogger")
        prev = qlog.level
        qlog.setLevel(logging.CRITICAL)
        try:
            if head and head.group(1).lower() in _SQL_STARTS:
                return self.interp.run_sql(inner.strip(), self.env)
            return self.interp.eval_expr(inner, self.env)
        except Exception as exc:
            return KerfErrorValue.from_exception(exc)
        finally:
            qlog.setLevel(prev)

    @staticmethod
    def _number(s: str):
        return float(s) if ("." in s or "e" in s or "E" in s) else int(s)

    def _brace(self, open_pos: int) -> Any:
        """`{` already consumed: lambda `{[x] ...}` or JSON map
        `{k: v, ...}` (kerf is a JSON superset; the brace group is
        TOKEN_GROUP_CURLY_BRACE, lexer.h:80).  The body is captured as a
        raw source span so lambda statements re-parse per call."""
        end = _match_delim(self.src, open_pos, "{", "}")
        body = self.src[open_pos + 1: end]
        # advance the token cursor past everything inside the braces
        while self.toks[self.i].kind != "eof" and self.toks[self.i].pos <= end:
            self.i += 1
        stripped = body.lstrip()
        if stripped.startswith("{"):
            # table literal {{col: 1 2 3, ...}} (kerf1's JSON-superset
            # table syntax; TABLE enums.h:261) -> a driver-built
            # DataFrame, usable as a temp view by later statements
            inner_open = open_pos + 1 + (len(body) - len(stripped))
            inner_end = _match_delim(self.src, inner_open, "{", "}")
            if self.src[inner_end + 1: end].strip():
                raise ParseError("trailing text inside table literal")
            cols = self.interp.eval_expr(
                self.src[inner_open: inner_end + 1], self.env
            )
            if not isinstance(cols, dict):
                raise KerfTypeError("table literal needs column: vector pairs")
            return self.interp.make_table(cols)
        if stripped.startswith("["):
            boff = open_pos + 1 + (len(body) - len(stripped))
            bend = _match_delim(self.src, boff, "[", "]")
            params = [
                p.strip()
                for p in self.src[boff + 1: bend].split(",")
                if p.strip()
            ]
            for p in params:
                if not re.fullmatch(r"[A-Za-z_]\w*", p):
                    raise ParseError(f"bad lambda parameter {p!r}")
            rest = self.src[bend + 1: end]
            return KerfLambda(params, split_statements(rest), self.env)
        # JSON map literal: `key: expr` pairs, keys are names or strings
        out: dict[str, Any] = {}
        if not stripped:
            return out
        for item in _depth_split(body, ","):
            m = re.match(r'\s*(?:([A-Za-z_]\w*)|"((?:\\.|[^"\\])*)")\s*:(.*)$',
                         item, re.DOTALL)
            if not m:
                raise ParseError(f"bad map entry {item.strip()!r}")
            key = m.group(1) if m.group(1) is not None else m.group(2)
            out[key] = self.interp.eval_expr(m.group(3), self.env)
        return out


class _Builtin:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


class _VerbRef:
    __slots__ = ("op",)

    def __init__(self, op: str):
        self.op = op


def _match_delim(src: str, open_i: int, op: str, cl: str) -> int:
    """Index of the delimiter matching ``src[open_i]``, skipping strings
    and comments."""
    depth, i, n = 0, open_i, len(src)
    while i < n:
        ch = src[i]
        if ch == '"':
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            i = j + 1
            continue
        if ch == "'":
            # single-quoted SQL literal ('' doubling AND Spark's
            # default backslash escapes): a ')' inside one must not
            # close the protected-eval span
            j = i + 1
            while j < n:
                if src[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if src[j] == "'":
                    if j + 1 < n and src[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise LexIncompleteError("unterminated /* comment")
            i = j + 2
            continue
        if ch == op:
            depth += 1
        elif ch == cl:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ParseIncompleteError(f"unmatched {op!r} in kerf source")


# -------------------------------------------------------- interpreter

_NAME_RE = re.compile(r"\b([A-Za-z_]\w*)\b")


def _string_mask(sql: str) -> list[bool]:
    """True at positions inside single-quoted SQL string literals."""
    mask = [False] * len(sql)
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            for k in range(i, min(j + 1, n)):
                mask[k] = True
            i = j + 1
        else:
            i += 1
    return mask
_SQL_KEYWORDS = frozenset(
    "select update insert upsert delete from where group by order limit "
    "asc desc on set values into and or not as in like between case when "
    "then else end is null distinct having join left right inner outer "
    "true false".split()
)


class Interp:
    """Statement executor.  One instance per script run."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ---- adverbs (adverbs.h:33-120; kerf1 words) ----
    def adverb(self, adv: str, f: Any, operand: Any) -> Any:
        call = lambda *a: self.call(f, list(a))  # noqa: E731
        if adv in ("mapdown", "each", "mapcores"):
            v = _np(operand)
            if not isinstance(v, np.ndarray) and not isinstance(v, list):
                return call(v)
            return np.array([call(x) for x in v])
        if adv == "fold":
            v = _np(operand)
            if len(v) == 0:
                raise ArgsError("fold over empty vector")
            acc = v[0]
            for x in v[1:]:
                acc = call(acc, x)
            return acc
        if adv == "unfold":
            v = _np(operand)
            out, acc = [], None
            for k, x in enumerate(v):
                acc = x if k == 0 else call(acc, x)
                out.append(acc)
            return np.array(out)
        if adv == "mapback":
            v = _np(operand)
            out = [v[0]] if len(v) else []
            for k in range(1, len(v)):
                out.append(call(v[k], v[k - 1]))
            return np.array(out)
        if adv in ("mapleft", "mapright"):
            raise ArgsError(
                f"{adv} needs both operands: use {adv}(f, xs, y)"
            )
        raise ParseError(f"unknown adverb {adv}")  # pragma: no cover

    # ---- calls ----
    def call(self, f: Any, args: list[Any]) -> Any:
        if isinstance(f, KerfLambda):
            return f(self, args)
        if isinstance(f, _VerbRef):
            if len(args) == 1:
                return _unary(f.op, args[0])
            if len(args) == 2:
                return _bin(f.op, args[0], args[1])
            raise ArityError(f"verb {f.op} takes 1 or 2 args")
        if isinstance(f, _Builtin):
            name = f.name
            if name in ("mapleft", "mapright"):
                # each with one bound arg (adverbs.h:44-46): mapleft
                # varies the left operand, mapright the right
                if len(args) != 3:
                    raise ArityError(f"{name}(f, xs, y) takes 3 args")
                g, a, b = args
                if name == "mapleft":
                    return np.array([self.call(g, [x, b]) for x in _np(a)])
                return np.array([self.call(g, [a, y]) for y in _np(b)])
            local, sqlfmt = _BUILTINS[name]
            if any(isinstance(a, SqlExpr) for a in args):
                if sqlfmt is None:
                    raise KerfTypeError(
                        f"{name} has no table-plane rendering"
                    )
                if name == "round" and len(args) == 1:
                    args = args + [0]
                texts = [
                    a.text if isinstance(a, SqlExpr) else _sql_lit(a)
                    for a in args
                ]
                return SqlExpr(sqlfmt.format(*texts))
            return local(*args)
        raise KerfTypeError(f"value of type {type(f).__name__} is not callable")

    # ---- table literal ----
    def make_table(self, cols: dict[str, Any]) -> DataFrame:
        """{{col: vector, ...}} -> DataFrame; scalar values broadcast to
        the table length (kerf conformability)."""
        import pandas as pd

        if not cols:
            raise ArgsError("empty table literal")
        n = max(
            (len(v) for v in cols.values() if isinstance(v, (np.ndarray, list))),
            default=1,
        )
        data = {}
        for k, v in cols.items():
            if isinstance(v, (np.ndarray, list)):
                if len(v) != n:
                    raise RankError(
                        f"table column {k} length {len(v)} != {n}"
                    )
                data[k] = np.asarray(v)
            else:
                data[k] = np.repeat(np.asarray(v), n)
        return self.spark.createDataFrame(pd.DataFrame(data))

    # ---- indexing ----
    def index(self, v: Any, idx: list[Any]) -> Any:
        if len(idx) != 1:
            raise RankError("kerf indexing takes one subscript")
        i = idx[0]
        if isinstance(v, KerfErrorValue):
            return v[i]  # "kind" / "message" fields of an error slab
        if isinstance(v, dict):
            return v[i]
        if isinstance(v, np.ndarray):
            if isinstance(i, np.ndarray):
                return v[i.astype(np.int64)]
            return v[int(i)].item() if np.isscalar(v[int(i)]) else v[int(i)]
        if isinstance(v, (list, str)):
            if isinstance(i, np.ndarray):
                return [v[int(k)] for k in i]
            return v[int(i)]
        raise KerfTypeError(f"cannot index {type(v).__name__}")

    # ---- functional amend (@[x;i;v] / .[x;p;v]) ----
    def amend(self, head: str, args: list[Any]) -> Any:
        """kerf1/k functional amend, COPY-ON-WRITE (the reference
        parses the bound-square forms, parser.h:471-486):

        * ``@[x; i; v]``       — shallow: positions/keys ``i`` replaced
          by ``v`` (``v`` vectorizes itemwise with vector ``i``);
        * ``@[x; i; f]``       — monadic: ``x[i] := f(x[i])``;
        * ``@[x; i; f; y]``    — dyadic: ``x[i] := f(x[i], y)``
          (``y`` itemwise with vector ``i``);
        * ``.[x; p; ...]``     — deep: same forms at nested path ``p``
          (a vector/list of successive subscripts).

        The input value is never mutated — amend returns a new value,
        kerf's COW discipline (concurrency-model.md:33-51)."""
        x, sel, f = args[0], args[1], args[2]
        y = args[3] if len(args) == 4 else _NOARG
        if head == "@":
            return self._amend_at(x, sel, f, y)
        path = list(_np(sel)) if isinstance(sel, (np.ndarray, list)) else [sel]
        return self._amend_deep(x, path, f, y)

    def _apply_amend(self, f: Any, old: Any, y: Any) -> Any:
        if isinstance(f, (KerfLambda, _Builtin, _VerbRef)):
            return self.call(f, [old] if y is _NOARG else [old, y])
        if y is not _NOARG:
            raise ArityError(
                "amend with a replacement VALUE takes 3 args; the "
                "4-arg form needs a function"
            )
        return f

    def _amend_at(self, x: Any, i: Any, f: Any, y: Any) -> Any:
        if isinstance(x, dict):
            out = dict(x)
            keys = (
                [k for k in i] if isinstance(i, (np.ndarray, list)) else [i]
            )
            many = isinstance(i, (np.ndarray, list))
            _amend_conform(y, len(keys), many, "replacement")
            if not self._callable_v(f):
                _amend_conform(f, len(keys), many, "replacement")
            for j, k in enumerate(keys):
                k = k.item() if isinstance(k, np.generic) else k
                yj = _amend_pick(y, j, many)
                fj = _amend_pick(f, j, many) if not self._callable_v(f) else f
                out[k] = self._apply_amend(fj, out.get(k), yj)
            return out
        v = _np(x)
        idxs = (
            _np(i).astype(np.int64).ravel()
            if isinstance(i, (np.ndarray, list))
            else np.array([int(i)])
        )
        many = isinstance(i, (np.ndarray, list))
        # a NEGATIVE index is a domain error in k/kerf amend (no
        # Python end-relative extension), and out-of-range is an
        # index error — both refused before any element is touched
        if len(idxs) and idxs.min() < 0:
            raise KerfIndexError(
                f"amend index {int(idxs.min())} is negative — k amend "
                f"takes nonnegative positions (domain error)"
            )
        if len(idxs) and idxs.max() >= len(v):
            raise KerfIndexError(
                f"amend index out of range for length {len(v)}"
            )
        _amend_conform(y, len(idxs), many, "replacement")
        if not self._callable_v(f):
            _amend_conform(f, len(idxs), many, "replacement")
        news = []
        for j, ix in enumerate(idxs):
            old = v[int(ix)]
            old = old.item() if isinstance(old, np.generic) else old
            yj = _amend_pick(y, j, many)
            fj = _amend_pick(f, j, many) if not self._callable_v(f) else f
            news.append(self._apply_amend(fj, old, yj))
        if not news:
            return v.copy()
        out = v.astype(np.result_type(v.dtype, np.asarray(news).dtype))
        for ix, nv in zip(idxs, news):
            out[int(ix)] = nv
        return out

    def _amend_deep(self, x: Any, path: list, f: Any, y: Any) -> Any:
        if not path:
            return self._apply_amend(f, x, y)
        k = path[0]
        k = k.item() if isinstance(k, np.generic) else k
        if isinstance(x, dict):
            out = dict(x)
            out[k] = self._amend_deep(x.get(k), path[1:], f, y)
            return out
        v = _np(x)
        ix = int(k)
        if ix < 0:
            raise KerfIndexError(
                f"amend path index {ix} is negative — k amend takes "
                f"nonnegative positions (domain error)"
            )
        if ix >= len(v):
            raise KerfIndexError(
                f"amend path index {ix} out of range for length {len(v)}"
            )
        old = v[ix]
        old = old.item() if isinstance(old, np.generic) else old
        nv = self._amend_deep(old, path[1:], f, y)
        if v.dtype == object:
            out = v.copy()
        else:
            out = v.astype(np.result_type(v.dtype, np.asarray(nv).dtype))
        out[ix] = nv
        return out

    @staticmethod
    def _callable_v(f: Any) -> bool:
        return isinstance(f, (KerfLambda, _Builtin, _VerbRef))

    # ---- table statements ----
    def _expand_lambdas(self, sql: str, env: Env) -> str:
        """Trace user-lambda calls inside a SQL statement to pure SQL
        expressions (repeatedly, so lambdas may call lambdas)."""
        for _ in range(32):
            mask = _string_mask(sql)
            m = None
            for cand in _NAME_RE.finditer(sql):
                name = cand.group(1)
                if mask[cand.start()]:
                    continue
                if env.has(name) and isinstance(env.get(name), KerfLambda):
                    after = sql[cand.end():].lstrip()
                    if after.startswith("("):
                        m = cand
                        break
            if m is None:
                return sql
            fn: KerfLambda = env.get(m.group(1))
            open_i = sql.index("(", m.end())
            depth, j = 1, open_i + 1
            while j < len(sql) and depth:
                if sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ParseUnmatchedError(f"unbalanced call of {m.group(1)}")
            raw_args = _split_sql_args(sql[open_i + 1: j - 1])
            traced = fn(self, [SqlExpr(f"({a.strip()})") for a in raw_args])
            text = traced.text if isinstance(traced, SqlExpr) else _sql_lit(traced)
            sql = sql[: m.start()] + text + sql[j:]
        raise ParseError("lambda expansion did not terminate")

    def _inline_vars(self, sql: str, env: Env) -> str:
        """Inline script variables referenced by a query as literals
        (kerf1 queries read local variables).  Env bindings shadow
        column names — the user chose the names.  DataFrame-valued
        variables stay symbolic (they are registered temp views)."""
        out, last = [], 0
        mask = _string_mask(sql)
        for m in _NAME_RE.finditer(sql):
            name = m.group(1)
            if mask[m.start()]:
                continue
            if name.lower() in _SQL_KEYWORDS or not env.has(name):
                continue
            v = env.get(name)
            if isinstance(v, (DataFrame, KerfLambda)):
                continue
            out.append(sql[last: m.start()])
            out.append(_sql_lit(v))
            last = m.end()
        out.append(sql[last:])
        return "".join(out)

    def run_sql(self, stmt: str, env: Env) -> DataFrame:
        stmt = self._expand_lambdas(stmt, env)
        stmt = self._inline_vars(stmt, env)
        return kerf_sql(self.spark, stmt)

    # ---- statements ----
    def eval_expr(self, src: str, env: Env) -> Any:
        p = _ExprParser(src, lex(src), self, env)
        v = p.parse()
        if p.peek().kind != "eof":
            raise ParseError(
                f"trailing tokens after expression: {p.peek().text!r}"
            )
        return v

    def exec_stmt(self, stmt: str, env: Env) -> Any:
        s = stmt.strip()
        if not s:
            return None
        head = re.match(r"[A-Za-z_]\w*", s)
        kw = head.group(0).lower() if head else ""

        if kw in _SQL_STARTS:
            return self.run_sql(s, env)

        if kw == "return":
            v = self.eval_expr(s[len("return"):].strip() or "null", env)
            env.returned = True
            env.return_value = v
            return v

        if kw in ("def", "function"):
            m = re.match(r"(?is)^(?:def|function)\s+([A-Za-z_]\w*)\s*"
                         r"[\(\[](.*?)[\)\]]\s*\{(.*)\}\s*$", s)
            if not m:
                raise ParseError(f"cannot parse function definition: {s!r}")
            name, params, body = m.groups()
            ps = [p.strip() for p in params.split(",") if p.strip()]
            env.assign(name, KerfLambda(ps, split_statements(body), env, name))
            return None

        if kw == "if":
            return self._exec_if(s, env)
        if kw == "while":
            cond, body, rest = _head_block(s, "while")
            if rest:
                raise ParseError(f"trailing text after while block: {rest!r}")
            guard = 0
            while _truthy(self.eval_expr(cond, env)):
                self._exec_block(body, env)
                if env.returned:
                    return env.return_value
                guard += 1
                if guard > 1_000_000:
                    raise ArgsError("while loop exceeded 1e6 iterations")
            return None
        if kw == "do":
            m = re.match(r"(?is)^do\s*\{(.*)\}\s*while\s*\((.*)\)\s*$", s)
            if not m:
                raise ParseError(f"cannot parse do-while: {s!r}")
            body, cond = m.groups()
            while True:
                self._exec_block(body, env)
                if env.returned:
                    return env.return_value
                if not _truthy(self.eval_expr(cond, env)):
                    return None
        if kw == "for":
            parts, body, rest = _head_block(s, "for")
            if rest:
                raise ParseError(f"trailing text after for block: {rest!r}")
            init, cond, step = (p.strip() for p in _split_semis(parts))
            if init:
                self.exec_stmt(init, env)
            while (not cond) or _truthy(self.eval_expr(cond, env)):
                self._exec_block(body, env)
                if env.returned:
                    return env.return_value
                if step:
                    self.exec_stmt(step, env)
            return None

        # assignment: `name: expr` / compound `name +: expr`
        m = re.match(r"^([A-Za-z_]\w*)\s*([-+*/%]?):(?!=)\s*(.+)$", s, re.DOTALL)
        if m and m.group(1).lower() not in _SQL_KEYWORDS:
            name, op, rhs = m.groups()
            rhead = re.match(r"[A-Za-z_]\w*", rhs.strip())
            if rhead and rhead.group(0).lower() in _SQL_STARTS:
                v = self.run_sql(rhs.strip(), env)
            else:
                v = self.eval_expr(rhs, env)
            if op:
                v = _bin(op, env.get(name), v)
            env.assign(name, v)
            if isinstance(v, DataFrame):
                v.createOrReplaceTempView(name)
            return v

        # indexed amend `name[i]: expr`
        m = re.match(r"^([A-Za-z_]\w*)\s*\[(.+?)\]\s*:(?!=)\s*(.+)$", s, re.DOTALL)
        if m:
            name, isrc, rhs = m.groups()
            tgt = env.get(name)
            i = self.eval_expr(isrc, env)
            v = self.eval_expr(rhs, env)
            if isinstance(tgt, dict):
                tgt[i] = v
            elif isinstance(tgt, np.ndarray):
                tgt[int(i)] = v
            elif isinstance(tgt, list):
                tgt[int(i)] = v
            else:
                raise KerfTypeError(f"cannot amend {type(tgt).__name__}")
            return v

        return self.eval_expr(s, env)

    def _exec_if(self, s: str, env: Env) -> Any:
        cond, body, rest = _head_block(s, "if")
        if _truthy(self.eval_expr(cond, env)):
            self._exec_block(body, env)
            return env.return_value if env.returned else None
        rest = rest.strip()
        if rest.lower().startswith("else"):
            rest = rest[4:].strip()
            if rest.lower().startswith("if"):
                return self._exec_if(rest, env)
            m = re.match(r"(?s)^\{(.*)\}\s*$", rest)
            if not m:
                raise ParseError(f"cannot parse else block: {rest!r}")
            self._exec_block(m.group(1), env)
            return env.return_value if env.returned else None
        if rest:
            raise ParseError(f"trailing text after if block: {rest!r}")
        return None

    def _exec_block(self, body: str, env: Env) -> None:
        for st in split_statements(body):
            self.exec_stmt(st, env)
            if env.returned:
                return


def _split_semis(parts: str) -> list[str]:
    out = _depth_split(parts, ";")
    if len(out) != 3:
        raise ParseError("for(init; cond; step) needs three clauses")
    return out


def _depth_split(text: str, sep: str) -> list[str]:
    out, cur, depth = [], [], 0
    for ch in text:
        if ch in _OPENS:
            depth += 1
        elif ch in _CLOSES:
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _split_sql_args(text: str) -> list[str]:
    return [a for a in _depth_split(text, ",")]


def _head_block(s: str, kw: str) -> tuple[str, str, str]:
    """Parse ``kw ( head ) { body } rest`` with balanced delimiters."""
    i = len(kw)
    while i < len(s) and s[i].isspace():
        i += 1
    if i >= len(s) or s[i] != "(":
        raise ParseError(f"{kw} needs a parenthesized head")
    depth, j = 1, i + 1
    while j < len(s) and depth:
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
        j += 1
    if depth:
        raise ParseUnmatchedError(f"unbalanced parens in {kw} head")
    head = s[i + 1: j - 1]
    k = j
    while k < len(s) and s[k].isspace():
        k += 1
    if k >= len(s) or s[k] != "{":
        raise ParseError(f"{kw} needs a braced body")
    depth, m = 1, k + 1
    while m < len(s) and depth:
        if s[m] == "{":
            depth += 1
        elif s[m] == "}":
            depth -= 1
        m += 1
    if depth:
        raise ParseUnmatchedError(f"unbalanced braces in {kw} body")
    return head, s[k + 1: m - 1], s[m:]


# --------------------------------------------------------------- API

def run(
    spark: SparkSession,
    source: str,
    tables: dict[str, DataFrame] | None = None,
    env: dict[str, Any] | None = None,
) -> Any:
    """Execute a kerf script; returns the last statement's value.

    ``tables`` are registered as temp views for the script's SQL
    statements; ``env`` seeds script variables.
    """
    interp = Interp(spark)
    root = Env()
    for name, value in (env or {}).items():
        root.set_local(name, value)
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
        root.set_local(name, df)
    ret = None
    for stmt in split_statements(source):
        ret = interp.exec_stmt(stmt, root)
    return ret


def run_df(
    spark: SparkSession,
    source: str,
    tables: dict[str, DataFrame] | None = None,
    env: dict[str, Any] | None = None,
) -> DataFrame:
    """`run` that requires the script to end in a table result."""
    v = run(spark, source, tables=tables, env=env)
    if not isinstance(v, DataFrame):
        raise KerfTypeError(
            f"script result is {type(v).__name__}, not a table"
        )
    return v
