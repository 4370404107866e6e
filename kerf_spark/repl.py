"""Interactive kerf console — the reference's primary entry point.

The reference runs a readline loop (main.cc:33-73): each line feeds the
console lexer, and only a *parenthetically complete* buffer
(lexer.h:620-631 — the paren stack is empty) is handed to the
interpreter; otherwise the prompt switches to a continuation prompt and
keeps reading.  This module is that loop over the Spark engine:

* completeness comes from the same depth/quote scanner scripts use
  (:func:`plans.kerf_lang.split_statements` raises the taxonomy's
  Incomplete/Unmatched kinds for still-open groups);
* state (variables, lambdas, temp views) persists across inputs in one
  :class:`plans.kerf_lang.Interp` + ``Env``, unlike the one-shot
  :func:`plans.kerf_lang.run`;
* results print kerf-style — tables as aligned columns with a dashed
  header rule (a BOUNDED ``limit(n+1)`` fetch, never a full collect),
  vectors space-joined, errors by their jump.h:144-198 kind string
  (``SHOW_ERROR_MESSAGES`` rendering).

Run it: ``python -m kerf_spark [--sf-dir DIR] [-e SCRIPT]``.
"""

from __future__ import annotations

import os
import sys
from typing import Any

from .errors import (
    KerfError,
    KerfErrorValue,
    ParseIncompleteError,
)

PROMPT = "kerf> "
CONTINUE_PROMPT = "    > "  # KERFCONTINUEPROMPT (main.cc:69-71)

#: rows shown for a table result before the "…" elision marker
TABLE_ROWS = 10


def source_complete(src: str) -> bool:
    """True when the buffered input forms a complete parse group —
    the reference's ``is_complete`` (lexer.h:620-631): no open
    paren/brace/bracket and no unterminated string.  Anything else
    wrong with the source still counts as complete: the evaluator is
    the one that should report it."""
    try:
        from .plans.kerf_lang import split_statements

        split_statements(src)
        return True
    except ParseIncompleteError:
        # open group OR open string/comment (LexIncompleteError is a
        # subclass): keep reading.  A stray closer raises the
        # Unmatched kind — complete-but-wrong, eval reports it.
        return False
    except Exception:
        return True


def format_table(df, n: int = TABLE_ROWS) -> str:
    """Kerf-style table rendering: left-aligned column names, a dashed
    rule, aligned rows, `…` when more rows exist.  Fetches ``n+1``
    rows only — printing never materializes an unbounded result."""
    rows = df.limit(n + 1).collect()
    more = len(rows) > n
    rows = rows[:n]
    cols = df.columns
    cells = [[_scalar_text(r[c]) for c in cols] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    out = [
        "  ".join(c.ljust(w) for c, w in zip(cols, widths)).rstrip(),
        "  ".join("-" * w for w in widths),
    ]
    for row in cells:
        out.append("  ".join(v.ljust(w) for v, w in zip(row, widths)).rstrip())
    if more:
        out.append("…")
    return "\n".join(out)


def _scalar_text(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def format_value(v: Any) -> str | None:
    """Render an evaluation result; None means print nothing (e.g.
    an assignment-less statement that returned no value)."""
    import numpy as np

    if v is None:
        return None
    try:  # DataFrame (duck-typed so pure-local sessions need no Spark)
        from pyspark.sql import DataFrame

        if isinstance(v, DataFrame):
            return format_table(v)
    except Exception:
        pass
    if isinstance(v, KerfErrorValue):
        return repr(v)
    if isinstance(v, np.ndarray):
        return " ".join(_scalar_text(x.item() if hasattr(x, "item") else x)
                        for x in v)
    if isinstance(v, np.generic):
        return _scalar_text(v.item())
    if isinstance(v, dict):
        inner = ", ".join(f"{k}: {_scalar_text(x)}" for k, x in v.items())
        return "{" + inner + "}"
    if isinstance(v, str):
        return f'"{v}"'
    return _scalar_text(v)


def format_error(exc: BaseException) -> str:
    """jump.h-taxonomy error display: KerfError prints its kind line
    verbatim (SHOW_ERROR_MESSAGES); Spark analysis errors shrink to
    their first line; everything else shows class + first line."""
    if isinstance(exc, KerfError):
        return str(exc)
    first = str(exc).strip().splitlines()[0] if str(exc).strip() else ""
    return f"{type(exc).__name__}: {first}"


class _LazySession:
    """Defers SparkSession creation until the interpreter actually
    touches it (spark.sql / createDataFrame), so console arithmetic
    stays JVM-free and instant."""

    def __init__(self, repl: "Repl"):
        self._repl = repl

    def __getattr__(self, name):
        return getattr(self._repl.spark, name)


class Repl:
    """One console session: persistent interpreter state + a lazily
    created SparkSession (pure-local arithmetic needs no JVM)."""

    def __init__(self, spark=None, sf_dir: str | None = None):
        from .plans.kerf_lang import Env

        self._spark = spark
        self._interp = None
        self.env = Env()
        self.sf_dir = sf_dir
        self.buffer: list[str] = []

    @property
    def spark(self):
        if self._spark is None:
            import logging

            from .session import get_spark

            self._spark = get_spark("kerf_repl")
            # console error display is the one-line taxonomy kind;
            # pyspark's multi-KB structured ERROR blob per analysis
            # failure would bury every typo under a page of JSON
            logging.getLogger("SQLQueryContextLogger").setLevel(
                logging.CRITICAL
            )
        return self._spark

    @property
    def interp(self):
        if self._interp is None:
            from .plans.kerf_lang import Interp

            # _LazySession: pure-local arithmetic/lambdas never start a
            # JVM; the first SQL statement or table literal does
            self._interp = Interp(_LazySession(self))
            if self.sf_dir:
                self.load_dir(self.sf_dir)
        return self._interp

    def load_dir(self, sf_dir: str) -> list[str]:
        """Open ``sf_dir`` into the session — the console analogue of
        the reference's workspace open.  A directory holding a saved
        kerf tree (``tree.json`` from ``\\s`` / ``sources.tree``)
        restores the WHOLE environment — scalars, vectors, maps,
        lambdas, tables (file.h:34-36 read_k_from_path semantics);
        otherwise every ``<name>.parquet`` registers as a temp view +
        script variable."""
        import glob

        from pyspark.sql import DataFrame

        from .sources.io import read_table
        from .sources.tree import has_tree, load_tree

        if has_tree(sf_dir):
            load_tree(self.spark, sf_dir, self.env)
            names = []
            for name, v in sorted(self.env.vars.items()):
                if isinstance(v, DataFrame):
                    v.createOrReplaceTempView(name)
                names.append(name)
            return names
        if os.path.exists(os.path.join(sf_dir, "workspace.json")):
            # a Workspace root: its named tables AND its derived
            # artifacts (attached rollups as finalized bars, matviews
            # as enriched rows) all register as views + variables — the
            # console sees the whole catalog, not just the base tables
            from .sources import matview as MV
            from .sources import rollup as RU
            from .sources.catalog import Workspace

            ws = Workspace(self.spark, sf_dir)
            names = []
            for t in ws.tables():
                df = ws.load(t)
                df.createOrReplaceTempView(t)
                self.env.set_local(t, df)
                names.append(t)
            for r in ws.rollups():
                df = RU.read_rollup(self.spark, ws.rollup_path(r))
                df.createOrReplaceTempView(r)
                self.env.set_local(r, df)
                names.append(r)
            for m in ws.matviews():
                df = MV.read_enrich_view(self.spark, ws.matview_path(m))
                df.createOrReplaceTempView(m)
                self.env.set_local(m, df)
                names.append(m)
            self.sf_dir = sf_dir
            return names
        names = sorted(
            os.path.basename(p)[:-8]
            for p in glob.glob(os.path.join(sf_dir, "*.parquet"))
        )
        for name in names:
            df = read_table(self.spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            self.env.set_local(name, df)
        self.sf_dir = sf_dir
        return names

    def save_workspace(self, root: str) -> list[str]:
        """Persist the whole session environment (the kerf tree) under
        ``root`` — ``\\s DIR``, the write_k_to_path analogue."""
        from .sources.tree import save_tree

        return save_tree(self.spark, root, self.env)["vars"]

    # ---- statement execution ----
    def eval_source(self, src: str) -> Any:
        from .plans.kerf_lang import split_statements

        ret = None
        interp = self.interp  # force session + table load first
        for stmt in split_statements(src):
            ret = interp.exec_stmt(stmt, self.env)
        return ret

    def handle_line(self, line: str, out=sys.stdout) -> bool:
        """Feed one input line; returns False when the session should
        exit.  Mirrors main.cc:33-73 line_handler: buffer until
        complete, then interpret and print."""
        stripped = line.strip()
        if not self.buffer and stripped in ("\\q", "exit", "quit"):
            return False
        if not self.buffer and stripped.startswith("\\l"):
            arg = stripped[2:].strip()
            try:
                names = self.load_dir(arg)
                print("loaded: " + " ".join(names), file=out)
            except Exception as exc:
                print(format_error(exc), file=out)
            return True
        if not self.buffer and stripped.startswith("\\s"):
            # \s DIR — save the whole session environment (scalars,
            # vectors, maps, lambdas, tables) as a kerf tree; \l DIR
            # restores it, lambdas re-parsed from source
            arg = stripped[2:].strip()
            try:
                names = self.save_workspace(arg)
                print("saved: " + " ".join(names), file=out)
            except Exception as exc:
                print(format_error(exc), file=out)
            return True
        if not self.buffer and stripped.startswith("\\e"):
            # \e <stmt> — show the Catalyst plan the statement compiles
            # to, the console's window into pushdown/pruning/codegen
            try:
                v = self.eval_source(stripped[2:].strip())
                from pyspark.sql import DataFrame

                if isinstance(v, DataFrame):
                    print(
                        v._sc._jvm.PythonSQLUtils.explainString(
                            v._jdf.queryExecution(), "formatted"
                        ).rstrip(),
                        file=out,
                    )
                else:
                    print(
                        "not a table expression (nothing to explain)",
                        file=out,
                    )
            except Exception as exc:
                print(format_error(exc), file=out)
            return True
        if not self.buffer and stripped.startswith("\\t"):
            # \t <stmt> — evaluate, FORCE execution (tables run to
            # completion via the noop sink), print wall time
            import time as _time

            try:
                t0 = _time.perf_counter()
                v = self.eval_source(stripped[2:].strip())
                from pyspark.sql import DataFrame

                if isinstance(v, DataFrame):
                    v.write.format("noop").mode("overwrite").save()
                dt = _time.perf_counter() - t0
                text = format_value(v)
                if text is not None:
                    print(text, file=out)
                print(f"elapsed: {dt:.4f}s", file=out)
            except Exception as exc:
                print(format_error(exc), file=out)
            return True
        self.buffer.append(line)
        src = "\n".join(self.buffer)
        if not source_complete(src):
            return True  # continuation prompt
        self.buffer = []
        if not src.strip():
            return True
        try:
            text = format_value(self.eval_source(src))
            if text is not None:
                print(text, file=out)
        except Exception as exc:
            print(format_error(exc), file=out)
        return True

    @property
    def prompt(self) -> str:
        return CONTINUE_PROMPT if self.buffer else PROMPT

    def completions(self, prefix: str) -> list[str]:
        """Tab-completion candidates: session variables (tables,
        lambdas, scalars), then builtins/keywords — the reference's
        rl_completion surface (main.cc:35).  Sorted, deduped."""
        from .plans.kerf_lang import (
            _BUILTINS, _KEYWORDS, _RESERVED_LITS, _SQL_STARTS,
        )

        names: set[str] = set()
        env = self.env
        while env is not None:
            names.update(env.vars)
            env = env.parent
        names.update(_BUILTINS)
        names.update(_KEYWORDS)
        names.update(_RESERVED_LITS)
        names.update(_SQL_STARTS)
        names.update(("try", "from", "group", "order", "where", "by"))
        return sorted(n for n in names if n.startswith(prefix))


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m kerf_spark",
        description="Interactive kerf console over the Spark engine.",
    )
    ap.add_argument(
        "--sf-dir",
        help="directory of <table>.parquet files to register at startup",
    )
    ap.add_argument(
        "-e", "--execute", metavar="SCRIPT",
        help="run one script string and exit (non-interactive)",
    )
    ap.add_argument(
        "--serve", metavar="PORT", type=int,
        help="serve the kerf IPC protocol on this TCP port instead of "
             "an interactive console (bus.h client/server surface)",
    )
    args = ap.parse_args(argv)

    repl = Repl(sf_dir=args.sf_dir)
    if args.serve is not None:
        from .server import KerfServer

        tables = {}
        if args.sf_dir:
            repl.load_dir(args.sf_dir)
            tables = dict(repl.env.vars)  # the loaded DataFrames
        srv = KerfServer(repl.spark, port=args.serve, tables=tables)
        host, port = srv.address
        print(f"kerf_spark server on {host}:{port}")
        srv.serve()
        return 0
    if args.execute is not None:
        try:
            text = format_value(repl.eval_source(args.execute))
            if text is not None:
                print(text)
            return 0
        except Exception as exc:
            print(format_error(exc), file=sys.stderr)
            return 1

    try:  # history + line editing + completion when the terminal has them
        import readline

        def _complete(text: str, state: int):
            cands = repl.completions(text)
            return cands[state] if state < len(cands) else None

        readline.set_completer(_complete)
        readline.set_completer_delims(" \t\n`~!@#$%^&*()-=+[{]}\\|;:'\",<>/?")
        readline.parse_and_bind("tab: complete")
    except Exception:
        pass
    print(
        "kerf_spark console — \\l DIR loads tables/workspace, \\s DIR "
        "saves the workspace, \\e STMT explains, \\t STMT times, \\q quits"
    )
    while True:
        try:
            line = input(repl.prompt)
        except EOFError:  # Ctrl-D: exit on a clean line (main.cc:38-42)
            print()
            return 0
        except KeyboardInterrupt:  # Ctrl-C at the prompt: drop buffer
            repl.buffer = []
            print()
            continue
        try:
            if not repl.handle_line(line):
                return 0
        except KeyboardInterrupt:
            # Ctrl-C MID-EVALUATION (a long collect): keep the session
            # — handle_line's own guard only catches Exception, and
            # losing all state to an interrupt would be worse than the
            # reference's behavior (ERROR_CTRL_C is a caught error
            # kind, jump.h:148).  Best-effort: also cancel the JVM-side
            # jobs the statement launched, so the cluster stops burning
            # (touch only an ALREADY-CREATED session — never start a
            # JVM to cancel nothing).  A py4j read interrupted mid-
            # response can still desynchronize the gateway; that risk
            # is inherent to interrupting py4j and is why the cancel
            # comes first.
            repl.buffer = []
            try:
                if repl._spark is not None:
                    repl._spark.sparkContext.cancelAllJobs()
            except Exception:
                pass
            print("\nCaught interrupt signal")
            continue


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
