"""Whole-workspace persistence — the reference's Kerf-Tree save/load.

The reference round-trips the ENTIRE value tree, not just tables:
``file.h:34-36`` (``write_k_to_path`` / ``read_k_from_path``) accepts
any K object, and ``test.cc:825-900`` saves/loads nested structures
like ``SLOP(11, 22, 33, SLOP(44, 55, ...))`` and string/float/map
mixes.  :class:`sources.catalog.Workspace` already persists the named
DataFrames; this module extends the same root directory to the rest of
a console/script environment — scalars, vectors, maps, nested lists,
lambdas, error values — so a REPL session survives a restart
(``\\s DIR`` / ``\\l DIR`` in :mod:`kerf_spark.repl`).

Design, split by weight (the Spark-first re-expression of one on-disk
tree):

* **DataFrames** go through ``Workspace.save`` — executor-parallel
  parquet, the plane that scales to 100 TB.  The tree document only
  records the table NAME (``__tree__<var>`` for nested positions), so
  loading the tree defers every table to a lazy parquet scan.
* **Everything else** is a driver-local value by construction (console
  scalars, small vectors, lambda sources), serialized into ONE JSON
  document ``tree.json`` with explicit type tags.  Floats ride JSON's
  shortest-repr round-trip (bit-exact, NaN/Infinity included via the
  Python json dialect the module itself re-reads); numpy vectors
  record their dtype and rebuild exactly.
* **Lambdas serialize as SOURCE** (params + body statement texts) and
  are re-parsed into :class:`plans.kerf_lang.KerfLambda` at load — the
  reference's own trick (its tree writer stores the lambda's text and
  re-lexes on read).  Closures re-bind to the LOADED global env: a
  reloaded lambda sees the reloaded globals, exactly like a re-parsed
  reference lambda, not a dead session's stack frame.

The JSON write is atomic (tmp + ``os.replace``) so a crashed save
leaves the previous complete tree — the ``Workspace._flush``/sidecar
discipline.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from .catalog import Workspace

_TREE = "tree.json"
#: bump when the encoding changes; a mismatched tree fails loudly
FORMAT = 1


class _Enc:
    """One save pass: encodes values, parking DataFrames into the
    workspace under deterministic ``__tree__``-prefixed table names."""

    def __init__(self, ws: Workspace):
        self.ws = ws
        self.tables: list[str] = []

    def enc(self, v: Any, path: str) -> Any:
        from ..errors import KerfErrorValue
        from ..plans.kerf_lang import KerfLambda, _Builtin, _VerbRef

        if v is None:
            return {"k": "null"}
        if isinstance(v, np.generic):  # numpy scalar -> tagged python
            return {"k": "npscalar", "dtype": str(v.dtype),
                    "v": self.enc(v.item(), path)}
        if isinstance(v, bool):
            return {"k": "bool", "v": v}
        if isinstance(v, int):
            return {"k": "int", "v": v}
        if isinstance(v, float):
            # json round-trips the shortest repr to the same bits;
            # nan/inf ride the module's own non-strict dialect
            return {"k": "float", "v": v}
        if isinstance(v, str):
            return {"k": "str", "v": v}
        if isinstance(v, bytes):
            return {"k": "bytes", "v": v.hex()}
        if isinstance(v, DataFrame):
            name = f"__tree__{path}"
            self.ws.save(name, v)
            self.tables.append(name)
            return {"k": "table", "table": name}
        if isinstance(v, np.ndarray):
            if v.dtype == object:  # nested/jagged: recurse per element
                return {
                    "k": "vec_obj",
                    "v": [self.enc(x, f"{path}_{i}")
                          for i, x in enumerate(v.tolist())],
                }
            return {
                "k": "vec",
                "dtype": str(v.dtype),
                "v": [self.enc(x, path) for x in v.tolist()],
            }
        if isinstance(v, (list, tuple)):
            return {
                "k": "list",
                "v": [self.enc(x, f"{path}_{i}") for i, x in enumerate(v)],
            }
        if isinstance(v, dict):
            return {
                "k": "map",
                "v": [
                    [self.enc(k, f"{path}_k{i}"),
                     self.enc(x, f"{path}_v{i}")]
                    for i, (k, x) in enumerate(v.items())
                ],
            }
        if isinstance(v, KerfLambda):
            # source text, the reference's re-parse trick: body is
            # already a list of statement strings
            return {
                "k": "lambda",
                "name": v.name,
                "params": list(v.params),
                "body": list(v.body),
            }
        if isinstance(v, KerfErrorValue):
            return {"k": "error", "kind": v.kind, "message": v.message}
        if isinstance(v, _Builtin):
            return {"k": "builtin", "name": v.name}
        if isinstance(v, _VerbRef):
            return {"k": "verb", "op": v.op}
        raise TypeError(
            f"kerf tree cannot persist {type(v).__name__} at {path!r}"
        )


def save_tree(spark: SparkSession, root: str, env) -> dict:
    """Persist ``env``'s variables (the GLOBAL frame — the console's
    whole namespace) under ``root``: DataFrames as workspace tables,
    the rest as one typed JSON tree.  Returns the manifest-style
    summary ``{"vars": [...], "tables": [...]}``."""
    ws = Workspace(spark, root)
    e = _Enc(ws)
    doc = {
        "format": FORMAT,
        "vars": {
            name: e.enc(v, name) for name, v in sorted(env.vars.items())
        },
    }
    tmp = os.path.join(root, _TREE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, os.path.join(root, _TREE))
    return {"vars": sorted(env.vars), "tables": e.tables}


def _dec(node: Any, ws: Workspace, genv) -> Any:
    from ..errors import KerfErrorValue
    from ..plans.kerf_lang import KerfLambda, _Builtin, _VerbRef

    k = node["k"]
    if k == "null":
        return None
    if k in ("bool", "int", "float", "str"):
        return node["v"]
    if k == "bytes":
        return bytes.fromhex(node["v"])
    if k == "npscalar":
        return np.dtype(node["dtype"]).type(_dec(node["v"], ws, genv))
    if k == "table":
        return ws.load(node["table"])
    if k == "vec":
        return np.array(
            [_dec(x, ws, genv) for x in node["v"]],
            dtype=np.dtype(node["dtype"]),
        )
    if k == "vec_obj":
        items = [_dec(x, ws, genv) for x in node["v"]]
        out = np.empty(len(items), dtype=object)
        out[:] = items
        return out
    if k == "list":
        return [_dec(x, ws, genv) for x in node["v"]]
    if k == "map":
        return {
            _dec(kk, ws, genv): _dec(vv, ws, genv) for kk, vv in node["v"]
        }
    if k == "lambda":
        # re-bound to the LOADED global env (reference re-parse
        # semantics): closures see reloaded globals
        return KerfLambda(
            list(node["params"]), list(node["body"]), genv, node["name"]
        )
    if k == "error":
        return KerfErrorValue(node["kind"], node["message"])
    if k == "builtin":
        return _Builtin(node["name"])
    if k == "verb":
        return _VerbRef(node["op"])
    raise ValueError(f"unknown kerf tree node kind: {k!r}")


def load_tree(spark: SparkSession, root: str, env=None):
    """Load the tree saved at ``root`` into ``env`` (a fresh global
    :class:`plans.kerf_lang.Env` when omitted) and return it.  Tables
    come back as lazy parquet scans through the Workspace manifest
    (schema-at-read, so width promotions apply); lambdas re-parse
    against the returned env."""
    from ..plans.kerf_lang import Env

    p = os.path.join(root, _TREE)
    with open(p) as fh:
        doc = json.load(fh)
    if doc.get("format") != FORMAT:
        raise ValueError(
            f"kerf tree at {root} has format {doc.get('format')!r}; "
            f"this build reads format {FORMAT}"
        )
    ws = Workspace(spark, root)
    genv = env if env is not None else Env()
    for name, node in doc["vars"].items():
        genv.set_local(name, _dec(node, ws, genv))
    return genv


def has_tree(root: str) -> bool:
    """True when ``root`` holds a saved kerf tree (``tree.json``)."""
    return os.path.isfile(os.path.join(root, _TREE))
