"""Plan linter: mechanical checks for the scale anti-patterns.

"Measure, don't guess" applied to plan shape: every anti-pattern here
either killed a real query in an earlier round (the 3-task
l_returnflag window behind rolling_window_stats, round 5) or is the
canonical Spark scale failure (cartesian products, row-at-a-time
Python UDFs).  `lint_plan` returns warning tags; the registry-wide
test (tests/test_plans_props.py) runs it over EVERY query with an
explicit allowlist, so a new query reintroducing one of these shapes
fails CI with the tag in the message.

Tags:

- ``cartesian-product``       CartesianProduct in the physical plan.
- ``nested-loop-join``        BroadcastNestedLoopJoin (theta-join fallback).
- ``python-row-udf``          BatchEvalPython — a row-at-a-time Python UDF
                              in the hot path (Arrow paths show as
                              ArrowEvalPython / mapInPandas instead).
- ``global-window``           a Window with an EMPTY partition spec: the
                              whole input funnels through ONE task.  For
                              bounded inputs (a per-bucket totals table,
                              a top-k result) this is fine — allowlist
                              it; for data-sized inputs use
                              windows.global_scan / chunked_moving.
- ``generator-filter-dup``    a Generate (explode) whose inferred filter
                              carries a ``lambdafunction`` body doing
                              per-element ``element_at`` re-indexing:
                              InferFiltersFromGenerate copies the WHOLE
                              interpreted generator expression into a
                              ``size(...) > 0`` filter that pushdown
                              then moves below the exchange onto the
                              scan — the generator body evaluates twice,
                              serially (the r13 leg-6 dsir/bigram
                              pathology: 16.1 s for 5k docs).  Rebuild
                              the generator over ``arrays_zip``/``slice``
                              so the per-element body is cheap.

NOT a tag: ``Exchange SinglePartition``.  It appears in every final
scalar aggregation (only partial-agg states cross it — idiomatic) —
measured over the registry it flags exactly the 1-row-result queries
and nothing else, so it carries no signal the tags above don't.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

#: A Window node in the OPTIMIZED LOGICAL plan prints only its
#: NON-EMPTY argument groups: `Window [exprs], [partitionSpec],
#: [orderSpec]` when both are present, `Window [exprs], [spec]` when
#: one is omitted, `Window [exprs]` when both are.  The one-group-
#: omitted case is ambiguous by position — but an ORDER spec always
#: carries ASC/DESC per column while a partition spec never does, so:
#: two separators -> partitioned; one separator whose group has
#: ASC/DESC -> ordered-but-UNPARTITIONED (global); one separator
#: without -> partitioned-but-unordered (fine); zero separators ->
#: neither (global).
_WINDOW_LINE = re.compile(r"Window \[.*\]$")
_ORDER_DIR = re.compile(r"\b(ASC|DESC)\b")


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def lint_plan(df: DataFrame) -> list[str]:
    """Return the sorted list of anti-pattern tags present in ``df``'s
    plan (empty list = clean)."""
    phys = _explain(df, "formatted")
    logical = _explain(df, "extended")
    tags = set()
    if "CartesianProduct" in phys:
        tags.add("cartesian-product")
    if "BroadcastNestedLoopJoin" in phys:
        tags.add("nested-loop-join")
    if "BatchEvalPython" in phys:
        tags.add("python-row-udf")
    # the InferFiltersFromGenerate double-eval (r13 leg 6): only when a
    # Generate is present AND some Filter condition re-evaluates a
    # lambdafunction body that re-indexes with element_at — the exact
    # duplicated-interpreted-generator signature (the cheap arrays_zip
    # rebuild still infers a lambdafunction filter, but without the
    # per-element element_at re-indexing)
    if "Generate" in phys:
        for line in phys.splitlines():
            ls = line.lstrip()
            if (
                ls.startswith("Condition")
                and "lambdafunction(" in ls
                and "element_at(" in ls
            ):
                tags.add("generator-filter-dup")
                break
    # inspect only the optimized-logical section of the extended output
    opt = logical.split("== Optimized Logical Plan ==")[-1]
    opt = opt.split("== Physical Plan ==")[0]
    for line in opt.splitlines():
        m = _WINDOW_LINE.search(line)
        if not m:
            continue
        seps = m.group(0).count("], [")
        if seps == 0:
            tags.add("global-window")
        elif seps == 1:
            last = m.group(0).rsplit("], [", 1)[1]
            if _ORDER_DIR.search(last):
                tags.add("global-window")
    return sorted(tags)
