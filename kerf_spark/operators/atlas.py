"""ATLAS document-store surface: schemaless JSON documents as columns.

The reference's ATLAS type (enums.h:262, error hook jump.h:190) is a
schemaless document collection living inside a column: documents carry
arbitrary nested fields, queries amend/update individual fields without
a declared schema, and appends tolerate schema drift (the table-level
promote-on-append discipline of layout.cc:726-934, applied at the
document level).

Spark-first design: a document is its JSON TEXT (one string column —
the same physical shape the events fixture's ``props`` uses), and the
schemaless operations are pure Column expressions over a
``map<string,string>`` decomposition:

* ``from_json(doc, "map<string,string>")`` keeps every field's RAW
  JSON fragment as its value — numbers stay ``69``, strings lose their
  quotes, nested objects/arrays keep their full JSON text.  No schema
  is declared anywhere; unknown fields flow through untouched.
* Setting/dropping a field rebuilds the entry list (filter + append)
  and re-serializes with a fragment-aware writer (JSON literals pass
  through raw; anything else is quoted/escaped), so field TYPES
  survive a round-trip — the bug ``to_json(map<string,string>)`` has
  (it quotes every value).
* Nested paths recurse the same set/drop through the enclosing
  fragments — fixed depth at plan time, still zero-shuffle column
  math.

Everything here is a narrow projection: at 100 TB these ops run at
scan speed with no exchange, and Catalyst prunes them like any other
expression.  Reads use the built-ins (``get_json_object`` /
``variant_get``) — only the WRITE path needs this module.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _quote(v: Column) -> Column:
    """JSON-escape and quote a plain string fragment.  Values without
    any escapable character (the common path) take a single concat;
    everything else routes through ``to_json`` of a one-field struct —
    Jackson escapes the FULL control range (U+0000–U+001F, not just the
    shorthand five), so strict parsers downstream never reject the
    fragment — and the quoted string is sliced back out of the
    ``{"v":…}`` wrapper (5-char prefix, 1-char suffix)."""
    js = F.to_json(F.struct(v.alias("v")))
    quoted = js.substr(F.lit(6), F.length(js) - F.lit(6))
    needs = v.rlike('[\\x00-\\x1f"\\\\]')
    # NULL stays NULL (to_json drops null fields, so the slice of
    # "{}" would otherwise manufacture an empty string)
    return F.when(v.isNull(), F.lit(None).cast("string")).when(
        ~needs, F.concat(F.lit('"'), v, F.lit('"'))
    ).otherwise(quoted)


def _frag(v: Column) -> Column:
    """Serialize one field value back into a JSON fragment.

    A value passes through RAW only when a real JSON parser accepts it
    (``try_parse_json`` — a shape regex like ``\\{.*\\}`` would wave
    through any brace-wrapped STRING such as ``{hello}`` and corrupt
    the whole document) and it carries no leading/trailing whitespace
    (``123\\n`` parses as a number with trailing whitespace, but the
    value was a string and must stay one).  Everything else is
    quoted/escaped.  CANONICALIZATION CAVEAT: the text-fragment
    representation cannot distinguish the JSON string "123" from the
    number 123 after a parse (both decompose to the text ``123``), so
    a round-trip canonicalizes literal-shaped strings to their literal
    type — kerf-style weak typing at the document boundary."""
    # two-layer check, both required:
    # 1. full-shape anchor (\A..\z, dotall for nested bodies): rejects
    #    trailing garbage the lenient variant parser accepts — Spark's
    #    try_parse_json('""0') parses the leading "" and ignores the
    #    rest (hypothesis-found), and '$' alone matches before a
    #    trailing newline;
    # 2. try_parse_json: rejects shape-matching NON-JSON like '{hello}'
    #    that the anchor's \{.*\} arm cannot.
    # The first-char class in the anchor doubles as a cheap prefilter:
    # plain words fail it without reaching the variant parse.
    shape = (
        r'(?s)\A("(\\.|[^"\\])*"'
        r"|-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?"
        r"|true|false|null|\{.*\}|\[.*\])\z"
    )
    is_literal = v.rlike(shape) & F.try_parse_json(v).isNotNull()
    return (
        F.when(v.isNull(), F.lit("null"))
        .when(is_literal, v)
        .otherwise(_quote(v))
    )


#: Characters with JSONPath meaning: a nested path component containing
#: them would make ``get_json_object`` navigate somewhere else entirely
#: (``"a.b"`` would look up key a then b).  TOP-level set/drop filters
#: map entries by exact key and accepts any key; only the nested
#: navigation is restricted.
_PATH_UNSAFE = re.compile(r"[.\[\]*'\"$]")


def _check_path_component(key: str) -> None:
    if _PATH_UNSAFE.search(key):
        raise ValueError(
            f"doc path component {key!r} contains JSONPath "
            "metacharacters (. [ ] * ' \" $) — nested navigation would "
            "target the wrong field.  Restructure the path, or operate "
            "on the extracted sub-document with top-level ops (which "
            "accept any key)."
        )


def _parse(doc: Column) -> Column:
    """ONE from_json per document — every consumer below derives from
    the same map expression, so Spark's subexpression elimination can
    share the parse within a projection (repeated independent parses
    were the dominant cost of a doc_set chain)."""
    return F.from_json(doc, "map<string,string>")


def doc_entries(doc: Column | str) -> Column:
    """Schemaless decomposition: array<struct<key,value>> of the
    document's top-level fields, values as raw JSON fragments."""
    return F.map_entries(_parse(_c(doc)))


def doc_keys(doc: Column | str) -> Column:
    """Top-level field names, document order."""
    return F.transform(doc_entries(doc), lambda e: e["key"])


def doc_serialize(entries: Column) -> Column:
    """Entries array -> canonical JSON object text (no whitespace,
    document order preserved)."""
    parts = F.transform(
        entries,
        lambda e: F.concat(_quote(e["key"]), F.lit(":"), _frag(e["value"])),
    )
    return F.concat(F.lit("{"), F.array_join(parts, ","), F.lit("}"))


def _set_top_m(m: Column, key: str, frag: Column) -> Column:
    """Set/overwrite one top-level field of a PARSED map: filter the
    old entry out, append the new one (RFC 7386 merge-patch puts new
    keys last)."""
    kept = F.filter(F.map_entries(m), lambda e: e["key"] != F.lit(key))
    entry = F.struct(F.lit(key).alias("key"), frag.alias("value"))
    return doc_serialize(F.concat(kept, F.array(entry)))


def _set_top_dm(d: Column, m: Column, key: str, frag: Column) -> Column:
    """Top-level set with the APPEND fast path: when the key is absent
    (the dominant feed-adds-a-field case) the new field splices into
    the original text — two regexes and a concat, no per-entry
    higher-order rebuild, and existing field text is preserved
    verbatim.  Only an overwrite of an EXISTING key pays the full
    decompose/re-serialize.  A malformed document yields NULL (the
    rebuild path's behavior)."""
    import json as _json

    dt = F.trim(d)
    has_fields = ~dt.rlike(r"\A\{\s*\}\z")
    fast = F.concat(
        F.regexp_replace(dt, r"\}\z", ""),
        F.when(has_fields, F.lit(",")).otherwise(F.lit("")),
        F.lit(_json.dumps(key) + ":"),
        _frag(frag),
        F.lit("}"),
    )
    return (
        F.when(m.isNull(), F.lit(None).cast("string"))
        .when(F.map_contains_key(m, F.lit(key)), _set_top_m(m, key, frag))
        .otherwise(fast)
    )


def _drop_top(doc: Column, key: str) -> Column:
    kept = F.filter(doc_entries(doc), lambda e: e["key"] != F.lit(key))
    return doc_serialize(kept)


def doc_set(doc: Column | str, path: str | list[str], frag: Column | str) -> Column:
    """Amend one field of a schemaless JSON document — ``path`` may be
    nested (``["cust", "tier"]``); missing intermediate objects are
    created, sibling fields survive untouched.  ``frag`` is the new
    value as a JSON fragment Column (``F.lit('"pro"')``, a number cast
    to string, a whole object's text) or a plain string treated as a
    literal fragment.

    The nested case recurses through the enclosing fragment: the
    sub-document comes off the SAME parsed map the rebuild uses
    (``element_at`` — never a second ``get_json_object`` parse), gets
    set within, and the rebuilt text splices back — all Column
    expressions with the recursion unrolled at plan-build time.

    SCALE NOTE: when CHAINING several doc_sets over the same column,
    stage each through its own projection (``.select(...).alias``) —
    nested Column composition re-evaluates the inner amend once per
    reference (no CSE across the expression boundary), ~3^depth
    document parses."""
    d = _c(doc)
    if isinstance(frag, str):
        frag = F.lit(frag)
    parts = [path] if isinstance(path, str) else list(path)
    if not parts:
        raise ValueError("doc_set: empty path")
    head, rest = parts[0], parts[1:]
    m = _parse(d)
    if not rest:
        return _set_top_dm(d, m, head, frag)
    _check_path_component(head)
    # a map-parsed fragment is well-formed JSON text: a '{' prefix IS
    # an object (no need for the full-shape regex, which also broke on
    # embedded newlines)
    sub = F.element_at(m, F.lit(head))
    sub_obj = F.when(sub.rlike(r"\A\{"), sub).otherwise(F.lit("{}"))
    rebuilt = doc_set(sub_obj, rest, frag)
    return _set_top_dm(d, m, head, rebuilt)


def doc_drop(doc: Column | str, path: str | list[str]) -> Column:
    """Delete one (possibly nested) field; a missing path is a no-op,
    siblings survive.  Same staging advice as :func:`doc_set` for
    chains."""
    d = _c(doc)
    parts = [path] if isinstance(path, str) else list(path)
    if not parts:
        raise ValueError("doc_drop: empty path")
    head, rest = parts[0], parts[1:]
    if not rest:
        return _drop_top(d, head)
    _check_path_component(head)
    m = _parse(d)
    sub = F.element_at(m, F.lit(head))
    is_obj = sub.rlike(r"\A\{")
    rebuilt = doc_drop(F.when(is_obj, sub).otherwise(F.lit("{}")), rest)
    # only splice back when the intermediate existed as an object —
    # dropping inside a missing subtree must not create it
    return F.when(is_obj, _set_top_m(m, head, rebuilt)).otherwise(d)


def doc_rename(doc: Column | str, old: str, new: str) -> Column:
    """Rename a top-level field IN PLACE (document order preserved —
    unlike drop+set, which would move the field to the end).  A missing
    ``old`` is a no-op; an existing ``new`` is replaced by the renamed
    field (last-wins, the kerf map-amend convention)."""
    d = _c(doc)
    if old == new:
        # rename-to-self is a no-op — without this the key != new
        # pre-filter would drop the field before the rename saw it
        return d
    m = _parse(d)
    entries = F.filter(
        F.map_entries(m), lambda e: e["key"] != F.lit(new)
    )
    renamed = F.transform(
        entries,
        lambda e: F.struct(
            F.when(e["key"] == F.lit(old), F.lit(new))
            .otherwise(e["key"])
            .alias("key"),
            e["value"].alias("value"),
        ),
    )
    has_old = F.map_contains_key(m, F.lit(old))
    return F.when(has_old, doc_serialize(renamed)).otherwise(d)


#: Comparison verbs doc_find accepts — plain Column operators, so every
#: predicate stays a Catalyst expression (codegen'd, pushdown-eligible).
_FIND_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def doc_find(df: DataFrame, doc_col: str, preds) -> DataFrame:
    """Collection find over schemaless documents — the ATLAS query
    surface (enums.h:262's document tables are SELECTed like columns;
    here the schema lives inside the document, the predicate reaches
    in).  ``preds`` is a list of ``(path, cast_type, op, value)``:
    dotted nested path, an optional Spark cast type for typed
    comparison (``None`` compares extracted text), an operator from
    ``= != < <= > >=``, and the literal.  All predicates AND together.

    A missing field extracts as NULL and fails every comparison —
    total over schema drift (a feed that hasn't added the field yet
    simply doesn't match), no declared schema anywhere.

    Scale shape: pure filter over a scan — conjunctive predicates on
    extracted fields, zero shuffle, evaluated inside the scan's
    projection.  JSON parsing is the only cost; for a find-heavy
    workload, extract hot fields once into real columns (the
    document-store "computed index" move) and let parquet stats prune.
    """
    cond = F.lit(True)
    for path, typ, op, value in preds:
        if op not in _FIND_OPS:
            raise ValueError(
                f"doc_find: unknown op {op!r} (use one of "
                f"{sorted(_FIND_OPS)})"
            )
        for part in path.split("."):
            _check_path_component(part)
        col = F.get_json_object(_c(doc_col), "$." + path)
        if typ is not None:
            col = col.cast(typ)
        cond = cond & _FIND_OPS[op](col, F.lit(value))
    return df.where(cond)


def round_half_up(v: float, digits: int = 0) -> float:
    """Python twin of ``F.round`` for use INSIDE doc-amend kernels:
    half-away-from-zero over the double's shortest decimal repr —
    exactly Spark's ``BigDecimal.valueOf(double).setScale(d, HALF_UP)``
    and the convention DuckDB oracles see on dyadic ties.  Python's
    builtin ``round`` is half-to-EVEN (round(0.0625, 3) = 0.062 where
    F.round and the oracle give 0.063) — never use it in a kernel
    whose output an oracle extracts."""
    import decimal

    q = decimal.Decimal(1).scaleb(-digits)
    d = decimal.Decimal(repr(float(v))).quantize(
        q, rounding=decimal.ROUND_HALF_UP
    )
    return float(d)


def doc_amend_udf(edit):
    """Factory for BULK document amends: an Arrow-batched kernel that
    parses each document once, applies ``edit(doc_dict, *vals) ->
    doc_dict`` in Python, and re-serializes compactly.

    WHY A UDF when the engine's rule is 'UDFs are the slow path':
    measured, not guessed (adverbs.h:215).  A chain of three
    expression-level doc_sets costs ~4.5 ms of core time PER ROW at
    sf0.1 — higher-order functions (filter/transform lambdas) evaluate
    interpreted outside whole-stage codegen, and repeated references
    re-evaluate whole subtrees (no CSE across expression boundaries) —
    where this Arrow batch does the same work in ~2 µs/row (python
    json parse + patch + dump).  The rule inverts for document-rebuild
    workloads; the Column-level :func:`doc_set`/:func:`doc_drop` stay
    the semantic reference (single amends, tests, oracles).

    ``edit`` receives the parsed dict (never None — malformed or
    non-object documents yield NULL without calling it) and the
    row's extra column values; it may mutate and return the dict.
    Keys are emitted in dict order (insertion order — matching
    doc_set's append-last convention).  Floats/ints must be Python
    natives in the returned dict (cast numpy scalars)."""

    def _run(doc, vals):
        import json

        outs = []
        for row in zip(doc, *vals):
            p = row[0]
            d = None
            if p is not None:
                try:
                    parsed = json.loads(p)
                    if isinstance(parsed, dict):
                        d = parsed
                except ValueError:
                    d = None
            if d is None:
                outs.append(None)
                continue
            r = edit(d, *row[1:])
            outs.append(
                None if r is None else json.dumps(r, separators=(",", ":"))
            )
        return pd.Series(outs, dtype=object)

    # pandas_udf rejects *args signatures — fixed arities up to 4
    # extra columns (raise loudly past that rather than degrade)
    @F.pandas_udf("string")
    def k0(doc: pd.Series) -> pd.Series:
        return _run(doc, ())

    @F.pandas_udf("string")
    def k1(doc: pd.Series, a: pd.Series) -> pd.Series:
        return _run(doc, (a,))

    @F.pandas_udf("string")
    def k2(doc: pd.Series, a: pd.Series, b: pd.Series) -> pd.Series:
        return _run(doc, (a, b))

    @F.pandas_udf("string")
    def k3(doc: pd.Series, a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
        return _run(doc, (a, b, c))

    @F.pandas_udf("string")
    def k4(
        doc: pd.Series, a: pd.Series, b: pd.Series, c: pd.Series,
        e: pd.Series,
    ) -> pd.Series:
        return _run(doc, (a, b, c, e))

    by_arity = {1: k0, 2: k1, 3: k2, 4: k3, 5: k4}

    def call(*cols):
        if len(cols) not in by_arity:
            raise ValueError(
                f"doc_amend_udf supports 0-4 extra columns, got {len(cols) - 1}"
            )
        return by_arity[len(cols)](*cols)

    return call


def doc_amend_project_udf(edit, projections: dict):
    """:func:`doc_amend_udf`'s fused READ-BACK twin: parse each
    document once, apply ``edit``, and emit PROJECTED values straight
    from the edited dict as a struct — for amend-then-extract chains
    where the caller never keeps the document text.  Skipping the
    re-serialize (json.dumps per row) and the downstream
    ``get_json_object`` re-parses (one JVM JSON parse per extracted
    field) halves the amend kernel and removes the whole extraction
    stage (measured ~0.7 s of atlas_nested_update's cost at sf0.1).

    ``projections`` maps field name -> (spark type DDL, fn(dict) ->
    value); values must be Python natives, exactly as a JSON
    round-trip would yield them (json.dumps(repr) -> JVM parse is the
    identity for finite floats/ints/strings, so emitting the dict
    value directly is bitwise-identical to extracting it from the
    rebuilt text).  Malformed / non-object / NULL documents yield a
    NULL struct — matching get_json_object's NULL on the same rows."""
    names = list(projections)
    schema = ", ".join(f"{n} {t}" for n, (t, _) in projections.items())

    def _run(doc, vals) -> pd.DataFrame:
        import json

        rows = []
        for row in zip(doc, *vals):
            p = row[0]
            d = None
            if p is not None:
                try:
                    parsed = json.loads(p)
                    if isinstance(parsed, dict):
                        d = parsed
                except ValueError:
                    d = None
            if d is not None:
                d = edit(d, *row[1:])
            if d is None:
                rows.append((None,) * len(names))
            else:
                rows.append(
                    tuple(fn(d) for _, fn in projections.values())
                )
        return pd.DataFrame(rows, columns=names, dtype=object)

    @F.pandas_udf(f"struct<{schema}>")
    def p1(doc: pd.Series, a: pd.Series) -> pd.DataFrame:
        return _run(doc, (a,))

    @F.pandas_udf(f"struct<{schema}>")
    def p0(doc: pd.Series) -> pd.DataFrame:
        return _run(doc, ())

    @F.pandas_udf(f"struct<{schema}>")
    def p2(doc: pd.Series, a: pd.Series, b: pd.Series) -> pd.DataFrame:
        return _run(doc, (a, b))

    by_arity = {1: p0, 2: p1, 3: p2}

    def call(*cols):
        if len(cols) not in by_arity:
            raise ValueError(
                f"doc_amend_project_udf supports 0-2 extra columns, "
                f"got {len(cols) - 1}"
            )
        return by_arity[len(cols)](*cols)

    return call


# ------------------------------------------------------- schema profile
#: Fragment-text type inference, shared with the SQL oracle (both
#: engines regex the same fragment text, so the profile is
#: engine-portable by construction).
_TYPE_INT = r"^-?(0|[1-9][0-9]*)$"
_TYPE_DOUBLE = r"^-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?$"
_TYPE_BOOL = r"^(true|false)$"


def frag_type(v: Column) -> Column:
    """Type tag of one JSON fragment: bigint / double / boolean /
    object / array / null / varchar."""
    return (
        F.when(v.isNull() | (v == "null"), F.lit("null"))
        .when(v.rlike(_TYPE_INT), F.lit("bigint"))
        .when(v.rlike(_TYPE_DOUBLE), F.lit("double"))
        .when(v.rlike(_TYPE_BOOL), F.lit("boolean"))
        .when(v.rlike(r"^\{.*\}$"), F.lit("object"))
        .when(v.rlike(r"^\[.*\]$"), F.lit("array"))
        .otherwise(F.lit("varchar"))
    )


def _promoted(types_array: Column) -> Column:
    """Promotion over a set of type tags: the lattice
    ``bigint < double < varchar``; boolean/object/array promote to
    varchar when mixed with anything else; null never demotes."""
    nonnull = F.array_remove(types_array, "null")
    return (
        F.when(F.size(nonnull) == 0, F.lit("null"))
        .when(F.size(nonnull) == 1, F.element_at(nonnull, 1))
        .when(
            F.size(
                F.array_except(
                    nonnull, F.array(F.lit("bigint"), F.lit("double"))
                )
            )
            == 0,
            F.lit("double"),
        )
        .otherwise(F.lit("varchar"))
    )


def schema_profile_partial(df: DataFrame, doc_col: str) -> DataFrame:
    """Mergeable per-key profile state: (key, n_docs, n_null, types
    set).  Counts add and type sets union across partials, so the
    profile accumulates across appends / stream micro-batches exactly
    like any partial aggregate — the streaming twin writes one partial
    per micro-batch and :func:`merge_schema_profiles` folds them."""
    e = df.select(F.explode(doc_entries(doc_col)).alias("e")).select(
        F.col("e.key").alias("key"), frag_type(F.col("e.value")).alias("t")
    )
    return e.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("t") == "null", 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.collect_set("t").alias("types"),
    )


def merge_schema_profiles(parts: DataFrame) -> DataFrame:
    """Fold partial profiles into the final (key, n_docs, n_null,
    promoted_type) profile — counts sum, type sets union, promotion
    applied once over the union."""
    merged = parts.groupBy("key").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_null").cast("long").alias("n_null"),
        F.array_distinct(F.flatten(F.collect_list("types"))).alias("__ts"),
    )
    return merged.select(
        "key", "n_docs", "n_null", _promoted(F.col("__ts")).alias("promoted_type")
    )


def schema_profile(df: DataFrame, doc_col: str) -> DataFrame:
    """Document-level promote-on-append: per top-level key, how many
    docs carry it and the PROMOTED type across them — the lattice
    ``bigint < double < varchar`` (layout.cc:726-934 applies this when
    appending tables; ATLAS applies it when a feed adds or retypes a
    field).  boolean/object/array/null promote to varchar when mixed
    with anything else; null never demotes a typed field.

    One explode + one keyed partial-agg shuffle on (key) — the profile
    is vocabulary-sized, never corpus-sized.  Built on the mergeable
    partial/merge pair so the batch and streaming paths cannot drift."""
    return merge_schema_profiles(schema_profile_partial(df, doc_col))
