"""Typed error taxonomy mirroring the reference's error kinds.

The reference catalogs ~50 error kinds and reports them by name
(jump.h:144-198: "Type error", "Length error", "Key mismatch error",
...), so a failure names the *semantic* contract that broke, not the
implementation detail that noticed.  This module gives the Spark engine
the same diagnosability: operator edges raise these instead of bare
``ValueError``/``TypeError``.

Each class carries ``kind`` — the reference's display string — so
messages render as ``Type error: <detail>`` exactly like the
reference's ``SHOW_ERROR_MESSAGES`` output.  Kinds tied to the C
runtime's own mechanics (VMEM, CTRL_C, DYLIB, forked verbs, ...) have
no Spark analogue and are intentionally unmapped: Spark's own
exceptions already name those faults.

Subclassing note: every class also inherits the closest Python builtin
(``ValueError``/``TypeError``/``KeyError``-family) so call sites that
caught builtins keep working — the taxonomy refines, never breaks.
"""

from __future__ import annotations


class KerfError(Exception):
    """Base of the kerf error taxonomy (jump.h:144-198)."""

    kind = "Inherited error"  # ERROR_SUBERROR: the catch-all parent

    def __init__(self, detail: str = ""):
        self.detail = detail
        super().__init__(f"{self.kind}: {detail}" if detail else self.kind)


# ----------------------------------------------------------------- data
class KerfTypeError(KerfError, TypeError):
    kind = "Type error"  # ERROR_OBJECTTYPE


class LengthError(KerfError, ValueError):
    kind = "Length error"  # ERROR_LENGTH: conformable lengths required


class SizeError(KerfError, ValueError):
    kind = "Size error"  # ERROR_SIZE


class SignError(KerfError, ValueError):
    kind = "Sign error"  # ERROR_SIGN: negative where nonnegative required


class RankError(KerfError, ValueError):
    kind = "Rank error"  # ERROR_RANK


class KerfIndexError(KerfError, IndexError):
    kind = "Index error"  # ERROR_INDEX


class ArityError(KerfError, TypeError):
    kind = "Arity error"  # ERROR_ARITY / ERROR_VALENCE


class ArgsError(KerfError, ValueError):
    kind = "Argument error"  # ERROR_ARGS


class ConformableError(KerfError, ValueError):
    kind = "Conformable error"  # ERROR_CONFORMABLE


class TimeError(KerfError, ValueError):
    kind = "Time error"  # ERROR_TIME: bad stamp/span literal or unit


class RadixError(KerfError, ValueError):
    kind = "Invalid radix error"  # ERROR_RADIX


class FormatStringError(KerfError, ValueError):
    kind = "Invalid format string error"  # ERROR_FORMAT_STRING


# ---------------------------------------------------------------- table
class KeysError(KerfError, ValueError):
    kind = "Key mismatch error"  # ERROR_KEYS: upsert/keyed-table keys


class ColumnError(KerfError, ValueError):
    kind = "Column error"  # ERROR_COLUMN: unknown/mismatched columns


class RowError(KerfError, ValueError):
    kind = "Row error"  # ERROR_ROW


class RaggedError(KerfError, ValueError):
    kind = "Ragged table error"  # ERROR_RAGGED


class TableError(KerfError, ValueError):
    kind = "Table error"  # ERROR_TABLE


class MapError(KerfError, ValueError):
    kind = "Map error"  # ERROR_MAP


class ReferenceError_(KerfError, NameError):
    kind = "Reference error"  # ERROR_REFERENCE / ERROR_VARIABLE


class DepthError(KerfError, RecursionError):
    kind = "Depth limit exceeded error"  # ERROR_DEPTH (jump.h:147)


# ---------------------------------------------------------------- parse
class ParseError(KerfError, ValueError):
    kind = "Unknown parse group error"  # ERROR_PARSE_UNKNOWN


class LexError(ParseError):
    kind = "Unknown token error"  # ERROR_LEX_UNKNOWN


class ParseIncompleteError(ParseError):
    kind = "Incomplete parse group error"  # ERROR_PARSE_INCOMPLETE


class ParseUnmatchedError(ParseError):
    kind = "Unmatched parse group error"  # ERROR_PARSE_UNMATCH


class SqlValuesError(ParseError):
    kind = "Malformed SQL INSERT syntax for VALUES error"  # ERROR_PARSE_SQL_VALUES


# ------------------------------------------------------------------ io
class FileError(KerfError, OSError):
    kind = "File error"  # ERROR_FILE


class DiskError(KerfError, OSError):
    kind = "Disk error"  # ERROR_DISK


class NetError(KerfError, OSError):
    kind = "Network error"  # ERROR_NET


class CappedAppendError(KerfError, ValueError):
    kind = "Capped append width exceeded error"  # ERROR_CAPPED_APPEND


class MissingFeatureError(KerfError, NotImplementedError):
    kind = "Missing feature error"  # ERROR_MISSING
