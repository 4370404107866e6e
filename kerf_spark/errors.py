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


class LexIncompleteError(ParseIncompleteError):
    kind = "Incomplete token error"  # ERROR_LEX_INCOMPLETE: an open
    # string/comment still reading — "give me more input", which is
    # how the console's completeness check discriminates it from a
    # stray-closer mismatch (type-based, never message matching)


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


# ----------------------------------------------------- first-class value
class KerfErrorValue:
    """An error as a first-class VALUE, not a raised exception — the
    reference stores errors in slabs a script can hold and inspect
    (presented.h:386-389 ``A_ERROR { is_error() }``, slop.h:535-546),
    with the kind string drawn from the jump.h:144-198 catalogue.
    Produced by kerf_lang's protected-eval form ``try(...)``; scripts
    inspect it with ``is_error(e)`` / ``e["kind"]`` / ``e["message"]``.
    """

    __slots__ = ("kind", "message")

    def __init__(self, kind: str, message: str = ""):
        self.kind = kind
        self.message = message

    def __getitem__(self, key: str):
        if key in ("kind", "message"):
            return getattr(self, key)
        raise KerfIndexError(f"error value has no field {key!r}")

    def __repr__(self) -> str:  # SHOW_ERROR_MESSAGES rendering
        return (
            f"error: {self.kind}: {self.message}"
            if self.message
            else f"error: {self.kind}"
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, KerfErrorValue)
            and (self.kind, self.message) == (other.kind, other.message)
        )

    def __hash__(self) -> int:
        return hash((self.kind, self.message))

    @classmethod
    def from_exception(cls, exc: BaseException) -> "KerfErrorValue":
        """Map a raised exception into the taxonomy: KerfError carries
        its own kind; Spark analysis failures map to the closest table
        kinds (unresolved column -> Column error, missing view ->
        Table error); anything else is the reference's catch-all
        ERROR_SUBERROR ("Inherited error") with the Python class name
        preserved in the message."""
        if isinstance(exc, KerfError):
            return cls(exc.kind, exc.detail or "")
        msg = str(exc)
        if type(exc).__name__ == "AnalysisException":
            if "UNRESOLVED_COLUMN" in msg or "cannot resolve" in msg:
                return cls("Column error", msg)
            if "TABLE_OR_VIEW_NOT_FOUND" in msg:
                return cls("Table error", msg)
            return cls("Inherited error", msg)
        if isinstance(exc, ZeroDivisionError):
            return cls("Argument error", msg or "division by zero")
        if isinstance(exc, RecursionError):
            return cls("Depth limit exceeded error", msg)
        return cls("Inherited error", f"{type(exc).__name__}: {msg}")
