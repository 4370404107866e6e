"""Nanosecond-native temporal functions (kerf STAMP/SPAN lattice).

The reference's temporal type system is a 9x9 lattice of stamp and span
granularities with a *nanosecond* base unit (enums.h:166-223; the
stamp/span arithmetic table is verbs.cc:145-187).  Spark timestamps are
microsecond-only, so the engine-wide convention is:

    ts_ns : LongType — epoch nanoseconds (kerf STAMP_NANOSECONDS)
    span_ns : LongType — signed duration in nanoseconds (kerf SPAN_*)
    span_months : IntegerType — calendar spans (SPAN_YEAR/SPAN_MONTH)

Everything here is a JVM-side Column expression — no UDFs — so the whole
surface stays inside whole-stage codegen and scales to 100 TB scans.

``xbar`` is kerf's temporal bucketing verb (the STAMP_DAY/HOUR/MINUTE...
bucket stamps, enums.h:167-175): floor a stamp to a span multiple, the
primitive under every "5-minute bars" tick query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- spans
NS = 1
US = 1_000
MS = 1_000_000
SECOND = 1_000_000_000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR
WEEK = 7 * DAY

_SPAN_UNITS = {
    "ns": NS, "us": US, "ms": MS, "s": SECOND,
    "m": MINUTE, "h": HOUR, "d": DAY, "w": WEEK,
}


def span_ns(n: float, unit: str) -> int:
    """A span literal in nanoseconds: ``span_ns(5, 'm')`` == 5 minutes.

    Mirrors kerf span literals (``12_y`` etc., horology.h) for the
    sub-month granularities; year/month spans are calendar-relative and
    live in ``add_months_ns``.
    """
    if unit not in _SPAN_UNITS:
        from ..errors import TimeError

        raise TimeError(
            f"unknown span unit {unit!r} (expected one of {sorted(_SPAN_UNITS)}; "
            "year/month are calendar-relative -> add_months_ns)"
        )
    return int(n * _SPAN_UNITS[unit])


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _divfloor(c: Column, k: int) -> Column:
    """Exact floor-division of a long column by a positive constant.

    ``floor(col / k)`` routes through double division and loses ULPs for
    epoch-ns magnitudes (~1.7e18 > 2^53); decimal division is exact.
    """
    return F.floor(c.cast("decimal(38,0)") / F.lit(k)).cast("long")


# ------------------------------------------------------- conversions
def ts_to_ns(ts: Column | str) -> Column:
    """TimestampType/NTZ -> epoch nanoseconds (µs precision * 1000)."""
    return (F.unix_micros(F.to_timestamp(_c(ts))) * F.lit(1000)).cast("long")


def ns_to_ts(ns: Column | str) -> Column:
    """Epoch-ns -> TimestampNTZ (truncates to Spark's µs precision)."""
    return F.timestamp_micros(_divfloor(_c(ns), 1000))


def ns_to_us(ns: Column | str) -> Column:
    """Epoch-ns -> epoch-µs long (floor-div; for µs-world interop)."""
    return _divfloor(_c(ns), 1000)


def ns_to_date(ns: Column | str) -> Column:
    return F.to_date(ns_to_ts(ns))


# ------------------------------------------------------- part extraction
# The 9 stamp granularities (enums.h:166-175) as part extractors.
def year(ns: Column | str) -> Column:
    return F.year(ns_to_ts(ns))


def month(ns: Column | str) -> Column:
    return F.month(ns_to_ts(ns))


def day(ns: Column | str) -> Column:
    return F.dayofmonth(ns_to_ts(ns))


def hour(ns: Column | str) -> Column:
    return F.hour(ns_to_ts(ns))


def minute(ns: Column | str) -> Column:
    return F.minute(ns_to_ts(ns))


def second(ns: Column | str) -> Column:
    return F.second(ns_to_ts(ns))


def millisecond(ns: Column | str) -> Column:
    """Milliseconds within the second (0-999; pmod keeps pre-epoch
    stamps in-range)."""
    return F.pmod(_divfloor(_c(ns), MS), F.lit(1000)).cast("int")


def microsecond(ns: Column | str) -> Column:
    """Microseconds within the second (0-999_999)."""
    return F.pmod(_divfloor(_c(ns), US), F.lit(1_000_000)).cast("int")


def nanosecond(ns: Column | str) -> Column:
    """Nanoseconds within the second (0-999_999_999) — sub-µs digits
    survive here even though Spark timestamps cannot hold them."""
    return F.pmod(_c(ns), F.lit(SECOND)).cast("long")


# ------------------------------------------------------- bucketing / arith
def xbar(ns: Column | str, width_ns: int | Column) -> Column:
    """Floor epoch-ns to a span multiple: kerf's bar/xbar bucketing.

    ``xbar('ts', span_ns(5, 'm'))`` -> start-of-5-minute-bucket in ns.
    Pure long arithmetic: vectorized, codegen'd, partition-prunable when
    the bucket is also the partition column.
    """
    w = F.lit(width_ns) if isinstance(width_ns, int) else width_ns
    # pmod, not %: Spark's % takes the dividend's sign, so pre-1970
    # stamps would round toward zero (bucket start AFTER the stamp).
    return (_c(ns) - F.pmod(_c(ns), w)).cast("long")


def add_span(ns: Column | str, dur_ns: int | Column) -> Column:
    """stamp + span -> stamp (verbs.cc:156-170, sub-month granularities)."""
    d = F.lit(dur_ns) if isinstance(dur_ns, int) else dur_ns
    return (_c(ns) + d).cast("long")


def sub_stamps(a: Column | str, b: Column | str) -> Column:
    """stamp - stamp -> span_ns (verbs.cc:171-176)."""
    return (_c(a) - _c(b)).cast("long")


def add_months_ns(ns: Column | str, months: int | Column) -> Column:
    """stamp + calendar span (SPAN_YEAR/SPAN_MONTH, verbs.cc:147-155).

    Calendar arithmetic happens at µs precision (Spark's add_months),
    sub-µs digits are carried through unchanged.
    """
    m = F.lit(months) if isinstance(months, int) else months
    sub_us = _c(ns) % F.lit(1000)
    # timestamp + year-month interval keeps time-of-day (F.add_months
    # follows date semantics and would truncate it)
    shifted = ns_to_ts(ns) + F.make_interval(F.lit(0), m)
    return (ts_to_ns(shifted) + sub_us).cast("long")


def now_ns() -> Column:
    """Current time as epoch-ns (µs precision — Spark's clock)."""
    return (F.unix_micros(F.current_timestamp()) * F.lit(1000)).cast("long")
