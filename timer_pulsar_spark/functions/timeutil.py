"""Timezone-independent epoch extraction.

The driver's testdata stores ``events.ts`` as parquet
``TIMESTAMP(isAdjustedToUTC=0)``, which Spark reads as ``TIMESTAMP_NTZ``
— the wall-clock type that keeps ``date_trunc``/``date_format`` results
identical on every session regardless of its timezone (matching DuckDB's
naive-timestamp semantics, so oracle comparisons are exact).

``unix_millis``/``unix_micros`` however accept only ``TIMESTAMP`` (LTZ)
and raise ``DATATYPE_MISMATCH`` on NTZ input. Casting NTZ -> LTZ is NOT
a fix: the bare cast binds the wall-clock to the *session's* timezone,
so the same data yields different epochs on differently-configured
sessions. Instead, for NTZ we take ``timestampdiff`` from the NTZ epoch
origin — pure wall-clock arithmetic, no timezone involved, and equal to
DuckDB's ``epoch_ms``/``epoch_us`` on the same naive values.

The helpers branch on the column's declared dtype so the same operator
code works against either timestamp flavor (the driver has already
shipped the testdata as NANOS in round 1 and MICROS-NTZ in round 2;
dtype-branching is the only future-proof shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _is_ntz(df: DataFrame, colname: str) -> bool:
    return isinstance(df.schema[colname].dataType, T.TimestampNTZType)


def epoch_millis(df: DataFrame, colname: str = "ts") -> Column:
    """Milliseconds since epoch for ``df[colname]``, NTZ-safe."""
    if _is_ntz(df, colname):
        return F.expr(f"timestampdiff(MILLISECOND, {_NTZ_EPOCH}, `{colname}`)")
    return F.unix_millis(F.col(colname))


def epoch_micros(df: DataFrame, colname: str = "ts") -> Column:
    """Microseconds since epoch for ``df[colname]``, NTZ-safe."""
    if _is_ntz(df, colname):
        return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, `{colname}`)")
    return F.unix_micros(F.col(colname))


def as_utc_instant(df: DataFrame, colname: str = "ts") -> Column:
    """LTZ ``TIMESTAMP`` whose instant is the NTZ wall-clock read as
    UTC — session-timezone-free (a bare NTZ->LTZ cast is not). Needed at
    streaming boundaries: Spark watermarks/event-time accept only LTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). Passthrough when
    the column is already LTZ."""
    if _is_ntz(df, colname):
        return F.timestamp_micros(epoch_micros(df, colname))
    return F.col(colname)


def utc_wallclock_ntz(col: Column) -> Column:
    """The reverse boundary: render an LTZ instant as its UTC wall-clock
    in ``TIMESTAMP_NTZ``, independent of the session timezone (a bare
    LTZ->NTZ cast binds to it). Together with ``as_utc_instant`` this
    makes a streaming replay NTZ-in/NTZ-out on any session."""
    return F.timestamp_add(
        "MICROSECOND", F.unix_micros(col), F.expr(_NTZ_EPOCH)
    )
