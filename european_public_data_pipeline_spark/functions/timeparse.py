"""Time-code parsing (SURVEY.md §2.8 F1-F3).

The reference parses Eurostat period codes row-at-a-time in Python
(``_parse_time_code``, /root/reference/src/ingestion/process_hicp_silver.py:50-62):
``^(\\d{4})M(\\d{2})$`` -> month-start timestamp, with a lenient
``pd.to_datetime(errors="coerce")`` fallback and truncation to month start.

Here the same semantics are pure Catalyst expressions — regexp + try_to_timestamp
+ date_trunc — which vectorize inside whole-stage codegen instead of invoking
Python per row. NULL on unparseable input (the ``errors="coerce"`` contract).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTH_CODE_RE = r"^(\d{4})M(\d{2})$"


def parse_time_code(col: Column | str) -> Column:
    """Parse ``2024M01`` or ISO-ish (``2024-01``, ``2024-01-15``) to a
    month-start DATE; NULL when unparseable (F1 + F2 + F3)."""
    c = F.col(col) if isinstance(col, str) else col
    monthly = F.regexp_replace(c, _MONTH_CODE_RE, r"$1-$2")
    parsed = F.coalesce(
        F.try_to_timestamp(monthly, F.lit("yyyy-MM")),
        F.try_to_timestamp(monthly, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(monthly),
    )
    return F.trunc(parsed, "MM")


def month_start(col: Column | str) -> Column:
    """Truncate any date/timestamp to the first of its month (F3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trunc(c, "MM")


def time_code(col: Column | str) -> Column:
    """Inverse of ``parse_time_code``: date/timestamp -> ``YYYYMmm`` code (F4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy'M'MM")
