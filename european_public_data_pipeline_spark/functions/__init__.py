"""Scalar column-expression library (SURVEY.md §2.8).

Everything here is a native Catalyst expression — no Python UDFs — so the
whole scalar surface stays inside whole-stage codegen on the JVM.
"""

from european_public_data_pipeline_spark.functions.exact import (
    davg,
    dec,
    dsum,
    dsum_expr,
)
from european_public_data_pipeline_spark.functions.timeparse import (
    month_start,
    parse_time_code,
    time_code,
)

__all__ = [
    "dec",
    "dsum",
    "dsum_expr",
    "davg",
    "parse_time_code",
    "month_start",
    "time_code",
]
