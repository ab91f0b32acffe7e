"""Query plan registry.

Importing this package populates the registry with every declared query
(the engine's public surface per SURVEY.md §2). ``__spark_entry__.py``
re-exports it for the driver.
"""

from european_public_data_pipeline_spark.plans.registry import (
    QuerySpec,
    all_specs,
    oracle_sql_map,
    queries_map,
    register,
)

# Import for registration side effects — each module registers its QuerySpecs.
from european_public_data_pipeline_spark.operators import relational  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import relational_ext  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import dedup  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import similarity  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import text  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import event_windows  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import multimodal  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import reshape  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import argmax_sql  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import rank_map  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import tpch_more  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import sampling  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import scale_joins  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import graph  # noqa: E402,F401
from european_public_data_pipeline_spark.operators import sketches  # noqa: E402,F401
from european_public_data_pipeline_spark.pipeline import hicp_queries  # noqa: E402,F401

# Must come last: composes already-registered stage oracles into the
# end-to-end curation-report oracle.
from european_public_data_pipeline_spark.operators import curation_report  # noqa: E402,F401

__all__ = [
    "QuerySpec",
    "register",
    "all_specs",
    "queries_map",
    "oracle_sql_map",
]
