"""Registration-time guard: every query's output schema is scalar-only.

The driver's correctness harness canonicalizes result rows with pandas
``sort_values`` before hashing, which raises ``TypeError: unhashable
type: 'list'`` on ArrayType / MapType / StructType output columns.  The
local parity harness (tests/oracle_compare.py) is more permissive — it
tuple-izes lists — which is exactly how q90_array_functions stayed green
locally for two rounds and then failed its first driver contact in round
5.  This guard makes the local suite at least as strict as the driver:
any registered query emitting a complex-typed TOP-LEVEL column fails at
registration time, long before a driver round.

Complex types are still first-class INSIDE query plans (collect_list,
transform, zip_with, aggregate folds, map/variant extraction, ...); the
contract constrains only the emitted result schema, where a deterministic
string serialization (array_join / to_json, mirrored by
array_to_string / to_json in the DuckDB oracle) is always available.

Schemas are inspected at the smallest scale factor. Most builders are
pure transformations (no job runs to read df.schema); the handful with
eager side effects (the bucketed-layout writers q95/q104, the manifest
publishers) do run real sf0.001 jobs here — acceptable cost, and safe
because the pytest suite runs single-process against the shared
warehouse (the same assumption the parity suite already makes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from european_public_data_pipeline_spark import plans

SPECS = plans.all_specs()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_output_schema_is_scalar_only(name, spark, sf_small):
    df = SPECS[name].builder(spark, sf_small)
    offenders = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not offenders, (
        f"{name}: top-level complex-typed output columns {offenders} — the "
        "driver's pandas canonicalizer cannot sort these; serialize to "
        "string (array_join / to_json) in both the Spark plan and the "
        "DuckDB oracle"
    )
