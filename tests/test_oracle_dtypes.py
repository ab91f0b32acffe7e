"""Arrow-dtype drift guard for every oracle.

Round 1's only driver failures were TYPING divergences invisible to the
value comparator here (DuckDB HUGEINT materializes as decimal128 under
Arrow while Spark emits int64 — same values, different hash). This test
pins the typed surface: for every oracle, the pandas dtype of each column
on the Spark side vs the DuckDB side must be identical or belong to a
known-benign pair (proven green in driver round 1):

- int32 vs int64           (width only; q10/s01/t01 driver-green)
- datetime64[ns] vs [us]   (pandas unit repr; q18/q26 driver-green)
- date-as-object vs datetime64[us] (DateType -> python date; q08/q20 green)

Anything else — a new HUGEINT, a decimal, a stringified number — fails
here before the driver ever sees it.
"""

from __future__ import annotations

from european_public_data_pipeline_spark import plans
from tests.oracle_compare import duckdb_connect

ALLOWED_PAIRS = {
    ("int32", "int64"),
    ("int64", "int32"),
    ("int32", "int8"),
    ("datetime64[ns]", "datetime64[us]"),
    ("object", "datetime64[us]"),  # Spark DateType -> python datetime.date
}


def test_every_oracle_column_dtype_matches_or_is_benign(spark, sf_medium):
    con = duckdb_connect(sf_medium)
    try:
        offenders = []
        for name, spec in sorted(plans.all_specs().items()):
            if spec.oracle is None:
                continue
            sdf = spec.builder(spark, sf_medium).limit(5).toPandas()
            ddf = con.execute(spec.oracle).fetch_df().head(5)
            sd = {c: str(d) for c, d in sdf.dtypes.items()}
            dd = {c: str(d) for c, d in ddf.dtypes.items()}
            for c, a in sd.items():
                b = dd.get(c)
                if b is None:
                    offenders.append((name, c, a, "MISSING"))
                elif a != b and (a, b) not in ALLOWED_PAIRS:
                    offenders.append((name, c, a, b))
        assert not offenders, f"dtype drift (spark vs duckdb): {offenders}"
    finally:
        con.close()
