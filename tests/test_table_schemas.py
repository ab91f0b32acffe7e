"""Schema-drift guard for the driver's testdata tables.

Round 3 broke on a silent physical-encoding change (events.ts NANOS ->
µs). This test pins the LOGICAL contract every operator relies on — table
names, column names, and normalized column types after load_table — so the
next driver-side drift fails here first with a readable diff instead of
deep inside 13 queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from european_public_data_pipeline_spark.tables import TABLE_NAMES, load_table

# Normalized type classes: the contract is "numeric", "chrono", etc., not a
# specific physical width — the loader may legitimately surface either.
_NUM = (T.LongType, T.IntegerType, T.ShortType, T.DoubleType, T.FloatType, T.DecimalType)
_CHRONO = (T.DateType, T.TimestampType, T.TimestampNTZType)

EXPECTED: dict[str, dict[str, tuple[type, ...]]] = {
    "region": {"r_regionkey": _NUM, "r_name": (T.StringType,)},
    "nation": {"n_nationkey": _NUM, "n_regionkey": _NUM, "n_name": (T.StringType,)},
    "customer": {
        "c_custkey": _NUM,
        "c_name": (T.StringType,),
        "c_nationkey": _NUM,
        "c_acctbal": _NUM,
        "c_mktsegment": (T.StringType,),
    },
    "supplier": {
        "s_suppkey": _NUM,
        "s_name": (T.StringType,),
        "s_nationkey": _NUM,
        "s_acctbal": _NUM,
    },
    "part": {
        "p_partkey": _NUM,
        "p_name": (T.StringType,),
        "p_brand": (T.StringType,),
        "p_type": (T.StringType,),
        "p_size": _NUM,
        "p_retailprice": _NUM,
    },
    "orders": {
        "o_orderkey": _NUM,
        "o_custkey": _NUM,
        "o_orderstatus": (T.StringType,),
        "o_totalprice": _NUM,
        "o_orderdate": _CHRONO,
        "o_orderpriority": (T.StringType,),
    },
    "lineitem": {
        "l_orderkey": _NUM,
        "l_partkey": _NUM,
        "l_suppkey": _NUM,
        "l_linenumber": _NUM,
        "l_quantity": _NUM,
        "l_extendedprice": _NUM,
        "l_discount": _NUM,
        "l_tax": _NUM,
        "l_returnflag": (T.StringType,),
        "l_linestatus": (T.StringType,),
        "l_shipdate": _CHRONO,
    },
    "events": {
        "event_id": _NUM,
        # the loader must normalize ts to TimestampType under EVERY
        # physical encoding (see tests/test_events_loader.py)
        "ts": (T.TimestampType,),
        "user_id": _NUM,
        "event_type": (T.StringType,),
        "value": (T.DoubleType, T.FloatType),
        "props": (T.StringType,),
    },
    "documents": {
        "doc_id": _NUM,
        "text": (T.StringType,),
        "lang": (T.StringType,),
        "source": (T.StringType,),
        "n_chars": _NUM,
    },
    "embeddings": {
        "vec_id": _NUM,
        "embedding": (T.ArrayType,),
        "label": _NUM,
    },
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_schema_contract(spark, sf_small, name):
    df = load_table(spark, sf_small, name)
    expected = EXPECTED[name]
    actual = {f.name: f.dataType for f in df.schema.fields}
    assert set(actual) == set(expected), (
        f"{name}: columns drifted — got {sorted(actual)}, want {sorted(expected)}"
    )
    for col, classes in expected.items():
        assert isinstance(actual[col], classes), (
            f"{name}.{col}: type {actual[col]} not in allowed classes {classes}"
        )
