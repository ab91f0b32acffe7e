"""Property-based tests (SURVEY.md §5): hypothesis-generated JSON-stat
cubes must round-trip through the reader, and the continuity check must
agree with the sequence-of-months definition."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from european_public_data_pipeline_spark.quality.checks import check_suite
from european_public_data_pipeline_spark.sources.jsonstat import parse_payload

codes = st.text(alphabet="ABCDEFGH", min_size=1, max_size=3)


@st.composite
def jsonstat_cubes(draw):
    n_dims = draw(st.integers(min_value=1, max_value=3))
    dims = [f"d{i}" for i in range(n_dims)]
    sizes = [draw(st.integers(min_value=1, max_value=4)) for _ in dims]
    n_cells = math.prod(sizes)
    categories = {}
    for d, n in zip(dims, sizes):
        cats = draw(
            st.lists(codes, min_size=n, max_size=n, unique=True)
        )
        categories[d] = cats
    dense = draw(st.booleans())
    values = draw(
        st.lists(
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
            min_size=n_cells,
            max_size=n_cells,
        )
    )
    if dense:
        value_field = values
    else:
        value_field = {
            str(i): v for i, v in enumerate(values) if v is not None and i % 2 == 0
        }
    payload = {
        "id": dims,
        "size": sizes,
        "dimension": {
            d: {"category": {"index": {c: i for i, c in enumerate(categories[d])}}}
            for d in dims
        },
        "value": value_field,
    }
    return payload, categories, value_field, n_cells, dense


@given(jsonstat_cubes())
@settings(max_examples=60, deadline=None)
def test_parse_payload_roundtrip(cube):
    """Every flat index maps back to the unique coordinate tuple it came
    from (unpivot(pivot(x)) == x), for dense and sparse encodings."""
    payload, categories, value_field, n_cells, dense = cube
    dims, cats, values, n = parse_payload(payload)
    assert n == n_cells
    assert cats == categories
    if dense:
        expected = {
            i: (None if v is None else float(v)) for i, v in enumerate(value_field)
        }
    else:
        expected = {int(k): float(v) for k, v in value_field.items()}
    assert values == expected

    # coordinate decode is a bijection: rebuild flat index from coords
    sizes = [len(cats[d]) for d in dims]
    strides = [1] * len(sizes)
    for j in range(len(sizes) - 2, -1, -1):
        strides[j] = strides[j + 1] * sizes[j + 1]
    seen = set()
    for i in range(n):
        coord = tuple((i // strides[j]) % sizes[j] for j in range(len(sizes)))
        rebuilt = sum(c * strides[j] for j, c in enumerate(coord))
        assert rebuilt == i
        assert coord not in seen
        seen.add(coord)


@given(
    st.lists(
        st.integers(min_value=0, max_value=23),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
@settings(max_examples=25, deadline=None)
def test_continuity_violations_equal_missing_months(spark, month_offsets):
    """The continuity check's violation count equals exactly the number of
    missing months inside the observed [min, max] span."""
    base = dt.date(2023, 1, 1)
    months = sorted(month_offsets)
    rows = [
        ("S", dt.date(2023 + (m // 12), m % 12 + 1, 1), 1.0) for m in months
    ]
    df = spark.createDataFrame(rows, "series string, time date, value double")
    res = {
        r["check"]: r["violations"]
        for r in check_suite(df)
        .expect_monthly_continuity(["series"], "time")
        .to_dataframe(spark)
        .collect()
    }
    span = months[-1] - months[0] + 1
    expected_missing = span - len(months)
    assert res["monthly_continuity:series:time"] == expected_missing
