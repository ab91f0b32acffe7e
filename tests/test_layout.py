"""Layout engineering: row-group min/max statistics must actually narrow
under range clustering and Z-ordering (measured with pyarrow, the same
stats a parquet reader prunes on)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from european_public_data_pipeline_spark.pipeline.layout import cluster_by, zorder_by
from european_public_data_pipeline_spark.tables import load_table


def _row_group_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for g in range(pf.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def _avg_coverage(spans: list[tuple[float, float]]) -> float:
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    return sum((b - a) / (hi - lo) for a, b in spans) / len(spans)


def test_range_clustering_narrows_row_groups(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    natural = str(tmp_path / "nat")
    clustered = str(tmp_path / "clu")
    li.repartition(8).write.parquet(natural)
    cluster_by(li, ["l_extendedprice"], 8).write.parquet(clustered)

    nat = _avg_coverage(_row_group_spans(natural, "l_extendedprice"))
    clu = _avg_coverage(_row_group_spans(clustered, "l_extendedprice"))
    # Random layout: every row group spans ~the full range. Clustered:
    # ~1/8 of it. A reader pruning on a price range skips ~7/8 of bytes.
    assert nat > 0.8
    assert clu < 0.25

    # Non-overlap: sorted spans must not interleave.
    spans = sorted(_row_group_spans(clustered, "l_extendedprice"))
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] < a[1])
    assert overlaps == 0


def test_zorder_narrows_both_dimensions(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    natural = str(tmp_path / "nat")
    zed = str(tmp_path / "z")
    li.repartition(8).write.parquet(natural)
    zorder_by(li, "l_extendedprice", "l_quantity", 8).write.parquet(zed)

    for col in ["l_extendedprice", "l_quantity"]:
        nat = _avg_coverage(_row_group_spans(natural, col))
        z = _avg_coverage(_row_group_spans(zed, col))
        # Z-order trades per-column tightness for covering both at once:
        # each dimension's spans must still be meaningfully narrower than
        # the random layout.
        assert z < 0.8 * nat, f"{col}: z={z:.2f} nat={nat:.2f}"


def test_layouts_preserve_data(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    zed = str(tmp_path / "z")
    zorder_by(li, "l_extendedprice", "l_quantity", 4).write.parquet(zed)
    want = sorted(tuple(r) for r in li.collect())
    got = sorted(tuple(r) for r in spark.read.parquet(zed).collect())
    assert got == want


def test_zorder_rejects_string_columns(spark, sf_small):
    import pytest as _pytest

    docs = load_table(spark, sf_small, "documents")
    with _pytest.raises(TypeError, match="not\\s+numeric"):
        zorder_by(docs, "lang", "doc_id", 4)


def test_zorder_accepts_timestamp_columns(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("ts", "user_id")
    out = str(tmp_path / "zts")
    zorder_by(ev, "ts", "user_id", 4).write.parquet(out)
    spans = _row_group_spans(out, "user_id")
    assert _avg_coverage(spans) < 0.9  # interleave did not degenerate
