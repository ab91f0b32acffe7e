"""Source/sink format round-trips (SURVEY.md §2.1): the same relation
written and re-read through parquet, CSV, and JSON lines must be
value-identical. Parquet is the engine's primary format; CSV/JSONL are the
interchange formats a reference user would export to."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.tables import load_table


def _docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").filter(F.col("doc_id") < 30)


def _rows(df):
    return sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    )


def test_parquet_roundtrip(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    p = str(tmp_path / "p")
    docs.write.parquet(p)
    assert _rows(spark.read.parquet(p)) == _rows(docs)


def test_csv_roundtrip(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    p = str(tmp_path / "c")
    docs.write.option("header", "true").csv(p)
    got = spark.read.option("header", "true").schema(docs.schema).csv(p)
    assert _rows(got) == _rows(docs)


def test_jsonl_roundtrip(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    p = str(tmp_path / "j")
    docs.write.json(p)
    got = spark.read.schema(docs.schema).json(p)
    assert _rows(got) == _rows(docs)


def test_jsonl_roundtrip_unicode_events_props(spark, sf_small, tmp_path):
    # props carries nested JSON strings; JSONL write/read must not mangle
    # quoting or non-ASCII.
    events = load_table(spark, sf_small, "events").filter(F.col("event_id") < 50)
    p = str(tmp_path / "e")
    # Default JSON timestampFormat truncates to milliseconds — microsecond
    # event times need the format pinned on BOTH sides.
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.option("timestampFormat", fmt).json(p)
    got = spark.read.schema(events.schema).option("timestampFormat", fmt).json(p)
    want = sorted(tuple(r) for r in events.collect())
    have = sorted(tuple(r) for r in got.collect())
    assert have == want


def test_orc_roundtrip(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    p = str(tmp_path / "o")
    docs.write.orc(p)
    assert _rows(spark.read.orc(p)) == _rows(docs)


def test_orc_events_timestamps(spark, sf_small, tmp_path):
    """events (timestamp column) must survive an ORC round-trip exactly —
    ORC stores its own timestamp encoding, so this pins the µs fidelity."""
    events = load_table(spark, sf_small, "events").filter(F.col("event_id") < 500)
    p = str(tmp_path / "oe")
    events.write.orc(p)
    got = spark.read.orc(p)
    want = sorted((r["event_id"], r["ts"]) for r in events.select("event_id", "ts").collect())
    have = sorted((r["event_id"], r["ts"]) for r in got.select("event_id", "ts").collect())
    assert have == want
