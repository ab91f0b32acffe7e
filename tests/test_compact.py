"""Compaction: fragmented partitions get fewer files, data is unchanged,
already-compact partitions are untouched."""

from __future__ import annotations

import os

from european_public_data_pipeline_spark.pipeline.compact import (
    compact_partitions,
    partition_file_stats,
)


def _files(path, part):
    d = os.path.join(path, part)
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def _seed_fragmented(spark, path):
    # en partition: 6 appends of small batches -> 6+ files.
    for i in range(6):
        df = spark.createDataFrame(
            [(i * 10 + j, "en", f"v{i}-{j}") for j in range(5)],
            "k long, lang string, v string",
        )
        df.coalesce(1).write.partitionBy("lang").mode("append").parquet(path)
    # de partition: one file, already compact.
    spark.createDataFrame(
        [(900, "de", "x")], "k long, lang string, v string"
    ).coalesce(1).write.partitionBy("lang").mode("append").parquet(path)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed_fragmented(spark, path)
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).select("k", "lang", "v").collect()
    )
    assert len(_files(path, "lang=en")) >= 6

    rewritten = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert rewritten == {"lang=en": 1}
    assert len(_files(path, "lang=en")) == 1

    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).select("k", "lang", "v").collect()
    )
    assert after_rows == before_rows


def test_compaction_skips_already_compact_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed_fragmented(spark, path)
    before_de = {
        f: os.path.getmtime(os.path.join(path, "lang=de", f))
        for f in _files(path, "lang=de")
    }
    compact_partitions(spark, path, target_file_bytes=1 << 30)
    after_de = {
        f: os.path.getmtime(os.path.join(path, "lang=de", f))
        for f in _files(path, "lang=de")
    }
    assert after_de == before_de  # single-file partition untouched


def test_partition_file_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed_fragmented(spark, path)
    stats = partition_file_stats(spark, path)
    assert set(stats) == {"lang=en", "lang=de"}
    assert stats["lang=en"][0] >= 6
    assert stats["lang=de"][0] == 1
    assert all(b > 0 for _, b in stats.values())
