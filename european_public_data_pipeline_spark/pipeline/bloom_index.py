"""Per-file Bloom sidecar index for manifest tables: point-lookup file
pruning on high-cardinality, unsorted columns.

Zone maps (``manifest.read_where``) prune RANGE predicates and work best
when the write clustered the column; a point lookup on an unclustered
key (user_id in an events table ordered by time) matches every file's
[min, max] and prunes nothing. The classic lakehouse answer (Iceberg's
puffin blobs, Delta's bloom filter indexes) is a per-file Bloom filter
kept OUTSIDE the data files: a membership probe reads the KB-sized
index, keeps only files whose k bits are all set, and plans the scan on
those — no false negatives ever (Bloom guarantees), false positives
only cost an extra file read.

Layout: the index for version N / column c is a small parquet relation
``{table}/index/v<N>-bloom-<c>/`` with rows (file, word, mask) — a
16384-bit filter per file as 256 OR-folded 64-bit words. It is built
with ONE distributed job over the version's files (groupBy
input_file_name — never a per-file job storm) and stays distributed at
prune time: the probe filters the sidecar to its k word cells, so only
candidate FILE NAMES ever reach the driver. At 100 TB with 10^5 files
the sidecar is ~10^5 x 256 rows ~ 200 MB of parquet — scanned with a
word-key filter pushed down, still metadata-scale next to the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.manifest import (
    _path_key,
    _read_json,
    current_version,
)

BLOOM_INDEX_BITS = 16384  # 256 words x 64 bits per file
BLOOM_INDEX_HASHES = 3
_SEED = 300  # xxhash64 seed base — disjoint from q80/q81's families


def _positions(col: F.Column) -> list[F.Column]:
    return [
        F.pmod(F.xxhash64(F.lit(_SEED + i), col), F.lit(BLOOM_INDEX_BITS))
        for i in range(BLOOM_INDEX_HASHES)
    ]


def _index_dir(table_path: str, version: int, col: str) -> str:
    return f"{table_path}/index/v{version:08d}-bloom-{col}"


def build_bloom_index(
    spark: SparkSession, table_path: str, col: str, version: int | None = None
) -> str:
    """Build (or rebuild) the per-file Bloom index for ``col`` over one
    committed version. One job: explode each row's k bit positions keyed
    by input_file_name, OR-fold into (file, word, mask) cells."""
    v = version if version is not None else current_version(spark, table_path)
    m = _read_json(spark, f"{table_path}/manifest/{v:08d}.json")
    rows = (
        spark.read.parquet(*m["files"])
        .select(F.col(col).alias("__k"))
        .withColumn("file", F.input_file_name())
        .select("file", F.explode(F.array(*_positions(F.col("__k")))).alias("pos"))
        .select(
            "file",
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("file", "word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    out = _index_dir(table_path, v, col)
    rows.write.mode("overwrite").parquet(out)
    return out


def read_point(
    spark: SparkSession,
    table_path: str,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Point lookup with Bloom file pruning: plan only the files whose
    index cells have every probe bit set, then apply the exact equality
    filter. Falls back to reading the whole version (still correct) when
    no index exists for ``col``."""
    v = version if version is not None else current_version(spark, table_path)
    m = _read_json(spark, f"{table_path}/manifest/{v:08d}.json")
    idx = _index_dir(table_path, v, col)
    try:
        sidecar = spark.read.parquet(idx)
    except Exception:
        return spark.read.parquet(*m["files"]).where(F.col(col) == F.lit(value))
    # The probe's k (word, mask) cells, computed with the SAME hash
    # expressions the builder used (one 1-row job). xxhash64 hashes the
    # TYPED binary value, so the literal must carry the column's exact
    # dtype — an int probe against a bigint column would silently hash
    # differently and read as a false negative.
    dt = spark.read.parquet(m["files"][0]).schema[col].dataType
    probe = (
        spark.range(1)
        .select(F.explode(F.array(*_positions(F.lit(value).cast(dt)))).alias("pos"))
        .select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .collect()
    )
    cells = [(int(r["word"]), int(r["bit"])) for r in probe]
    hits = [
        F.max(
            F.when(
                (F.col("word") == w) & (F.col("mask").bitwiseAND(F.lit(b)) != 0),
                1,
            ).otherwise(0)
        ).alias(f"h{i}")
        for i, (w, b) in enumerate(cells)
    ]
    cand_rows = (
        sidecar.filter(F.col("word").isin([w for w, _ in cells]))
        .groupBy("file")
        .agg(*hits)
        .filter(" and ".join(f"h{i} = 1" for i in range(len(cells))))
        .select("file")
        .collect()
    )
    cand_keys = {_path_key(r["file"]) for r in cand_rows}
    # Files the sidecar has never seen — appended after the index build,
    # or rewritten by purge_rows under a new name — MUST stay candidates:
    # pruning is only sound for files the index actually covers. One
    # extra tiny scan of the sidecar's distinct file names.
    indexed = {
        _path_key(r["file"]) for r in sidecar.select("file").distinct().collect()
    }
    keep = [
        f
        for f in m["files"]
        if _path_key(f) in cand_keys or _path_key(f) not in indexed
    ]
    if not keep:
        return spark.read.parquet(m["files"][0]).where(F.lit(False))
    return spark.read.parquet(*keep).where(F.col(col) == F.lit(value))
