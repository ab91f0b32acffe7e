"""JSON-stat as a first-class Spark data source: ``spark.read.format("jsonstat")``.

Wraps the same envelope-tolerant JSON-stat 2.0 decoding as
``sources/jsonstat.py`` (reference: ``process_hicp_silver.py``'s
pandas unpivot) in Spark 4's Python DataSource API
(``pyspark.sql.datasource``), so the hypercube format plugs into the
ordinary reader surface:

    spark.dataSource.register(JsonStatDataSource)
    df = (spark.read.format("jsonstat")
          .option("path", "/data/landing/**/*.json")
          .option("dims", "geo,coicop,time")
          .load())

Contract mirrors ``read_jsonstat_files``: declared dims become string
columns (NULL when a payload lacks the dimension), plus ``value`` double
and ``src_path`` lineage. File listing happens once at planning time; each
``InputPartition`` carries a bounded chunk of files, so a million-file
landing zone fans out across the cluster instead of serializing one
driver-side loop. Parsing is per-file CPU work with no cross-file state —
embarrassingly parallel by construction.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from european_public_data_pipeline_spark.sources.jsonstat import (
    _iter_rows,
    parse_payload,
)

# Files per task: small enough to parallelize a modest landing zone,
# large enough that task overhead doesn't dominate on a huge one.
_FILES_PER_PARTITION = 64


class JsonStatDataSource(DataSource):
    """``format("jsonstat")`` — options: ``path`` (glob), ``dims`` (csv),
    optional ``value_column`` (default ``value``)."""

    @classmethod
    def name(cls) -> str:
        return "jsonstat"

    def schema(self) -> T.StructType:
        dims = [d for d in self.options.get("dims", "").split(",") if d]
        if not dims:
            raise ValueError("jsonstat source requires option 'dims' (csv of dimension names)")
        value_column = self.options.get("value_column", "value")
        return T.StructType(
            [T.StructField(d, T.StringType(), True) for d in dims]
            + [
                T.StructField(value_column, T.DoubleType(), True),
                T.StructField("src_path", T.StringType(), True),
            ]
        )

    def reader(self, schema: T.StructType) -> "JsonStatReader":
        return JsonStatReader(self.options, schema)


class JsonStatReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonstat source requires option 'path'")
        self._dims = [f.name for f in schema.fields[:-2]]
        self._value_column = schema.fields[-2].name
        if os.path.isdir(path):
            path = os.path.join(path, "**", "*.json")
        self._files = sorted(glob.glob(path, recursive=True))

    def partitions(self) -> Sequence[InputPartition]:
        chunks = [
            self._files[i : i + _FILES_PER_PARTITION]
            for i in range(0, len(self._files), _FILES_PER_PARTITION)
        ]
        # Spark requires >= 1 partition even for an empty listing.
        return [InputPartition(c) for c in chunks] or [InputPartition([])]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        for file_path in partition.value:
            with open(file_path, "rb") as f:
                payload = json.loads(f.read().decode("utf-8"))
            p_dims, cats, vals, n_cells = parse_payload(payload)
            dim_pos = {d: j for j, d in enumerate(p_dims)}
            for row in _iter_rows(p_dims, cats, vals, n_cells):
                yield tuple(
                    row[dim_pos[d]] if d in dim_pos else None for d in self._dims
                ) + (row[-1], file_path)
