"""The UDTF chunker must emit exactly t08's chunks (same boundaries, same
content) through both the DataFrame-lateral and SQL-LATERAL surfaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.chunk_udtf import ChunkDocument
from european_public_data_pipeline_spark.operators.text import t08_chunk_windows
from european_public_data_pipeline_spark.tables import load_table


@pytest.fixture()
def t08_chunks(spark, sf_small):
    return {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_hash"])
        for r in t08_chunk_windows(spark, sf_small).collect()
    }


def _as_map(rows):
    return {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_hash"]) for r in rows
    }


def test_sql_lateral_matches_t08(spark, sf_small, t08_chunks):
    spark.udtf.register("chunk_document", ChunkDocument)
    load_table(spark, sf_small, "documents").createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens, md5(c.chunk_text) AS chunk_hash "
        "FROM docs_udtf d, LATERAL chunk_document(d.text) c"
    ).collect()
    assert _as_map(rows) == t08_chunks


def test_dataframe_lateral_matches_t08(spark, sf_small, t08_chunks):
    docs = load_table(spark, sf_small, "documents")
    rows = (
        docs.lateralJoin(ChunkDocument(F.col("text").outer()))
        .select("doc_id", "chunk_idx", "n_tokens", F.md5("chunk_text").alias("chunk_hash"))
        .collect()
    )
    assert _as_map(rows) == t08_chunks
