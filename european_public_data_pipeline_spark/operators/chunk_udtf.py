"""Document chunking as a Spark 4 Python UDTF (user-defined table function).

`t08_chunk_windows` (operators/text.py) does overlapping token-window
chunking with pure Catalyst HOFs — the fast path. This module exposes the
SAME semantics as a lateral-joinable UDTF for the cases where chunking
logic outgrows expressions (real tokenizers, sentence boundaries, model-
specific packing rules): swap the body of ``eval`` and the call sites
keep working, in both DataFrame and SQL form:

    spark.udtf.register("chunk_document", ChunkDocument)
    spark.sql("SELECT d.doc_id, c.* FROM documents d, "
              "LATERAL chunk_document(d.text) c")

Scale: a UDTF runs row-local in the scan stage exactly like the HOF
fan-out — no shuffle is introduced; the cost is the Python worker hop,
which is why t08 stays the default and this is the extension point.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from european_public_data_pipeline_spark.operators.text import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)


@udtf(returnType="chunk_idx: int, n_tokens: int, chunk_text: string")
class ChunkDocument:
    """Yield (chunk_idx, n_tokens, chunk_text) windows of CHUNK_TOKENS
    tokens at CHUNK_STRIDE, matching t08's boundary rule: windows start
    at every stride offset in [0, max(1, n - CHUNK_TOKENS + 1))."""

    def eval(self, text: str):  # noqa: D102 - contract documented above
        if text is None:
            return
        toks = text.strip().split()
        n = len(toks)
        last_start = max(1, n - CHUNK_TOKENS + 1)
        idx = 0
        for start in range(0, last_start, CHUNK_STRIDE):
            window = toks[start : start + CHUNK_TOKENS]
            yield idx, len(window), " ".join(window)
            idx += 1
