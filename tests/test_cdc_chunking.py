"""Content-defined chunking (d21): the shift-invariance property test.

Insert one token near the START of a long document: fixed-stride windows
(d11's grain) all shift and share nothing; content-defined boundaries
re-sync immediately, so almost all chunks of the edited document still
hash-match the original. This is the property that makes chunk-level
dedup robust to small edits.
"""

from __future__ import annotations

import random

from european_public_data_pipeline_spark import plans


def _write_docs(spark, path, docs):
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)


def test_cdc_chunks_survive_early_insertion(spark, tmp_path):
    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(400)]
    original = " ".join(words)
    edited = " ".join(words[:5] + ["INSERTED"] + words[5:])
    sf = str(tmp_path)
    _write_docs(spark, f"{sf}/documents.parquet", [original, edited])

    rows = {
        r["doc_id"]: r
        for r in plans.all_specs()["d21_cdc_chunk_dedup"]
        .builder(spark, sf)
        .collect()
    }
    # Both docs re-sync after the edit: the overwhelming majority of each
    # document's chunks also occur in the other.
    for d in (0, 1):
        assert rows[d]["n_chunks"] > 10
        assert rows[d]["dup_ratio"] >= 0.7, rows[d]

    # Control: fixed-stride 10-token windows shift — near-zero overlap
    # after the same edit (the weakness CDC exists to fix).
    def fixed_windows(tokens):
        return {
            " ".join(tokens[i : i + 10])
            for i in range(0, max(1, len(tokens) - 9), 10)
        }

    a = fixed_windows(words)
    b = fixed_windows(words[:5] + ["INSERTED"] + words[5:])
    assert len(a & b) <= 1  # at most the untouched head window
