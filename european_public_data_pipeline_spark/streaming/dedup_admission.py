"""Streaming corpus ingestion with dedup admission control — the
streaming form of d09 (incremental exact dedup) + d23 (incremental LSH
probe), run continuously over document micro-batches (SURVEY.md §2.11 +
§2.12 dedup).

Every micro-batch of documents is admitted against the corpus ingested
so far:

1. **Within-batch exact**: keep-first per normalized-text fingerprint
   (d02's md5 fingerprint, smallest doc_id survives — d09's rule).
2. **Corpus exact**: one left-anti join against the admitted index's
   fingerprint column.
3. **Within-batch near-dup**: surviving docs band-join among themselves
   (d04's 4x4 MinHash bands); a candidate pair whose signature-estimated
   Jaccard (the Broder estimator, d14) reaches the threshold drops the
   larger doc_id.
4. **Corpus near-dup**: the remaining docs probe the admitted index's
   band relation (derived by projection from the stored signature
   columns); any corpus candidate at or above the threshold rejects the
   batch doc. Only batch-vs-corpus candidates are ever generated —
   admitted docs are never re-paired (d23's O(batch)-per-ingest shape).

State is the admitted index: one row per admitted doc carrying its
fingerprint and 16 minhash components — CONSTANT bytes per doc, no
shingle sets stored (estimation replaces exact verification at the
admission boundary; d14 is the audit that justifies the estimator).
The index lives under ``pipeline/manifest``'s versioned protocol using
the **append commit** (``append_version``): each batch writes only its
own parquet and carries every prior file by reference, so a micro-batch
costs O(batch) data + one KB-sized manifest at ANY corpus size — the
shape that survives 100 TB, where a per-batch state rewrite would be a
corpus-sized write every few seconds.

Crash/replay safety mirrors ``mv_maintenance``: immutable versioned
commits (a crash mid-append cannot corrupt the current index) and an
``applied_batch`` watermark — stored in the manifest's ``meta`` dict, so
the replay check is one manifest read, never a corpus scan. A replayed
foreachBatch id is a no-op.

``replay_admission`` is the batch twin: the same per-batch fold applied
sequentially without streaming machinery. The stream-equals-batch test
(tests/test_dedup_admission.py) proves the streamed index equals that
fold bit-for-bit, including across a kill-and-resume boundary.

Determinism: admission is order-dependent BY DESIGN (first writer wins,
like every ingest-time dedup); within a batch all tie-breaks are
doc_id-keyed, so a fixed batch partition of the input yields one exact
admitted set on both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.dedup import (
    _AB,
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_PRIME,
    MINHASH_ROWS,
    base_hash28,
    shingles,
)
from european_public_data_pipeline_spark.pipeline.manifest import (
    append_version,
    read_version,
    version_meta,
    versions,
)

_K = MINHASH_BANDS * MINHASH_ROWS


def _fingerprint() -> F.Column:
    """d02's normalized-text md5 fingerprint."""
    return F.md5(
        F.array_join(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), " ")
    )


def _signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, m0..m15) — d04's portable minhash columns."""
    fp = docs.select("doc_id", _fingerprint().alias("fingerprint"))
    sig = (
        shingles(docs)
        .withColumn("hv", base_hash28(F.col("shingle")))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    (F.lit(a) * F.col("hv") + F.lit(b)) % MINHASH_PRIME
                ).alias(f"m{i}")
                for i, (a, b) in enumerate(_AB)
            ]
        )
    )
    return fp.join(sig, "doc_id")


def _bands(sig: DataFrame, id_alias: str) -> DataFrame:
    """(id_alias, band_id, band_sig) derived by projection from the
    stored signature columns — nothing extra is persisted for banding."""
    band_struct = F.array(
        *[
            F.struct(
                F.lit(band).alias("band_id"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{band * MINHASH_ROWS + r}")
                        for r in range(MINHASH_ROWS)
                    ],
                ).alias("band_sig"),
            )
            for band in range(MINHASH_BANDS)
        ]
    )
    return sig.select(
        F.col("doc_id").alias(id_alias), F.explode(band_struct).alias("b")
    ).select(id_alias, F.col("b.band_id").alias("band_id"), F.col("b.band_sig").alias("band_sig"))


def _renamed_sig(sig: DataFrame, id_alias: str, prefix: str) -> DataFrame:
    """Signature columns renamed (doc_id -> id_alias, m<i> -> <prefix><i>)
    so pair joins need no frame aliases — d04's self-join-safe pattern."""
    return sig.select(
        F.col("doc_id").alias(id_alias),
        *[F.col(f"m{i}").alias(f"{prefix}{i}") for i in range(_K)],
    )


def _est_ge_threshold(l_prefix: str, r_prefix: str) -> F.Column:
    """Broder estimate (mean of equal components) at/above threshold, on
    a pair row carrying both renamed signature column sets."""
    eq = sum(
        F.when(F.col(f"{l_prefix}{i}") == F.col(f"{r_prefix}{i}"), 1).otherwise(0)
        for i in range(_K)
    )
    return eq.cast("double") / F.lit(float(_K)) >= F.lit(JACCARD_THRESHOLD)


def _admit_against(sig: DataFrame, state_sig: DataFrame | None) -> DataFrame:
    """The admission fold for one batch's signature relation against the
    admitted index (None for the first batch): returns the batch rows to
    admit, with all four rejection rules applied. Both the streaming body
    and the batch twin call THIS — one implementation, two drivers."""
    # 1. within-batch exact: keep-first per fingerprint.
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    sig = (
        sig.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    if state_sig is not None:
        # 2. corpus exact: the admitted index's fingerprints reject.
        sig = sig.join(
            state_sig.select("fingerprint"), "fingerprint", "left_anti"
        )
    sig = sig.cache()
    # 3. within-batch near-dup: band-bucket candidates, estimate, drop the
    # larger doc_id of any qualifying pair (pair-dominance, not transitive
    # keep-first: a doc matching ANY smaller batch doc drops, even if that
    # smaller doc itself dropped — the same rule on both twin paths).
    b1 = _bands(sig, "d1")
    b2 = _bands(sig, "d2")
    cand_in = (
        b1.join(b2, ["band_id", "band_sig"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    dropped = (
        cand_in.join(_renamed_sig(sig, "d1", "a"), "d1")
        .join(_renamed_sig(sig, "d2", "b"), "d2")
        .filter(_est_ge_threshold("a", "b"))
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )
    sig = sig.join(dropped, "doc_id", "left_anti")
    if state_sig is None:
        return sig
    # 4. corpus near-dup: batch-vs-corpus candidates only (d23's shape).
    sb = _bands(sig, "d1")
    cb = _bands(state_sig, "d2")
    cand_x = (
        sb.join(cb, ["band_id", "band_sig"]).select("d1", "d2").distinct()
    )
    rejected = (
        cand_x.join(_renamed_sig(sig, "d1", "a"), "d1")
        .join(_renamed_sig(state_sig, "d2", "b"), "d2")
        .filter(_est_ge_threshold("a", "b"))
        .select(F.col("d1").alias("doc_id"))
        .distinct()
    )
    return sig.join(rejected, "doc_id", "left_anti")


def admit_batch(
    spark: SparkSession, state_path: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Admit one micro-batch into the index at ``state_path`` (idempotent
    per batch_id, crash-safe, O(batch) committed; see module docstring)."""
    if batch_df.limit(1).count() == 0:
        return  # nothing to admit; do not advance the watermark
    has_state = bool(versions(spark, state_path))
    if has_state:
        last = version_meta(spark, state_path).get("applied_batch")
        if last is not None and last >= batch_id:
            return  # replayed batch: already absorbed (one manifest read)
    state_sig = read_version(spark, state_path) if has_state else None
    admitted = _admit_against(_signatures(batch_df), state_sig)
    # An all-rejected batch still commits an empty append: the manifest's
    # watermark must advance or every replay would redo the probe work.
    append_version(
        admitted.withColumn("applied_batch", F.lit(batch_id).cast("long")),
        state_path,
        meta={"applied_batch": batch_id},
    )


def ingest_documents(
    stream_df: DataFrame, state_path: str, checkpoint_path: str
):
    """Run admission over all available input (Trigger.AvailableNow).
    Re-invoking with the same checkpoint admits ONLY new files; the index
    at ``state_path`` always equals ``replay_admission`` over the same
    batch sequence, and prior index states stay time-travelable."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: admit_batch(spark, state_path, df, bid)
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_admitted(spark: SparkSession, state_path: str) -> DataFrame:
    """The current admitted index (manifest-committed view)."""
    return read_version(spark, state_path)


def replay_admission(
    spark: SparkSession, batches: list[DataFrame]
) -> DataFrame:
    """The batch twin: the same admission fold applied sequentially in
    batch order, no streaming machinery — what the streamed index must
    equal bit-for-bit (minus applied_batch bookkeeping)."""
    state: DataFrame | None = None
    for batch_df in batches:
        admitted = _admit_against(_signatures(batch_df), state)
        state = admitted if state is None else state.unionByName(admitted)
        state = state.cache()
    assert state is not None, "replay_admission needs at least one batch"
    return state
