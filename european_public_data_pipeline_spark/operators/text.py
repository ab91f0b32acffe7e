"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.12).

The training-data-pipeline surface the reference lacks: token statistics,
quality scoring, language identification, document fingerprinting, corpus
term frequencies. Everything is native ``pyspark.sql.functions`` — tokenize
with ``split``, per-document statistics with higher-order array functions
(no explode/shuffle for per-row stats), corpus-level stats with one
explode + groupBy.

Determinism contract (the driver hash-compares against DuckDB): every float
is either a single division of exact integers or an identically-shaped
expression on both sides, so results are bit-identical without rounding.

Scale notes (100 TB):
- Per-document metrics are narrow projections over the text column — no
  shuffle, whole-stage codegen end to end, trivially partition-parallel.
- Corpus term frequency is one explode + map-side-combined groupBy on the
  token key; vocabulary is tiny relative to corpus so the shuffle is small.
- Language-ID is a stopword-ratio heuristic (the classic cheap LID baseline;
  fasttext-style models would slot in as a Pandas UDF without changing the
  plan shape).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table

# Public, tiny stopword profiles for the heuristic language identifier.
# Deliberately small and disjoint enough for a deterministic argmax; order
# of LANGS is the tie-break order (alphabetical).
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "en": ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"],
    "es": ["el", "los", "las", "una", "es", "en", "y", "por", "con", "para"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "dans", "que", "pour"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "就", "不", "人"],
}
LANGS = sorted(STOPWORDS)


def tokens(col: str = "text") -> F.Column:
    """Whitespace tokenization of a trimmed text column."""
    return F.split(F.trim(F.col(col)), r"\s+")


_SQL_TOKENS = "string_split_regex(trim(text), '\\s+')"


@register(
    "t01_token_stats",
    category="text",
    doc="Per-document token statistics via higher-order array functions — "
    "token count, distinct tokens, type-token ratio, mean token length. "
    "No shuffle: every metric is computed inside the row.",
    oracle=f"""
SELECT doc_id,
       len(w) AS n_tokens,
       len(list_distinct(w)) AS n_distinct,
       CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
       CAST(list_reduce(list_transform(w, t -> CAST(len(t) AS BIGINT)), (a, b) -> a + b) AS DOUBLE)
         / len(w) AS mean_token_len
FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
ORDER BY doc_id
""",
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = tokens()
    n = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    total_len = F.aggregate(
        F.transform(w, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            n_distinct.alias("n_distinct"),
            (n_distinct.cast("double") / n).alias("ttr"),
            (total_len.cast("double") / n).alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "t02_quality_score",
    category="text",
    doc="Per-document quality heuristics (length score, stopword ratio, "
    "repetition ratio, non-alpha ratio) and a weighted composite — the "
    "standard pre-training corpus filter stack as narrow column ops.",
    oracle=f"""
SELECT doc_id,
       n_tokens,
       CAST(least(n_tokens, 100) AS DOUBLE) / 100 AS len_score,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(max_freq AS DOUBLE) / n_tokens AS repetition_ratio,
       CAST(n_nonalpha AS DOUBLE) / n_tokens AS nonalpha_ratio,
       0.25 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100)
         + 0.25 * (CAST(n_stop AS DOUBLE) / n_tokens)
         + 0.25 * (1 - CAST(max_freq AS DOUBLE) / n_tokens)
         + 0.25 * (1 - CAST(n_nonalpha AS DOUBLE) / n_tokens) AS quality_score
FROM (
  SELECT doc_id,
         len(w) AS n_tokens,
         len(list_filter(w, t -> list_contains({STOPWORDS['en']!r}, t))) AS n_stop,
         list_max(list_transform(list_distinct(w),
                  t -> len(list_filter(w, x -> x = t)))) AS max_freq,
         len(list_filter(w, t -> NOT regexp_matches(t, '^[A-Za-z]+$'))) AS n_nonalpha
  FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
)
ORDER BY doc_id
""",
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = tokens()
    stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    base = docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.filter(w, lambda t: F.array_contains(stop, t))).alias("n_stop"),
        F.array_max(
            F.transform(
                F.array_distinct(w),
                lambda t: F.size(F.filter(w, lambda x: x == t)),
            )
        ).alias("max_freq"),
        F.size(F.filter(w, lambda t: ~t.rlike("^[A-Za-z]+$"))).alias("n_nonalpha"),
    )
    n = F.col("n_tokens")
    len_score = F.least(n, F.lit(100)).cast("double") / 100
    stop_ratio = F.col("n_stop").cast("double") / n
    rep_ratio = F.col("max_freq").cast("double") / n
    nonalpha_ratio = F.col("n_nonalpha").cast("double") / n
    return (
        base.select(
            "doc_id",
            "n_tokens",
            len_score.alias("len_score"),
            stop_ratio.alias("stopword_ratio"),
            rep_ratio.alias("repetition_ratio"),
            nonalpha_ratio.alias("nonalpha_ratio"),
            (
                0.25 * len_score
                + 0.25 * stop_ratio
                + 0.25 * (1 - rep_ratio)
                + 0.25 * (1 - nonalpha_ratio)
            ).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


def _lid_case_sql() -> str:
    """CASE chain implementing argmax with alphabetical tie-break."""
    arms = []
    for lang in LANGS:
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in LANGS if other != lang
        )
        arms.append(f"WHEN {conds} THEN '{lang}'")
    greatest = ", ".join(f"s_{lang}" for lang in LANGS)
    return (
        f"CASE WHEN greatest({greatest}) = 0 THEN 'und' "
        + " ".join(arms)
        + " ELSE 'und' END"
    )


@register(
    "t03_lang_id",
    category="text",
    doc="Heuristic language identification: per-language stopword hit "
    "ratios + deterministic argmax (ties break alphabetically, all-zero "
    "scores give 'und'). Validated by parity with an identically-shaped "
    "SQL computation; on real corpora the stopword profiles do the work.",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang, {', '.join(f's_{lang}' for lang in LANGS)},
       {_lid_case_sql()} AS predicted_lang
FROM (
  SELECT doc_id, lang,
         {', '.join(
             f"CAST(len(list_filter(w, t -> list_contains({STOPWORDS[lang]!r}, t))) AS DOUBLE) / len(w) AS s_{lang}"
             for lang in LANGS
         )}
  FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS w FROM documents)
)
ORDER BY doc_id
""",
)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = tokens()
    def stop_ratio(lang: str) -> F.Column:
        arr = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        return (
            F.size(F.filter(w, lambda t: F.array_contains(arr, t))).cast("double")
            / F.size(w)
        ).alias(f"s_{lang}")

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[stop_ratio(lang) for lang in LANGS],
    )
    pred = F.when(F.greatest(*[F.col(f"s_{lang}") for lang in LANGS]) == 0, F.lit("und"))
    for lang in LANGS:
        cond = None
        for other in LANGS:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return scored.withColumn("predicted_lang", pred).orderBy("doc_id")


@register(
    "t04_fingerprint",
    category="text",
    doc="Document fingerprinting: md5 over whitespace-normalized lowercased "
    "text (the exact-dedup key) plus a 60-bit integer prefix hash usable as "
    "a shard/bucket key at scale.",
    oracle="""
SELECT doc_id,
       md5(norm) AS fingerprint,
       CAST('0x' || substr(md5(norm), 1, 15) AS BIGINT) AS fingerprint60
FROM (
  SELECT doc_id, array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ') AS norm
  FROM documents
)
ORDER BY doc_id
""",
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.array_join(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), " ")
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fingerprint60"),
    ).orderBy("doc_id")


# BPE-ish pre-tokenization pattern (letters / digits / single punctuation),
# the classic GPT-2-style split shape; compatible Java-regex / RE2 subset.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

ROLL_BASE = 257
ROLL_PRIME = 1_000_000_007


@register(
    "t06_bpe_token_count",
    category="text",
    doc="BPE-ish token counting: regex pre-tokenization (letter runs / "
    "digit runs / single punctuation — the GPT-2 split shape) next to the "
    "whitespace count, plus the sub-token expansion ratio used for "
    "token-budget estimation in training pipelines.",
    oracle=f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
         / len(string_split_regex(trim(text), '\\s+')) AS expansion_ratio
FROM documents
ORDER BY doc_id
""",
)
def t06_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(tokens())
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / ws).alias("expansion_ratio"),
    ).orderBy("doc_id")


@register(
    "t07_rolling_hash_fingerprint",
    category="text",
    doc="Rolling polynomial hash fingerprint (Rabin-Karp over the token "
    "stream, base 257 mod 1e9+7) — order-sensitive unlike the md5 set "
    "fingerprint (t04), so reordered documents get different prints; "
    "identical sequential fold on both engines.",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_transform(string_split_regex(trim(text), '\\s+'),
                        t -> CAST('0x' || substr(md5(t), 1, 7) AS BIGINT)),
         (a, b) -> (a * {ROLL_BASE} + b) % {ROLL_PRIME}
       ) AS rolling_fp
FROM documents
ORDER BY doc_id
""",
)
def t07_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashes = F.transform(
        tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint"),
    )
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda a, b: (a * ROLL_BASE + b) % ROLL_PRIME,
    )
    return docs.select("doc_id", fp.alias("rolling_fp")).orderBy("doc_id")


@register(
    "t05_term_frequency",
    category="text",
    bench=True,
    doc="Corpus term frequency with document frequency and rank — one "
    "explode + map-side-combined groupBy on the token key; the aggregate "
    "output is vocabulary-sized, tiny relative to the corpus.",
    oracle=f"""
SELECT token, tf, df, rank FROM (
  SELECT token, tf, df,
         ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rank
  FROM (
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
    GROUP BY token
  )
)
WHERE rank <= 20
ORDER BY rank
""",
)
def t05_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select("doc_id", F.explode(tokens()).alias("token"))
    freq = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    # Top-k WITHOUT a global window: orderBy().limit(k) compiles to a
    # distributed TakeOrderedAndProject (per-partition top-k, driver merge) —
    # a 100 TB vocabulary never single-partition-sorts. Rank is then derived
    # on the k-row result by sorting a collected struct array (no WindowExec).
    top = freq.orderBy(F.desc("tf"), F.asc("token")).limit(20)
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                (-F.col("tf")).alias("neg_tf"),
                F.col("token"),
                F.col("tf"),
                F.col("df"),
            )
        )
    )
    return (
        top.agg(arr.alias("a"))
        .select(F.posexplode("a").alias("pos", "s"))
        .select(
            F.col("s.token").alias("token"),
            F.col("s.tf").alias("tf"),
            F.col("s.df").alias("df"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
        .orderBy("rank")
    )


CHUNK_TOKENS = 50
CHUNK_STRIDE = 25


@register(
    "t08_chunk_windows",
    category="text",
    doc="Overlapping token-window chunking (50-token windows, stride 25) — "
    "the sequence-prep step that turns documents into training samples. "
    "Chunk boundaries come from a per-row `sequence` + `posexplode` (no "
    "UDF, no shuffle: row-local fan-out inside the scan stage); chunks are "
    "emitted as md5 content hashes so the output is join-able for chunk-"
    "level dedup without shipping the text twice.",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_TOKENS} AS words FROM documents),
s AS (
  SELECT doc_id, words, i AS start,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_idx
  FROM w, UNNEST(generate_series(1, greatest(1, len(words) - {CHUNK_TOKENS - 1}), {CHUNK_STRIDE})) AS t(i)
)
SELECT doc_id, chunk_idx,
       len(words[start : start + {CHUNK_TOKENS - 1}]) AS n_tokens,
       md5(array_to_string(words[start : start + {CHUNK_TOKENS - 1}], ' ')) AS chunk_hash
FROM s
ORDER BY doc_id, chunk_idx
""",
)
def t08_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.col("w"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), n - (CHUNK_TOKENS - 1)),
        F.lit(CHUNK_STRIDE),
    )
    chunk = F.slice(F.col("w"), F.col("start"), CHUNK_TOKENS)
    return (
        docs.select("doc_id", tokens().alias("w"))
        .select("doc_id", "w", F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size(chunk).alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "t10_repetition_signals",
    category="text",
    doc="Gopher-style repetition signals per document: duplicate bigram / "
    "trigram fractions (share of n-gram occurrences that repeat an earlier "
    "one), top-bigram fraction (mass of the single most frequent bigram), "
    "and the longest consecutive run of one token. All computed row-locally "
    "with higher-order array functions — no explode, no shuffle; every "
    "ratio is one division of exact integers so parity needs no rounding. "
    "The run length uses change-point positions: tokens w[i] != w[i-1] "
    "mark boundaries, and the max gap between consecutive boundaries is "
    "the longest run — O(n) instead of a per-row sequential fold.",
    oracle="""
SELECT doc_id,
       n_tokens,
       CAST(n_bg - n_bg_distinct AS DOUBLE) / n_bg AS dup_bigram_frac,
       CAST(top_bg AS DOUBLE) / n_bg AS top_bigram_frac,
       CAST(n_tg - n_tg_distinct AS DOUBLE) / n_tg AS dup_trigram_frac,
       CAST(max_run AS BIGINT) AS max_token_run
FROM (
  SELECT doc_id,
         len(w) AS n_tokens,
         len(bg) AS n_bg,
         len(list_distinct(bg)) AS n_bg_distinct,
         list_max(list_transform(list_distinct(bg),
                  t -> len(list_filter(bg, x -> x = t)))) AS top_bg,
         len(tg) AS n_tg,
         len(list_distinct(tg)) AS n_tg_distinct,
         CASE WHEN len(w) < 2 THEN len(w) ELSE (
           SELECT max(b[k+1] - b[k])
           FROM (SELECT [1] || list_filter(generate_series(2, len(w)),
                                           i -> w[i] != w[i-1])
                        || [len(w) + 1] AS b),
                UNNEST(generate_series(1, len(b) - 1)) AS t(k)
         ) END AS max_run
  FROM (
    SELECT doc_id, w,
           list_transform(generate_series(1, len(w) - 1),
                          i -> concat_ws(' ', w[i], w[i+1])) AS bg,
           list_transform(generate_series(1, len(w) - 2),
                          i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS tg
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM documents)
  )
)
ORDER BY doc_id
""",
)
def t10_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.col("w")
    n = F.size(w)

    def grams(k: int) -> F.Column:
        return F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        )

    base = docs.select("doc_id", tokens().alias("w")).select(
        "doc_id", "w", grams(2).alias("bg"), grams(3).alias("tg")
    )
    bg, tg = F.col("bg"), F.col("tg")
    top_bg = F.array_max(
        F.transform(
            F.array_distinct(bg), lambda t: F.size(F.filter(bg, lambda x: x == t))
        )
    )
    # Change-point positions i (1-indexed, 2..n) where w[i] != w[i-1];
    # padded with 1 and n+1, consecutive gaps are the run lengths.
    boundaries = F.concat(
        F.array(F.lit(1)),
        F.filter(
            F.sequence(F.lit(2), n),
            lambda i: F.element_at(w, i) != F.element_at(w, i - 1),
        ),
        F.array(n + 1),
    )
    max_run = F.array_max(
        F.transform(
            F.sequence(F.lit(1), F.size(boundaries) - 1),
            lambda k: F.element_at(boundaries, k + 1) - F.element_at(boundaries, k),
        )
    )
    n_bg, n_tg = F.size(bg), F.size(tg)
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        ((n_bg - F.size(F.array_distinct(bg))).cast("double") / n_bg).alias(
            "dup_bigram_frac"
        ),
        (top_bg.cast("double") / n_bg).alias("top_bigram_frac"),
        ((n_tg - F.size(F.array_distinct(tg))).cast("double") / n_tg).alias(
            "dup_trigram_frac"
        ),
        F.when(n < 2, n).otherwise(max_run).cast("bigint").alias("max_token_run"),
    ).orderBy("doc_id")


_SQL_SCORED_WITH_LANG = f"""
SELECT doc_id, lang,
       0.25 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100)
         + 0.25 * (CAST(n_stop AS DOUBLE) / n_tokens)
         + 0.25 * (1 - CAST(max_freq AS DOUBLE) / n_tokens)
         + 0.25 * (1 - CAST(n_nonalpha AS DOUBLE) / n_tokens) AS quality_score
FROM (
  SELECT doc_id, lang,
         len(w) AS n_tokens,
         len(list_filter(w, t -> list_contains({STOPWORDS['en']!r}, t))) AS n_stop,
         list_max(list_transform(list_distinct(w),
                  t -> len(list_filter(w, x -> x = t)))) AS max_freq,
         len(list_filter(w, t -> NOT regexp_matches(t, '^[A-Za-z]+$'))) AS n_nonalpha
  FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS w FROM documents)
)
"""


@register(
    "t09_quality_percentile_filter",
    category="text",
    doc="Per-language quality gate: keep documents whose t02 composite "
    "score is strictly above the language's 25th percentile — the "
    "'drop the worst quartile per stratum' corpus filter. Shape: score "
    "(narrow, shuffle-free) -> tiny per-stratum quantile aggregate -> "
    "broadcast join back -> filter. Parity-safe without rounding: scores "
    "are bit-identical (t02), and a strict comparison against an "
    "interpolated threshold cannot flip because no data point lies "
    "strictly between adjacent order statistics.",
    oracle=f"""
WITH scored AS ({_SQL_SCORED_WITH_LANG}),
thr AS (
  SELECT lang, quantile_cont(quality_score, 0.25) AS lang_p25
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.quality_score, t.lang_p25
FROM scored s JOIN thr t USING (lang)
WHERE s.quality_score > t.lang_p25
ORDER BY s.doc_id
""",
)
def t09_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = t02_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    s = scored.join(docs.select("doc_id", "lang"), "doc_id")
    thr = s.groupBy("lang").agg(
        F.percentile("quality_score", F.lit(0.25)).alias("lang_p25")
    )
    return (
        s.join(F.broadcast(thr), "lang")
        .filter(F.col("quality_score") > F.col("lang_p25"))
        .select("doc_id", "lang", "quality_score", "lang_p25")
        .orderBy("doc_id")
    )


TFIDF_TOPK = 5


@register(
    "t11_tfidf_topk",
    category="text",
    doc="Top-5 characteristic terms per document by TF-IDF. The idf is the "
    "rational form N/df (not log(N/df)): libm log differs in the last ulp "
    "across engines, a ratio of exact integers does not, and the induced "
    "ranking for a fixed corpus is monotone-equivalent. Shape: one explode "
    "+ one (doc, token) aggregation; df then falls out of the aggregated "
    "tf relation itself as a token-partitioned window count (distinct docs "
    "per token == rows per token in tf), so the corpus is scanned and "
    "exploded exactly ONCE — the df shuffle moves only the vocabulary-"
    "compressed tf relation, never raw tokens. Final window top-k "
    "partitions by doc_id, the natural high-cardinality key — no skew.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
WHERE rk <= {TFIDF_TOPK}
ORDER BY doc_id, tfidf DESC, token
""",
)
def t11_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df falls out of tf: distinct docs per token == rows per token in the
    # already-aggregated tf relation, computed as a token-partitioned window
    # count so the exploded corpus is scanned exactly once (a separate
    # groupBy-derived df would re-scan and re-explode: the two agg exchanges
    # prune differently and are not reuse-eligible).
    n_docs = docs.count()
    w_tok = Window.partitionBy("token")
    scored = tf.select(
        "doc_id",
        "token",
        "tf",
        F.count(F.lit(1)).over(w_tok).alias("df"),
    ).withColumn("tfidf", (F.col("tf") * n_docs).cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOPK)
        .drop("rk")
        .orderBy("doc_id", F.desc("tfidf"), "token")
    )


@register(
    "t12_corpus_head_mass",
    category="text",
    doc="Corpus frequency-concentration report (the Zipf head check run "
    "before vocabulary decisions): vocabulary size, total token count, "
    "share of all occurrences covered by the top-10 and the top-1% of "
    "vocabulary, and the singleton (hapax) share. One explode + groupBy "
    "to vocabulary size, one global window rank over the (tiny) "
    "vocabulary relation, one final single-row aggregate — every ratio "
    "is a division of exact integers. The 1% cutoff uses integer "
    "ceiling ((v+99) div 100), identical in both engines.",
    oracle=f"""
WITH tf AS (
  SELECT token, COUNT(*) AS tf
  FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
  GROUP BY token
),
r AS (
  SELECT tf,
         ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rk,
         COUNT(*) OVER () AS vocab
  FROM tf
)
SELECT CAST(MAX(vocab) AS BIGINT) AS vocab_size,
       CAST(SUM(tf) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN rk <= 10 THEN tf ELSE 0 END) AS DOUBLE)
         / CAST(SUM(tf) AS BIGINT) AS top10_mass,
       CAST(SUM(CASE WHEN rk <= (vocab + 99) // 100 THEN tf ELSE 0 END) AS DOUBLE)
         / CAST(SUM(tf) AS BIGINT) AS top1pct_mass,
       CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(MAX(vocab) AS BIGINT) AS singleton_share
FROM r
""",
)
def t12_corpus_head_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale shape: head MASS only depends on tf VALUES, never on token
    # identity (every token in a tied-tf group contributes exactly tf), so
    # the global rank window of the naive form is unnecessary. Aggregate the
    # vocabulary down to the distinct-frequency relation (Zipf: |distinct tf|
    # ≪ vocab), collect THAT as one sorted array, and fold cumulative head
    # sums with higher-order functions — no WindowExec, no single-partition
    # sort of a 100 TB vocabulary anywhere in the plan.
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tfcnt = tf.groupBy("tf").agg(F.count(F.lit(1)).cast("long").alias("n"))
    arr = tfcnt.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("tf"), F.col("n"))), asc=False
        ).alias("a")
    )

    def head_mass(cutoff):
        # fold: acc = (cum_tokens, head_sum); a tied-tf group contributes
        # tf * min(n, remaining slots under the cutoff).
        return F.aggregate(
            F.col("a"),
            F.struct(
                F.lit(0).cast("long").alias("cum"), F.lit(0).cast("long").alias("s")
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["n"]).alias("cum"),
                (
                    acc["s"]
                    + x["tf"]
                    * F.greatest(
                        F.lit(0).cast("long"),
                        F.least(x["n"], cutoff - acc["cum"]),
                    )
                ).alias("s"),
            ),
            lambda acc: acc["s"],
        )

    stats = arr.select(
        "a",
        F.aggregate(
            "a", F.lit(0).cast("long"), lambda acc, x: acc + x["n"]
        ).alias("vocab"),
        F.aggregate(
            "a", F.lit(0).cast("long"), lambda acc, x: acc + x["tf"] * x["n"]
        ).alias("total"),
        F.aggregate(
            "a",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x["tf"] == 1, x["n"]).otherwise(F.lit(0)),
        ).alias("singletons"),
    )
    cutoff = F.expr("(vocab + 99) div 100")
    return stats.select(
        F.col("vocab").alias("vocab_size"),
        F.col("total").alias("total_tokens"),
        (head_mass(F.lit(10).cast("long")).cast("double") / F.col("total")).alias(
            "top10_mass"
        ),
        (head_mass(cutoff).cast("double") / F.col("total")).alias("top1pct_mass"),
        (F.col("singletons").cast("double") / F.col("vocab")).alias(
            "singleton_share"
        ),
    )


LEXICON_K = 1000


@register(
    "t13_vocab_coverage",
    category="text",
    doc="Out-of-vocabulary rate per document against a corpus-derived "
    "lexicon (the top-1000 tokens by frequency, ties broken "
    "alphabetically) — the tokenizer-coverage check run before committing "
    "to a vocabulary: documents with high OOV rates are the ones a fixed "
    "vocab will shred into bytes. Shape: the lexicon is a distributed "
    "TakeOrdered over the token-frequency aggregate (vocabulary-sized "
    "input, k-row output) broadcast back onto the exploded token stream; "
    "per-doc rollup is one map-side-combined groupBy on doc_id. No global "
    "sort, no second corpus scan for the lexicon probe.",
    oracle=f"""
WITH tf AS (
  SELECT token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
  GROUP BY token
),
lex AS (SELECT token FROM tf ORDER BY tf DESC, token LIMIT {LEXICON_K}),
tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN l.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN l.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS oov_rate
FROM tok t LEFT JOIN lex l ON t.token = l.token
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def t13_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    lex = (
        freq.orderBy(F.desc("tf"), F.asc("token"))
        .limit(LEXICON_K)
        .select("token", F.lit(True).alias("in_lex"))
    )
    return (
        tok.join(F.broadcast(lex), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_lex").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .withColumn("oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens"))
        .orderBy("doc_id")
    )


@register(
    "t14_unigram_cross_entropy",
    category="text",
    doc="Per-document cross-entropy under the corpus unigram language "
    "model — the classic LM-based quality/perplexity proxy for training-"
    "data filtering (low-entropy docs are boilerplate, high-entropy docs "
    "are noise). Per-token surprisal -ln(count/total) is fixed-pointed to "
    "integer micro-nats (floor*1e6) so the per-doc SUM is an exact integer "
    "fold, order-independent across partitions and engines; the mean is "
    "then one IEEE division of exact values. Shape: one token-key shuffle "
    "builds the vocabulary (map-side combined), the probe re-joins tokens "
    "to their counts on the token key, one doc-key shuffle aggregates — "
    "all corpus-linear; the vocabulary relation is aggregate-sized. At "
    "100 TB the probe join shuffles on the token key (or broadcasts a "
    "truncated lexicon); nothing is quadratic.",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents),
vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
sur AS (
  SELECT token,
         CAST(floor(-ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT)
           AS micronats
  FROM vocab, tot
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(s.micronats) AS BIGINT) AS sum_micronats,
       CAST(CAST(SUM(s.micronats) AS BIGINT) AS DOUBLE) / COUNT(*)
         AS avg_micronats
FROM tok t JOIN sur s ON t.token = s.token
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def t14_unigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Both the vocabulary build and the probe scan the token relation —
    # cache it so the explode runs once per session (same pattern as d10's
    # shingle relation; at 100 TB prefer recomputation over caching a
    # corpus-sized relation and let the two branches share the scan stage).
    tok = docs.select("doc_id", F.explode(tokens()).alias("token")).cache()
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    sur = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(-F.log(F.col("cnt") / F.col("total")) * 1e6)
        .cast("long")
        .alias("micronats"),
    )
    return (
        tok.join(sur, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("micronats").alias("sum_micronats"),
        )
        .withColumn(
            "avg_micronats",
            F.col("sum_micronats").cast("double") / F.col("n_tokens"),
        )
        .orderBy("doc_id")
    )


# PII surface patterns — deliberately restricted to syntax that Java regex
# (Spark) and RE2 (DuckDB) interpret identically: character classes,
# bounded repetition, \b word boundaries, one optional leading +. Cross-
# engine agreement is pinned by the t15 oracle hash check.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"(\+?\d[\d\-() ]{7,}\d)"

_T15_ORACLE = """
SELECT doc_id,
       len(regexp_extract_all(text, '{email}')) AS n_emails,
       len(regexp_extract_all(text, '{ip}')) AS n_ips,
       len(regexp_extract_all(text, '{phone}')) AS n_phones,
       len(regexp_extract_all(text, '{email}'))
         + len(regexp_extract_all(text, '{ip}'))
         + len(regexp_extract_all(text, '{phone}')) AS n_pii,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{email}', '<EMAIL>', 'g'),
             '{ip}', '<IP>', 'g'),
             '{phone}', '<PHONE>', 'g')) AS redacted_md5
FROM documents
ORDER BY doc_id
""".format(email=PII_EMAIL, ip=PII_IPV4, phone=PII_PHONE)


@register(
    "t15_pii_redaction",
    category="text",
    doc="PII detection and redaction over the text column — the scrub "
    "pass every training-data pipeline runs before anything ships: "
    "per-document email / IPv4 / phone-number match counts on the raw "
    "text plus an md5 fingerprint of the redacted text (email -> ip -> "
    "phone substitution order, identical in the oracle, so the hash "
    "pins byte-exact redaction parity across engines). Regex surface "
    "kept to the Java/RE2 common subset. Shape: pure row-local "
    "projection — no shuffle, whole-stage codegen end to end; at 100 TB "
    "this is scan-bound and embarrassingly parallel. A production NER "
    "model would slot in as an Arrow-batched mapInPandas stage without "
    "changing the plan shape; the regex tier stays as the cheap "
    "first-pass filter.",
    oracle=_T15_ORACLE,
)
def t15_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_emails = F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0))
    n_ips = F.size(F.regexp_extract_all("text", F.lit(PII_IPV4), 0))
    n_phones = F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        (n_emails + n_ips + n_phones).alias("n_pii"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


def _t16_oracle() -> str:
    scores = ", ".join(
        f"CAST(len(list_filter(w, t -> list_contains({STOPWORDS[lang]!r}, t))) AS DOUBLE)"
        f" / len(w) AS s_{lang}"
        for lang in LANGS
    )
    return f"""
WITH pred AS (
  SELECT doc_id, lang AS labeled_lang, {_lid_case_sql()} AS predicted_lang
  FROM (
    SELECT doc_id, lang, {scores}
    FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS w FROM documents)
  )
),
cm AS (
  SELECT labeled_lang, predicted_lang, COUNT(*) AS n
  FROM pred GROUP BY 1, 2
),
tot AS (SELECT labeled_lang, SUM(n) AS label_total FROM cm GROUP BY 1)
SELECT c.labeled_lang, c.predicted_lang, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / t.label_total AS label_share
FROM cm c JOIN tot t ON t.labeled_lang = c.labeled_lang
ORDER BY c.labeled_lang, c.predicted_lang
"""


@register(
    "t16_langid_confusion",
    category="text",
    doc="Language-label noise audit: the confusion matrix between the "
    "corpus's labeled language and the heuristic identifier's prediction "
    "(t03), with each cell's share of its labeled row — the "
    "label-quality gate run before trusting per-language sampling or "
    "mixture weights (sm07/sm08 allocate budget by the label; a noisy "
    "label silently reallocates training mass). Per-doc scoring is "
    "row-local HOFs; the matrix is a lang-cardinality aggregate (25 "
    "cells), so the only shuffle moves a language-pair-sized relation.",
    oracle=_t16_oracle(),
)
def t16_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = t03_lang_id(spark, sf_dir).select("labeled_lang", "predicted_lang")
    cm = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cm.groupBy("labeled_lang").agg(F.sum("n").alias("label_total"))
    return (
        cm.join(F.broadcast(tot), "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            (F.col("n").cast("double") / F.col("label_total")).alias("label_share"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


BM25_QUERY_TERMS = ("spark", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "t17_bm25_scoring",
    category="text",
    bench=True,
    doc="BM25 relevance scoring of the corpus against a fixed query — the "
    "retrieval primitive behind RAG candidate generation and data-"
    "selection-by-query curation. Scale shape: the exploded token stream "
    "is filtered to the broadcast query vocabulary BEFORE any shuffle, "
    "so tf is a (matching-docs x |query|)-sized aggregate and df falls "
    "out of tf as a |query|-row rollup; document length is computed "
    "row-locally (size(split(...)), no explode), and N/avgdl travel as "
    "one broadcast row. Only docs hitting >=1 query term survive — the "
    "output is sparse, never corpus-wide. Per-term contributions are "
    "rounded to integer micro-points and summed as BIGINTs, so the "
    "cross-engine hash cannot wobble on libm's last ulp or on float "
    "summation order.",
    oracle=f"""
WITH dl AS (
  SELECT doc_id, len({_SQL_TOKENS}) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
  WHERE token IN ('spark', 'window', 'merge')
  GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
),
contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           (LN(1 + (CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
            * ((CAST(tf.tf AS DOUBLE) * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avgdl)))))
           * 1000000.0) AS BIGINT) AS micro
  FROM tf
  JOIN df USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(SUM(micro) AS BIGINT) AS score_micro,
       CAST(SUM(micro) AS DOUBLE) / 1000000.0 AS bm25
FROM contrib
GROUP BY doc_id
ORDER BY score_micro DESC, doc_id
""",
)
def t17_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # dl feeds BOTH the corpus stats aggregate and the per-doc norm join;
    # uncached, each reference re-tokenizes every document (the dominant
    # cost), so the corpus was tokenized 3x per run (dl x2 + tok).  Caching
    # the doc-cardinality (doc_id, int) relation makes it once for dl and
    # once for tok: measured 1.000 -> 0.949 s min-of-5 cold (sf0.1, noop).
    # Scatter and caching the exploded tok relation both measured WORSE
    # (1.35x / 1.39x) -- the explode is cheap, the tokenize is not.
    # MEMORY_AND_DISK serialized: ~16 B/doc, spills gracefully at corpus
    # scale; lifecycle is LRU eviction on the shared session (see PLANS.md).
    dl = docs.select("doc_id", F.size(tokens()).alias("dl")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    tf = (
        tok.filter(F.col("token").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * norm * F.lit(1000000.0), 0).cast("long").alias("micro"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_hit_terms",
            "score_micro",
            (F.col("score_micro").cast("double") / F.lit(1000000.0)).alias("bm25"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
    )


@register(
    "t18_zipf_slope",
    category="text",
    doc="Zipf law fit over the corpus head: log-log OLS slope of "
    "frequency vs rank for the top-1000 tokens — the one-number "
    "distribution-shape diagnostic (natural text ~ -1; templated or "
    "synthetic corpora flatten it) run before mixing a new source into "
    "training data. Determinism: ln(rank) and ln(tf) are fixed-pointed "
    "to integer micro-nats (floor*1e6, t14's construction) so all five "
    "OLS sums are exact bigint folds, order-independent across "
    "partitions and engines; slope/intercept are then identical double "
    "arithmetic on identical exact integers. Shape: one explode + "
    "map-side-combined groupBy to vocabulary size, top-k via "
    "orderBy().limit(k) (TakeOrderedAndProject — per-partition top-k, "
    "driver merge, no single-partition sort of a 100 TB vocabulary), "
    "rank assigned by posexplode of the one sorted k-row array, one "
    "single-row aggregate for the sums.",
    oracle=f"""
WITH tf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
  GROUP BY token
),
top AS (SELECT token, tf FROM tf ORDER BY tf DESC, token LIMIT 1000),
xy AS (
  SELECT CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(floor(ln(CAST(tf AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM top
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM xy
)
SELECT n, sx, sy, sxy, sxx,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS zipf_slope
FROM s
""",
)
def t18_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    top = tf.orderBy(F.desc("tf"), F.asc("token")).limit(1000)
    # Rank WITHOUT a window: sort the collected k-row array (k bounded at
    # 1000) and posexplode — pos+1 is exactly ROW_NUMBER ordered by
    # (tf DESC, token) because struct sort is lexicographic on
    # (-tf, token).
    arr = top.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("tf")).alias("neg_tf"), "token", "tf"))
        ).alias("a")
    )
    xy = arr.select(F.posexplode("a").alias("pos", "s")).select(
        F.floor(F.log((F.col("pos") + 1).cast("double")) * 1e6)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("s.tf").cast("double")) * 1e6).cast("long").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    return s.select(
        "n", "sx", "sy", "sxy", "sxx",
        ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)).alias("zipf_slope"),
    )


@register(
    "t19_heaps_law_fit",
    category="text",
    doc="Heaps' law fit across sources: each source contributes one "
    "(total tokens N, distinct vocabulary V) point and the V = K*N^beta "
    "growth law is fit by log-log OLS — the vocabulary-growth "
    "diagnostic that says whether a new source keeps adding novel "
    "types (natural text: beta ~0.4-0.6) or is template spam (beta -> "
    "0). Same determinism recipe as t18: ln values fixed-pointed to "
    "integer micro-nats so the OLS sums are exact bigint folds; "
    "slope/intercept are identical double arithmetic on exact "
    "integers. Shape: ONE corpus explode + one (source, token) "
    "shuffle; both N (sum of counts) and V (row count) then fall out "
    "of the same aggregated relation in a source-keyed second "
    "aggregate that is source-cardinality-sized. Nothing rescans the "
    "corpus; at 100 TB the only fact-sized op is the first combinable "
    "groupBy.",
    oracle=f"""
WITH tf AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest({_SQL_TOKENS}) AS token FROM documents)
  GROUP BY source, token
),
pts AS (
  SELECT source,
         CAST(floor(ln(CAST(SUM(cnt) AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(floor(ln(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM tf GROUP BY source
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n, sx, sy, sxy, sxx,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS heaps_beta
FROM s
""",
)
def t19_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(tokens()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pts = tf.groupBy("source").agg(
        F.floor(F.log(F.sum("cnt").cast("double")) * 1e6).cast("long").alias("x"),
        F.floor(F.log(F.count(F.lit(1)).cast("double")) * 1e6)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    return s.select(
        "n", "sx", "sy", "sxy", "sxx",
        ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)).alias("heaps_beta"),
    )


@register(
    "t20_source_kl_divergence",
    category="text",
    doc="Per-source KL divergence from the corpus unigram distribution — "
    "the distribution-shift gate run before admitting a new source into "
    "a training mix (high KL = off-domain or templated; near-zero = "
    "redundant with what the corpus already has). Per-token terms "
    "cnt_s * (ln cnt_s - ln total_s - ln cnt_corpus + ln total_corpus) "
    "are fixed-pointed to integer micro-nats and summed as "
    "DECIMAL(38,0) (t14's recipe at corpus magnitudes), so the fold is "
    "partition-order invariant and cross-engine exact; KL(nats) is one "
    "final double division. Shape: ONE corpus explode feeds both the "
    "(source, token) and token aggregations (vocabulary-sized "
    "relations); the per-source probe joins on the token key. Nothing "
    "rescans the corpus; every source's token set is a subset of the "
    "corpus vocabulary, so no zero-denominator terms exist.",
    oracle=f"""
WITH tok AS (SELECT source, unnest({_SQL_TOKENS}) AS token FROM documents),
st AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt_s
  FROM tok GROUP BY source, token
),
stot AS (
  SELECT source, CAST(SUM(cnt_s) AS BIGINT) AS total_s FROM st GROUP BY source
),
vocab AS (
  SELECT token, CAST(SUM(cnt_s) AS BIGINT) AS cnt_all FROM st GROUP BY token
),
ctot AS (SELECT CAST(SUM(cnt_all) AS BIGINT) AS total_all FROM vocab),
terms AS (
  SELECT st.source,
         st.cnt_s
           * CAST(floor((ln(CAST(st.cnt_s AS DOUBLE)) - ln(CAST(stot.total_s AS DOUBLE))
                         - ln(CAST(v.cnt_all AS DOUBLE)) + ln(CAST(ct.total_all AS DOUBLE)))
                        * 1e6) AS BIGINT) AS micronats
  FROM st
  JOIN stot ON stot.source = st.source
  JOIN vocab v ON v.token = st.token
  CROSS JOIN ctot ct
)
SELECT t.source,
       s.total_s AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_s,
       CAST(SUM(CAST(t.micronats AS DECIMAL(38,0))) AS DOUBLE) AS sum_micronats,
       CAST(SUM(CAST(t.micronats AS DECIMAL(38,0))) AS DOUBLE) / 1e6
         / CAST(s.total_s AS DOUBLE) AS kl_nats
FROM terms t JOIN stot s ON s.source = t.source
GROUP BY t.source, s.total_s
ORDER BY t.source
""",
)
def t20_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens()).alias("token"))
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt_s"))
    stot = st.groupBy("source").agg(F.sum("cnt_s").alias("total_s"))
    vocab = st.groupBy("token").agg(F.sum("cnt_s").alias("cnt_all"))
    ctot = vocab.agg(F.sum("cnt_all").alias("total_all"))
    ln = lambda c: F.log(F.col(c).cast("double"))  # noqa: E731
    terms = (
        st.join(F.broadcast(stot), "source")
        .join(vocab, "token")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            "total_s",
            (
                F.col("cnt_s")
                * F.floor(
                    (ln("cnt_s") - ln("total_s") - ln("cnt_all") + ln("total_all"))
                    * 1e6
                ).cast("long")
            ).alias("micronats"),
        )
    )
    return (
        terms.groupBy("source", "total_s")
        .agg(
            F.count(F.lit(1)).alias("vocab_s"),
            F.sum(F.col("micronats").cast("decimal(38,0)")).cast("double").alias(
                "sum_micronats"
            ),
        )
        .select(
            "source",
            F.col("total_s").alias("n_tokens"),
            "vocab_s",
            "sum_micronats",
            (F.col("sum_micronats") / 1e6 / F.col("total_s").cast("double")).alias(
                "kl_nats"
            ),
        )
        .orderBy("source")
    )


@register(
    "t21_bigram_surprisal",
    category="text",
    doc="Top-50 most-surprising documents under the corpus BIGRAM "
    "language model — the context-aware step beyond t14's unigram "
    "filter (production quality filters are n-gram KenLM scorers; the "
    "bigram model is the Spark-native rung of that ladder: unusual "
    "token SEQUENCES score high even when every token is common). "
    "p(w2|w1) = cnt(w1 w2) / cnt(w1 ·), so per-occurrence surprisal "
    "-ln p is the DIFFERENCE of two integer micro-nat terms "
    "(floor(ln(ctx)*1e6) - floor(ln(big)*1e6)) — per-doc sums are exact "
    "integer folds, engine- and partition-order-independent. Shape: one "
    "positioned explode builds the bigram relation (corpus-linear), a "
    "bigram-keyed aggregate builds the model, the context marginal is a "
    "SECOND aggregate OF THE MODEL (bigram-vocab-sized, not corpus-"
    "sized), the probe re-joins on the bigram key, one doc-keyed "
    "aggregate, then TakeOrdered 50 — never a global sort.",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
big AS (
  SELECT doc_id, concat_ws(' ', ws[i], ws[i+1]) AS bigram, ws[i] AS ctx
  FROM tok, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
bmodel AS (SELECT bigram, ANY_VALUE(ctx) AS ctx, CAST(COUNT(*) AS BIGINT) AS c12
           FROM big GROUP BY bigram),
cmodel AS (SELECT ctx, CAST(SUM(c12) AS BIGINT) AS c1 FROM bmodel GROUP BY ctx),
sur AS (
  SELECT b.bigram,
         CAST(floor(ln(CAST(c.c1 AS DOUBLE)) * 1e6) AS BIGINT)
           - CAST(floor(ln(CAST(b.c12 AS DOUBLE)) * 1e6) AS BIGINT)
           AS micronats
  FROM bmodel b JOIN cmodel c ON c.ctx = b.ctx
)
SELECT doc_id, n_bigrams, sum_micronats, avg_micronats FROM (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(s.micronats) AS BIGINT) AS sum_micronats,
         CAST(CAST(SUM(s.micronats) AS BIGINT) AS DOUBLE) / COUNT(*)
           AS avg_micronats
  FROM big g JOIN sur s ON s.bigram = g.bigram
  GROUP BY g.doc_id
)
ORDER BY avg_micronats DESC, doc_id
LIMIT 50
""",
)
def t21_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens()
    base = docs.select("doc_id", ws.alias("ws"))
    # Positioned bigram relation; docs under 2 tokens emit nothing (the
    # sequence guard — Spark's sequence(1, 0) would count DOWN).
    big = (
        base.withColumn("n", F.size("ws"))
        .filter(F.col("n") >= 2)
        .select(
            "doc_id",
            "ws",
            F.explode(F.sequence(F.lit(1), F.col("n") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.element_at("ws", F.col("i")), F.element_at("ws", F.col("i") + 1)
            ).alias("bigram"),
            F.element_at("ws", F.col("i")).alias("ctx"),
        )
        .cache()  # feeds the model build AND the probe join
    )
    bmodel = big.groupBy("bigram").agg(
        F.first("ctx").alias("ctx"), F.count(F.lit(1)).alias("c12")
    )
    cmodel = bmodel.groupBy("ctx").agg(F.sum("c12").alias("c1"))
    sur = bmodel.join(cmodel, "ctx").select(
        "bigram",
        (
            F.floor(F.log(F.col("c1").cast("double")) * 1e6).cast("long")
            - F.floor(F.log(F.col("c12").cast("double")) * 1e6).cast("long")
        ).alias("micronats"),
    )
    return (
        big.join(sur, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("micronats").alias("sum_micronats"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_micronats",
            (F.col("sum_micronats").cast("double") / F.col("n_bigrams")).alias(
                "avg_micronats"
            ),
        )
        .orderBy(F.desc("avg_micronats"), F.asc("doc_id"))
        .limit(50)
    )


# --- t22: reference-LM perplexity bucketing (CCNet-style) ------------------

PPL_TRAIN_SOURCE = "src0"

# Shared oracle CTE chain ending in ``scored`` (doc_id, n_toks, score)
# and ``th`` (t1, t2 tercile thresholds) — the SQL twin of
# ``perplexity_scored``; t22 aggregates it into buckets and p07 gates
# the curation chain on it, and both oracles nest the SAME text so the
# quality gate and the report cannot drift.
_SQL_PPL_SCORED = f"""train AS (
  SELECT unnest({_SQL_TOKENS}) AS w FROM documents WHERE source = '{PPL_TRAIN_SOURCE}'
),
counts AS (SELECT w, COUNT(*) AS c FROM train GROUP BY w),
consts AS (
  SELECT (SELECT COUNT(*) FROM train) + (SELECT COUNT(*) FROM counts) + 1 AS d
),
toks AS (
  SELECT doc_id, source, unnest({_SQL_TOKENS}) AS w
  FROM documents WHERE source <> '{PPL_TRAIN_SOURCE}'
),
sur AS (
  SELECT t.doc_id, t.source,
         CAST(floor(ln(CAST(d AS DOUBLE)) * 1e6) AS BIGINT)
         - CAST(floor(ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE)) * 1e6) AS BIGINT) AS m
  FROM toks t LEFT JOIN counts USING (w), consts
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_toks, SUM(m) // COUNT(*) AS score
  FROM sur GROUP BY doc_id
),
hist AS (SELECT score, COUNT(*) AS cnt FROM scored GROUP BY score),
cum AS (SELECT score, SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
nn AS (SELECT COUNT(*) AS n FROM scored),
th AS (SELECT (SELECT MIN(score) FROM cum, nn WHERE cum >= (n + 2) // 3) AS t1,
              (SELECT MIN(score) FROM cum, nn WHERE cum >= (2 * n + 2) // 3) AS t2)"""


def perplexity_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CCNet perplexity relation shared by t22 (bucket
    aggregate) and p07 (curation gate): (doc_id, n_toks, score, bucket)
    for every NON-reference document, where score is the exact integer
    mean micro-nat surprisal under the add-one-smoothed src0 unigram LM
    and bucket is the head/middle/tail tercile from the score-DOMAIN
    histogram (q87's trick — the only window runs over the value
    domain, never the corpus). One shared code path: the gate p07
    applies is definitionally the bucketing t22 reports."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens()).alias("w")
    )
    train = tok.filter(F.col("source") == PPL_TRAIN_SOURCE)
    counts = train.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()  # vocab-sized; feeds the probe join AND the N+V constant
    # N + V + 1 read off the vocab-sized counts relation (sum of counts =
    # train tokens; row count = vocab) — not a second corpus scan.
    consts = counts.agg(
        (F.sum("c") + F.count(F.lit(1)) + F.lit(1)).alias("d")
    )
    micro_d = F.floor(F.log(F.col("d").cast("double")) * 1e6).cast("long")
    micro_c = F.floor(
        F.log((F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")) * 1e6
    ).cast("long")
    sur = (
        tok.filter(F.col("source") != PPL_TRAIN_SOURCE)
        .join(counts, "w", "left")
        .crossJoin(F.broadcast(consts))
        .select("doc_id", (micro_d - micro_c).alias("m"))
    )
    scored = sur.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.expr("sum(m) div count(1)").alias("score"),
    ).cache()  # feeds the histogram AND the final bucketing
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).alias("cnt"))
    # The doc total n = sum(cnt) is read off the SAME window pass as the
    # cumulative counts (same partition spec + ordering, an extra frame in
    # the one WindowExec) — the r13 shape aggregated the scored cache a
    # second time for it and broadcast the 1-row result, two extra stages
    # of pure scheduling floor on a query whose tail is stage-count-bound
    # (profiled: the post-scored stages cost as much as the whole
    # compute at sf0.1).
    w_cum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "score",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    th = cum.agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n + 2) div 3"), F.col("score")
            )
        ).alias("t1"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(2 * n + 2) div 3"), F.col("score")
            )
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("score") <= F.col("t1"), "head")
        .when(F.col("score") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    return scored.crossJoin(F.broadcast(th)).select(
        "doc_id", "n_toks", "score", bucket.alias("bucket")
    )


@register(
    "t22_perplexity_buckets",
    category="text",
    bench=True,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): train an "
    "add-one-smoothed unigram LM on a REFERENCE source (src0 — the "
    "'Wikipedia' of the corpus), score every other document's tokens "
    "under it, and split the target corpus into head/middle/tail "
    "terciles of per-token surprisal — the quality gate CCNet uses to "
    "keep the cleanest third of CommonCrawl. Determinism: surprisal is "
    "the DIFFERENCE of two per-count micro-nat floors (t21's monomial "
    "recipe — floor(ln(N+V+1)*1e6) - floor(ln(c+1)*1e6), integers in "
    "both engines), per-doc score is an exact integer division, and "
    "tercile thresholds come from the score-domain histogram's "
    "cumulative counts (rank-from-histogram — no global sort, no "
    "corpus-sized window; the cumulative window runs over the "
    "aggregate-sized score domain). Scale: one token-keyed probe join "
    "against the vocab-sized LM (broadcast-able), one map-side-"
    "combinable doc aggregate, domain-sized everything after.",
    oracle=f"""
WITH {_SQL_PPL_SCORED}
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(MIN(score) AS BIGINT) AS min_score,
       CAST(MAX(score) AS BIGINT) AS max_score
FROM (
  SELECT CASE WHEN score <= t1 THEN 'head'
              WHEN score <= t2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         n_toks, score
  FROM scored, th
)
GROUP BY bucket
ORDER BY bucket
""",
)
def t22_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        perplexity_scored(spark, sf_dir)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("bucket")
    )
