"""Cluster-scale join strategies: bucketed co-located joins and skew
salting (SURVEY.md §4 — the partitioning techniques the 100 TB deployment
relies on; nothing here exists in the single-process reference).

- ``write_bucketed`` / ``bucketed_join``: pre-shuffle both fact tables into
  the same bucket layout at WRITE time (``bucketBy`` + ``sortBy``), so every
  subsequent equi-join on the bucket key is a zero-shuffle sort-merge join —
  the single biggest cost lever for repeated fact-fact joins at scale.
  tests/test_scale_joins.py asserts the physical plan contains NO shuffle
  exchange on the bucketed sides.

- ``salted_join``: hot-key mitigation when one side has pathological key
  skew (one user = 30% of events). The skewed side gets a deterministic
  salt (hash of a secondary column, NOT a random number — reproducibility),
  the small side is replicated once per salt value, and the join key becomes
  (key, salt) — the hot key's rows spread over ``n_salts`` reducers instead
  of one straggler. AQE's skew-join handles moderate skew automatically;
  explicit salting is for the extreme tail and for deterministic layout.

Both helpers return plain DataFrames: they compose with every other
operator in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed, sorted managed table: the one-time shuffle
    that makes every later join/aggregation on ``bucket_col`` shuffle-free.

    A FRESH session (in-memory catalog) pointed at a warehouse directory
    holding a previous session's table data refuses ``saveAsTable`` with
    LOCATION_ALREADY_EXISTS — the location is orphaned from the new
    catalog's perspective. Drop any catalog entry AND remove a stale
    orphaned location before writing so the helper is rerun-safe across
    sessions (the correctness driver re-runs builders in new sessions)."""
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    # Resolve the table's location BEFORE dropping: the catalog's answer
    # is authoritative when an entry exists (covers EXTERNAL locations and
    # non-default warehouses). Only when the catalog has no entry — the
    # orphaned-location case this cleanup exists for — derive the default
    # managed path from the fully-parsed identifier: 'db.tbl' lives at
    # {warehouse}/db.db/tbl, an unqualified name under the CURRENT
    # database ({warehouse}/tbl only for 'default').
    loc_str = None
    if spark.catalog.tableExists(table):
        tbl_type = None
        for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
            key = row.col_name.strip()
            if key == "Location":
                loc_str = row.data_type.strip()
            elif key == "Type":
                tbl_type = row.data_type.strip().upper()
        if tbl_type != "MANAGED":
            # DROP TABLE on an EXTERNAL table intentionally preserves its
            # data; recursively deleting the location here would destroy a
            # colliding real table's files (ADVICE r6). Only MANAGED
            # locations (which DROP reclaims anyway) are safe to clear.
            loc_str = None
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    else:
        warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
        parts = [p.strip("`").lower() for p in table.split(".")]
        if len(parts) > 3:
            raise ValueError(f"unparseable table identifier: {table!r}")
        if len(parts) == 3:
            # catalog.db.tbl: only the session catalog's warehouse is
            # managed here — a wrong split would fs.delete an unrelated
            # directory, so reject foreign catalogs outright.
            if parts[0] not in ("spark_catalog",):
                raise ValueError(
                    f"write_bucketed manages only spark_catalog tables, got {table!r}"
                )
            db, tbl = parts[1], parts[2]
        elif len(parts) == 2:
            db, tbl = parts
        else:
            db, tbl = spark.catalog.currentDatabase().lower(), parts[0]
        loc_str = (
            f"{warehouse}/{tbl}" if db == "default"
            else f"{warehouse}/{db}.db/{tbl}"
        )
    if loc_str is not None:
        loc = jvm.org.apache.hadoop.fs.Path(loc_str)
        fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    w = df.write.bucketBy(n_buckets, bucket_col).sortBy(sort_col or bucket_col)
    w.mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key: Catalyst
    recognizes the matching output partitioning and plans a sort-merge join
    with no Exchange on either side. The merge hint pins the SMJ strategy
    (at toy scale AQE would otherwise pick broadcast and hide the
    co-location property this helper exists to exploit)."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the skewed side salted across ``n_salts`` sub-keys.

    ``salt_source``: a column on the skewed side whose hash spreads the hot
    key's rows (e.g. an event id); defaults to the whole row's first column.
    The small side is exploded once per salt value (size x n_salts — cheap
    when the small side is dimension-sized).
    """
    src = salt_source or skewed.columns[0]
    salted_left = skewed.withColumn(
        "_salt", (F.abs(F.hash(F.col(src))) % n_salts).cast("int")
    )
    replicated_right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    out = salted_left.join(replicated_right, [key, "_salt"])
    return out.drop("_salt")


N_SALTS = 16

_FIXED = "CAST(floor(value * 1000000.0) AS DECIMAL(38,0))"


def _register_salted_agg():
    # Local import: this module is imported by the plans package, and
    # registry/load_table import from plans-adjacent modules.
    from european_public_data_pipeline_spark.plans.registry import register
    from european_public_data_pipeline_spark.tables import load_table

    @register(
        "q47_salted_skew_agg",
        category="scale",
        doc="Two-phase salted aggregation over a low-cardinality skewed "
        "key (event_type: a handful of values over the whole fact "
        "table): phase 1 aggregates on (key, salt16) — spreading each "
        "hot key over 16 reducers — phase 2 merges the 16 partials per "
        "key. Value sums accumulate fixed-point floor(v*1e6) DECIMAL("
        "38,0), so the two-phase result is bit-identical to the "
        "oracle's single GROUP BY: associativity of integer sums is "
        "what makes salting semantically free. Salt is a deterministic "
        "portable hash of event_id, never an RNG. (Spark's partial "
        "aggregation does this automatically for plain aggregates; "
        "explicit salting is the pattern for when the aggregate state "
        "itself is heavy — collect_list/percentile state — or for "
        "salted joins.)",
        oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM({_FIXED}) AS DOUBLE) / 1000000.0 AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    )
    def q47_salted_skew_agg(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        salt = (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 7), 16, 10
            ).cast("bigint")
            % N_SALTS
        )
        partial = (
            events.withColumn("salt", salt)
            .groupBy("event_type", "salt")
            .agg(
                F.count(F.lit(1)).alias("pn"),
                F.sum(
                    F.floor(F.col("value") * 1000000.0).cast("decimal(38,0)")
                ).alias("pv"),
            )
        )
        return (
            partial.groupBy("event_type")
            .agg(
                F.sum("pn").alias("n"),
                (F.sum("pv").cast("double") / F.lit(1000000.0)).alias("total_value"),
            )
            .orderBy("event_type")
        )

    return q47_salted_skew_agg


q47_salted_skew_agg = _register_salted_agg()
