"""String & JSON functions (SURVEY.md §2.2).

The reference's compound-string columns (gpu_specs ``Memory``,
``Shaders_TMUs_ROPs``; reference: README.md:73-81) are parsed with the same
split/regexp primitives in ``models.py``; here the testdata analogs are
``part`` (brand/type parsing) and ``events.props`` (JSON payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from .registry import query


@query(
    "string_parse_parts",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(len(regexp_split_to_array(trim(p_name), ' ')) AS BIGINT) AS n_name_words,
           regexp_split_to_array(trim(p_name), ' ')[1] AS first_word,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
           lower(p_type) AS type_lower,
           concat(p_brand, '/', p_type) AS brand_type,
           CAST(length(p_name) AS INT) AS name_len,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    """,
)
def string_parse_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.trim("p_name"), " ")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.size(words).cast("long").alias("n_name_words"),
        F.element_at(words, 1).alias("first_word"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.lower("p_type").alias("type_lower"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@query(
    "json_extract_props",
    oracle="""
    WITH x AS (
        SELECT event_type,
               TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '')
                        AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS DOUBLE) / NULLIF(COUNT(k), 0) AS avg_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM x
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # get_json_object NULLs malformed/NULL props; the oracle's regexp path
    # TRY_CASTs the (possibly empty) match — both engines NULL the same
    # rows, and avg divides by NULLIF(count) so an all-malformed group
    # yields NULL instead of an ANSI divide-by-zero
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("k").cast("double")
                / F.nullif(F.count("k"), F.lit(0))
            ).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --- edit-distance similarity of adjacent part names -------------------------
# Levenshtein is the classic fuzzy-matching primitive (catalog entity
# resolution). Pairing by key+1 keeps the check deterministic and linear —
# a real entity-resolution pass would block candidates first (LSH/sorted
# neighborhood) exactly like the dedup operators do.
@query(
    "string_similarity_adjacent",
    oracle="""
    SELECT a.p_partkey,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    """,
)
def string_similarity_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey"), F.col("p_name").alias("name_a"))
    b = p.select((F.col("p_partkey") - 1).alias("p_partkey"), F.col("p_name").alias("name_b"))
    return a.join(b, "p_partkey").select(
        "p_partkey",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("edit_dist"),
    )


# --- VARIANT semi-structured extraction --------------------------------------
# Spark 4's VARIANT type: parse JSON once into a binary variant, extract
# typed paths with variant_get — the modern semi-structured path that
# replaces per-access get_json_object string re-parsing (at scale, parsing
# every props string once per referenced field multiplies scan CPU; variant
# parses once and shreds). Same aggregate shape as json_extract_props so the
# two stay comparable.
@query(
    "variant_props_stats",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CASE WHEN props IS NOT NULL AND json_valid(props)
                    THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           COUNT(DISTINCT k % 10) AS n_k_buckets
    FROM x
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed/empty props become a NULL variant (and a
    # NULL k) instead of failing the whole job — mirrored by the oracle's
    # json_valid guard
    k = F.expr("variant_get(try_parse_json(props), '$.k', 'bigint')")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.count_distinct(F.col("k") % 10).alias("n_k_buckets"),
        )
    )


# --- ordered string aggregation (LISTAGG) ------------------------------------
# The reporting concatenation op (SQL:2023 LISTAGG, Spark 4 native): nations
# per region as a deterministic ordered CSV. WITHIN GROUP (ORDER BY) is the
# determinism contract — unordered string_agg output is partition-order
# dependent and would never hash-match.
@query(
    "listagg_nations_per_region",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["region", "nation"])
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations_csv,
               COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


# --- ANSI-safe TRY functions -------------------------------------------------
# Under ANSI mode (Spark 4 default) a single malformed value fails the whole
# job; try_cast/try_divide convert per-row failures to NULL — the row-level
# quarantine for expressions (the scan-level twin is
# ingest.ingest_csv_quarantine). Both engines NULL the same rows, so the
# differential stays exact.
@query(
    "try_safety_functions",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                               THEN json_extract_string(props, '$.k') END
                          AS BIGINT)) AS n_numeric_k,
           CAST(SUM(CASE WHEN value IS NULL OR value = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_unsafe_div
    FROM events
    GROUP BY event_type
    """,
)
def try_safety_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")).alias(
            "n_numeric_k"
        ),
        F.sum(
            F.expr("try_divide(1.0, value)").isNull().cast("long")
        ).alias("n_unsafe_div"),
    )


# --- edit-distance similarity JOIN (q-gram count-filter pruned) --------------
# The oracle is deliberately the NAIVE all-pairs levenshtein join: the
# engine-side inverted-index + count-filter + verify pipeline must produce
# the IDENTICAL pair set, so the hash-match certifies the pruning bound is
# lossless (false-positive-only), not approximately right.
EDJOIN_K = 2


@query(
    "editdist_join_partnames",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS ed
    FROM n a JOIN n b ON a.name < b.name
    WHERE abs(length(a.name) - length(b.name)) <= {EDJOIN_K}
      AND levenshtein(a.name, b.name) <= {EDJOIN_K}
    """,
)
def editdist_join_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import edit_distance_join

    part = load_table(spark, sf_dir, "part")
    return edit_distance_join(part, "p_name", k=EDJOIN_K, q=3)


# --- deterministic pseudonymization (privacy / governance) -------------------
# PII-safe analytics: replace the natural key with an md5 surrogate BEFORE
# data leaves the trust boundary. Because the tokenization is a pure
# function of the key, referential integrity survives — joins on the
# surrogate produce exactly the joins the raw key would — which this query
# proves by aggregating a customer×events join keyed ONLY on surrogates.
# Row-local tokenization (no lookup table to secure or replicate), identical
# md5 on both engines.
@query(
    "pseudonymized_join_integrity",
    oracle="""
    WITH e AS (
        SELECT substring(md5(CAST(user_id AS VARCHAR)), 1, 16) AS user_token,
               value
        FROM events
    ),
    c AS (
        SELECT substring(md5(CAST(c_custkey AS VARCHAR)), 1, 16) AS user_token,
               c_mktsegment
        FROM customer
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_token) AS n_tokens,
           (SUM(CAST(FLOOR(e.value * 1000000 + 0.5) AS BIGINT)) / 1000000.0) AS sum_value
    FROM e JOIN c USING (user_token)
    WHERE e.value IS NOT NULL
    GROUP BY c.c_mktsegment
    """,
)
def pseudonymized_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 16).alias(
                "user_token"
            ),
            "value",
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 16).alias(
            "user_token"
        ),
        "c_mktsegment",
    )
    return (
        ev.join(F.broadcast(cust), "user_token")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_token").alias("n_tokens"),
            (
                F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")) / 1000000.0
            ).alias("sum_value"),
        )
    )
