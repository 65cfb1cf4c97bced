"""Deterministic sampling — the reproducible-subset primitives a 100 TB
pipeline needs (quick-look analytics, train/eval splits, A/B cohorts).

``df.sample()`` draws per-partition pseudo-randomly: the subset changes with
partitioning and Spark version, so it can't be oracle-checked and — worse for
production — a rerun sees different rows. Hash-gating on a stable key fixes
both: ``md5(key) prefix < threshold`` picks the same ~p fraction of keys on
any engine, any partitioning, any day. The gate is a plain filter, so it
needs no shuffle and rides predicate pushdown's row-group skipping where the
key is clustered; cohort membership is also stable under late-arriving data
(a key is in or out forever — exactly what an experiment assignment needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum
from .registry import dsum, query

# 2-hex-digit md5 prefix < 0x1a keeps 26/256 ~ 10.2% of keys; string compare
# on lowercase hex is identical in Spark and DuckDB.
_PREFIX_LT = "1a"


def hash_sample(df: DataFrame, key, prefix_lt: str = _PREFIX_LT) -> DataFrame:
    """Keep rows whose md5(key) 2-hex prefix sorts below ``prefix_lt``."""
    gate = F.substring(F.md5(F.col(key).cast("string")), 1, 2) < prefix_lt
    return df.filter(gate)


@query(
    "hash_sample_orders",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           {dsum("o_totalprice", "sum_price", scale=2)}
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '{_PREFIX_LT}'
    GROUP BY o_orderpriority
    """,
)
def hash_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return hash_sample(o, "o_orderkey").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        exact_sum("o_totalprice", scale=2).alias("sum_price"),
    )


@query(
    "stratified_user_sample",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '{_PREFIX_LT}'
    GROUP BY event_type
    """,
)
def stratified_user_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level (stratified-by-user) sample: gating on user_id instead of
    the row keeps EVERY row of a sampled user, which is what sequence-level
    work (sessionization, dedup, training splits) requires — row-level
    sampling would shred user histories."""
    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "user_id").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --- deterministic per-group reservoir (fixed-k sample per key) --------------
# "k examples per user/class" — the training-data balancing op. A true
# reservoir needs sequential state; the distributed equivalent ranks rows by
# a uniform deterministic hash and keeps the k smallest per key: same
# marginal distribution, embarrassingly parallel (one shuffle on the key;
# partial TakeOrdered per partition caps mapper output at k rows/key), and
# reproducible run-to-run — which random() reservoirs are not.
RESERVOIR_K = 5


@query(
    "reservoir_sample_per_user",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM events
    )
    SELECT user_id, event_id, event_type, rk
    FROM ranked WHERE rk <= {RESERVOIR_K}
    """,
)
def reservoir_sample_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.select("user_id", "event_id", "event_type")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
    )


# --- deterministic train/val/test split --------------------------------------
# The split every training pipeline needs: entity-keyed (all of a user's
# rows land in ONE split — row-level splits leak sequences across sets),
# deterministic (md5 bucket, no RNG state), and proportioned by hash range
# (~80/10/10). One map-side projection; no shuffle beyond the audit agg.
@query(
    "train_val_test_split",
    oracle="""
    WITH tagged AS (
        SELECT event_type,
               CASE
                   WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < 'cc'
                       THEN 'train'
                   WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < 'e6'
                       THEN 'val'
                   ELSE 'test'
               END AS split
        FROM events
    )
    SELECT split, event_type, COUNT(*) AS n
    FROM tagged
    GROUP BY split, event_type
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    prefix = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cc", "train").when(prefix < "e6", "val").otherwise("test")
    )
    return (
        ev.withColumn("split", split)
        .groupBy("split", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- quota (balanced) sampling per group -------------------------------------
# Corpus rebalancing for training mixes: cap every (lang, source) cell at
# QUOTA docs, chosen by deterministic md5 rank so the SAME docs are picked on
# any engine, partitioning, or rerun (and membership is stable as new data
# arrives — existing picks only change if a new doc hashes below the cut).
# One hash-partitioned window pass; Spark 4 plans rank<=k as WindowGroupLimit,
# which keeps a running top-k per group on the map side instead of sorting
# whole partitions — the skewed-cell-safe form of per-group capping at scale.
QUOTA = 5


@query(
    "quota_sample_by_group",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS rk
        FROM documents
    )
    SELECT doc_id, lang, source, rk FROM ranked WHERE rk <= {QUOTA}
    """,
)
def quota_sample_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA)
    )


# --- temperature (alpha) source rebalancing ----------------------------------
# LLM corpus mixing: sample source s with weight n_s^alpha (alpha=0.5 here)
# instead of proportionally, up-weighting small sources — the mix-rebalance
# step of multi-corpus training-set construction. All arithmetic that crosses
# engines is exact: sqrt is IEEE-correctly-rounded (unlike pow), the weight
# is staged to a scaled BIGINT, quotas use integer division, and membership
# is the md5-ranked prefix per source, so the SAME docs are chosen on both
# engines — pinned by sum_kept_ids, not just counts.
MIX_TOTAL = 200


@query(
    "alpha_mix_resample",
    oracle=f"""
    WITH ps AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (
        SELECT source, n_docs,
               CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS w
        FROM ps
    ),
    tot AS (SELECT SUM(w) AS sum_w FROM w),
    q AS (
        SELECT source, n_docs,
               CAST(({MIX_TOTAL} * w) // sum_w AS BIGINT) AS quota
        FROM w, tot
    ),
    r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ),
    k AS (
        SELECT r.source, COUNT(*) AS n_kept, SUM(r.doc_id) AS sum_ids
        FROM r JOIN q USING (source) WHERE rk <= quota GROUP BY r.source
    )
    SELECT q.source, q.n_docs, q.quota,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.sum_ids, 0) AS BIGINT) AS sum_kept_ids
    FROM q LEFT JOIN k USING (source)
    """,
)
def alpha_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = per_src.withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000 + F.lit(0.5)).cast("long")
    )
    tot = w.agg(F.sum("w").alias("sum_w"))
    quotas = w.crossJoin(F.broadcast(tot)).withColumn(
        "quota", F.expr(f"CAST(({MIX_TOTAL} * w) DIV sum_w AS BIGINT)")
    )
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    kept = (
        ranked.join(F.broadcast(quotas.select("source", "quota")), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("sum_ids"),
        )
    )
    return (
        quotas.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "quota",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("sum_ids"), F.lit(0)).cast("long").alias("sum_kept_ids"),
        )
    )


# --- A/B experiment readout --------------------------------------------------
# Deterministic hash-gate arm assignment (the stable-cohort property the
# module docstring argues for) + per-arm outcome rates: users, converters
# (any purchase), conversion rate. The per-arm readout every experimentation
# platform materializes; identical md5 parity on both engines means the
# same users land in the same arm forever.
@query(
    "ab_experiment_readout",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                         AS BIGINT) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    )
    SELECT arm,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS conversion_rate
    FROM u GROUP BY arm
    """,
)
def ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import md5_int

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "arm",
        F.when(
            md5_int(F.col("user_id").cast("string")) % 2 == 0, "control"
        ).otherwise("treatment"),
    )
    return u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("conversion_rate"),
    )


# --- weighted sampling without replacement (Efraimidis-Spirakis) -------------
# Importance-weighted subset selection: pick K users with probability
# proportional to activity weight, WITHOUT replacement, in one distributed
# pass. The E-S scheme assigns each item the key u^(1/w) (u uniform) and
# keeps the K largest — equivalently the K largest ln(u)/w, which avoids
# pow's cross-platform rounding wobble. u is the md5-derived 60-bit uniform,
# so the draw is deterministic, partitioning-independent, and replayable on
# any engine: the one property random() cannot give a 100 TB pipeline. The
# top-K is a TakeOrdered (per-partition partial top-K, no global sort).
WEIGHTED_K = 40


@query(
    "weighted_sample_users",
    oracle=f"""
    WITH w AS (
        SELECT user_id, COUNT(*) AS n_events,
               ln((CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                        AS BIGINT) + 1) / 1152921504606846976.0)
                   / COUNT(*) AS es_key
        FROM events GROUP BY user_id
    ), ranked AS (
        SELECT user_id, n_events, es_key,
               CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, user_id)
                    AS INT) AS rk
        FROM w
    )
    SELECT user_id, n_events, ROUND(es_key, 6) AS es_key_r, rk
    FROM ranked WHERE rk <= {WEIGHTED_K}
    """,
)
def weighted_sample_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-S weighted K-sample of users, weight = event count. ln(u)/w for
    u in (0,1] is <= 0 and monotone in u^(1/w); larger w pulls the key
    toward 0, raising selection probability. The per-user aggregate is
    |users|-sized; rank<=K plans as WindowGroupLimit (running top-K, no
    full sort). ln() on bit-identical inputs agrees across libm
    implementations at these magnitudes; the rounded key is published so
    a mismatch would surface in the value hash, not silently."""
    from pyspark.sql import Window as W

    from ..functions import md5_int

    ev = load_table(spark, sf_dir, "events").select("user_id")
    u01 = (md5_int(F.col("user_id").cast("string")) + 1) / F.lit(
        1152921504606846976.0
    )
    w = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = w.withColumn("es_key", F.log(u01) / F.col("n_events"))
    rk = F.row_number().over(
        W.orderBy(F.col("es_key").desc(), "user_id")
    ).cast("int")
    return (
        w.withColumn("rk", rk)
        .filter(F.col("rk") <= WEIGHTED_K)
        .select("user_id", "n_events", F.round("es_key", 6).alias("es_key_r"), "rk")
    )
