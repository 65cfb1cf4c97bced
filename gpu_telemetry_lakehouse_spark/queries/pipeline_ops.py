"""Training-data pipeline operators, batch 3: PII redaction, RAG chunking,
embedding quantization, exact-k sampling, EWMA smoothing.

Each is an LLM-corpus-preparation primitive the reference lacks entirely
(SURVEY.md §2.2 extension surface), expressed with built-in JVM-side
functions only — no Python UDFs anywhere in this module — and twinned with
a DuckDB oracle. Regex patterns are written in the common Java-regex/RE2
subset so both engines count identical matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# Java-regex / RE2 common-subset PII patterns.
#
# BOUNDED quantifiers on the email parts (giant-single-token corpus class,
# round 9): `[…]+@` under Java's backtracking engine is O(n^2) on a long
# alphanumeric run with no '@' — every start offset consumes the rest of
# the run, fails, and find() restarts one char later; a single 1M-char
# unbroken token (a binary blob in a text column) stalls the scan for
# hours while DuckDB's RE2 automaton stays linear. RFC 5321 caps the
# local part at 64 octets and the domain at 255, so {1,64}/{1,255} match
# every real email identically in both engines AND cap the per-offset
# backtrack at a constant — the scan is linear again.
RE_EMAIL = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}"
RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
RE_PHONE = r"\+?\d[\d\- ]{7,}\d"


# --- PII redaction report ----------------------------------------------------
# The scrub-before-training pass: count and strip emails / IPv4s / phone-like
# digit runs per source. Row-local regex work (one scan, no shuffle beyond
# the per-source rollup); the redacted length proves the replacement ran,
# not just the counter.
@query(
    "pii_redaction_report",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               len(regexp_extract_all(text, '{RE_EMAIL}')) AS n_email,
               len(regexp_extract_all(text, '{RE_IPV4}')) AS n_ipv4,
               len(regexp_extract_all(text, '{RE_PHONE}')) AS n_phone,
               length(regexp_replace(regexp_replace(regexp_replace(text,
                   '{RE_EMAIL}', '<PII>', 'g'),
                   '{RE_IPV4}', '<PII>', 'g'),
                   '{RE_PHONE}', '<PII>', 'g')) AS clean_len
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN n_email + n_ipv4 + n_phone > 0 THEN 1 END) AS docs_with_pii,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(clean_len) AS BIGINT) AS clean_len_sum
    FROM per_doc
    GROUP BY source
    """,
)
def pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_email = F.size(F.regexp_extract_all("text", F.lit(RE_EMAIL), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all("text", F.lit(RE_IPV4), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all("text", F.lit(RE_PHONE), F.lit(0)))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", RE_EMAIL, "<PII>"), RE_IPV4, "<PII>"
        ),
        RE_PHONE,
        "<PII>",
    )
    per_doc = docs.select(
        "source",
        n_email.alias("n_email"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phone"),
        F.length(clean).alias("clean_len"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(
            F.when(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone") > 0, 1)
        ).alias("docs_with_pii"),
        F.sum("n_email").cast("long").alias("n_emails"),
        F.sum("n_ipv4").cast("long").alias("n_ipv4"),
        F.sum("n_phone").cast("long").alias("n_phones"),
        F.sum("clean_len").cast("long").alias("clean_len_sum"),
    )


# --- RAG chunking with overlap -----------------------------------------------
# Fixed-size token windows with stride (size 64, stride 40 -> 24-token
# overlap): the retrieval-corpus preparation step. Pure lateral explode over
# a per-row start sequence — row-local, embarrassingly parallel, output keyed
# (doc_id, chunk_id) so a downstream embed stage partitions evenly. Chunks
# are emitted as md5 + token count (scalar cells for the driver comparator),
# not the text itself.
CHUNK_SIZE, CHUNK_STRIDE = 64, 40


@query(
    "chunk_documents_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t, CAST(s AS INT) AS start
        FROM toks, unnest(range(1, len(t) + 1, {CHUNK_STRIDE})) AS g(s)
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
           CAST(len(t[start : start + {CHUNK_SIZE} - 1]) AS INT) AS n_tokens,
           md5(array_to_string(t[start : start + {CHUNK_SIZE} - 1], ' ')) AS chunk_md5
    FROM starts
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.trim("text"), r"\s+")
    starts = F.sequence(F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE))
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_SIZE)
    return (
        docs.select("doc_id", t.alias("t"))
        .select("doc_id", "t", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


# --- int8 embedding quantization ---------------------------------------------
# Symmetric per-vector int8 quantization (the memory/bandwidth lever for
# serving ANN at 100 TB: 4x smaller vectors, SIMD int8 dot products):
# scale = max|x| / 127, q_i = round(x_i / scale). Everything is row-local
# array math (zero shuffles); reconstruction error comes back per vector so
# a quality gate can reject badly-conditioned embeddings. Element-wise IEEE
# ops are identical on both engines -> hash-exact.
@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
    ),
    s AS (
        SELECT vec_id, x,
               list_max(list_transform(x, e -> abs(e))) / 127.0 AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, scale,
               list_transform(x, e -> CAST(FLOOR(e / scale + 0.5) AS INT)) AS qi,
               list_max(list_transform(x,
                   e -> abs(e - FLOOR(e / scale + 0.5) * scale))) AS max_err
        FROM s
        WHERE scale > 0
    )
    SELECT vec_id,
           ROUND(scale, 9) AS scale,
           CAST(list_sum(list_transform(qi, e -> abs(e))) AS BIGINT) AS q_l1,
           ROUND(max_err, 9) AS max_abs_err
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(x, lambda e: F.abs(e))) / F.lit(127.0)
    df = emb.select("vec_id", x.alias("x"), scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    qi = F.transform("x", lambda e: F.floor(e / F.col("scale") + F.lit(0.5)).cast("int"))
    err = F.array_max(
        F.transform(
            "x", lambda e: F.abs(e - F.floor(e / F.col("scale") + F.lit(0.5)) * F.col("scale"))
        )
    )
    # two selects: aliasing ROUND(scale) as "scale" in the same projection
    # that computes err would let lateral-column-alias resolution feed the
    # ROUNDED scale into the err lambda (observed: 2e-9 drift vs the oracle)
    core = df.select(
        "vec_id",
        "scale",
        F.aggregate(
            qi, F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
        ).alias("q_l1"),
        err.alias("__err"),
    )
    return core.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        "q_l1",
        F.round("__err", 9).alias("max_abs_err"),
    )


# --- exact-k deterministic uniform sample ------------------------------------
# Content-addressed exact-k sampling: rank every row by md5(key) and keep the
# k smallest — a uniform-without-replacement sample that is reproducible
# across runs, engines, layouts, and cluster sizes (no RNG state to ship).
# Spark plans TakeOrderedAndProject: each task heap-selects its local k and
# only n_partitions*k candidate rows ever move — one pass, no global sort
# materialization.
SAMPLE_K = 100


@query(
    "sample_exact_k",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           md5(CAST(o_orderkey AS VARCHAR)) AS rk
    FROM orders
    ORDER BY rk, o_orderkey
    LIMIT {SAMPLE_K}
    """,
)
def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.md5(F.col("o_orderkey").cast("string")).alias("rk"),
        )
        .orderBy("rk", "o_orderkey")
        .limit(SAMPLE_K)
    )


# --- EWMA smoothing over the daily series ------------------------------------
# Exponentially-weighted moving average with a DYADIC decay (alpha = 1/2,
# truncated at 8 days): weights 2^-j are exactly representable doubles, the
# per-term products are identical IEEE ops on both engines, and the weighted
# sums stage through scaled longs — so the smoothed series is hash-exact,
# which a generic fp alpha could not promise. Shape: the daily rollup is one
# hash agg; the trailing-window join has bounded fan-out (<= 8 rows per day,
# a calendar-bounded range join), then one more day-level agg — every stage
# keyed on dt, so it scales with days, not samples.
@query(
    "ewma_daily_value",
    oracle="""
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                   / COUNT(value) AS avg_v
        FROM events
        WHERE value IS NOT NULL
        GROUP BY 1
    )
    SELECT a.dt, ROUND(a.avg_v, 6) AS avg_v,
           ROUND(
               (SUM(CAST(FLOOR(b.avg_v * power(2.0, -date_diff('day', b.dt, a.dt)) * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0)
               / (SUM(CAST(FLOOR(power(2.0, -date_diff('day', b.dt, a.dt)) * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0),
           6) AS ewma_v
    FROM d a JOIN d b
      ON b.dt BETWEEN a.dt - INTERVAL 7 DAY AND a.dt
    GROUP BY a.dt, a.avg_v
    """,
)
def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import exact_avg

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("dt"))
        .agg(exact_avg("value").alias("avg_v"))
    )
    a = d.select(F.col("dt"), F.col("avg_v"))
    b = d.select(F.col("dt").alias("dt_b"), F.col("avg_v").alias("avg_b"))
    j = a.join(
        b,
        (F.col("dt_b") <= F.col("dt"))
        & (F.col("dt_b") >= F.col("dt") - F.expr("INTERVAL 7 DAY")),
    )
    wexp = -F.datediff(F.col("dt"), F.col("dt_b"))
    weight = F.pow(F.lit(2.0), wexp.cast("double"))
    m = F.lit(10**9)
    num = F.sum(F.floor(F.col("avg_b") * weight * m + F.lit(0.5)).cast("long")) / m.cast("double")
    den = F.sum(F.floor(weight * m + F.lit(0.5)).cast("long")) / m.cast("double")
    return (
        j.groupBy("dt", "avg_v")
        .agg(F.round(num / den, 6).alias("ewma_v"))
        .select("dt", F.round("avg_v", 6).alias("avg_v"), "ewma_v")
    )


# --- training-shard manifest -------------------------------------------------
# The declarative twin of operators/shard.py::export_shards: per-shard row
# count + order-independent XOR checksum under the SAME engine-portable
# md5-mod assignment the writer uses. Proves the shard hash is reproducible
# outside Spark — a consumer on any engine can recompute the manifest.
N_SHARDS = 8


@query(
    "shard_manifest_summary",
    oracle=f"""
    WITH h AS (
        SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                   AS hv,
               doc_id, n_chars
        FROM documents
    )
    SELECT CAST(hv % {N_SHARDS} AS INT) AS shard,
           COUNT(*) AS n_docs,
           bit_xor(hv) AS xor_checksum,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM h GROUP BY 1 ORDER BY shard
    """,
)
def shard_manifest_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import md5_int
    from ..operators.shard import shard_of

    docs = load_table(spark, sf_dir, "documents")
    hv = md5_int(F.col("doc_id").cast("string"))
    return (
        docs.select(
            shard_of("doc_id", N_SHARDS).alias("shard"),
            hv.alias("hv"),
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.bit_xor("hv").alias("xor_checksum"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("shard")
    )
