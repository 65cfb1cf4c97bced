"""Web-crawl curation: URL canonicalization/dedup and domain blocklists.

Web-scale training corpora are keyed by URL, and the same page arrives under
many spellings — scheme casing, ``www.`` prefixes, tracking parameters
(``utm_*``), fragments, trailing slashes. Canonicalizing before dedup is the
first stage of every crawl pipeline (the frontier must not re-fetch, and the
corpus must not double-count). The ``documents`` table carries no URL column,
so each query derives a deterministic synthetic URL per doc from (doc_id,
source, lang) — the SAME expression in Spark and the DuckDB oracle — then
exercises the real operator on top: regex canonicalization, canonical-key
dedup, and broadcast blocklist filtering.

Scale shape: everything before the rollup is row-local string work (no UDFs —
Java regex stays inside whole-stage codegen); the dedup is one map-side-
combinable groupBy on the canonical key followed by a tiny per-TLD rollup.
At 100 TB the canonical-key aggregation is the only real shuffle, exactly the
shape of a production crawl-dedup job. Regexes use no lookaround/backrefs so
Java (Spark) and RE2 (DuckDB) match identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# --- deterministic synthetic URL (same logic, both engines) ------------------
# host  : source + TLD from doc_id%4; doc_id%3==0 adds 'www.'; doc_id%2==0
#         upper-cases the host (canonicalization must lower it back)
# path  : /<lang>/p<doc_id%25>; doc_id%7==0 appends a trailing slash
# query : %3==0 -> utm_source + a KEPT low-cardinality ref param;
#         %3==1 -> utm_campaign only (drops to empty); %3==2 -> none
# frag  : doc_id%5==0 appends '#sec'
# Collisions by construction: docs sharing (source, tld, lang, id%25, kept
# param) canonicalize to the same URL even though raw spellings differ.

_URL_SQL = """
        'https://'
        || CASE WHEN doc_id % 2 = 0
                THEN upper(CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
                           || source || '.' || CASE doc_id % 4
                               WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                               WHEN 2 THEN 'net' ELSE 'io' END)
                ELSE CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
                     || source || '.' || CASE doc_id % 4
                         WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                         WHEN 2 THEN 'net' ELSE 'io' END END
        || '/' || lang || '/p' || CAST(doc_id % 25 AS VARCHAR)
        || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
        || CASE WHEN doc_id % 3 = 0
                THEN '?utm_source=feed&ref=r' || CAST(doc_id % 2 AS VARCHAR)
                WHEN doc_id % 3 = 1 THEN '?utm_campaign=x' ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END
"""

# Canonicalization over the raw URL string (pure regex, engine-portable):
#   host: lowered, 'www.' stripped;  path: trailing '/' stripped;
#   query: utm_* params removed, leading '&' tidied, kept iff non-empty;
#   fragment: dropped.
_CANON_SQL = """
        regexp_replace(lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
                       '^www\\.', '')
        || regexp_replace(regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1),
                          '/$', '')
        || CASE WHEN regexp_replace(regexp_replace(
                         regexp_extract(url, '\\?([^#]*)', 1),
                         '(^|&)utm_[a-z]+=[^&]*', '', 'g'), '^&', '') <> ''
                THEN '?' || regexp_replace(regexp_replace(
                         regexp_extract(url, '\\?([^#]*)', 1),
                         '(^|&)utm_[a-z]+=[^&]*', '', 'g'), '^&', '')
                ELSE '' END
"""


def _with_url(docs: DataFrame) -> DataFrame:
    tld = (
        F.when(F.col("doc_id") % 4 == 0, "com")
        .when(F.col("doc_id") % 4 == 1, "org")
        .when(F.col("doc_id") % 4 == 2, "net")
        .otherwise("io")
    )
    host = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("."),
        tld,
    )
    host = F.when(F.col("doc_id") % 2 == 0, F.upper(host)).otherwise(host)
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit("/"),
        F.col("lang"),
        F.lit("/p"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&ref=r"),
                (F.col("doc_id") % 2).cast("string"),
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("?utm_campaign=x"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", "source", "lang", url.alias("url"))


def _canonical(url: F.Column) -> F.Column:
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"^https://([^/?#]+)", 1)), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^https://[^/?#]+([^?#]*)", 1), r"/$", ""
    )
    q = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(url, r"\?([^#]*)", 1), r"(^|&)utm_[a-z]+=[^&]*", ""
        ),
        r"^&",
        "",
    )
    return F.concat(
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


@query(
    "url_canonical_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, ({_URL_SQL}) AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, url, ({_CANON_SQL}) AS curl FROM raw
    ),
    grp AS (
        SELECT regexp_extract(curl, '^[^/?]*\\.([a-z]+)', 1) AS tld,
               curl, COUNT(*) AS n, MIN(doc_id) AS keep_id
        FROM canon GROUP BY 1, 2
    )
    SELECT tld,
           CAST(SUM(n) AS BIGINT) AS n_raw,
           CAST(COUNT(*) AS BIGINT) AS n_canonical,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dropped,
           CAST(COALESCE(SUM(keep_id), 0) AS BIGINT) AS sum_kept_ids
    FROM grp GROUP BY tld ORDER BY tld
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup report per TLD.

    Raw URL spellings (case, www., utm_* params, fragments, trailing slash)
    collapse onto one canonical key; the keep-rule is min(doc_id) per key and
    ``sum_kept_ids`` pins the kept MEMBERSHIP cross-engine, not just counts.
    Reference scope: the reference has no crawl layer (467 LoC pandas
    medallion, README.md:556-573 future work) — this is extension surface.
    """
    docs = _with_url(load_table(spark, sf_dir, "documents"))
    canon = docs.select("doc_id", _canonical(F.col("url")).alias("curl"))
    grp = canon.groupBy(
        F.regexp_extract(F.col("curl"), r"^[^/?]*\.([a-z]+)", 1).alias("tld"),
        "curl",
    ).agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_id"))
    return (
        grp.groupBy("tld")
        .agg(
            F.sum("n").cast("long").alias("n_raw"),
            F.count(F.lit(1)).cast("long").alias("n_canonical"),
            (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_dropped"),
            F.coalesce(F.sum("keep_id"), F.lit(0)).cast("long").alias("sum_kept_ids"),
        )
        .orderBy("tld")
    )


@query(
    "domain_blocklist_filter",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, source, ({_URL_SQL}) AS url FROM documents
    ),
    hosts AS (
        SELECT doc_id, source,
               regexp_replace(lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
                              '^www\\.', '') AS host
        FROM raw
    ),
    block (bhost) AS (
        VALUES ('src0.com'), ('src1.io'), ('src2.net'), ('src3.org'),
               ('src4.com'), ('src5.io')
    ),
    flagged AS (
        SELECT h.doc_id, h.source,
               CASE WHEN b.bhost IS NULL THEN 0 ELSE 1 END AS blocked
        FROM hosts h LEFT JOIN block b ON h.host = b.bhost
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(blocked) AS BIGINT) AS n_blocked,
           CAST(COUNT(*) - SUM(blocked) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN blocked = 0 THEN doc_id END), 0)
                AS BIGINT) AS sum_kept_ids
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast domain-blocklist filter with per-source kept/blocked audit.

    The blocklist (spam/adult/SEO domains in production; a literal host list
    here) broadcasts to every executor — the fact side streams through one
    hash probe, no shuffle before the per-source rollup. Membership of the
    kept set is pinned via ``sum_kept_ids``.
    """
    docs = _with_url(load_table(spark, sf_dir, "documents"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"^https://([^/?#]+)", 1)),
        r"^www\.",
        "",
    )
    hosts = docs.select("doc_id", "source", host.alias("host"))
    block = docs.sparkSession.createDataFrame(
        [("src0.com",), ("src1.io",), ("src2.net",), ("src3.org",),
         ("src4.com",), ("src5.io",)],
        ["bhost"],
    )
    flagged = hosts.join(
        F.broadcast(block), hosts["host"] == block["bhost"], "left"
    ).select(
        "doc_id",
        "source",
        F.when(F.col("bhost").isNull(), 0).otherwise(1).alias("blocked"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("blocked").cast("long").alias("n_blocked"),
            (F.count(F.lit(1)) - F.sum("blocked")).cast("long").alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("blocked") == 0, F.col("doc_id"))), F.lit(0)
            )
            .cast("long")
            .alias("sum_kept_ids"),
        )
        .orderBy("source")
    )
