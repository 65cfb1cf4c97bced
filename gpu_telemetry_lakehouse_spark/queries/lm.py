"""Statistical language-model scoring over the documents corpus.

Extends the unigram-logprob quality filter (queries/text.py,
``doc_unigram_logprob``) with the next rung of corpus-LM tooling a training-
data pipeline runs: add-k-smoothed bigram perplexity per document (the
classic cheap fluency filter) and a Zipf-law fit over the token frequency
spectrum (corpus-health diagnostic: natural text has slope ~ -1; a
boilerplate-heavy or deduplicated-to-death corpus visibly deviates).

Scale notes: token and bigram frequency tables are vocab-sized, not corpus-
sized, after the first aggregation; the per-doc scoring join keys on the
bigram string (hash-partitioned equi-join — at 100 TB the bigram table is
NOT broadcastable and the plan correctly leaves both sides shuffled on the
join key, one shuffle each). All logs/exp are pure double functions of
exactly-agreed integer counts; sums go through scaled longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum, tokens
from .registry import query

# Add-k smoothing constant for the bigram model.
_ADD_K = 0.5

# DuckDB-side tokenization (identical to functions.tokens) and row-local
# bigram construction over the 1-based token list.
_TOK = r"regexp_split_to_array(trim(text), '\s+')"
_BIGRAMS = (
    f"list_transform(range(2, len({_TOK}) + 1),"
    f" i -> {_TOK}[i - 1] || ' ' || {_TOK}[i])"
)


@query(
    "bigram_perplexity_docs",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOK}) AS token FROM documents
    ),
    vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
    bg AS (
        SELECT doc_id, unnest({_BIGRAMS}) AS bigram FROM documents
    ),
    cb AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY 1),
    ctx AS (
        SELECT split_part(bigram, ' ', 1) AS w1, SUM(cb) AS cw
        FROM cb GROUP BY 1
    ),
    scored AS (
        SELECT b.doc_id,
               ln((CAST(cb.cb AS DOUBLE) + {_ADD_K})
                  / (CAST(ctx.cw AS DOUBLE) + {_ADD_K} * vocab.v)) AS lp
        FROM bg b
        JOIN cb ON cb.bigram = b.bigram
        JOIN ctx ON ctx.w1 = split_part(b.bigram, ' ', 1)
        CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(exp(-((SUM(CAST(ROUND(lp * 1000000.0, 0) AS BIGINT)) / 1000000.0)
                       / COUNT(*))), 4) AS perplexity
    FROM scored GROUP BY doc_id
    """,
)
def bigram_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE per row; the regex split is the per-row hot cost and must
    # not be re-evaluated inside the bigram lambda (3 evals/row measured ~2x
    # slower end-to-end)
    toked = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    tok = toked.select("doc_id", F.explode("t").alias("token"))
    vocab = tok.agg(F.count_distinct("token").alias("v"))
    # row-local bigram construction: no positional self-join over the corpus
    bg = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(t[i - 1], ' ', t[i]))"
            )
        ).alias("bigram"),
    )
    cb = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    # context counts derive from the bigram table (vocab-sized), not a second
    # corpus pass
    ctx = (
        cb.groupBy(F.split(F.col("bigram"), " ").getItem(0).alias("w1"))
        .agg(F.sum("cb").alias("cw"))
    )
    lp = F.log(
        (F.col("cb").cast("double") + _ADD_K)
        / (F.col("cw").cast("double") + _ADD_K * F.col("v"))
    )
    scored = (
        bg.join(cb, "bigram")
        .join(ctx, F.split(F.col("bigram"), " ").getItem(0) == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
    )
    avg_lp = exact_sum("lp", scale=6) / F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.exp(-avg_lp), 4).alias("perplexity"),
    )


# --- Zipf-law fit over the token frequency spectrum --------------------------
# Least-squares regression of ln(freq) on ln(rank) over the ranked vocabulary
# (rank ties broken by token text so both engines agree). Slope ~ -1 for
# natural language. The regression runs entirely on the vocab-sized frequency
# table; the closed-form moments go through scaled-long sums.
@query(
    "zipf_fit_tokens",
    oracle="""
    WITH freq AS (
        SELECT token, COUNT(*) AS c
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
              FROM documents)
        GROUP BY 1
    ),
    ranked AS (
        SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token) AS DOUBLE)) AS x,
               ln(CAST(c AS DOUBLE)) AS y
        FROM freq
    ),
    m AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(ROUND(x * 1000000.0, 0) AS BIGINT)) / 1000000.0 AS sx,
               SUM(CAST(ROUND(y * 1000000.0, 0) AS BIGINT)) / 1000000.0 AS sy,
               SUM(CAST(ROUND(x * x * 1000000.0, 0) AS BIGINT)) / 1000000.0 AS sxx,
               SUM(CAST(ROUND(x * y * 1000000.0, 0) AS BIGINT)) / 1000000.0 AS sxy
        FROM ranked
    )
    SELECT n AS n_vocab,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
               AS intercept
    FROM m
    """,
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # global rank over the vocab-sized table only (never the corpus)
    ranked = freq.select(
        F.log(
            F.row_number()
            .over(W.orderBy(F.col("c").desc(), F.col("token")))
            .cast("double")
        ).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("x", scale=6).alias("sx"),
        exact_sum("y", scale=6).alias("sy"),
        exact_sum(F.col("x") * F.col("x"), scale=6).alias("sxx"),
        exact_sum(F.col("x") * F.col("y"), scale=6).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )
