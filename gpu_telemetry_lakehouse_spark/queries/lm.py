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
           ROUND(exp(-((SUM(CAST(FLOOR(lp * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0)
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
    # ... and ONCE per corpus (r10, VERDICT r9 item 6): three separate
    # lineages consume `toked` (vocab count-distinct, the bigram count
    # build, and the per-doc scoring probe), so the regex tokenize ran
    # THREE full corpus passes. Checkpointing the tokenized frame pins one
    # materialization that all three read — the checkpoint-per-stage
    # contract; no aggregate/join shape changes, bit-identical output.
    # Interleaved A/B at sf0.1: 0.90/0.88/0.92/0.83 -> 0.77/0.77/0.73/0.71
    # per rep (~-17%). (The shared-bigram-exchange variant — repartition
    # by bigram feeding both the count and the probe — measured noisier
    # and no better: best 0.68 but 0.84 on cold reps; kept out.)
    toked = toked.localCheckpoint(eager=False)
    tok = toked.select("doc_id", F.explode("t").alias("token"))
    vocab = tok.agg(F.count_distinct("token").alias("v"))
    # row-local bigram construction: no positional self-join over the corpus
    bg = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                # sequence(1, 0) is DESCENDING in Spark — a single-token doc
                # needs the explicit empty branch (DuckDB's range(2, 2) is
                # empty already)
                "CASE WHEN size(t) < 2 THEN array()"
                " ELSE transform(sequence(1, size(t) - 1),"
                " i -> concat(t[i - 1], ' ', t[i])) END"
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
               SUM(CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS sx,
               SUM(CAST(FLOOR(y * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS sy,
               SUM(CAST(FLOOR(x * x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS sxx,
               SUM(CAST(FLOOR(x * y * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS sxy
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


# --- distributed BPE merge learning ------------------------------------------
# The first N merges of byte-pair-encoding vocabulary learning (Sennrich et
# al. 2016), the tokenizer-training primitive of every modern LLM pipeline.
# Per iteration: (1) count adjacent symbol pairs over the DISTINCT-WORD table
# weighted by word frequency — after the first aggregation nothing is ever
# corpus-sized again; (2) take the argmax pair (count desc, pair asc — a
# 1-row TakeOrdered over the pair-vocab frame); (3) apply the merge to every
# word as a row-local left-to-right fold (Spark ``aggregate``, DuckDB
# ``list_reduce`` — both seed with the first symbol and walk once, exactly
# the classic greedy merge walk: a symbol produced by a merge is never the
# left operand of another merge in the same pass, because merged != left).
# The argmax row rides a broadcast crossJoin into the next iteration — the
# whole N-iteration fit is ONE declarative plan, no driver-side collect.
# Scale path note: because b1..bN each appear in two consumers (next
# iteration + final union), Spark re-executes their lineage — including the
# initial corpus scan — once per branch. Fine here (the scan is one cheap
# aggregation), but a production fit over 100 TB would first MATERIALIZE the
# word-frequency table (one corpus pass, vocab-sized output, e.g. via
# tablog.create_table) and iterate over that; the per-iteration plan shape
# below is unchanged.
_BPE_ITERS = 4

# Symmetric degenerate-input gate (giant-single-token corpus class, round
# 9): a "word" of W chars char-splits into a W-symbol sequence whose pair
# enumeration and left-to-right merge fold both cost O(W^2) — a single
# multi-MB unbroken token (a binary blob that leaked into a text column)
# stalls BOTH engines for hours. No natural-language word, URL, or
# identifier approaches 1024 chars, so on real corpora the gate is a
# no-op; it is applied in the Spark plan AND the DuckDB oracle so results
# stay bit-identical on every corpus.
_BPE_MAX_WORD = 1024

# fold step, per engine (same semantics; Spark spells the suffix test
# ``endswith``, DuckDB ``ends_with``)
_BPE_FOLD_DUCK = (
    "CASE WHEN x = b AND (acc = a OR ends_with(acc, ' ' || a))"
    " THEN acc || b ELSE acc || ' ' || x END"
)
_BPE_FOLD_SPARK = (
    "CASE WHEN x = b AND (acc = a OR endswith(acc, concat(' ', a)))"
    " THEN concat(acc, b) ELSE concat(acc, ' ', x) END"
)


def _bpe_oracle() -> str:
    parts = [
        f"""
    WITH words AS (
        SELECT token AS w, COUNT(*) AS c
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
              FROM documents)
        WHERE len(token) <= {_BPE_MAX_WORD}
        GROUP BY 1
    ),
    it0 AS (
        SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq, c FROM words
    )"""
    ]
    for i in range(1, _BPE_ITERS + 1):
        parts.append(f""",
    p{i} AS (
        SELECT pr, CAST(SUM(c) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_transform(range(2, len(s) + 1),
                                         j -> s[j - 1] || ' ' || s[j])) AS pr, c
            FROM (SELECT string_split(seq, ' ') AS s, c FROM it{i - 1})
        ) GROUP BY 1
    ),
    b{i} AS (
        SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b,
               pr, cnt
        FROM p{i} ORDER BY cnt DESC, pr LIMIT 1
    )""")
        if i < _BPE_ITERS:
            parts.append(f""",
    it{i} AS (
        SELECT list_reduce(string_split(seq, ' '),
                           (acc, x) -> {_BPE_FOLD_DUCK}) AS seq, c
        FROM it{i - 1} CROSS JOIN b{i}
    )""")
    finals = [
        f"SELECT {i} AS merge_rank, pr AS pair, cnt FROM b{i}"
        for i in range(1, _BPE_ITERS + 1)
    ]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(finals)


@query("bpe_learn_merges", oracle=_bpe_oracle())
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") <= _BPE_MAX_WORD)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cur = words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "c"
    )
    bests = []
    for _ in range(_BPE_ITERS):
        s = F.split(F.col("seq"), " ")
        pairs = (
            cur.select(
                F.explode(
                    F.expr(
                        # sequence(1, 0) is DESCENDING in Spark — single-
                        # symbol words need the explicit empty branch
                        "CASE WHEN size(split(seq, ' ')) < 2 THEN array()"
                        " ELSE transform(sequence(1, size(split(seq, ' ')) - 1),"
                        " j -> concat(split(seq, ' ')[j - 1], ' ',"
                        " split(seq, ' ')[j])) END"
                    )
                ).alias("pr"),
                "c",
            )
            .groupBy("pr")
            .agg(F.sum("c").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("pr"))
            .limit(1)
            .select(
                F.split("pr", " ").getItem(0).alias("a"),
                F.split("pr", " ").getItem(1).alias("b"),
                "pr",
                "cnt",
            )
        )
        bests.append(best)
        cur = cur.crossJoin(F.broadcast(best)).select(
            F.expr(
                "aggregate(slice(split(seq, ' '), 2,"
                " size(split(seq, ' ')) - 1), split(seq, ' ')[0],"
                f" (acc, x) -> {_BPE_FOLD_SPARK})"
            ).alias("seq"),
            "c",
        )
    out = None
    for i, b in enumerate(bests, start=1):
        row = b.select(
            F.lit(i).alias("merge_rank"), F.col("pr").alias("pair"), "cnt"
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- BPE tokenizer APPLICATION (the encode side of bpe_learn_merges) ---------
# Apply all N learned merges to the corpus vocabulary and report the token-
# count compression they buy: frequency-weighted symbol count before
# (characters) vs after — the metric a tokenizer-training loop watches to
# decide how many merges to learn. Same declarative chain as the learner,
# extended one application step (the N-th merge is applied too), ending in
# two scalar aggregates over the vocab-sized table.
def _bpe_apply_oracle() -> str:
    parts = [
        f"""
    WITH words AS (
        SELECT token AS w, COUNT(*) AS c
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
              FROM documents)
        WHERE len(token) <= {_BPE_MAX_WORD}
        GROUP BY 1
    ),
    it0 AS (
        SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq, c FROM words
    )"""
    ]
    for i in range(1, _BPE_ITERS + 1):
        parts.append(f""",
    p{i} AS (
        SELECT pr, CAST(SUM(c) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_transform(range(2, len(s) + 1),
                                         j -> s[j - 1] || ' ' || s[j])) AS pr, c
            FROM (SELECT string_split(seq, ' ') AS s, c FROM it{i - 1})
        ) GROUP BY 1
    ),
    b{i} AS (
        SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b
        FROM p{i} ORDER BY cnt DESC, pr LIMIT 1
    ),
    it{i} AS (
        SELECT list_reduce(string_split(seq, ' '),
                           (acc, x) -> {_BPE_FOLD_DUCK}) AS seq, c
        FROM it{i - 1} CROSS JOIN b{i}
    )""")
    parts.append(f"""
    SELECT before.v AS symbols_before,
           after.v AS symbols_after,
           {_BPE_ITERS} AS n_merges,
           ROUND(CAST(after.v AS DOUBLE) / CAST(before.v AS DOUBLE), 6)
               AS compression
    FROM (SELECT CAST(SUM(c * len(string_split(seq, ' '))) AS BIGINT) AS v
          FROM it0) before
    CROSS JOIN (SELECT CAST(SUM(c * len(string_split(seq, ' '))) AS BIGINT) AS v
                FROM it{_BPE_ITERS}) after
    """)
    return "".join(parts)


@query("bpe_apply_stats", oracle=_bpe_apply_oracle())
def bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") <= _BPE_MAX_WORD)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    it0 = words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "c"
    )
    cur = it0
    for _ in range(_BPE_ITERS):
        pairs = (
            cur.select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(split(seq, ' ')) < 2 THEN array()"
                        " ELSE transform(sequence(1, size(split(seq, ' ')) - 1),"
                        " j -> concat(split(seq, ' ')[j - 1], ' ',"
                        " split(seq, ' ')[j])) END"
                    )
                ).alias("pr"),
                "c",
            )
            .groupBy("pr")
            .agg(F.sum("c").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("pr"))
            .limit(1)
            .select(
                F.split("pr", " ").getItem(0).alias("a"),
                F.split("pr", " ").getItem(1).alias("b"),
            )
        )
        cur = cur.crossJoin(F.broadcast(best)).select(
            F.expr(
                "aggregate(slice(split(seq, ' '), 2,"
                " size(split(seq, ' ')) - 1), split(seq, ' ')[0],"
                f" (acc, x) -> {_BPE_FOLD_SPARK})"
            ).alias("seq"),
            "c",
        )

    def weighted_symbols(df: DataFrame) -> DataFrame:
        return df.agg(
            F.sum(F.col("c") * F.size(F.split("seq", " "))).cast("long").alias("v")
        )

    before = weighted_symbols(it0)
    after = weighted_symbols(cur)
    return (
        before.select(F.col("v").alias("symbols_before"))
        .crossJoin(F.broadcast(after.select(F.col("v").alias("symbols_after"))))
        .select(
            "symbols_before",
            "symbols_after",
            F.lit(_BPE_ITERS).alias("n_merges"),
            F.round(
                F.col("symbols_after").cast("double")
                / F.col("symbols_before").cast("double"),
                6,
            ).alias("compression"),
        )
    )


# --- multinomial Naive Bayes language classifier -----------------------------
# The classic fully-distributed text classifier: training IS aggregation
# (per-(class, token) counts + class priors), scoring IS one equi-join and a
# sum — no iterative optimization, no driver-side state. Add-1 smoothing
# makes unseen (token, class) pairs contribute ln(0+1) = 0, so the scoring
# join only needs EXISTING count rows (an inner join against the vocab-sized
# count table, missing pairs coalesce to zero) — the property that keeps the
# plan at two shuffles regardless of vocabulary size.
#
# Split: even doc_ids train, odd doc_ids score (deterministic, engine-
# portable). Per-term log-likelihoods round to 1e-6-scaled longs before
# summation (the repo's exact-sum discipline), so class scores are exact
# integers and the argmax is partition-order-proof on both engines.
#
# Scale: the (class, token) count table is vocab x classes (aggregated, not
# corpus-sized); the class stats frame is |classes| rows (broadcast); the
# scoring join hash-partitions on token; the argmax window partitions by
# doc_id over |classes| rows per doc. No global sorts, no driver collects.
@query(
    "naive_bayes_lang_confusion",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, {_TOK} AS tk FROM documents),
    tr_tok AS (SELECT lang, unnest(tk) AS token FROM d WHERE doc_id % 2 = 0),
    tc AS (SELECT lang, token, COUNT(*) AS c FROM tr_tok GROUP BY 1, 2),
    cls_tok AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tok_c FROM tc GROUP BY 1),
    docs_c AS (
        SELECT lang, COUNT(*) AS dc FROM d WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(dc) AS BIGINT) AS td FROM docs_c),
    voc AS (SELECT COUNT(DISTINCT token) AS v FROM tc),
    cls AS (
        SELECT dc.lang,
               CAST(FLOOR(ln(CAST(dc.dc AS DOUBLE) / CAST(tot.td AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS prior_s,
               CAST(FLOOR(ln(CAST(ct.tok_c + voc.v AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS denom_s
        FROM docs_c dc JOIN cls_tok ct USING (lang) CROSS JOIN tot CROSS JOIN voc
    ),
    te_tok AS (SELECT doc_id, unnest(tk) AS token FROM d WHERE doc_id % 2 = 1),
    nd AS (SELECT doc_id, COUNT(*) AS n_tok FROM te_tok GROUP BY 1),
    hit AS (
        SELECT t.doc_id, c.lang,
               CAST(SUM(CAST(FLOOR(ln(CAST(c.c + 1 AS DOUBLE)) * 1000000 + 0.5)
                             AS BIGINT)) AS BIGINT) AS hit_s
        FROM te_tok t JOIN tc c USING (token) GROUP BY 1, 2
    ),
    sc AS (
        SELECT nd.doc_id, cls.lang,
               cls.prior_s + COALESCE(h.hit_s, 0) - nd.n_tok * cls.denom_s
                   AS score_s
        FROM nd CROSS JOIN cls
        LEFT JOIN hit h ON h.doc_id = nd.doc_id AND h.lang = cls.lang
    ),
    pred AS (
        SELECT doc_id, lang AS pred_lang,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score_s DESC, lang ASC
               ) AS rn
        FROM sc
    )
    SELECT d.lang, p.pred_lang, COUNT(*) AS n_docs
    FROM pred p JOIN d ON d.doc_id = p.doc_id
    WHERE p.rn = 1
    GROUP BY 1, 2
    """,
)
def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)

    tr_tok = train.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
    tc = tr_tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    cls_tok = tc.groupBy("lang").agg(F.sum("c").cast("long").alias("tok_c"))
    docs_c = train.groupBy("lang").agg(F.count(F.lit(1)).alias("dc"))
    tot = docs_c.groupBy().agg(F.sum("dc").cast("long").alias("td"))
    voc = tc.groupBy().agg(F.countDistinct("token").alias("v"))

    s6 = lambda col: F.floor(col * 1_000_000 + F.lit(0.5)).cast("long")  # noqa: E731
    cls = (
        docs_c.join(cls_tok, "lang")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
        .select(
            "lang",
            s6(F.log(F.col("dc").cast("double") / F.col("td").cast("double")))
            .alias("prior_s"),
            s6(F.log((F.col("tok_c") + F.col("v")).cast("double"))).alias("denom_s"),
        )
    )

    te_tok = test.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    nd = te_tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    hit = (
        te_tok.join(tc, "token")
        .groupBy("doc_id", "lang")
        .agg(F.sum(s6(F.log((F.col("c") + 1).cast("double")))).cast("long").alias("hit_s"))
    )
    sc = (
        nd.crossJoin(F.broadcast(cls))
        .join(hit, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang",
            (
                F.col("prior_s")
                + F.coalesce(F.col("hit_s"), F.lit(0))
                - F.col("n_tok") * F.col("denom_s")
            ).alias("score_s"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score_s").desc(), F.col("lang").asc())
    pred = (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    return (
        pred.join(test.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
