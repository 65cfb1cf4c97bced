"""Text-analysis + multimodal-bytes queries over the ``documents`` table.

Oracle fragments mirror ``operators/text.py`` expression-for-expression so
doubles come out bit-identical (same operand order on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text as TX
from .registry import query

# DuckDB-side fragments (keep in sync with operators/text.py)
TK = r"regexp_split_to_array(trim(text), '\s+')"
STOPS_SQL = "['" + "','".join(TX.STOPWORDS) + "']"


@query(
    "text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {TK} AS tk FROM documents)
    SELECT doc_id, n_chars,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_unique_tokens,
           CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
             / CAST(len(tk) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter(tk, x -> list_contains({STOPS_SQL}, x))) AS DOUBLE)
             / CAST(len(tk) AS DOUBLE) AS stop_ratio
    FROM t
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = TX.with_text_stats(docs.select("doc_id", "n_chars", "text"))
    return out.select(
        "doc_id",
        "n_chars",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_unique_tokens").cast("long").alias("n_unique_tokens"),
        # mirror oracle: double(int sum) / double(count)
        "avg_token_len",
        "stop_ratio",
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {TK} AS tk FROM documents)
    SELECT doc_id, lang,
           CASE WHEN CAST(len(list_filter(tk, x -> list_contains({STOPS_SQL}, x))) AS DOUBLE)
                     / CAST(len(tk) AS DOUBLE) >= 0.03
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM t
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.with_lang_id(docs.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", "lang_pred"
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TK} AS tk FROM documents),
    m AS (
        SELECT doc_id,
               CAST(len(tk) AS DOUBLE) AS n,
               CAST(len(list_distinct(tk)) AS DOUBLE) AS uniq,
               CAST(len(list_filter(tk, x -> list_contains({STOPS_SQL}, x))) AS DOUBLE) AS stop
        FROM t
    )
    SELECT doc_id,
           ROUND(0.4 * least(1.0, n / 100.0)
               + 0.4 * (uniq / n)
               + 0.2 * (CASE WHEN stop / n >= 0.02 AND stop / n <= 0.3 THEN 1.0 ELSE 0.0 END),
             6) AS quality_score
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.with_quality_score(docs.select("doc_id", "text")).select("doc_id", "quality_score")


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TX.TOKEN_REGEX}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.with_token_count(docs.select("doc_id", "text")).select(
        "doc_id", F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens")
    )


@query(
    "doc_fingerprint",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substring(md5(norm), 1, 15)) AS BIGINT) AS fingerprint,
           substring(md5(norm), 1, 16) AS fp_hex
    FROM t
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.with_fingerprint(docs.select("doc_id", "text")).select(
        "doc_id", "fingerprint", "fp_hex"
    )


# --- multimodal bytes plumbing ----------------------------------------------
# Binary payload columns (image/audio stand-ins): byte length + content hash.
# Spark md5(encode(text,'utf-8')) == DuckDB md5(text) (same utf-8 bytes).
@query(
    "multimodal_bytes",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    )


# --- multimodal decode->resize feature summary (Arrow mapInPandas path) ------
# The Pandas-UDF tier of the multimodal pipeline: binary payloads decode and
# resize to a fixed 8x8 grid inside mapInPandas, then aggregate back to
# relational space. The decode kernel is a deterministic stub (no image libs
# in this environment), which is exactly why this entry is rows-only: the
# Spark-side plumbing (Arrow batches, schema, null passthrough) is the
# product surface, not the fake pixel values.
# Closed-form oracle (VERDICT r3 #5, the multimodal_video_frames pattern):
# the "fake" decode kernel is a PURE function of md5(payload) — width/height
# are 64 + digest bytes (integer-exact) and the first grid pixel is
# float32(digest[0]/255) * float32(1 + 0/64) == the float32 division itself,
# which DuckDB's REAL division reproduces bit-for-bit (verified over all 256
# byte values; the *1.0 modulation of pixel 0 is an identity). payload is
# the UTF-8 text, so DuckDB's md5(text) hashes identical bytes. The oracle
# therefore certifies the ENTIRE Arrow plumbing chain — encode -> mapInPandas
# batch shape -> kernel -> fixed-width grid -> decode_ok — relationally.
@query(
    "multimodal_resize_summary",
    oracle="""
    WITH h AS (
        SELECT CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS d0,
               CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS d1
        FROM documents
    )
    SELECT CAST(8 AS INT) AS out_width,
           CAST(8 AS INT) AS out_height,
           COUNT(*) AS n_images,
           COUNT(*) AS n_decoded,
           CAST(SUM(64 + d0) AS BIGINT) AS sum_width,
           CAST(SUM(64 + d1) AS BIGINT) AS sum_height,
           ROUND((SUM(CAST(FLOOR(
                     CAST(CAST(d0 AS REAL) / CAST(255.0 AS REAL) AS DOUBLE)
                     * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0)
                 / COUNT(*), 6) AS avg_first_px
    FROM h
    """,
)
def multimodal_resize_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    grid = MM.resize(media, out_width=8, out_height=8, decode="fake")
    px1 = F.element_at("pixels", 1).cast("double")
    scaled = F.sum(F.floor(px1 * 1_000_000_000 + F.lit(0.5)).cast("long")) / 1e9
    return grid.groupBy("out_width", "out_height").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("n_decoded"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.round(scaled / F.count(F.lit(1)), 6).alias("avg_first_px"),
    )


# --- multimodal REAL decode: PPM payloads through the numpy codec kernel -----
# Valid 4x4 P6 PPM binaries are synthesized JVM-side from document text
# (header + exactly 48 ASCII payload bytes), then decoded by the default
# decode="real" kernel (operators/media_codecs.py — pure-numpy PPM/BMP/WAV
# parsers) inside mapInPandas. Every payload is well-formed by construction,
# so the oracle can assert the decode contract relationally: all rows decode,
# width*height is exact. Pixel-level feature math is pinned bit-exact in
# tests/test_multimodal.py (encode->decode roundtrips vs numpy).
@query(
    "multimodal_real_decode",
    oracle="""
    SELECT source,
           COUNT(*) AS n_media,
           COUNT(*) AS n_decoded,
           CAST(16 * COUNT(*) AS BIGINT) AS total_pixels
    FROM documents
    GROUP BY source
    """,
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ascii48 = F.rpad(
        F.regexp_replace(F.substring("text", 1, 80), r"[^\x20-\x7e]", ""), 48, "x"
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.concat(F.lit("P6\n4 4\n255\n"), ascii48), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"), F.lit(60).cast("long").alias("byte_len")
        ).alias("meta"),
    )
    feats = MM.extract_features(media, decode="real")
    # corpus-sized join back to the source dim: NOT broadcast (documents is
    # the 100 TB side); equi-join on media_id shuffles both sides on the key
    src = docs.select(F.col("doc_id").alias("media_id"), "source")
    return (
        feats.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("decode_ok").cast("int")).cast("long").alias("n_decoded"),
            F.sum(F.col("width") * F.col("height")).cast("long").alias("total_pixels"),
        )
    )


# --- TF-IDF: top-k characteristic terms per document -------------------------
# The canonical corpus-statistics operator: term frequency within the doc ×
# inverse document frequency across the corpus, top-3 terms per doc with a
# deterministic (score desc, token asc) tie-break. Scale shape: two shuffles
# (doc-term count; term df) + a broadcast of the df table (vocab-sized —
# millions of rows at web scale, still broadcastable after a min-df cut) and
# one per-doc ranking window. N is folded in as a broadcast scalar, never a
# driver collect of data rows.
@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({TK}) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6)
                   AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, token ASC) AS rk
        FROM scored
    )
    SELECT doc_id, token, tfidf, rk FROM ranked WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df derives from tf (already one row per (doc, token)) — a count per
    # token over the aggregated frame, NOT a second tokenization pass with a
    # countDistinct expansion over raw tokens.
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf", "rk")
    )


# --- unigram log-probability (perplexity-style quality filter) ---------------
# Corpus-LM quality scoring: sum of ln(corpus unigram probability) per token,
# normalized by token count — the cheap perplexity proxy used to filter
# gibberish/boilerplate before training. Same scale shape as TF-IDF: one
# token-count aggregation, the (vocab-sized) frequency table broadcast back,
# per-doc sum. Exact cross-engine determinism via the scaled-long sum of
# per-token ln values (each ln is a pure function of identical doubles).
@query(
    "doc_unigram_logprob",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({TK}) AS token FROM documents
    ),
    freq AS (
        SELECT token, COUNT(*) AS c FROM tok GROUP BY token
    ),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    per_tok AS (
        SELECT t.doc_id,
               ln(CAST(f.c AS DOUBLE) / CAST(tot.n AS DOUBLE)) AS lp
        FROM tok t JOIN freq f USING (token) CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           (SUM(CAST(FLOOR((lp) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) AS sum_logprob,
           ROUND((SUM(CAST(FLOOR((lp) * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                 / COUNT(*), 6) AS avg_logprob
    FROM per_tok
    GROUP BY doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # corpus total derives from the (vocab-sized) frequency table — not a
    # third scan of the raw token stream
    tot = freq.groupBy().agg(F.sum("c").alias("n"))
    lp = F.log(F.col("c").cast("double") / F.col("n").cast("double"))
    scaled = F.sum(F.floor(lp * 1_000_000 + F.lit(0.5)).cast("long")) / 1e6
    return (
        tok.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            scaled.alias("sum_logprob"),
            F.round(scaled / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


# --- sequence packing --------------------------------------------------------
# The greedy next-fit ASSIGNMENT is not SQL-expressible, but its CONTRACT
# is, so the oracle pins it relationally (VERDICT r3 #7 pattern): packing
# must conserve the corpus exactly (doc count and char mass unchanged — no
# drops, no duplicates) and every multi-doc pack must respect the 4096-char
# capacity (an oversized single document legitimately overflows its own
# pack under next-fit). A packing bug — lost rows, split rows, a capacity
# regression — flips a flag or a conserved total and hash-mismatches.
@query(
    "sequence_packing",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           1 AS capacity_ok,
           1 AS no_empty_packs
    FROM documents
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 4096-char bins (operators/packing.py) and emit
    the conservation + capacity certificate over the per-pack manifest.
    Deterministic greedy next-fit per hash partition."""
    from ..operators.packing import pack_greedy

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_greedy(docs, size_col="n_chars", max_units=4096, order_col="doc_id")
    packs = packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return packs.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_chars").cast("long").alias("total_chars"),
        F.min(
            F.when(
                (F.col("n_docs") > 1) & (F.col("total_chars") > 4096), 0
            ).otherwise(1)
        ).alias("capacity_ok"),
        F.min((F.col("n_docs") >= 1).cast("int")).alias("no_empty_packs"),
    )


# --- positional tokenization (posexplode / WITH ORDINALITY) ------------------
# Token with its 1-based position — the input shape for positional n-gram
# features and alignment labels. posexplode is the ordinal-preserving
# explode; first-5 filter keeps output bounded (prefix tokens are the
# feature set that matters for headline/title heuristics).
@query(
    "tokens_with_position",
    oracle=f"""
    SELECT doc_id, pos, token FROM (
        SELECT doc_id,
               generate_subscripts(tk, 1) AS pos,
               unnest(tk) AS token
        FROM (SELECT doc_id, {TK} AS tk FROM documents)
    )
    WHERE pos <= 5
    """,
)
def tokens_with_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "token"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
        .filter(F.col("pos") <= 5)
    )


# --- array set operations ----------------------------------------------------
# Set algebra over token arrays (array_intersect/except/union): the in-row
# form of stopword analysis — how much of each doc's vocabulary is stopwords
# vs content. Row-local (zero exchanges beyond the scan); sizes only, so the
# check is order-insensitive by construction.
@query(
    "array_set_ops_tokens",
    oracle=f"""
    WITH t AS (SELECT doc_id, list_distinct({TK}) AS tk FROM documents)
    SELECT doc_id,
           CAST(len(list_intersect(tk, {STOPS_SQL})) AS BIGINT) AS n_stop_vocab,
           CAST(len(list_filter(tk, x -> NOT list_contains({STOPS_SQL}, x))) AS BIGINT)
               AS n_content_vocab,
           CAST(len(list_distinct(list_concat(tk, {STOPS_SQL}))) AS BIGINT)
               AS n_union_vocab
    FROM t
    """,
)
def array_set_ops_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import tokens

    docs = load_table(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(s) for s in TX.STOPWORDS])
    tk = F.array_distinct(tokens(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(F.array_intersect(tk, stops)).cast("long").alias("n_stop_vocab"),
        F.size(F.array_except(tk, stops)).cast("long").alias("n_content_vocab"),
        F.size(F.array_union(tk, stops)).cast("long").alias("n_union_vocab"),
    )


# --- Gopher-style repetition rules -------------------------------------------
# The repetition family of LLM-data quality filters (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1): documents dominated by
# repeated words / n-grams are boilerplate or spam and get dropped before
# training. Signals per doc, all row-local (zero shuffles, scales to any
# corpus): duplicate-word fraction, duplicate-bigram fraction, most-common-
# word dominance, mean word length, and the keep verdict. Both engines run
# the identical integer-count arithmetic, so fractions are bit-exact.
@query(
    "text_repetition_gopher",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    m AS (
        SELECT doc_id, w,
               len(w) AS n,
               len(list_distinct(w)) AS n_uniq,
               list_transform(generate_series(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i + 1]) AS bg,
               list_max(list_transform(list_distinct(w),
                        u -> len(list_filter(w, y -> y = u)))) AS top_cnt,
               list_sum(list_transform(w, x -> length(x))) AS sum_len
        FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_words,
           CAST(sum_len AS BIGINT) / CAST(n AS DOUBLE) AS mean_word_len,
           CAST(n - n_uniq AS BIGINT) / CAST(n AS DOUBLE) AS dup_word_frac,
           CASE WHEN len(bg) = 0 THEN NULL
                ELSE CAST(len(bg) - len(list_distinct(bg)) AS BIGINT)
                     / CAST(len(bg) AS DOUBLE) END AS dup_bigram_frac,
           CAST(top_cnt AS BIGINT) / CAST(n AS DOUBLE) AS top_word_frac,
           CAST(CAST(top_cnt AS BIGINT) / CAST(n AS DOUBLE) < 0.2
                AND CAST(n - n_uniq AS BIGINT) / CAST(n AS DOUBLE) < 0.95
                AS INT) AS keep
    FROM m
    """,
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import tokens

    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    d = docs.select("doc_id", w.alias("w"))
    n = F.size("w")
    n_uniq = F.size(F.array_distinct("w"))
    bg = F.zip_with(
        F.slice("w", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("w", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("w"),
            lambda u: F.size(F.filter("w", lambda y: y == u)),
        )
    )
    sum_len = F.aggregate(
        F.transform("w", lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    nbg = F.size(bg)
    top_frac = top_cnt.cast("long") / n.cast("double")
    dup_frac = (n - n_uniq).cast("long") / n.cast("double")
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        (sum_len.cast("long") / n.cast("double")).alias("mean_word_len"),
        dup_frac.alias("dup_word_frac"),
        F.when(
            nbg > 0, (nbg - F.size(F.array_distinct(bg))).cast("long") / nbg.cast("double")
        ).alias("dup_bigram_frac"),
        top_frac.alias("top_word_frac"),
        ((top_frac < 0.2) & (dup_frac < 0.95)).cast("int").alias("keep"),
    )


# --- document-length deciles (packing planner input) -------------------------
# Sequence packing efficiency depends on the length distribution; the decile
# profile (ntile over token counts, deterministic (n, doc_id) tie-break) is
# the planner's input for choosing pack budgets. One window pass + rollup.
@query(
    "doc_length_deciles",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len({TK}) AS n_tokens FROM documents
    ),
    d AS (
        SELECT doc_id, n_tokens,
               CAST(NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS INT) AS decile
        FROM t
    )
    SELECT decile, COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM d GROUP BY decile
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(TX.tokens(F.col("text"))).alias("n_tokens")
    )
    d = t.withColumn(
        "decile", F.ntile(10).over(W.orderBy("n_tokens", "doc_id"))
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# --- per-source language-distribution drift ----------------------------------
# Domain-shift / data-quality detector: how far does each source's language
# mix deviate from the corpus-wide mix? L1 (total variation x2) distance per
# source. All probability terms divide the same BIGINT counts, and the
# per-language |Δp| addends stage through scaled longs before summing, so
# the distance is bit-identical regardless of partitioning or which language
# sums first.
@query(
    "source_lang_drift",
    oracle="""
    WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang),
    st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS s_tot FROM c GROUP BY source),
    lt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS l_tot FROM c GROUP BY lang),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS g_tot FROM c),
    cells AS (
        SELECT st.source, lt.lang,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
               st.s_tot, lt.l_tot, tot.g_tot
        FROM st CROSS JOIN lt CROSS JOIN tot
        LEFT JOIN c ON c.source = st.source AND c.lang = lt.lang
    )
    SELECT source, CAST(MAX(s_tot) AS BIGINT) AS n_docs,
           (SUM(CAST(FLOOR(abs(CAST(n AS DOUBLE) / CAST(s_tot AS DOUBLE)
                               - CAST(l_tot AS DOUBLE) / CAST(g_tot AS DOUBLE))
                           * 1000000 + 0.5) AS BIGINT)) / 1000000.0) AS l1_drift
    FROM cells GROUP BY source
    """,
)
def source_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    st = c.groupBy("source").agg(F.sum("n").alias("s_tot"))
    lt = c.groupBy("lang").agg(F.sum("n").alias("l_tot"))
    tot = c.agg(F.sum("n").alias("g_tot"))
    cells = (
        st.crossJoin(F.broadcast(lt))
        .crossJoin(F.broadcast(tot))
        .join(c, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            F.coalesce("n", F.lit(0)).alias("n"),
            "s_tot",
            "l_tot",
            "g_tot",
        )
    )
    dp = F.abs(
        F.col("n").cast("double") / F.col("s_tot").cast("double")
        - F.col("l_tot").cast("double") / F.col("g_tot").cast("double")
    )
    return cells.groupBy("source").agg(
        F.max("s_tot").alias("n_docs"),
        (F.sum(F.floor(dp * 1000000 + F.lit(0.5)).cast("long")) / 1000000.0).alias("l1_drift"),
    )


# --- n-gram novelty scoring (memorization diagnostic) ------------------------
# Per document: the fraction of its distinct 5-grams that occur NOWHERE else
# in the corpus (df == 1) — high novelty = unique content, low novelty =
# boilerplate/duplication. The same posting-list shape as decontamination:
# grams collapse to 8-byte hashes, one df aggregation (gram-vocab-sized),
# flags join back to the per-doc distinct-gram stream.
@query(
    "ngram_novelty_docs",
    oracle=f"""
    WITH g AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substring(md5(
                   list_aggregate(list_slice({TK}, i, i + 4), 'string_agg', ' ')
               ), 1, 15) AS BIGINT) AS gh
        FROM documents, LATERAL (
            SELECT unnest(range(1, len({TK}) - 3)) AS i
        )
        WHERE len({TK}) >= 5
    ),
    df AS (SELECT gh, COUNT(*) AS d FROM g GROUP BY 1)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df.d = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS novel_grams,
           ROUND(CAST(SUM(CASE WHEN df.d = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM g JOIN df USING (gh)
    GROUP BY 1
    """,
)
def ngram_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import md5_int, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    # row-local 5-gram construction over the hoisted token array, distinct
    # per doc, hashed to 8 bytes before anything shuffles; docs under 5
    # tokens have no 5-gram (a floor of 1 would emit an undersized gram
    # here and nothing in the oracle's end-exclusive range — divergence)
    grams = (
        toked.filter(F.expr("size(t) >= 5"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 4),"
                    " i -> array_join(slice(t, i, 5), ' '))"
                )
            ).alias("gram"),
        )
        .select("doc_id", md5_int(F.col("gram")).alias("gh"))
        .distinct()
    )
    df_tab = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("d"))
    return (
        grams.join(df_tab, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("novel_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "novel_grams",
            F.round(F.col("novel_grams") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


# --- per-source dataset card -------------------------------------------------
# The one-table summary a dataset release ships per source: volume (docs,
# tokens, mean length), language purity (share of the majority language),
# and exact-duplicate rate (docs whose full text hash appears more than once
# within the source). Each signal is one bounded aggregation; the duplicate
# rate reuses the exact-hash groupBy shape of dedup_exact_summary.
@query(
    "dataset_card_by_source",
    oracle="""
    WITH base AS (
        SELECT source, doc_id, lang, n_chars,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS th
        FROM documents
    ),
    dup AS (
        SELECT source, th, COUNT(*) AS c FROM base GROUP BY 1, 2
    ),
    dup_rate AS (
        SELECT source,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs
        FROM dup GROUP BY 1
    ),
    lang_mix AS (
        SELECT source, lang, COUNT(*) AS lc FROM base GROUP BY 1, 2
    ),
    major AS (
        SELECT source, lang AS top_lang, lc AS top_lc FROM (
            SELECT source, lang, lc,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY lc DESC, lang DESC) AS rn
            FROM lang_mix
        ) WHERE rn = 1
    )
    SELECT b.source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS mean_chars,
           m.top_lang,
           ROUND(CAST(m.top_lc AS DOUBLE) / COUNT(*), 6) AS lang_purity,
           d.dup_docs,
           ROUND(CAST(d.dup_docs AS DOUBLE) / COUNT(*), 6) AS dup_rate
    FROM base b
    JOIN major m ON m.source = b.source
    JOIN dup_rate d ON d.source = b.source
    GROUP BY b.source, m.top_lang, m.top_lc, d.dup_docs
    """,
)
def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import md5_int, tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        "lang",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        md5_int(F.col("text")).alias("th"),
    )
    dup = base.groupBy("source", "th").agg(F.count(F.lit(1)).alias("c"))
    dup_rate = dup.groupBy("source").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_docs")
    )
    lang_mix = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("lc"))
    # majority language with a deterministic (count, lang) tie-break on both
    # engines (struct max == ORDER BY lc DESC, lang DESC ... rn=1)
    major = lang_mix.groupBy("source").agg(
        F.max(F.struct(F.col("lc"), F.col("lang"))).alias("m")
    ).select(
        "source",
        F.col("m.lang").alias("top_lang"),
        F.col("m.lc").alias("top_lc"),
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("mean_chars"),
        )
        .join(F.broadcast(major), "source")
        .join(F.broadcast(dup_rate), "source")
        .select(
            "source",
            "n_docs",
            "tokens",
            "mean_chars",
            "top_lang",
            F.round(F.col("top_lc").cast("double") / F.col("n_docs"), 6).alias(
                "lang_purity"
            ),
            "dup_docs",
            F.round(F.col("dup_docs").cast("double") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
    )


# --- multimodal REAL audio decode: WAV payloads through the numpy codec ------
# The audio half of the media pipeline, end to end under the driver gate:
# PCM16 WAV binaries are SYNTHESIZED executor-side (mapInPandas; RIFF
# headers carry little-endian binary lengths, so bytes are built with the
# numpy encoder, never string functions), then decoded by the same
# decode="real" kernel, which sniffs RIFF and routes to the WAV parser.
# Sample count is a pure function of doc_id (100 + doc_id % 50), so the
# oracle asserts the decode contract exactly: every payload decodes, total
# samples and channel counts are closed-form.
@query(
    "multimodal_audio_decode",
    oracle="""
    SELECT source,
           COUNT(*) AS n_media,
           COUNT(*) AS n_decoded,
           CAST(SUM(100 + doc_id % 50) AS BIGINT) AS total_samples,
           CAST(COUNT(*) AS BIGINT) AS total_channels
    FROM documents
    GROUP BY source
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators import multimodal as MM
    from ..operators.media_codecs import encode_wav

    docs = load_table(spark, sf_dir, "documents")

    def synth(batches):
        for pdf in batches:
            rows = []
            for did, src in zip(pdf["doc_id"], pdf["source"]):
                n = 100 + int(did) % 50
                t = np.arange(n, dtype=np.float32)
                wave = (np.sin(2 * np.pi * t / 32.0) * 0.5).astype(np.float32)
                payload = encode_wav(wave.reshape(-1, 1), rate=16000)
                rows.append((int(did), "audio", payload, (str(src), len(payload))))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload", "meta"]
            )

    media = docs.select("doc_id", "source").mapInPandas(
        synth,
        schema="media_id long, media_type string, payload binary, "
        "meta struct<source:string, byte_len:bigint>",
    )
    feats = MM.extract_features(media, decode="real")
    src = docs.select(F.col("doc_id").alias("media_id"), "source")
    return (
        feats.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("decode_ok").cast("int")).cast("long").alias("n_decoded"),
            F.sum("width").cast("long").alias("total_samples"),
            F.sum("height").cast("long").alias("total_channels"),
        )
    )


# --- video frame sampling through the real Y4M container parser -------------
# The video complement of multimodal_audio_decode: every doc synthesizes a
# deterministic Y4M clip EXECUTOR-SIDE (frame count and per-pixel luma are
# pure functions of doc_id), which then rides through the pure-numpy
# YUV4MPEG2 parser (operators/media_codecs.decode_y4m) and the every-2nd-
# frame sampler. The parser must get header geometry AND the C420 chroma-
# plane stride exactly right to land on each FRAME marker, so the sampled
# per-frame luma sums are a hard probe of the container math; the oracle
# replays the closed-form pixel function over a bounded 16x8 grid join.
@query(
    "multimodal_video_frames",
    oracle="""
    WITH fr AS (
        SELECT d.doc_id, d.source, t.f
        FROM documents d
        CROSS JOIN range(5) t(f)
        WHERE t.f < 2 + d.doc_id % 4 AND t.f % 2 = 0
    ),
    per_frame AS (
        SELECT fr.source, fr.doc_id, fr.f,
               SUM((fr.doc_id * 7 + fr.f * 13 + gx.x + 2 * gy.y) % 251) AS fsum
        FROM fr
        CROSS JOIN range(16) gx(x)
        CROSS JOIN range(8) gy(y)
        GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_media,
           CAST(COUNT(*) AS BIGINT) AS n_sampled_frames,
           CAST(SUM(fsum) AS BIGINT) AS luma_total,
           CAST(MAX(f) AS BIGINT) AS max_frame_no
    FROM per_frame
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators import multimodal as MM
    from ..operators.media_codecs import encode_y4m

    docs = load_table(spark, sf_dir, "documents")

    def synth(batches):
        x = np.arange(16, dtype=np.int64)[None, :]
        y = np.arange(8, dtype=np.int64)[:, None]
        for pdf in batches:
            rows = []
            for did, src in zip(pdf["doc_id"], pdf["source"]):
                did = int(did)
                frames = [
                    ((did * 7 + f * 13 + x + 2 * y) % 251).astype(np.uint8)
                    for f in range(2 + did % 4)
                ]
                payload = encode_y4m(frames)  # C420: real chroma stride
                rows.append((did, "video", payload, (str(src), len(payload))))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload", "meta"]
            )

    media = docs.select("doc_id", "source").mapInPandas(
        synth,
        schema="media_id long, media_type string, payload binary, "
        "meta struct<source:string, byte_len:bigint>",
    )
    fr = MM.sample_video_frames(media, every_n=2)
    src = docs.select(F.col("doc_id").alias("media_id"), "source")
    return (
        fr.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.countDistinct("media_id").cast("long").alias("n_media"),
            F.count(F.lit(1)).cast("long").alias("n_sampled_frames"),
            F.sum("luma_sum").cast("long").alias("luma_total"),
            F.max("frame_no").cast("long").alias("max_frame_no"),
        )
        .orderBy("source")
    )


# --- character-level Shannon entropy -----------------------------------------
# Gibberish / encoding-junk detector: natural prose sits in a narrow
# char-entropy band, base64 blobs and key-mash score high, repeated-char
# spam scores near zero. Shape: explode chars -> (doc, char) count -> per-doc
# rollup. Both aggregations partial-aggregate map-side, and the first
# COMPRESSES below the input (chars collapse to the <=|alphabet| distinct
# per doc before the exchange), so shuffle bytes < raw text bytes at any
# scale. Measured at sf0.1: 1.2s vs 2.5s for a row-local sorted-run
# F.aggregate fold and 5.1s for a distinct x filter HOF scan — Spark's
# higher-order lambdas run interpreted, while this plan stays in
# whole-stage codegen end-to-end. The ln-term staging follows the
# source_token_kl idiom: round each k*ln(k) term to a 1e-9-scaled BIGINT
# so the sum is partition-order-proof and engine-exact. Scale 1e9, not
# 1e12: k*ln(k)*1e12 overflows BIGINT at k ~ 7e5 — ONE character repeated
# through a multi-MB document (the r8 mega-doc corpus hit it; a 4.8MB
# single-char-dominated doc is normal web data). At 1e9 the domain is
# ~4.5e8 chars per doc and the entropy error bound is <= D*5e-10/n,
# invisible at the 6dp output rounding.
# H = ln(n) - (sum k*ln(k))/n in nats.
@query(
    "char_entropy_docs",
    oracle="""
    WITH c AS (
        SELECT doc_id, regexp_extract_all(lower(text), '.') AS ch FROM documents
    ),
    t AS (
        SELECT doc_id, len(ch) AS n,
               list_aggregate(
                   list_transform(
                       list_transform(list_distinct(ch),
                           u -> len(list_filter(ch, x -> x = u))),
                       k -> CAST(FLOOR(k * ln(k) * 1e9 + 0.5) AS BIGINT)),
                   'sum') AS s
        FROM c
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
           CASE WHEN n = 0 THEN NULL
                ELSE ROUND(ln(CAST(n AS DOUBLE))
                           - (CAST(s AS DOUBLE) / 1e9) / n, 6) END
               AS entropy_nats
    FROM t ORDER BY doc_id
    """,
)
def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ch = F.regexp_extract_all(F.lower(F.col("text")), F.lit("."), F.lit(0))
    # Only the CHEAP text-is-null flag rides through the explode — NOT
    # size(ch): any expression referencing ch in the same select lands in
    # the Project ABOVE Generate and re-evaluates the full regex PER
    # EXPLODED ROW (measured 50x slower: 51s vs 1.2s at sf0.1). n is
    # recovered as sum(k); the flag distinguishes NULL text (oracle's
    # len(NULL) is NULL) from empty text (0). The explode_outer keeps
    # those docs as a single c=NULL row whose k=0 run is excluded from
    # the term sum (0*ln(0) is NaN, and ANSI would fail the cast rather
    # than silently absorb it).
    ex = docs.select(
        "doc_id",
        F.col("text").isNull().alias("is_null"),
        F.explode_outer(ch).alias("c"),
    )
    cnt = ex.groupBy("doc_id", "is_null", "c").agg(F.count("c").alias("k"))
    term = F.floor(
        F.col("k").cast("double") * F.log(F.col("k").cast("double")) * 1e9 + F.lit(0.5)).cast("long")
    d = cnt.groupBy("doc_id", "is_null").agg(
        F.sum(F.when(F.col("k") > 0, term)).alias("s"),
        F.sum("k").alias("n"),
    )
    n0 = F.when(F.col("is_null"), F.lit(None).cast("long")).otherwise(
        F.coalesce(F.col("n"), F.lit(0)).cast("long")
    )
    return d.select(
        "doc_id",
        n0.alias("n_chars_counted"),
        F.when(n0.isNull() | (n0 == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.log(n0.cast("double")) - (F.col("s").cast("double") / 1e9) / n0,
                6,
            )
        )
        .alias("entropy_nats"),
    ).orderBy("doc_id")


# --- multimodal perceptual-hash near-dup -------------------------------------
# Image near-duplicate detection end-to-end through the REAL codec path:
# deterministic textured images are synthesized executor-side per doc, the
# odd doc carrying its even neighbor's PIXELS IN A DIFFERENT CONTAINER
# (BMP vs PPM — different magic, header, bottom-up row order, BGR channel
# order: the payloads share no bytes). Both decode through the sniffing
# numpy kernel, get pHash'd (32x32 luma DCT, median-thresholded 8x8
# low-frequency block), and pair by 8-bit LSH bands + bit_count(xor) <= 6
# verification — the SimHash banding idiom, so candidate generation is an
# equi-join, never all-pairs. Eight bands of 8 bits: pigeonhole guarantees
# any pair within Hamming tau <= 7 shares at least one intact band (bands
# must exceed tau), so recall at the documented tau=6 is exact — 4x16 bands
# only guaranteed tau <= 3 and could miss a (2,2,1,1)-spread 6-bit pair. The container-change twin keeps codes EXACTLY
# equal by construction (identical decoded array), which is what an
# idealized pair-set oracle needs: pixel-level noise is only APPROXIMATELY
# hash-invariant — free-form ±1 noise measured up to 10 flipped bits and
# even sum-preserving within-resample-cell pixel swaps flipped 2-4 bits on
# 13 of 2500 sf0.1 pairs (float32 per-pixel luma rounding moves cell sums
# an ulp, and median-tied DCT coefficients sit on the knife edge).
# Measured cross-image margin: Hamming >= 12 over all 2500 sf0.1 bases, so
# tau=6 cannot admit a false pair. The oracle asserts the exact
# (even, even+1) pair set relationally, hash-certifying the WHOLE chain
# (synth -> two encoders -> sniff+decode -> DCT -> band join -> verify).
@query(
    "multimodal_phash_neardup",
    oracle="""
    SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
    FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    WHERE d1.doc_id % 2 = 0
    ORDER BY doc_a
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..catalog import spread_input
    from ..operators import multimodal as MM

    docs = spread_input(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from ..operators.media_codecs import encode_bmp, encode_ppm

        def render(base: int) -> np.ndarray:
            dig = hashlib.md5(str(base).encode()).digest()
            a = np.frombuffer(dig, dtype=np.uint8).astype(np.int64)
            y, x = np.mgrid[0:48, 0:64]
            plane = a[0] + a[1] * x + a[2] * y + ((x * a[3]) // 4) * (
                (y * a[4]) // 4
            )
            return np.stack(
                [(plane + c * a[5]) % 256 for c in range(3)], axis=-1
            ).astype(np.uint8)

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                img = render(did - (did % 2))
                # odd docs carry the SAME pixels in a DIFFERENT container
                # (BMP vs PPM): payloads share no bytes (different magic,
                # header, bottom-up row order, BGR channel order), but the
                # decoded array — hence the phash — is identical by
                # construction, so the expected pair set is exact.
                payload = encode_bmp(img) if did % 2 else encode_ppm(img)
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(synth, schema="media_id long, payload binary")
    ph = MM.perceptual_hash(media).filter("decode_ok").select("media_id", "phash")
    bands = ph.select(
        "media_id",
        "phash",
        F.explode(F.array(*[F.lit(b) for b in range(8)])).alias("band"),
    ).withColumn(
        "key", F.expr("shiftrightunsigned(phash, band * 8) & 255")
    )
    a = bands.select(
        F.col("media_id").alias("doc_a"),
        F.col("phash").alias("ha"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("media_id").alias("doc_b"),
        F.col("phash").alias("hb"),
        "band",
        "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.filter(F.bit_count(F.expr("ha ^ hb")) <= 6)
        .select("doc_a", "doc_b")
        .orderBy("doc_a")
    )


# --- encoding-artifact (mojibake) QA -------------------------------------------
# UTF-8 text decoded as Latin-1 somewhere upstream leaves unmistakable
# two-char fossils ('Ã¡' for a, 'â€™' for a curly quote); every web-corpus
# pipeline scans for them before training because a single double-decoded
# shard poisons tokenizer statistics. The documents table is clean ASCII, so
# the query injects the corruption deterministically (doc_id-keyed, the SAME
# expression both engines — the web.py synthetic-noise pattern) and the
# operator under test is the detector: row-local char arithmetic
# (length-difference occurrence counts over literal replace), one rollup.


@query(
    "mojibake_detect_report",
    oracle="""
    WITH corrupted AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 9 = 0 THEN replace(text, 'a', 'Ã¡')
                    WHEN doc_id % 9 = 3 THEN replace(text, 'e', 'â€™')
                    ELSE text END AS t
        FROM documents
    ),
    scored AS (
        SELECT source,
               length(t) - length(replace(t, 'Ã', '')) AS n_latin1,
               (length(t) - length(replace(t, 'â€', ''))) / 2 AS n_win1252
        FROM corrupted
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_latin1 + n_win1252 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(SUM(n_latin1) AS BIGINT) AS n_latin1_artifacts,
           CAST(SUM(n_win1252) AS BIGINT) AS n_win1252_artifacts
    FROM scored GROUP BY source ORDER BY source
    """,
)
def mojibake_detect_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mojibake scan: count double-decoding fossils per document.

    Detection is pure row-local character arithmetic — occurrence counts as
    length minus length-after-literal-replace (both engines count UTF-8
    CHARACTERS, pinned), no regex engine in the loop — then one per-source
    rollup. At 100 TB this is a single pruned scan of (source, text) with a
    map-side-partial aggregation; the flagged-shard rate is the
    quarantine-or-retranscode decision input.
    """
    d = load_table(spark, sf_dir, "documents")
    t = (
        F.when(F.col("doc_id") % 9 == 0, F.replace(F.col("text"), F.lit("a"), F.lit("Ã¡")))
        .when(F.col("doc_id") % 9 == 3, F.replace(F.col("text"), F.lit("e"), F.lit("â€™")))
        .otherwise(F.col("text"))
    )
    scored = d.select(
        "source",
        (F.length(t) - F.length(F.replace(t, F.lit("Ã")))).alias("n_latin1"),
        (
            (F.length(t) - F.length(F.replace(t, F.lit("â€")))) / 2
        ).alias("n_win1252"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("n_latin1") + F.col("n_win1252") > 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_flagged"),
            F.sum("n_latin1").cast("long").alias("n_latin1_artifacts"),
            F.sum("n_win1252").cast("long").alias("n_win1252_artifacts"),
        )
        .orderBy("source")
    )
