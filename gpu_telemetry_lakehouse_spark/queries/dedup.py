"""Deduplication queries: exact, MinHash(+LSH), SimHash, shingle-Jaccard.

Every stage is md5-derived so even the sketch pipelines have DuckDB oracle
twins (generated SQL mirrors the Spark expressions term by term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_input
from ..functions import md5_int, tokens
from ..operators import dedup as DD
from ..operators import text as TXO
from .registry import query

K = 8          # minhash permutations
BANDS = 4      # LSH bands (2 rows each)
SIMHASH_BITS = 32

# ---- shared DuckDB fragments ------------------------------------------------
TK = r"regexp_split_to_array(trim(text), '\s+')"
SHINGLES = (
    "CASE WHEN len(tk) >= 3 THEN "
    "list_transform(generate_series(1, len(tk) - 2), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) "
    "ELSE [] END"
)


def _md5int(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


# minhash: one md5 per shingle -> base x, then k universal-hash permutations
# (a_i*x + b_i) mod P aggregated as MIN per doc (mirrors operators/dedup.py).
_P = DD.MINHASH_P
_SIG_COLS = ",\n           ".join(
    f"MIN(({a} * x + {b}) % {_P}) AS h{i}"
    for i, (a, b) in enumerate(DD.perm_consts(K))
)

_SIGS_CTE = f"""
    WITH toks AS (SELECT doc_id, {TK} AS tk FROM documents),
    sh AS (SELECT doc_id, {SHINGLES} AS s FROM toks),
    ex AS (
        SELECT doc_id,
               unnest(CASE WHEN len(s) > 0 THEN s ELSE [NULL] END) AS sg
        FROM sh
    ),
    base AS (SELECT doc_id, {_md5int('sg')} % {_P} AS x FROM ex),
    sigs AS (
        SELECT doc_id,
           {_SIG_COLS}
        FROM base GROUP BY doc_id
    )
"""

# LSH bands: band b's key is the raw component pair (h_{2b}, h_{2b+1})
_BANDS_SQL = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {', '.join(f'h{j}' for j in range(K))}, "
    f"{b} AS band, h{2 * b} AS k0, h{2 * b + 1} AS k1 FROM sigs"
    for b in range(BANDS)
)

_AGREE_SQL = " + ".join(
    f"(CASE WHEN h{i} = bh{i} THEN 1 ELSE 0 END)" for i in range(K)
)

# simhash: per-bit ±1 sums over distinct-token md5 hashes
_CONTRIB_COLS = ",\n               ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS c{i}"
    for i in range(SIMHASH_BITS)
)
_PACK_SQL = " + ".join(
    f"(CASE WHEN c{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
    for i in range(SIMHASH_BITS)
)


# --- exact dedup summary -----------------------------------------------------
# SURVEY.md §2.2 (dedup); hash-groupBy at scale: group on md5, not raw text.
@query(
    "dedup_exact_summary",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_unique_texts,
           COUNT(DISTINCT md5(text)) AS n_unique_hashes
    FROM documents
    """,
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        F.countDistinct(F.md5("text")).alias("n_unique_hashes"),
    )


# --- minhash signatures (row-local, no shuffle) ------------------------------
@query(
    "dedup_minhash_sigs",
    oracle=_SIGS_CTE + "\n    SELECT doc_id, "
    + ", ".join(f"h{i}" for i in range(K))
    + " FROM sigs",
)
def dedup_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    return DD.minhash_signatures(docs, k=K)


# --- minhash LSH candidate pairs + estimated jaccard -------------------------
@query(
    "dedup_minhash_pairs",
    oracle=_SIGS_CTE
    + f""",
    bands AS (
{_BANDS_SQL}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               {', '.join(f'a.h{i}' for i in range(K))},
               {', '.join(f'b.h{i} AS bh{i}' for i in range(K))}
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
                    AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(({_AGREE_SQL}) / {float(K)}, 6) AS est_jaccard
    FROM cand
    """,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    sigs = DD.minhash_signatures(docs, k=K)
    return DD.minhash_lsh_pairs(sigs, k=K, bands=BANDS)


# --- exact shingle-jaccard near-dup pairs ------------------------------------
@query(
    "dedup_shingle_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TK} AS tk FROM documents),
    sh0 AS (SELECT doc_id, {SHINGLES} AS s FROM toks),
    d AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(s, x -> {_md5int('x')})) AS s
          FROM sh0),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter,
           ROUND(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.1
    """,
)
def dedup_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    return DD.shingle_jaccard_pairs(docs, threshold=0.1)


# --- df-capped shingle-jaccard (web-scale stop-list path) --------------------
# Same inverted-index pipeline with posting lists longer than MAX_DF dropped:
# the quadratic pair fan-out of boilerplate shingles is bounded at MAX_DF²/2
# per shingle, the price being that Jaccard becomes a lower bound (union
# sizes stay exact). The oracle applies the identical cap, so the check
# stays an exact differential, not an approximation tolerance.
MAX_DF = 10


@query(
    "dedup_shingle_jaccard_capped",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TK} AS tk FROM documents),
    sh0 AS (SELECT doc_id, {SHINGLES} AS s FROM toks),
    d AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(s, x -> {_md5int('x')})) AS s
          FROM sh0),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
    keep AS (SELECT s FROM d GROUP BY s HAVING COUNT(*) BETWEEN 2 AND {MAX_DF}),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM d a
        JOIN keep k ON k.s = a.s
        JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter,
           ROUND(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.05
    """,
)
def dedup_shingle_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    return DD.shingle_jaccard_pairs(docs, threshold=0.05, max_df=MAX_DF)


# --- simhash signatures ------------------------------------------------------
@query(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TK} AS tk FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(tk) AS t FROM toks),
    h AS (SELECT doc_id, {_md5int('t')} AS h FROM tok),
    c AS (
        SELECT doc_id,
               {_CONTRIB_COLS}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({_PACK_SQL} AS BIGINT) AS simhash FROM c
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    return DD.simhash(docs, bits=SIMHASH_BITS)


# --- duplicate clusters: transitive closure of near-dup pairs ----------------
# Pair lists are half the dedup story: pipelines drop all-but-one per CLUSTER
# (transitive closure of pairs). Spark side: distributed min-label propagation
# (operators/dedup.py::connected_components); oracle: recursive-CTE reachable
# set with MIN label — same fixpoint, so the check stays exact.
@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {TK} AS tk FROM documents),
    sh0 AS (SELECT doc_id, {SHINGLES} AS s FROM toks),
    d AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(s, x -> {_md5int('x')})) AS s
          FROM sh0),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.1
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node)
    SELECT doc.doc_id,
           COALESCE(cc.lbl, doc.doc_id) AS component,
           CAST(cc.node IS NOT NULL AND cc.lbl <> doc.doc_id AS INT) AS is_drop
    FROM documents doc LEFT JOIN cc ON cc.node = doc.doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    pairs = DD.shingle_jaccard_pairs(docs, threshold=0.1)
    cc = DD.connected_components(pairs)
    return docs.select("doc_id").join(
        cc, docs.doc_id == cc.node, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("lbl"), F.col("doc_id")).alias("component"),
        (F.col("node").isNotNull() & (F.col("lbl") != F.col("doc_id")))
        .cast("int")
        .alias("is_drop"),
    )


# --- cross-source n-gram contamination ---------------------------------------
# Benchmark-contamination / corpus-leak detection: for every pair of sources,
# how many distinct 3-gram shingles they share, with the overlap coefficient
# |A∩B| / min(|A|,|B|). Scale shape: the per-source distinct shingle set is
# ONE aggregation of (shingle-hash, source) — 8-byte keys, never text — and
# the pair expansion happens on posting lists over sources (bounded by
# #sources per shingle, not documents). The per-source set sizes broadcast
# back for the coefficient.
@query(
    "cross_source_contamination",
    oracle=f"""
    WITH toks AS (SELECT source, {TK} AS tk FROM documents),
    sh0 AS (SELECT source, {SHINGLES} AS s FROM toks),
    d AS (SELECT DISTINCT source,
                 unnest(list_transform(s, x -> {_md5int('x')})) AS s
          FROM sh0),
    sizes AS (SELECT source, COUNT(*) AS n FROM d GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM d a JOIN d b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_shared,
           ROUND(n_shared / LEAST(sa.n, sb.n), 6) AS overlap_coef
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    WHERE n_shared >= 5
    """,
)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = spread_input(load_table(spark, sf_dir, "documents"))
    arr = F.array_distinct(
        F.transform(TXO.shingles(tokens(F.col("text")), 3), md5_int)
    )
    d = (
        docs.select("source", arr.alias("__arr"))
        .select("source", F.explode("__arr").alias("s"))
        .distinct()
    )
    # Per-source set size rides along via a window instead of a separate
    # aggregate + join-back: the expensive shingle/explode/distinct subtree
    # is computed once, and the self-join's two sides share one shuffle
    # (ReusedExchange) because they are the identical subplan. Audited at 5
    # exchanges vs 11 for the agg+broadcast-join formulation.
    d2 = d.withColumn("n", F.count(F.lit(1)).over(W.partitionBy("source")))
    a, b = d2.alias("a"), d2.alias("b")
    return (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.first(F.col("a.n")).alias("na"),
            F.first(F.col("b.n")).alias("nb"),
        )
        .filter(F.col("n_shared") >= 5)
        .select(
            "src_a", "src_b", "n_shared",
            F.round(F.col("n_shared") / F.least("na", "nb"), 6).alias("overlap_coef"),
        )
    )


# --- the FULL cleaning pipeline under one oracle ----------------------------
# clean_corpus (operators/dedup.py) chains exact -> LSH candidates ->
# exact-Jaccard verify -> transitive-closure cluster -> canonical keep and
# returns a stage-count report. Every stage is md5-derived, so the WHOLE
# composite — including the banding collision set and the recursive
# closure — replays in DuckDB SQL assembled from the per-stage oracle
# fragments above: the end-to-end pipeline gets a hash-exact differential,
# not just its parts.
_CLEAN_THRESH = 0.5
_SIGS_OVER_ED = _SIGS_CTE.strip()[len("WITH ") :].replace("FROM documents", "FROM ed")


@query(
    "dedup_clean_corpus_report",
    oracle=f"""
    WITH RECURSIVE
    keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    ed AS (
        SELECT d.doc_id, d.text FROM documents d JOIN keep k USING (doc_id)
    ),
    {_SIGS_OVER_ED},
    bands AS (
{_BANDS_SQL}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
                    AND a.doc_id < b.doc_id
    ),
    shl AS (
        SELECT doc_id,
               list_distinct(list_transform(s, x -> {_md5int('x')})) AS sl
        FROM sh
    ),
    ver AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN shl sa ON sa.doc_id = c.id_a
        JOIN shl sb ON sb.doc_id = c.id_b
        WHERE len(list_intersect(sa.sl, sb.sl))
              / (len(sa.sl) + len(sb.sl) - len(list_intersect(sa.sl, sb.sl)))
              >= {_CLEAN_THRESH}
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM ver
        UNION ALL
        SELECT id_b, id_a FROM ver
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node),
    drops AS (SELECT COUNT(*) AS nd FROM cc WHERE node <> lbl)
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs_in,
           CAST((SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM ed) AS BIGINT) AS n_exact_dups,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_lsh_candidates,
           CAST((SELECT COUNT(*) FROM ver) AS BIGINT) AS n_verified_pairs,
           CAST((SELECT nd FROM drops) AS BIGINT) AS n_neardup_dropped,
           CAST((SELECT COUNT(*) FROM ed)
                - (SELECT nd FROM drops) AS BIGINT) AS n_docs_out
    """,
)
def dedup_clean_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    _, report = DD.clean_corpus(
        docs, k=K, bands=BANDS, jaccard_threshold=_CLEAN_THRESH
    )
    return report


# --- repeated-segment boilerplate removal (CCNet/RefinedWeb line-dedup) ------
# Corpus-level repeated-chunk stripping: the "this document was crawled by"
# boilerplate that exact- and near-dup passes both miss because it is a
# FRAGMENT shared across otherwise-distinct pages. Fixed 4-token windows
# stand in for lines (the driver corpus has no newlines); a segment in >
# MAX_SEG_DF documents is boilerplate and its tokens are dropped from the
# doc's retention count. Three narrow exchanges at any scale (df index on
# 8-byte hashes, flag-back join, per-doc rollup) — see operators/dedup.py.
SEG_LEN = 4
MAX_SEG_DF = 2


@query(
    "dedup_boilerplate_segments",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TK} AS tk FROM documents),
    s AS (
        SELECT doc_id, g.h AS h, g.c AS c FROM t,
        LATERAL unnest(list_transform(
            generate_series(0, CAST(ceil(len(tk) / {SEG_LEN}.0) AS BIGINT) - 1),
            i -> struct_pack(
                h := {_md5int(f"array_to_string(list_slice(tk, i*{SEG_LEN}+1, i*{SEG_LEN}+{SEG_LEN}), ' ')")},
                c := len(list_slice(tk, i*{SEG_LEN}+1, i*{SEG_LEN}+{SEG_LEN}))
            ))) u(g)
    ),
    boiler AS (
        SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df FROM s GROUP BY h)
        WHERE df > {MAX_SEG_DF}
    )
    SELECT s.doc_id,
           COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(s.c) AS BIGINT) AS toks_total,
           CAST(SUM(CASE WHEN b.h IS NULL THEN s.c ELSE 0 END) AS BIGINT) AS toks_kept,
           ROUND(CAST(SUM(CASE WHEN b.h IS NULL THEN s.c ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(s.c) AS DOUBLE), 6) AS keep_ratio
    FROM s LEFT JOIN boiler b USING (h)
    GROUP BY s.doc_id
    """,
)
def dedup_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    out = DD.segment_boilerplate_stats(
        docs.select("doc_id", "text"), seg_len=SEG_LEN, max_df=MAX_SEG_DF
    )
    return out.select(
        "doc_id",
        "n_segs",
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.col("toks_total").cast("long").alias("toks_total"),
        F.col("toks_kept").cast("long").alias("toks_kept"),
        F.round(F.col("toks_kept").cast("double") / F.col("toks_total").cast("double"), 6).alias("keep_ratio"),
    )


# --- benchmark decontamination (train-vs-eval n-gram collision scrub) --------
# The eval-set side collapses to one distinct set of 5-gram hashes (bounded
# by the benchmark corpus, tiny next to the training side), so the membership
# probe is a broadcastable long-key join; training docs sharing >= DECON_HITS
# distinct grams with ANY benchmark doc get flagged. The benchmark cohort is
# the deterministic md5 gate over doc_id (same hash-gate idiom as
# queries/sampling.py, so membership is stable across engines and reruns).
DECON_N = 5
DECON_HITS = 3
_BENCH_GATE = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'"
SHINGLES5 = (
    f"CASE WHEN len(tk) >= {DECON_N} THEN "
    f"list_transform(generate_series(1, len(tk) - {DECON_N - 1}), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]) "
    "ELSE [] END"
)


@query(
    "benchmark_decontam",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TK} AS tk FROM documents),
    g AS (
        SELECT doc_id, unnest(list_distinct(list_transform({SHINGLES5}, s -> {_md5int('s')}))) AS g
        FROM t
    ),
    bg AS (SELECT DISTINCT g FROM g WHERE {_BENCH_GATE}),
    tr AS (SELECT doc_id, g.g AS g FROM g WHERE NOT ({_BENCH_GATE}))
    SELECT tr.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(CASE WHEN SUM(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) >= {DECON_HITS}
                THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM tr LEFT JOIN bg USING (g)
    GROUP BY tr.doc_id
    """,
)
def benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    bench = docs.filter(gate)
    train = docs.filter(~gate)
    out = DD.ngram_decontam(train, bench, n=DECON_N, min_hits=DECON_HITS)
    return out.select(
        "doc_id",
        "n_grams",
        F.col("n_hits").cast("long").alias("n_hits"),
        "contaminated",
    )


# --- end-to-end corpus preparation under ONE oracle --------------------------
# The training-data prep flow a corpus owner actually runs, chaining the new
# operators in realistic order: strip boilerplate-heavy docs -> hold out the
# eval cohort -> decontaminate train against it -> quality-filter -> quota
# sample. Each stage's survivor count AND membership (sum of surviving ids)
# replays in one DuckDB WITH-chain assembled from the per-stage fragments,
# so the hard signal covers the COMPOSITE, not just the parts. At 100 TB
# each stage materializes through the table format (checkpoint-per-stage);
# here the declarative chain re-derives upstream stages per report branch —
# bounded at 6 branches, and the whole report is one job.
_PREP_KR = 0.85   # min per-doc token retention after boilerplate strip
_PREP_Q = 0.5     # min composite quality score
_PREP_QUOTA = 5   # per-(lang, source) cap
_STOPS5 = "['" + "','".join(TXO.STOPWORDS) + "']"
_G5 = f"unnest(list_distinct(list_transform({{sh}}, s -> {_md5int('s')}))) AS g"


@query(
    "corpus_prep_report",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, lang, source FROM documents),
    t AS (SELECT doc_id, {TK} AS tk FROM base),
    seg AS (
        SELECT doc_id, g.h AS h, g.c AS c FROM t,
        LATERAL unnest(list_transform(
            generate_series(0, CAST(ceil(len(tk) / {SEG_LEN}.0) AS BIGINT) - 1),
            i -> struct_pack(
                h := {_md5int(f"array_to_string(list_slice(tk, i*{SEG_LEN}+1, i*{SEG_LEN}+{SEG_LEN}), ' ')")},
                c := len(list_slice(tk, i*{SEG_LEN}+1, i*{SEG_LEN}+{SEG_LEN}))
            ))) u(g)
    ),
    boiler AS (
        SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY h)
        WHERE df > {MAX_SEG_DF}
    ),
    kr AS (
        SELECT seg.doc_id,
               ROUND(CAST(SUM(CASE WHEN b.h IS NULL THEN seg.c ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(seg.c) AS DOUBLE), 6) AS keep_ratio
        FROM seg LEFT JOIN boiler b USING (h) GROUP BY seg.doc_id
    ),
    s1 AS (SELECT base.* FROM base JOIN kr USING (doc_id) WHERE keep_ratio >= {_PREP_KR}),
    s2 AS (SELECT * FROM s1 WHERE NOT ({_BENCH_GATE})),
    benchd AS (SELECT * FROM s1 WHERE {_BENCH_GATE}),
    g2 AS (
        SELECT doc_id, {_G5.format(sh=SHINGLES5)}
        FROM (SELECT doc_id, {TK} AS tk FROM s2)
    ),
    bg AS (
        SELECT DISTINCT g FROM (
            SELECT {_G5.format(sh=SHINGLES5)}
            FROM (SELECT doc_id, {TK} AS tk FROM benchd)
        )
    ),
    hits AS (
        SELECT g2.doc_id,
               SUM(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
        FROM g2 LEFT JOIN bg USING (g) GROUP BY g2.doc_id
    ),
    s3 AS (
        SELECT s2.* FROM s2 LEFT JOIN hits USING (doc_id)
        WHERE COALESCE(n_hits, 0) < {DECON_HITS}
    ),
    m AS (
        SELECT doc_id, CAST(len(tk) AS DOUBLE) AS n,
               CAST(len(list_distinct(tk)) AS DOUBLE) AS uniq,
               CAST(len(list_filter(tk, x -> list_contains({_STOPS5}, x))) AS DOUBLE) AS stop
        FROM (SELECT doc_id, {TK} AS tk FROM s3)
    ),
    qs AS (
        SELECT doc_id,
               ROUND(0.4 * least(1.0, n / 100.0) + 0.4 * (uniq / n)
                   + 0.2 * (CASE WHEN stop / n >= 0.02 AND stop / n <= 0.3
                            THEN 1.0 ELSE 0.0 END), 6) AS q
        FROM m
    ),
    s4 AS (SELECT s3.* FROM s3 JOIN qs USING (doc_id) WHERE q >= {_PREP_Q}),
    r AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM s4
    ),
    s5 AS (SELECT doc_id FROM r WHERE rk <= {_PREP_QUOTA})
    SELECT 0 AS stage_idx, 'input' AS stage, COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS sum_ids FROM base
    UNION ALL SELECT 1, 'boilerplate', COUNT(*), CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s1
    UNION ALL SELECT 2, 'holdout_removed', COUNT(*), CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s2
    UNION ALL SELECT 3, 'decontaminated', COUNT(*), CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s3
    UNION ALL SELECT 4, 'quality', COUNT(*), CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s4
    UNION ALL SELECT 5, 'quota_sampled', COUNT(*), CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s5
    """,
)
def corpus_prep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = spread_input(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "lang", "source"
    )
    # Stage frames are localCheckpoint-pinned (lazy), mirroring the
    # clean_corpus operator's checkpoint-per-stage discipline and the
    # docstring's 100 TB contract (each stage materializes through the table
    # format): the six report branches previously re-derived their FULL
    # upstream chain per branch — the input was re-scanned and re-shingled
    # ~15x across branches (the audited 80-exchange plan). Checkpointing
    # computes each stage once; the report aggregates read materialized
    # rows. Same values, measured 5.9s -> 4.2s at sf0.1 (interleaved A/B).
    # stage 1: drop boilerplate-heavy docs (df-indexed over the FULL input)
    kr = DD.segment_boilerplate_stats(docs, seg_len=SEG_LEN, max_df=MAX_SEG_DF)
    s1 = docs.join(kr.select("doc_id", "keep_ratio"), "doc_id").filter(
        F.col("keep_ratio") >= _PREP_KR
    ).drop("keep_ratio").localCheckpoint(eager=False)
    # stage 2: hold out the eval cohort (deterministic md5 gate)
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    benchd, s2 = s1.filter(gate), s1.filter(~gate)
    # stage 3: decontaminate train against the held-out cohort
    dec = DD.ngram_decontam(s2, benchd, n=DECON_N, min_hits=DECON_HITS)
    s3 = s2.join(dec.select("doc_id", "contaminated"), "doc_id", "left").filter(
        F.coalesce(F.col("contaminated"), F.lit(0)) == 0
    ).drop("contaminated").localCheckpoint(eager=False)
    # stage 4: composite quality filter
    s4 = TXO.with_quality_score(s3).filter(
        F.col("quality_score") >= _PREP_Q
    ).drop("quality_score").localCheckpoint(eager=False)
    # stage 5: quota sample per (lang, source)
    w = W.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    s5 = s4.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _PREP_QUOTA
    )

    def stage(df: DataFrame, idx: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("sum_ids"),
        ).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"),
            "n_docs", "sum_ids",
        )

    stages = [
        stage(docs, 0, "input"),
        stage(s1, 1, "boilerplate"),
        stage(s2, 2, "holdout_removed"),
        stage(s3, 3, "decontaminated"),
        stage(s4, 4, "quality"),
        stage(s5, 5, "quota_sampled"),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


# --- surgical (span-level) decontamination -----------------------------------
# benchmark_decontam DROPS whole contaminated docs; real pipelines often
# STRIP just the overlapping spans and keep the rest. Per train doc: every
# 5-gram position whose hash is in the benchmark set covers tokens
# [s, s+4]; the union length of those intervals (classic merge via the
# running-max-end window) is the strippable token count. One window pass
# over flagged positions only — the coverage math never touches clean text.
@query(
    "decontam_span_report",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {TK} AS tk FROM documents WHERE NOT ({_BENCH_GATE})
    ),
    d AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM t),
    g AS (
        SELECT doc_id, u.s AS s, u.g AS g FROM d,
        LATERAL unnest(
            CASE WHEN len(tk) >= {DECON_N} THEN
                list_transform(generate_series(1, len(tk) - {DECON_N - 1}),
                    i -> struct_pack(
                        g := {_md5int(f"array_to_string(list_slice(tk, i, i + {DECON_N - 1}), ' ')")},
                        s := i))
            ELSE [] END) u2(u)
    ),
    bt AS (SELECT doc_id, {TK} AS tk FROM documents WHERE {_BENCH_GATE}),
    bg AS (
        SELECT DISTINCT unnest(list_distinct(list_transform({SHINGLES5}, s -> {_md5int('s')}))) AS g
        FROM bt
    ),
    flagged AS (
        SELECT g.doc_id, g.s AS s, g.s + {DECON_N - 1} AS e
        FROM g JOIN bg ON bg.g = g.g
    ),
    cov AS (
        SELECT doc_id, s, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
        FROM flagged
    ),
    per AS (
        SELECT doc_id, COUNT(*) AS n_flagged,
               SUM(GREATEST(0, e - GREATEST(COALESCE(mx, 0), s - 1))) AS covered
        FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(per.n_flagged, 0) AS BIGINT) AS n_flagged,
           CAST(COALESCE(per.covered, 0) AS BIGINT) AS covered_tokens,
           ROUND(CAST(COALESCE(per.covered, 0) AS DOUBLE)
                 / CAST(d.n_tokens AS DOUBLE), 6) AS strip_ratio
    FROM d LEFT JOIN per USING (doc_id)
    """,
)
def decontam_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = spread_input(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    bench, train = docs.filter(gate), docs.filter(~gate)

    # Positional grams via shingles + posexplode, NOT slice-in-a-lambda:
    # F.slice inside transform() re-materializes the backing array per
    # element (O(tokens) per call -> O(tokens^2) per document), which the
    # r8 mega-doc corpus exposed as a 25+ minute single-task stall on ONE
    # 800k-token document. shingles() builds the gram array in O(n·N) via
    # zip_with over N shifted slices, and posexplode carries the 1-based
    # start position for free. The token array is also bound to a column
    # first so the 4MB regex-split runs once per row.
    tk = F.col("tk")
    train_tk = train.select("doc_id", tokens(F.col("text")).alias("tk"))
    d = train_tk.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        TXO.shingles(tk, DECON_N).alias("sh"),
    )
    g = d.select(
        "doc_id", F.posexplode("sh").alias("p", "gram")
    ).select("doc_id", md5_int(F.col("gram")).alias("g"), (F.col("p") + 1).alias("s"))
    barr = F.array_distinct(F.transform(TXO.shingles(tk, DECON_N), md5_int))
    bg = (
        bench.select(tokens(F.col("text")).alias("tk"))
        .select(F.explode(barr).alias("g")).distinct()
        .withColumn("hit", F.lit(True))
    )
    flagged = (
        g.join(bg, "g")
        .select("doc_id", "s", (F.col("s") + (DECON_N - 1)).alias("e"))
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    per = (
        flagged.withColumn("mx", F.max("e").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_flagged"),
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.col("e")
                    - F.greatest(F.coalesce(F.col("mx"), F.lit(0)), F.col("s") - 1),
                )
            ).alias("covered"),
        )
    )
    return (
        d.select("doc_id", "n_tokens")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
            F.coalesce("covered", F.lit(0)).cast("long").alias("covered_tokens"),
            F.round(
                F.coalesce("covered", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("strip_ratio"),
        )
    )


# --- exact-substring duplicate spans (ExactSubstr, Lee et al. 2022 shape) ----
# Corpus-internal verbatim duplication at CHARACTER granularity: every
# position whose L-char gram occurs >= 2 times anywhere in the corpus lies
# inside a duplicated substring of length >= L, and conversely — so the
# interval union of duplicated gram positions is exactly the char mass a
# suffix-array ExactSubstr pass would flag. Distributed form: docs explode
# to (8-byte gram-hash, pos) postings — the text itself never crosses a
# shuffle — one group-by finds repeated hashes, one join-back flags
# positions, one windowed coverage pass unions the intervals.
SUBSTR_L = 40


@query(
    "exact_substring_dup_spans",
    oracle=f"""
    WITH grams AS (
        SELECT d.doc_id, CAST(u.i AS INT) AS pos,
               {_md5int(f"substr(d.text, CAST(u.i AS INT), {SUBSTR_L})")} AS gh
        FROM documents d
        CROSS JOIN UNNEST(range(1, length(d.text) - {SUBSTR_L} + 2)) AS u(i)
        WHERE length(d.text) >= {SUBSTR_L}
    ),
    dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) > 1),
    hits AS (
        SELECT g.doc_id, g.pos, g.pos + {SUBSTR_L} AS e
        FROM grams g JOIN dup USING (gh)
    ),
    cov AS (
        SELECT doc_id, pos, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
        FROM hits
    ),
    per AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN mx IS NULL OR pos > mx THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_spans,
               CAST(SUM(GREATEST(0, e - GREATEST(COALESCE(mx, 0), pos)))
                    AS BIGINT) AS dup_chars
        FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
           COALESCE(per.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(per.dup_chars, 0) AS dup_chars,
           ROUND(CAST(COALESCE(per.dup_chars, 0) AS DOUBLE)
                 / CAST(NULLIF(d.n_chars, 0) AS DOUBLE), 6) AS dup_frac
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def exact_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc verbatim-duplication report: count and char mass of maximal
    duplicated spans (gram length SUBSTR_L, stride 1), the diagnostic that
    drives span-level (not whole-doc) dedup of a pretraining corpus.

    Scale: postings are (hash, pos) pairs — 12 bytes/char position, no text
    after the projection; the repeated-hash set is df-bounded like the
    shingle posting lists (dedup_shingle_jaccard docstring); coverage is one
    window pass over FLAGGED positions only. Same shape at 100 TB with the
    gram stride widened (stride s multiplies both cost and resolution by
    1/s; stride 1 here because the oracle must be exact)."""
    from pyspark.sql import Window as W

    docs = spread_input(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    # Two size-gated gram builders, identical output:
    # - small docs: F.substr(text, i, L) — ONE interpreted expression per
    #   position; its O(i) codepoint walk (UTF8String.substring) is cheap
    #   while i stays small;
    # - large docs: a chars array split ONCE per row + SUBSTR_L O(1)
    #   element accesses per position — linear in document length, where
    #   the substr walk is O(len^2) (the r8 mega-doc corpus exposed one
    #   4.8M-char document as an hours-scale single task; the array path
    #   finishes it in 25s).
    # The row-level gate keeps the common web-document case on the cheaper
    # single-expression path (the array form measured +25% on 300-char
    # docs at sf0.1) while bounding the worst case.
    ch = F.col("__ch")
    gram_small = lambda i: md5_int(F.substr(F.col("text"), i, F.lit(SUBSTR_L)))  # noqa: E731
    gram_large = lambda i: md5_int(  # noqa: E731
        F.concat(*[F.try_element_at(ch, (i + j).cast("int")) for j in range(SUBSTR_L)])
    )

    def _pos_grams(gram, n):
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(gram(i).alias("gh"), i.cast("int").alias("pos")),
        )

    small = F.length("text") <= 4096
    n_small = F.length("text") - (SUBSTR_L - 1)
    n_large = F.size(ch) - (SUBSTR_L - 1)
    pos_grams = (
        F.when(small & (n_small >= 1), _pos_grams(gram_small, n_small))
        .when(~small & (n_large >= 1), _pos_grams(gram_large, n_large))
        .otherwise(F.array())
    )
    grams = (
        docs.select(
            "doc_id",
            "text",
            F.when(~small, F.split(F.col("text"), "")).otherwise(
                F.array().cast("array<string>")
            ).alias("__ch"),
        )
        .select("doc_id", F.explode(pos_grams).alias("u"))
        .select("doc_id", F.col("u.gh").alias("gh"), F.col("u.pos").alias("pos"))
    )
    # Repeated-gram flagging as ONE window count over gh instead of the
    # groupBy(gh)+join-back pair: the join form consumed `grams` twice with
    # different projections, so the md5-per-position explode (the dominant
    # cost) ran twice and its exchange was not reused (r9 event-log profile:
    # two ~equal gram-build stages). The window form builds grams once and
    # shuffles it once; the sort it adds is over 12-byte (gh,pos) rows and
    # spills gracefully — the right 100 TB shape. Measured 3.42s -> 1.88s at
    # sf0.1, bit-identical output.
    wg = W.partitionBy("gh")
    hits = (
        grams.withColumn("cnt", F.count(F.lit(1)).over(wg))
        .filter(F.col("cnt") > 1)
        .select("doc_id", "pos", (F.col("pos") + SUBSTR_L).alias("e"))
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    per = (
        hits.withColumn("mx", F.max("e").over(w))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("mx").isNull() | (F.col("pos") > F.col("mx")), 1)
                .otherwise(0)
            ).cast("long").alias("n_dup_spans"),
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.col("e") - F.greatest(F.coalesce("mx", F.lit(0)), F.col("pos")),
                )
            ).cast("long").alias("dup_chars"),
        )
    )
    return (
        docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            # NULLIF guard: an empty doc would divide by zero — ANSI Spark
            # raises while DuckDB yields NaN; NULL on both engines instead
            F.round(
                F.coalesce("dup_chars", F.lit(0)).cast("double")
                / F.nullif(F.col("n_chars"), F.lit(0)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


# --- MinHash-LSH quality evaluation (precision/recall vs exact Jaccard) ------
# The dedup pipeline's eval harness: at each threshold t, how well do the
# LSH candidates (est_jaccard from K=8 signature agreement) recover the
# TRUE near-dup pairs (exact shingle-Jaccard >= t)? Both sides reuse this
# module's existing machinery — truth via posting-list intersection (never
# all-pairs), predictions via banded LSH — full-outer joined on the pair
# key, then one tiny threshold-grid aggregation. A pred pair absent from
# the truth base has true J < 0.1 < t, so COALESCE(truth, 0) classifies it
# FP correctly. Counts are exact BIGINTs; precision/recall divide them once
# in double. This is the number that justifies the K/bands choice before a
# 100 TB run — recall too low => more bands, precision too low => verify
# stage required.
@query(
    "dedup_minhash_pr_eval",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TK} AS tk FROM documents),
    sh AS (SELECT doc_id, {SHINGLES} AS s FROM toks),
    d AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(s, x -> {_md5int('x')})) AS s
          FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b,
               ROUND(n_inter / (sa.n + sb.n - n_inter), 6) AS tj
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE ROUND(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.1
    ),
    ex AS (
        SELECT doc_id,
               unnest(CASE WHEN len(s) > 0 THEN s ELSE [NULL] END) AS sg
        FROM sh
    ),
    base AS (SELECT doc_id, {_md5int('sg')} % {_P} AS x FROM ex),
    sigs AS (
        SELECT doc_id,
           {_SIG_COLS}
        FROM base GROUP BY doc_id
    ),
    bands AS (
{_BANDS_SQL}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               {', '.join(f'a.h{i}' for i in range(K))},
               {', '.join(f'b.h{i} AS bh{i}' for i in range(K))}
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
                    AND a.doc_id < b.doc_id
    ),
    pred AS (
        SELECT id_a, id_b,
               ROUND(({_AGREE_SQL}) / {float(K)}, 6) AS ej
        FROM cand
    ),
    pairs AS (
        SELECT COALESCE(t.tj, 0.0) AS tj, COALESCE(p.ej, 0.0) AS ej
        FROM truth t FULL OUTER JOIN pred p
          ON t.id_a = p.id_a AND t.id_b = p.id_b
    ),
    grid AS (SELECT unnest([0.2e0, 0.4e0, 0.6e0]) AS t)
    SELECT g.t AS threshold,
           CAST(SUM(CASE WHEN tj >= g.t THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
           CAST(SUM(CASE WHEN ej >= g.t THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
           CAST(SUM(CASE WHEN tj >= g.t AND ej >= g.t THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN ej >= g.t AND tj < g.t THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN tj >= g.t AND ej < g.t THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           ROUND(CAST(SUM(CASE WHEN tj >= g.t AND ej >= g.t THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN ej >= g.t THEN 1 ELSE 0 END), 0), 6)
               AS precision,
           ROUND(CAST(SUM(CASE WHEN tj >= g.t AND ej >= g.t THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN tj >= g.t THEN 1 ELSE 0 END), 0), 6)
               AS recall
    FROM pairs CROSS JOIN grid g
    GROUP BY g.t ORDER BY g.t
    """,
)
def dedup_minhash_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    truth = DD.shingle_jaccard_pairs(docs, threshold=0.1).select(
        "id_a", "id_b", F.col("jaccard").alias("tj")
    )
    sigs = DD.minhash_signatures(docs, k=K)
    pred = DD.minhash_lsh_pairs(sigs, k=K, bands=BANDS).select(
        F.col("id_a").alias("p_a"), F.col("id_b").alias("p_b"),
        F.col("est_jaccard").alias("ej"),
    )
    pairs = truth.join(
        pred,
        (truth["id_a"] == pred["p_a"]) & (truth["id_b"] == pred["p_b"]),
        "full_outer",
    ).select(
        F.coalesce("tj", F.lit(0.0)).alias("tj"),
        F.coalesce("ej", F.lit(0.0)).alias("ej"),
    )
    grid = docs.sparkSession.createDataFrame(
        [(0.2,), (0.4,), (0.6,)], "t double"
    )
    j = pairs.crossJoin(F.broadcast(grid))
    tp = F.sum(F.when((F.col("tj") >= F.col("t")) & (F.col("ej") >= F.col("t")), 1).otherwise(0))
    np_ = F.sum(F.when(F.col("ej") >= F.col("t"), 1).otherwise(0))
    nt = F.sum(F.when(F.col("tj") >= F.col("t"), 1).otherwise(0))
    return (
        j.groupBy(F.col("t").alias("threshold"))
        .agg(
            nt.cast("long").alias("n_truth"),
            np_.cast("long").alias("n_pred"),
            tp.cast("long").alias("tp"),
            F.sum(
                F.when((F.col("ej") >= F.col("t")) & (F.col("tj") < F.col("t")), 1)
                .otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when((F.col("tj") >= F.col("t")) & (F.col("ej") < F.col("t")), 1)
                .otherwise(0)
            ).cast("long").alias("fn"),
            F.round(
                tp.cast("double") / F.nullif(np_, F.lit(0)), 6
            ).alias("precision"),
            F.round(
                tp.cast("double") / F.nullif(nt, F.lit(0)), 6
            ).alias("recall"),
        )
        .orderBy("threshold")
    )
