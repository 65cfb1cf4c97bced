"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, regex token counting,
document fingerprinting. All expressions are row-local (no shuffle): at 100 TB
these run map-side at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_int, tokens

# Tiny English stopword set shared with the oracle SQL (keep in sync with
# queries/text.py fragments).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]

# One word-ish token per match: letter runs, digit runs, then any single
# non-space leftover (a BPE-style pre-tokenizer's coarse pass).
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array; empty array when < n tokens.

    Row-local (no explode, no shuffle). Built from zip_with over n shifted
    slices rather than transform+element_at: element_at inside a lambda makes
    Catalyst's projection collapse re-inline the token expression per array
    element (n evaluations per shingle), while slice/zip_with evaluate the
    token array a constant number of times per row.
    """
    m = F.greatest(F.size(tok_col) - (n - 1), F.lit(0))
    parts = [F.slice(tok_col, j + 1, m) for j in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return out


def stop_hits(tok_col: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tok_col, lambda x: F.array_contains(stops, x)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts, uniqueness, mean token length, stopword ratio."""
    tk = tokens(F.col(text_col))
    n = F.size(tk)
    return df.withColumns(
        {
            "n_tokens": n,
            "n_unique_tokens": F.size(F.array_distinct(tk)),
            "avg_token_len": F.aggregate(
                F.transform(tk, F.length), F.lit(0), lambda a, x: a + x
            )
            / n.cast("double"),
            "stop_ratio": stop_hits(tk) / n.cast("double"),
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text", threshold: float = 0.03) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio over the whitespace tokens.

    A real deployment swaps the stopword table per language and takes the
    argmax; the Spark plumbing (broadcast wordlists, row-local ratio) is
    identical.
    """
    tk = tokens(F.col(text_col))
    ratio = stop_hits(tk) / F.size(tk).cast("double")
    return df.withColumn(
        "lang_pred", F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("und"))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length saturation, lexical diversity,
    natural stopword density (the shape used to filter LLM training corpora).
    """
    tk = tokens(F.col(text_col))
    n = F.size(tk).cast("double")
    uniq_ratio = F.size(F.array_distinct(tk)) / n
    stop_ratio = stop_hits(tk) / n
    length_sat = F.least(F.lit(1.0), n / F.lit(100.0))
    stop_ok = F.when((stop_ratio >= 0.02) & (stop_ratio <= 0.3), 1.0).otherwise(0.0)
    return df.withColumn(
        "quality_score", F.round(0.4 * length_sat + 0.4 * uniq_ratio + 0.2 * stop_ok, 6)
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex pre-tokenizer count (BPE-ish upper bound on token usage)."""
    return df.withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), F.lit(0)))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit-ish content fingerprint of whitespace-normalized lowercase text
    (md5-derived; portable to the oracle)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", md5_int(norm)).withColumn(
        "fp_hex", F.substring(F.md5(norm), 1, 16)
    )


def edit_distance_join(
    df: DataFrame, col: str, k: int = 2, q: int = 3
) -> DataFrame:
    """Edit-distance similarity self-join WITHOUT the O(n²) pair space:
    q-gram count filtering (the Gravano et al., VLDB 2001 family). Candidate
    pairs come from an inverted q-gram index join; a pair survives only if
    its gram-match count m = Σ_g cnt_a(g)·cnt_b(g) reaches the sound lower
    bound max(|G_a|,|G_b|) − k·q (one edit destroys at most q grams — m
    overcounts the multiset intersection, so the filter admits false
    positives, never false negatives) and the lengths differ by ≤ k. Only
    survivors pay the levenshtein verification.

    Strings whose gram count is ≤ k·q (shorter than q·(k+1)+q−1 chars) make
    the bound vacuous AND may share zero grams at distance k, so they get an
    exact all-pairs fallback — bounded by the (tiny) short-string set only;
    short×long pairs keep a positive bound via the longer side and stay in
    the index path.

    The DuckDB oracle for this operator is the NAIVE quadratic join, so the
    differential check proves the pruning is lossless, not just plausible.
    Returns distinct (name_a, name_b, ed) with name_a < name_b, 1 ≤ ed ≤ k.
    """
    names = (
        df.select(F.col(col).alias("name"))
        .distinct()
        .withColumn("len", F.length("name"))
        .withColumn("gcnt", F.greatest(F.col("len") - q + 1, F.lit(0)))
    )
    grams = names.filter(F.col("gcnt") > 0).select(
        "name",
        "len",
        "gcnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("gcnt")),
                lambda i: F.col("name").substr(i, F.lit(q)),
            )
        ).alias("g"),
    )
    a = grams.select(
        F.col("name").alias("name_a"), F.col("len").alias("la"),
        F.col("gcnt").alias("ca"), "g",
    )
    b = grams.select(
        F.col("name").alias("name_b"), F.col("len").alias("lb"),
        F.col("gcnt").alias("cb"), F.col("g").alias("gb"),
    )
    cand = (
        a.join(b, (F.col("g") == F.col("gb")) & (F.col("name_a") < F.col("name_b")))
        .groupBy("name_a", "name_b", "la", "lb", "ca", "cb")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(
            (F.abs(F.col("la") - F.col("lb")) <= k)
            & (F.col("m") >= F.greatest("ca", "cb") - k * q)
        )
        .select("name_a", "name_b")
    )
    # Exact fallback: both strings too short for a sound gram bound. The
    # length predicate |la−lb| ≤ k becomes an EQUI join on a length band
    # (each left string fans out to its k±band of lengths, the right joins
    # on its own length) so even the fallback never plans a nested loop —
    # a pair with lb−la = δ ∈ [−k, k] matches exactly one band value.
    short = names.filter(F.col("gcnt") <= k * q)
    sa = short.select(
        F.col("name").alias("name_a"),
        F.explode(
            F.sequence(F.col("len") - k, F.col("len") + k)
        ).alias("band"),
    )
    sb = short.select(F.col("name").alias("name_b"), F.col("len").alias("lb"))
    short_pairs = sa.join(
        sb,
        (F.col("band") == F.col("lb")) & (F.col("name_a") < F.col("name_b")),
    ).select("name_a", "name_b")
    return (
        cand.unionByName(short_pairs)
        .distinct()
        .withColumn("ed", F.levenshtein("name_a", "name_b"))
        .filter(F.col("ed") <= k)
        .select("name_a", "name_b", F.col("ed").cast("int").alias("ed"))
    )
