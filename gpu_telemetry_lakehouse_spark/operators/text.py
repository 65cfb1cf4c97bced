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
