"""Every oracle-backed registry query must hash-match DuckDB (driver gate)."""

from __future__ import annotations

import os

import pytest

from gpu_telemetry_lakehouse_spark.queries import ORACLE, QUERIES

from .oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, name, sf_dir)


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert {f.name for f in df.schema.fields} >= {"dt", "avg_value", "p95_value"}


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    """sf0.001 with adversarial edge rows injected: documents shorter than
    one 5-gram (0..5 tokens) and events with NULL value — the cases review
    r3 found latent on the clean generated testdata."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("edge_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (9000001, 'one two three', 'en', 'web', 13),
            (9000002, 'alpha beta gamma delta', 'en', 'web', 22),
            (9000003, 'a b c d e', 'en', 'books', 9),
            (9000004, '', 'en', 'books', 0)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet'
          UNION ALL BY NAME
          SELECT * FROM (
            SELECT event_id + 9000000 AS event_id, ts, user_id, event_type,
                   CAST(NULL AS DOUBLE) AS value, props
            FROM '{src}/events.parquet' LIMIT 25
          ) x
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "ngram_novelty_docs",
        "mutual_info_event_bucket",
        "text_token_count",
        "doc_fingerprint",
        "text_quality_score",
        "bigram_perplexity_docs",
        "exact_substring_dup_spans",
        "chunk_documents_overlap",
        "dsir_importance_weights",
        "source_token_kl",
        "chi2_event_weekday",
        "forecast_daily_events",
    ],
)
def test_edge_corpus_matches_oracle(spark, edge_dir, name):
    compare(spark, name, edge_dir)


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """Pathological slice: events collapses to 25 rows in ONE weekday/day
    with NULL values — the 1xC contingency table and zero-variance OLS fit
    that crashed chi2/forecast under ANSI division (review r3)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT event_id, min(ts) OVER () AS ts, user_id, event_type,
                 CAST(NULL AS DOUBLE) AS value, props
          FROM '{src}/events.parquet' LIMIT 25
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", ["chi2_event_weekday", "forecast_daily_events"])
def test_degenerate_slice_yields_null_not_crash(spark, degenerate_dir, name):
    compare(spark, name, degenerate_dir)



@pytest.fixture(scope="module")
def malformed_props_dir(tmp_path_factory):
    """events with NULL / truncated ('{oops') / empty-string props: the
    VARIANT/JSON family must degrade malformed payloads to NULL on BOTH
    engines (TRY semantics), never fail the job (review r3)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("props_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet'
          UNION ALL BY NAME
          SELECT * FROM (
            SELECT event_id + 9000000 AS event_id, ts, user_id, event_type,
                   value,
                   CASE WHEN event_id % 3 = 0 THEN NULL
                        WHEN event_id % 3 = 1 THEN '{{oops'
                        ELSE '' END AS props
            FROM '{src}/events.parquet' LIMIT 30
          ) x
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["json_extract_props", "variant_props_stats", "try_safety_functions"],
)
def test_malformed_props_degrade_to_null(spark, malformed_props_dir, name):
    compare(spark, name, malformed_props_dir)


@pytest.fixture(scope="module")
def tie_doubled_dir(tmp_path_factory):
    """orders/lineitem doubled under shifted keys: every value appears
    (at least) twice, so any ranking/limit without a complete tie-break —
    or midpoint-sensitive rounding of rank ratios — diverges between
    engines (review r3: percent_rank at 41/640 = .0640625 split Spark's
    shortest-repr HALF_UP from DuckDB's exact-expansion rounding)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("ties_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        con.sql(
            f"""
            COPY (
              SELECT * FROM '{src}/{t}.parquet'
              UNION ALL BY NAME
              SELECT * REPLACE ({key} + 1000000000 AS {key})
              FROM '{src}/{t}.parquet'
            ) TO '{d}/{t}.parquet' (FORMAT PARQUET)
            """
        )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["window_rank_family", "topk_orders", "window_topk_per_group", "theta_join_balance_rank"],
)
def test_tie_doubled_corpus_matches_oracle(spark, tie_doubled_dir, name):
    compare(spark, name, tie_doubled_dir)


@pytest.fixture(scope="module")
def degenerate_embeddings_dir(tmp_path_factory):
    """embeddings with NULL and all-zero vectors: cosine against them is
    undefined — the similarity family must exclude them (with_norm
    contract), never die on an ANSI divide-by-zero (review r3: 9 of 13
    embedding queries crashed before the guard)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("zvec_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/embeddings.parquet'
          UNION ALL BY NAME
          SELECT * FROM (
            SELECT vec_id + 9000000 AS vec_id, label,
                   CASE WHEN vec_id % 2 = 0
                        THEN list_transform(embedding, x -> 0.0::FLOAT)
                        ELSE NULL END AS embedding
            FROM '{src}/embeddings.parquet' LIMIT 6
          ) x
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["knn_cosine_brute", "semdedup_prune", "embedding_neardup_pairs",
     "knn_cosine_vectorized", "knn_hard_negatives"],
)
def test_degenerate_embeddings_do_not_crash(spark, degenerate_embeddings_dir, name):
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    out = QUERIES[name](spark, degenerate_embeddings_dir)
    rows = out.collect()
    assert rows  # produces real results from the healthy vectors
    # no degenerate id ever appears as a neighbor/member
    bad_ids = {9000000 + i for i in range(10)}
    for r in rows:
        for f in ("neighbor_id", "negative_id", "id_a", "id_b", "vec_id"):
            if f in r.asDict() and r[f] is not None:
                assert r[f] not in bad_ids, (name, f, r[f])
