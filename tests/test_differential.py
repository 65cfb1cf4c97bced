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


# --- degenerate branches of the r6 stats/causal family (VERDICT r6 #1/#5) ---
# Each corpus triggers the branch an oracle twin could silently share a NULL
# (or an ANSI divide-by-zero crash) on: the row must be DEFINED and identical
# on both engines by construction, and where the value is determinable by
# hand it is pinned exactly.


@pytest.fixture(scope="module")
def sparse_stratum_dir(tmp_path_factory):
    """Events where one weekday stratum has treated rows but ZERO treated
    converters: the CMH `a` cell is 0, so its (0 - E_i) deviation must be
    INCLUDED in sum_dev (VERDICT r6 #1 — the unguarded SUM(CASE...THEN m END)
    went NULL and silently dropped the stratum on both engines)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("sparse_stratum")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * FROM (VALUES
            -- Mon: treated (uid 3) never converts; control (uid 1) converts once
            (1, TIMESTAMP '2024-01-01 10:00:00', 3, 'click', 10.0, NULL),
            (2, TIMESTAMP '2024-01-01 11:00:00', 3, 'click', 10.0, NULL),
            (3, TIMESTAMP '2024-01-01 12:00:00', 1, 'click', 80.0, NULL),
            (4, TIMESTAMP '2024-01-01 13:00:00', 1, 'click', 10.0, NULL),
            -- Tue: balanced (one converter per arm)
            (5, TIMESTAMP '2024-01-02 10:00:00', 3, 'click', 80.0, NULL),
            (6, TIMESTAMP '2024-01-02 11:00:00', 3, 'click', 10.0, NULL),
            (7, TIMESTAMP '2024-01-02 12:00:00', 1, 'click', 80.0, NULL),
            (8, TIMESTAMP '2024-01-02 13:00:00', 1, 'click', 10.0, NULL)
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_cmh_sparse_stratum_includes_zero_cell(spark, sparse_stratum_dir):
    """Mon: a=0, E=r1*c1/n=2*1/4=0.5 -> dev -0.5; Tue: a=1, E=1 -> dev 0.
    sum_dev MUST be -0.5 (the pre-fix NULL-asymmetry summed to 0.0)."""
    compare(spark, "cmh_stratified_readout", sparse_stratum_dir)
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    row = QUERIES["cmh_stratified_readout"](spark, sparse_stratum_dir).collect()[0]
    assert row["n_strata"] == 2
    assert row["sum_dev"] == pytest.approx(-0.5)


@pytest.fixture(scope="module")
def one_arm_events_dir(tmp_path_factory):
    """Every user treated (uid % 3 == 0), every value constant, activity in
    both periods: CEM has NO matched cell, DiD is missing both control
    cells, every daily mean ties, the CMH pooled variance is zero, and
    both Kendall daily series are constant (every pair tied). Documents
    are replaced by 5 identical long texts, so both kappa raters are the
    CONSTANT rater (p_e = 1)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("one_arm")
    rows = []
    eid = 0
    for uid in (3, 6, 9):
        for day in ("2024-01-10", "2024-01-11", "2024-01-12",
                    "2024-01-20", "2024-01-21"):
            eid += 1
            rows.append(
                f"({eid}, TIMESTAMP '{day} 10:00:00', {uid},"
                " 'click', 10.0, NULL)"
            )
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (SELECT * FROM (VALUES {','.join(rows)})
              t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    text = " ".join(["word"] * 60)
    doc_rows = ",".join(
        f"({i}, '{text}', 'en', 'web', {len(text)})" for i in range(1, 6)
    )
    con.sql(
        f"""
        COPY (SELECT * FROM (VALUES {doc_rows})
              t(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "cem_att_readout",       # empty matched set: ATT NULL by construction
        "did_readout",           # missing control cells: did NULL, counts real
        "mann_kendall_daily",    # all-tied days: S=0, var_s=0, z=0
        "cmh_stratified_readout",  # zero pooled variance: chi2 NULL
        "kendall_tau_daily",     # constant series: tau_b NULL via NULLIF
        "cohens_kappa_quality_labels",  # constant raters: kappa NULL
        "median_of_means_value",  # constant values: all bucket means equal
        "freshness_lag_report",  # single event type, sparse days
    ],
)
def test_one_arm_degenerate_matches_oracle(spark, one_arm_events_dir, name):
    compare(spark, name, one_arm_events_dir)


def test_one_arm_degenerate_semantics(spark, one_arm_events_dir):
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    cem = QUERIES["cem_att_readout"](spark, one_arm_events_dir).collect()[0]
    assert cem["n_matched_cells"] == 0 and cem["n_users_pruned"] == 3
    assert cem["att"] is None  # explicit, not a crash

    did = QUERIES["did_readout"](spark, one_arm_events_dir).collect()[0]
    assert did["n_t_pre"] == 9 and did["n_t_post"] == 6
    assert did["n_c_pre"] is None and did["did"] is None

    mk = QUERIES["mann_kendall_daily"](spark, one_arm_events_dir).collect()[0]
    assert mk["n_days"] == 5 and mk["s_stat"] == 0
    assert mk["var_s"] == 0.0 and mk["z"] == 0.0

    cmh = QUERIES["cmh_stratified_readout"](spark, one_arm_events_dir).collect()[0]
    assert cmh["sum_var"] == 0.0 and cmh["cmh_chi2"] is None

    tau = QUERIES["kendall_tau_daily"](spark, one_arm_events_dir).collect()[0]
    assert tau["tied_x"] == tau["n_pairs"] and tau["tau_b"] is None

    kap = QUERIES["cohens_kappa_quality_labels"](
        spark, one_arm_events_dir
    ).collect()[0]
    assert kap["n11"] == kap["n"] and kap["kappa"] is None


@pytest.fixture(scope="module")
def single_day_orders_dir(tmp_path_factory):
    """Orders collapsed onto ONE order date: the delete-one-day jackknife has
    zero leave-one-out estimates — variance undefined, but theta_full must
    still report from the full-sample totals."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("one_day_orders")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 MIN(o_orderdate) OVER () AS o_orderdate, o_orderpriority
          FROM '{src}/orders.parquet' LIMIT 50
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_jackknife_single_day_defined(spark, single_day_orders_dir):
    compare(spark, "jackknife_day_ratio", single_day_orders_dir)
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    row = QUERIES["jackknife_day_ratio"](spark, single_day_orders_dir).collect()[0]
    assert row["g_days"] == 0
    assert row["theta_full"] is not None and row["theta_full"] > 0
    assert row["jk_var"] is None and row["jk_se"] is None


@pytest.fixture(scope="module")
def single_class_customers_dir(tmp_path_factory):
    """Customers collapsed to ONE quasi-identifier class: its bucket mix IS
    the global mix, so t-closeness must report t_max = 0 exactly."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("one_class_cust")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT c_custkey, c_name, CAST(7 AS INT) AS c_nationkey, c_acctbal,
                 'BUILDING' AS c_mktsegment
          FROM '{src}/customer.parquet' LIMIT 40
        ) TO '{d}/customer.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_t_closeness_single_class(spark, single_class_customers_dir):
    compare(spark, "t_closeness_customers", single_class_customers_dir)
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    row = QUERIES["t_closeness_customers"](
        spark, single_class_customers_dir
    ).collect()[0]
    assert row["n_classes"] == 1 and row["t_max"] == 0.0


# --- the all-empty corpus (round 7): zero-row tables, schemas preserved ------
# The remaining classic degenerate class after the one-arm/sparse corpora:
# fitted operators must return a typed empty frame (or a diagnosable typed
# error), aggregation contracts must emit their vacuous-truth row, and both
# engines must agree — not crash in numpy or return undefined NULL shapes.


def _corpus_slice(tmp_path_factory, name: str, limit: int) -> str:
    """Every catalog table truncated to ``limit`` rows, schemas preserved.
    Iterates catalog.TABLES so a newly added table is covered automatically
    instead of silently missing from the degenerate corpora."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp(name)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT {limit})"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def empty_corpus_dir(tmp_path_factory):
    return _corpus_slice(tmp_path_factory, "empty_sf", 0)


@pytest.mark.parametrize(
    "name",
    [
        "gold_daily_util",
        "agg_summary",            # ungrouped agg: 1 vacuous row both engines
        "tpch_q1",
        "gold_job_efficiency_daily",  # was: None+1 TypeError in _n_users
        "anomaly_daily_certified",    # was: numpy IndexError in the fit;
                                      # now the vacuous-truth certificate row
        "tablog_lifecycle_report",    # 4 empty versions exist on both sides
        "jackknife_day_ratio",
        "cmh_stratified_readout",
        "kendall_tau_daily",
        "t_closeness_customers",
        "freshness_lag_report",
        "als_recommend_parts_certified",  # was: ALS 'No ratings' failure;
                                          # now the vacuous-truth contract
        "tdigest_value_quantiles_certified",  # was: IndexError in the
                                              # empty digest; NaN estimates
        "funnel_conversion_stats",    # was: ANSI 0/0 conversion rate
        "logreg_embedding_eval",      # was: empty-summarizer failure;
                                      # now a typed empty report
    ],
)
def test_empty_corpus_matches_oracle(spark, empty_corpus_dir, name):
    compare(spark, name, empty_corpus_dir)


def test_empty_corpus_semantics(spark, empty_corpus_dir):
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    # fitted scorer returns a TYPED empty frame, not an IndexError
    scored = QUERIES["anomaly_daily"](spark, empty_corpus_dir)
    assert scored.count() == 0
    assert {"anomaly_score", "anomaly_flag"} <= set(scored.columns)

    cert = QUERIES["anomaly_daily_certified"](spark, empty_corpus_dir).collect()
    assert len(cert) == 1 and cert[0]["total_days"] == 0
    assert cert[0]["flags_ok"] == 1  # vacuous truth, not NULL

    # PQ codebook fitting on zero vectors fails LOUD with a typed,
    # diagnosable error (the sklearn contract), never a silent empty answer
    with pytest.raises(ValueError, match="sample vectors"):
        QUERIES["knn_pq_adc_certified"](spark, empty_corpus_dir).collect()


def test_empty_corpus_rollup_engine_divergence(spark, empty_corpus_dir):
    """KNOWN engine-semantics difference, pinned so a silent change either
    way is noticed: SQL-standard ROLLUP includes the () grouping set, so
    DuckDB emits ONE grand-total row over an empty input; Spark's
    rollup()/ROLLUP emits ZERO rows. On any non-empty input both agree
    (the sf0.01 differential covers that); the empty limit diverges by
    engine design, not by a bug in this repo's plans."""
    from gpu_telemetry_lakehouse_spark.queries import ORACLE, QUERIES

    from .oracle import duck_con

    assert QUERIES["rollup_region_nation"](spark, empty_corpus_dir).count() == 0
    con = duck_con(empty_corpus_dir)
    assert len(con.sql(ORACLE["rollup_region_nation"]).fetchall()) == 1
    con.close()


# --- the single-row corpus (round 7): one row per table ----------------------
# The n-1 / zero-variance denominator class: sample variance, rank
# correlation, AUC with one empty class, least-squares on a single point —
# each must yield a defined NULL on BOTH engines, never an ANSI 0/0.


@pytest.fixture(scope="module")
def one_row_corpus_dir(tmp_path_factory):
    return _corpus_slice(tmp_path_factory, "onerow_sf", 1)


@pytest.mark.parametrize(
    "name",
    [
        "higher_moment_stats",       # zero-variance shape moments
        "spearman_price_qty",        # zero rank variance
        "roc_auc_price_returns",     # one empty class
        "lift_gains_price_returns",  # zero total positives
        "fano_burstiness_types",     # single hour: no sample variance
        "cv_regression_price_qty",   # single-point least squares
        "conformal_interval_price",  # empty/degenerate fit split
        "jackknife_day_ratio",
        "kendall_tau_daily",
        "mann_kendall_daily",
    ],
)
def test_one_row_corpus_matches_oracle(spark, one_row_corpus_dir, name):
    compare(spark, name, one_row_corpus_dir)


@pytest.fixture(scope="module")
def single_day_events_dir(tmp_path_factory):
    """All events collapsed onto ONE day (intra-day times preserved): the
    daily trend/lag/pairwise family sees an empty pair space and
    zero-variance daily series — defined NULLs on both engines."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("oneday_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT event_id,
                 TIMESTAMP '2024-01-15 00:00:00'
                   + (ts - date_trunc('day', ts)) AS ts,
                 user_id, event_type, value, props
          FROM '{src}/events.parquet'
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "theilsen_daily_trend",   # zero pairwise slopes
        "mann_kendall_daily",     # single day: no pairs
        "kendall_tau_daily",
        "jackknife_day_ratio",    # events-based twin stays defined
        "forecast_daily_events",  # zero-variance OLS on one day
        "acf_daily_value",        # lag series empty
        "ewma_recursive_daily",
        "holt_linear_daily",
        "isotonic_daily_value",
        "cusum_change_point",
        "weekday_seasonality",
        "rolling_wau_dau",
        "daily_new_vs_returning",
        "gold_daily_util",
    ],
)
def test_single_day_corpus_matches_oracle(spark, single_day_events_dir, name):
    compare(spark, name, single_day_events_dir)


# --- unicode-hostile documents (round 7) -------------------------------------
# Emoji (astral plane), CJK, RTL scripts, combining marks, zero-width
# joiners, control-ish characters: the text family must stay crash-free and
# engine-identical. The ONE known divergence is pinned below.

_HOSTILE_TEXTS = [
    "café naïve résumé coöperation",
    "\U0001F600\U0001F680 emoji soup \U0001F4A9\U0001F3C6 end",
    "東京都 北京市 漢字テスト",
    "العربية mixed עברית rtl",
    "tab\there newline\\n quote'quote double\"double",
    "ÿþ latin1-ish €£¥ currency",
    "zero​width‌joiners‍ here",
]


@pytest.fixture(scope="module")
def unicode_docs_dir(tmp_path_factory):
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("unicode_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    rows = ",".join(
        f"({9000001 + i}, '{t.replace(chr(39), chr(39) * 2)}', 'en', 'web',"
        f" {len(t)})"
        for i, t in enumerate(_HOSTILE_TEXTS)
    )
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          UNION ALL BY NAME
          SELECT * FROM (VALUES {rows}) t(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "char_entropy_docs",
        "doc_fingerprint",
        "text_lang_id",
        "text_stats",
        "text_quality_score",
        "text_token_count",
        "mojibake_detect_report",
        "dedup_exact_summary",
        "dedup_simhash",
        "pii_redaction_report",
        "chunk_documents_overlap",
        "doc_length_deciles",
    ],
)
def test_unicode_corpus_matches_oracle(spark, unicode_docs_dir, name):
    compare(spark, name, unicode_docs_dir)


def test_turkish_dotted_i_engine_divergence(spark):
    """KNOWN engine-semantics difference, pinned so a silent change either
    way is noticed: lowercasing U+0130 (LATIN CAPITAL LETTER I WITH DOT
    ABOVE) yields TWO codepoints on the JVM ('i' + U+0307 combining dot —
    the Unicode SpecialCasing.txt mapping) but ONE in DuckDB ('i'). Any
    query that case-folds text before counting or hashing characters
    (char_entropy_docs, doc_fingerprint) legitimately differs on documents
    containing İ; every other hostile-unicode class above is
    engine-identical. Neither mapping is wrong — they implement different
    published Unicode options."""
    import duckdb

    from pyspark.sql import functions as F

    spark_len = (
        spark.range(1)
        .select(F.length(F.lower(F.lit("İstanbul"))).alias("n"))
        .first()["n"]
    )
    duck_len = duckdb.sql("SELECT length(lower('İstanbul'))").fetchone()[0]
    assert spark_len == 9 and duck_len == 8


@pytest.fixture(scope="module")
def single_type_events_dir(tmp_path_factory):
    """Every event the same type: two-sample and funnel-style queries see
    one empty sample — defined NULLs on both engines, never an ANSI 0/0."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("onetype_sf")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), d / f)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT event_id, ts, user_id, 'click' AS event_type, value, props
          FROM '{src}/events.parquet'
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "ks_test_click_purchase",   # empty purchase sample: KS NULL
        "funnel_view_click_purchase",
        "funnel_conversion_stats",  # zero viewers: rate NULL
        "chi2_event_weekday",       # 1xC contingency
        "event_transition_matrix",  # single self-transition state
        "event_cooccurrence_lift",
        "attribution_last_touch",
        "top_event_paths",
    ],
)
def test_single_type_corpus_matches_oracle(spark, single_type_events_dir, name):
    compare(spark, name, single_type_events_dir)


# --- round-8 degenerate classes (VERDICT r7 #4) -------------------------------
# Four new adversarial corpora: duplicate-every-row (sampling/reservoir
# family), extreme-magnitude numerics (+-1e308, subnormals through the
# exact-decimal staging), NaN/Inf embedding vectors (ANN/k-means family),
# and a multi-MB single document (posting/text family — swept separately,
# tools/degen_sweep.py). Full 303-query sweep results in COVERAGE.md.


@pytest.fixture(scope="module")
def dup_all_rows_dir(tmp_path_factory):
    """Every row of every table duplicated exactly once."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("dup_all")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT t.* FROM '{src}/{t}.parquet' t CROSS JOIN range(2) r)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        # the sampling/dedup family must stay deterministic and
        # engine-identical when every row has an exact twin
        "reservoir_sample_per_user",
        "quota_sample_by_group",
        "sample_exact_k",
        "stratified_user_sample",
        "weighted_sample_users",
        "hash_sample_orders",
        "train_val_test_split",
        "dedup_exact_summary",
        "dedup_groups_exact",
        "constraint_unique_probe",  # duplicates are exactly what it reports
        "heavy_hitter_users",
        "content_checksum_orders",  # XOR cancels twin pairs; n_rows catches
    ],
)
def test_dup_all_rows_matches_oracle(spark, dup_all_rows_dir, name):
    compare(spark, name, dup_all_rows_dir)


@pytest.fixture(scope="module")
def extreme_values_dir(tmp_path_factory):
    """+-1e308, the smallest subnormal, DBL_MIN-boundary and zero rotated
    through events.value and lineitem.l_extendedprice."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("extreme_vals")
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            sql = f"""
              SELECT event_id, ts, user_id, event_type,
                     CASE event_id % 8
                          WHEN 0 THEN 1e308 WHEN 1 THEN -1e308
                          WHEN 2 THEN 5e-324 WHEN 3 THEN -2.2250738585072014e-308
                          WHEN 4 THEN 0.0 WHEN 5 THEN NULL
                          ELSE value END AS value,
                     props
              FROM '{src}/events.parquet'"""
        elif t == "lineitem":
            sql = f"""
              SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                     CASE l_orderkey % 7 WHEN 0 THEN 1e308 WHEN 1 THEN 4.9e-324
                          ELSE l_extendedprice END AS l_extendedprice,
                     l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
              FROM '{src}/lineitem.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", ["gold_daily_util", "tpch_q1", "agg_summary"])
def test_extreme_values_both_engines_refuse(spark, extreme_values_dir, name):
    """PINNED engine-parity fail-loud: the exact-decimal staging's domain is
    |x| * 10^scale < 2^63 (functions.exact_sum). Outside it there is no
    representable exact answer, and BOTH engines refuse — Spark with the
    ANSI overflow (the reason ANSI mode is on: never a silent wraparound),
    DuckDB with its BIGINT conversion error. A fix that silenced either
    side (try_cast, ansi off) would trade a loud refusal for silently
    dropped or wrapped values."""
    import duckdb as _duck

    from .oracle import duck_con

    with pytest.raises(Exception, match="OVERFLOW|overflow"):
        QUERIES[name](spark, extreme_values_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    con = duck_con(extreme_values_dir)
    with pytest.raises(_duck.Error):
        con.sql(ORACLE[name]).fetchall()
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        # non-staged math over the same extremes must stay engine-identical:
        # order statistics and plain IEEE arithmetic both define +-1e308
        "mad_value_by_type",
        "topk_orders",  # untouched-domain control
        "casts_flags",
        "constraint_null_probe",
        "doc_length_deciles",
    ],
)
def test_extreme_values_nonstaged_matches_oracle(spark, extreme_values_dir, name):
    compare(spark, name, extreme_values_dir)


@pytest.fixture(scope="module")
def naninf_embeddings_dir(tmp_path_factory):
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("naninf_emb")
    con = duckdb.connect()
    for t in TABLES:
        if t == "embeddings":
            sql = f"""
              SELECT vec_id,
                     CASE vec_id % 5
                          WHEN 0 THEN list_transform(embedding, x -> CAST('nan' AS FLOAT))
                          WHEN 1 THEN list_transform(embedding, x -> CAST('inf' AS FLOAT))
                          WHEN 2 THEN list_transform(embedding, x -> CAST('-inf' AS FLOAT))
                          WHEN 3 THEN [CAST('nan' AS FLOAT)] || embedding[2:]
                          ELSE embedding END AS embedding,
                     label
              FROM '{src}/embeddings.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name", ["knn_ivf", "knn_ivf_certified", "knn_ivfpq", "knn_ivfpq_certified"]
)
def test_naninf_embeddings_fail_loud_typed(spark, naninf_embeddings_dir, name):
    """r8 defect class FIXED: NaN centroids used to reach the SQL-literal
    plan form as an unparseable ``nanD`` token (an AnalysisException about a
    phantom column). Now the single chokepoint where centroids become plan
    literals raises the diagnosable ValueError every fit path shares."""
    with pytest.raises(ValueError, match="non-finite"):
        QUERIES[name](spark, naninf_embeddings_dir).write.format("noop").mode(
            "overwrite"
        ).save()


def test_naninf_embeddings_udaf_guard(spark, extreme_values_dir):
    """The cent-exact pandas UDAF refuses non-finite input with a typed
    ValueError instead of pandas' IntCastingNaNError (and refuses the
    silent-wrap int64 range numpy would otherwise allow)."""
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="cent-exact|exact domain"):
        QUERIES["udaf_weighted_avg_price"](spark, extreme_values_dir).write.format(
            "noop"
        ).mode("overwrite").save()


@pytest.fixture(scope="module")
def skew_user_dir(tmp_path_factory):
    """90% of events collapse onto ONE user — the key-skew shape that
    stalls single-partition windows and explodes co-occurrence pair
    generation at scale. Full 303-query sweep: zero defects, zero stalls
    (the co-activity bucket caps bound the hot key's fan-out)."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("skew_user")
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            sql = f"""
              SELECT event_id, ts,
                     CASE WHEN event_id % 10 < 9 THEN 7 ELSE user_id END AS user_id,
                     event_type, value, props
              FROM '{src}/events.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "session_windows_users",   # per-user sessionization on the hot key
        "rolling_wau_dau",         # distinct-user windows
        "event_gap_detection",     # per-user lag chains
        "longest_event_streak",    # per-user consecutive-day runs
        "heavy_hitter_users",      # the skew IS the answer here
        "key_skew_report",         # must REPORT the skew it diagnoses
        "triangle_count_cousers",  # co-activity pair generation, capped
        "funnel_view_click_purchase",  # per-user ordered funnels
    ],
)
def test_skewed_user_corpus_matches_oracle(spark, skew_user_dir, name):
    compare(spark, name, skew_user_dir)


@pytest.fixture(scope="module")
def extreme_ts_dir(tmp_path_factory):
    """Sentinel timestamps (epoch 0, 1900-01-01, 9999-12-31, the 2038
    boundary) rotated through events.ts, orders.o_orderdate and
    lineitem.l_shipdate — the corrupt-ingest shape every real lake sees."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("extreme_ts")
    con = duckdb.connect()
    rewrites = {
        "events": f"""
          SELECT event_id,
                 CASE event_id % 12
                      WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                      WHEN 1 THEN TIMESTAMP '1900-01-01 00:00:00'
                      WHEN 2 THEN TIMESTAMP '9999-12-31 23:59:59'
                      WHEN 3 THEN TIMESTAMP '2038-01-19 03:14:08'
                      ELSE ts END AS ts,
                 user_id, event_type, value, props
          FROM '{src}/events.parquet'""",
        "orders": f"""
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 CASE o_orderkey % 9
                      WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                      WHEN 1 THEN TIMESTAMP '9999-12-30 00:00:00'
                      ELSE o_orderdate END AS o_orderdate,
                 o_orderpriority
          FROM '{src}/orders.parquet'""",
        "lineitem": f"""
          SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus,
                 CASE l_orderkey % 11
                      WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                      WHEN 1 THEN TIMESTAMP '9999-12-31 00:00:00'
                      ELSE l_shipdate END AS l_shipdate
          FROM '{src}/lineitem.parquet'""",
    }
    for t in TABLES:
        sql = rewrites.get(t, f"SELECT * FROM '{src}/{t}.parquet'")
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["medallion_end_to_end", "gapfill_hourly_locf", "gapfill_hourly_linear"],
)
def test_sentinel_timestamp_span_guard_fires(spark, extreme_ts_dir, name):
    """r8 defect class FIXED: a corrupt sentinel end timestamp used to
    explode ONE interval into millions of spine rows — a 12+ minute DoS on
    both engines. functions.guarded_seq_end now refuses per offending row
    with a diagnosable message, in under a second."""
    with pytest.raises(Exception, match="corrupt sentinel timestamp"):
        QUERIES[name](spark, extreme_ts_dir).write.format("noop").mode(
            "overwrite"
        ).save()


def test_sentinel_timestamp_bounded_refusals(spark, extreme_ts_dir):
    """Pinned loud refusals on the same corpus: the recursive month spine
    hits Spark's RECURSION_LEVEL_LIMIT (1970->9999 is ~97k months — the
    engine's own bounded-recursion guard, same posture as ours), and the
    driver-side collect of year-9999 gold days refuses at the Arrow
    nanosecond bound rather than silently wrapping."""
    with pytest.raises(Exception, match="RECURSION_LEVEL_LIMIT"):
        QUERIES["recursive_month_spine"](spark, extreme_ts_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    with pytest.raises(Exception, match="out of bounds timestamp"):
        QUERIES["anomaly_daily"](spark, extreme_ts_dir).write.format("noop").mode(
            "overwrite"
        ).save()


@pytest.mark.parametrize(
    "name", ["priority_line_counts", "text_lang_id", "constraint_null_probe"]
)
def test_extreme_ts_nontemporal_outputs_match_oracle(spark, extreme_ts_dir, name):
    """Queries whose OUTPUT carries no timestamp column stay hash-identical
    over the sentinel-bearing inputs (the comparator itself cannot hold a
    year-9999 timestamp — Arrow ns bound — so temporal outputs are pinned
    via the refusal tests above instead)."""
    compare(spark, name, extreme_ts_dir)


# --- round-9 degenerate classes (VERDICT r8 #4) -------------------------------
# Three new adversarial corpora, each swept over all 303 queries
# (tools/degen_sweep.py; results in COVERAGE.md): FK-orphan events (every
# user_id missing from the customer dim), zero-variance features (constant
# event values, identical embedding vectors), and whitespace-only /
# zero-token documents. The fourth r9 class — out-of-order / duplicate
# event-time replay — lives in tests/test_streaming.py (it is a streaming
# semantics class, not a corpus-sweep class).


@pytest.fixture(scope="module")
def fk_orphans_dir(tmp_path_factory):
    """Every events.user_id shifted out of the customer key space — the
    referential break every real lake hits when a dim snapshot lags the
    fact stream. Full 303-query sweep: zero defects."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("fk_orphans")
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            sql = f"""
              SELECT event_id, ts, user_id + 1000000000 AS user_id,
                     event_type, value, props
              FROM '{src}/events.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "referential_orphan_summary",  # must REPORT the 100% orphan rate
        "events_enriched_segment_hourly",  # inner enrichment joins go empty
        "pseudonymized_join_integrity",  # pseudonym audit over zero matches
        "daily_new_vs_returning",      # events-only control, unaffected
        "session_windows_users",       # orphan keys still sessionize
    ],
)
def test_fk_orphans_match_oracle(spark, fk_orphans_dir, name):
    compare(spark, name, fk_orphans_dir)


@pytest.fixture(scope="module")
def zero_variance_dir(tmp_path_factory):
    """Constant event values and identical embedding vectors: the
    zero-variance shape that divides by a zero std in scalers, zeroes every
    covariance in PCA, and collapses every cosine to the same score."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("zero_var")
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            sql = f"""
              SELECT event_id, ts, user_id, event_type,
                     CASE WHEN value IS NULL THEN NULL ELSE 1.0 END AS value,
                     props
              FROM '{src}/events.parquet'"""
        elif t == "embeddings":
            sql = f"""
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(0.5 AS FLOAT))
                         AS embedding,
                     label
              FROM '{src}/embeddings.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "pca_project_2d",         # zero covariance matrix eigenbasis
        "cusum_change_point",     # no change point in a constant series
        "robust_center_stats",    # MAD = 0, trimmed means constant
        "embedding_quantize_error",  # quantizing a constant vector
        "knn_cosine_brute",       # all-ties cosine, deterministic tie-break
        "mad_value_by_type",      # per-group MAD of a constant = 0
        "winsorized_value_stats",  # winsorizing a constant series
        "acf_daily_value",        # r9 defect FIXED: NULL acf, not 0/0
    ],
)
def test_zero_variance_matches_oracle(spark, zero_variance_dir, name):
    compare(spark, name, zero_variance_dir)


@pytest.fixture(scope="module")
def ws_docs_dir(tmp_path_factory):
    """Whitespace-only, punctuation-only (zero tokens after normalization),
    non-alphanumeric-unicode and single-char documents rotated through the
    corpus. Full 303-query sweep: 303/303 ok, zero defects."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("ws_docs")
    con = duckdb.connect()
    case = """
      CASE doc_id % 7
           WHEN 0 THEN ''
           WHEN 1 THEN '   '
           WHEN 2 THEN chr(9) || chr(10) || '  ' || chr(9)
           WHEN 3 THEN '!!! ,,, ... ;;;'
           WHEN 4 THEN '§ © ® —'
           WHEN 5 THEN ' a '
           ELSE text END
    """
    for t in TABLES:
        if t == "documents":
            sql = f"""
              SELECT doc_id, {case} AS text, lang, source,
                     CAST(length({case}) AS BIGINT) AS n_chars
              FROM '{src}/documents.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "text_stats",
        "text_token_count",
        "text_lang_id",
        "text_quality_score",
        "doc_length_deciles",
        "tfidf_top_terms",
        "doc_unigram_logprob",
        "text_repetition_gopher",
        "char_entropy_docs",
        "chunk_documents_overlap",
    ],
)
def test_ws_docs_match_oracle(spark, ws_docs_dir, name):
    compare(spark, name, ws_docs_dir)


# --- round-9b degenerate classes ----------------------------------------------
# Ragged embeddings (per-row dimension drift), giant-single-token documents
# (multi-MB unbroken tokens), and all-NULL join keys. Sweeps via
# tools/degen_sweep.py recorded in COVERAGE.md; the pins below hold the
# fixes: stack_uniform diagnosed refusals, the pca try_element_at NULL
# symmetry, the _BPE_MAX_WORD symmetric gate, the cosine_topk NULL-cos
# exclusion, and the rolling_wau_dau NULLIF guard.


@pytest.fixture(scope="module")
def ragged_embeddings_dir(tmp_path_factory):
    """Embedding vectors whose lengths drift per row (empty, truncated,
    full) — the corpus shape of a re-embedding migration gone half-way."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("ragged_emb")
    con = duckdb.connect()
    for t in TABLES:
        if t == "embeddings":
            sql = f"""
              SELECT vec_id,
                     CASE
                       WHEN vec_id % 7 = 0 THEN []::FLOAT[]
                       WHEN vec_id % 3 = 0
                         THEN embedding[1:CAST(1 + vec_id % 13 AS BIGINT)]
                       ELSE embedding
                     END AS embedding,
                     label
              FROM '{src}/embeddings.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


def test_ragged_embeddings_pca_matches_oracle(spark, ragged_embeddings_dir):
    """try_element_at gives out-of-bounds -> NULL, DuckDB's native list-index
    semantics — short/empty vectors contribute NULL moments/projections in
    BOTH engines instead of an ANSI array-index crash on ours."""
    compare(spark, "pca_project_2d", ragged_embeddings_dir)


@pytest.mark.parametrize(
    "name",
    ["logreg_embedding_eval", "knn_cosine_vectorized", "knn_ivf", "knn_pq_adc"],
)
def test_ragged_embeddings_diagnosed_refusal(spark, ragged_embeddings_dir, name):
    """Fit/stack paths must refuse a ragged embedding column with a message
    that NAMES the defect — numpy's 'inhomogeneous shape' and the JVM's
    Py4J fit crash did not (stack_uniform / fit gate, round 9)."""
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    with pytest.raises(ValueError, match="inconsistent"):
        QUERIES[name](spark, ragged_embeddings_dir).collect()


def test_ragged_embeddings_knn_brute_excludes_cross_dim(
    spark, ragged_embeddings_dir
):
    """Pinned engine-parity divergence: Spark EXCLUDES cross-dimension pairs
    (zip_with NULL-pads -> NULL cosine -> filtered, same footing as the
    zero-norm exclusion), DuckDB REFUSES (list_dot_product raises on
    mismatched lengths). Neither is silent; ranks stay contiguous over
    same-dimension pairs only."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.queries import ORACLE, QUERIES

    from .oracle import duck_con

    rows = QUERIES["knn_cosine_brute"](spark, ragged_embeddings_dir).collect()
    assert rows
    assert all(r.cos_sim is not None for r in rows)
    # rank contiguity: each query's ranks are 1..n with no NULL-cos gaps
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rn)
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))
    con = duck_con(ragged_embeddings_dir)
    with pytest.raises(duckdb.Error, match="dimensions must be equal"):
        con.sql(ORACLE["knn_cosine_brute"]).fetchall()


@pytest.fixture(scope="module")
def giant_token_dir(tmp_path_factory):
    """Documents that are ONE unbroken token — no whitespace anywhere, a few
    multi-MB (a binary blob that leaked into a text column). Char-splitting
    BPE paid O(W^2) per word before the _BPE_MAX_WORD gate."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("giant_token")
    body = (
        "CASE WHEN doc_id % 97 = 0 THEN repeat('a1b2c3d4', 131072)"
        " ELSE repeat(concat('x', CAST(doc_id AS VARCHAR), 'y'), 3) END"
    )
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            sql = f"""
              SELECT doc_id, {body} AS text, lang, source,
                     length({body}) AS n_chars
              FROM '{src}/documents.parquet'"""
        else:
            sql = f"SELECT * FROM '{src}/{t}.parquet'"
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", ["bpe_learn_merges", "bpe_apply_stats"])
def test_giant_token_bpe_gated_and_oracle_identical(spark, giant_token_dir, name):
    """The _BPE_MAX_WORD gate excludes multi-MB 'words' from merge learning
    in the Spark plan AND the oracle SQL — hash-identical on this corpus
    (and a no-op on natural text), where the ungated form stalled for
    hours on one 1M-char token."""
    compare(spark, name, giant_token_dir)


@pytest.fixture(scope="module")
def null_keys_dir(tmp_path_factory):
    """Every FK NULL (events.user_id, orders.o_custkey, customer.c_nationkey)
    — distinct from the FK-orphan class (keys present but unmatched): NULL
    keys exercise null-group and null-join semantics."""
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("null_keys")
    over = {
        "events": "SELECT event_id, ts, NULL::BIGINT AS user_id, event_type,"
        " value, props FROM '{s}/events.parquet'",
        "orders": "SELECT o_orderkey, NULL::BIGINT AS o_custkey, o_orderstatus,"
        " o_totalprice, o_orderdate, o_orderpriority FROM '{s}/orders.parquet'",
        "customer": "SELECT c_custkey, c_name, NULL::INTEGER AS c_nationkey,"
        " c_acctbal, c_mktsegment FROM '{s}/customer.parquet'",
    }
    con = duckdb.connect()
    for t in TABLES:
        sql = over.get(t, "SELECT * FROM '{s}/" + t + ".parquet'").format(s=src)
        con.sql(f"COPY ({sql}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "rolling_wau_dau",          # wau=0 under all-NULL users: NULLIF guard
        "daily_new_vs_returning",   # NULL user grouping, engine-identical
        "null_safe_join_status",    # the <=> family is BUILT for this corpus
        "group_by_all_orders",      # NULL o_custkey groups agree
        "join_outer_histogram",     # outer-join NULL-key fan agrees
    ],
)
def test_null_keys_match_oracle(spark, null_keys_dir, name):
    compare(spark, name, null_keys_dir)


# --- round-9c degenerate class: PRE-EPOCH timestamps -------------------------
# Every temporal column shifted 60 years back, putting EVERY epoch value
# NEGATIVE (1932-38 order dates, 1964 telemetry) — the floor-vs-truncate
# division, negative-modulo and epoch-extraction boundaries that 1970+ data
# never exercises (integer `x DIV n` truncates toward zero while floor(x/n)
# rounds down; they agree on positives and differ by 1 on every non-exact
# negative). Full 303-query sweep via tools/degen_sweep.py recorded in
# COVERAGE.md; the pins below hold the time-bucketing family oracle-identical
# on the corpus.


@pytest.fixture(scope="module")
def pre_epoch_dir(tmp_path_factory):
    import duckdb

    from gpu_telemetry_lakehouse_spark.catalog import TABLES

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("pre_epoch")
    shift = {
        "events": "* REPLACE (ts - INTERVAL 60 YEAR AS ts)",
        "orders": "* REPLACE (o_orderdate - INTERVAL 60 YEAR AS o_orderdate)",
        "lineitem": "* REPLACE (l_shipdate - INTERVAL 60 YEAR AS l_shipdate)",
    }
    con = duckdb.connect()
    for t in TABLES:
        sel = shift.get(t, "*")
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "time_bucket_rollup_15m",
        "events_hourly_window",
        "gapfill_hourly_linear",
        "twap_user_daily",
        "weekday_seasonality",
        "datetime_features_orders",
        "ewma_daily_value",
        "freshness_lag_report",
        "sql_cte_daily",
        "gold_daily_util",
        "event_gap_detection",
        "funnel_conversion_stats",
        "business_day_latency",
        "peak_concurrent_orders",
    ],
)
def test_pre_epoch_time_family_matches_oracle(spark, pre_epoch_dir, name):
    compare(spark, name, pre_epoch_dir)
