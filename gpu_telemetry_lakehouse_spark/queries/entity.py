"""Entity resolution / record linkage: fingerprint clustering, blocked
fuzzy matching, and survivorship.

Deduplicating ENTITIES (merchants, users, organizations) is different from
deduplicating documents: the same real-world entity arrives as many dirty
spellings — casing, punctuation, token order, duplicated words, typos — and
the pipeline must (1) collapse trivially-equivalent spellings with a
normalization key, (2) recover typo'd records with a bounded fuzzy match,
and (3) elect one golden record per cluster. The classic scale recipe is
fingerprinting (OpenRefine key collision) for stage 1 and BLOCKING +
verify for stage 2 — never an all-pairs comparison.

The ``customer`` table carries no dirty-name column, so each query derives
TWO deterministic dirty spellings per customer (the SAME expression in
Spark and the DuckDB oracle, the web.py synthetic-URL pattern), with noise
spanning exactly the four classes above: case flips, moved punctuation,
duplicated tokens, and a deletion typo (``stor`` for ``store``) on a
deterministic subset. The generative truth (mktsegment, custkey mod 250) is
known, so cluster PURITY is measurable, not assumed.

Scale shape: fingerprinting is row-local string work (lower / regex strip /
split / distinct / sort / join — all inside whole-stage codegen, no UDFs)
plus ONE groupBy on the key; the fuzzy stage joins only within blocks (the
numeric token), so candidate pairs are bounded by block size, and the
levenshtein verify runs on the collided candidates only. At 100 TB the
block key would compose more fields (sorted-neighborhood windows, phonetic
codes); the plan shape — derive key, equi-join, verify — is unchanged.

Reference scope: the reference (467 LoC pandas medallion over GPU telemetry)
has no entity layer; this is §2.2 extension surface for the training-data
pipeline (user/merchant table consolidation before feature joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# --- deterministic dirty records (same logic, both engines) ------------------
# Record A (rid = 2k):   [UPPER|lower](segment) [,] Store #<k%250>
# Record B (rid = 2k+1): [store|stor(k%7=0)] <k%250>  lower(segment) [ STORE]
# The fingerprint (lower, strip punctuation, split, DISTINCT, sort, join)
# collapses A and clean B onto one key; the 'stor' typo records survive to
# stage 2, where the digit-token block + levenshtein<=2 recovers them.

_RECORDS_SQL = """
    SELECT c_custkey * 2 AS rid,
           c_custkey AS k,
           lower(c_mktsegment) || '#' || CAST(c_custkey % 250 AS VARCHAR)
               AS entity_key,
           c_acctbal,
           (CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                 ELSE lower(c_mktsegment) END)
           || (CASE WHEN c_custkey % 3 = 0 THEN ', Store #' ELSE ' Store #' END)
           || CAST(c_custkey % 250 AS VARCHAR) AS name
    FROM customer
    UNION ALL
    SELECT c_custkey * 2 + 1,
           c_custkey,
           lower(c_mktsegment) || '#' || CAST(c_custkey % 250 AS VARCHAR),
           c_acctbal,
           (CASE WHEN c_custkey % 7 = 0 THEN 'stor ' ELSE 'store ' END)
           || CAST(c_custkey % 250 AS VARCHAR) || '  ' || lower(c_mktsegment)
           || (CASE WHEN c_custkey % 5 = 0 THEN ' STORE' ELSE '' END)
    FROM customer
"""

_FP_SQL = """
    array_to_string(list_sort(list_distinct(string_split_regex(trim(
        regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')), ' +'))), ' ')
"""

# Prefix-blocking key: 4-char prefix of every sorted fingerprint token.
# Suffix typos ('stor' for 'store') keep their block; keys compose ALL
# tokens, so block population is the true entity's dirty spellings plus
# prefix-collisions only — block size tracks entity duplication, not corpus
# size, which is what keeps sum(block^2) linear at 100 TB.
_BLK_SQL = """
    array_to_string(list_transform(list_sort(list_distinct(string_split_regex(
        trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')), ' +'))),
        x -> substr(x, 1, 4)), ' ')
"""


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    n = (k % 250).cast("string")
    entity = F.concat(F.lower("c_mktsegment"), F.lit("#"), n)
    seg_a = F.when(k % 2 == 0, F.upper("c_mktsegment")).otherwise(
        F.lower("c_mktsegment")
    )
    name_a = F.concat(
        seg_a,
        F.when(k % 3 == 0, F.lit(", Store #")).otherwise(F.lit(" Store #")),
        n,
    )
    name_b = F.concat(
        F.when(k % 7 == 0, F.lit("stor ")).otherwise(F.lit("store ")),
        n,
        F.lit("  "),
        F.lower("c_mktsegment"),
        F.when(k % 5 == 0, F.lit(" STORE")).otherwise(F.lit("")),
    )
    a = c.select(
        (k * 2).alias("rid"),
        entity.alias("entity_key"),
        F.col("c_acctbal"),
        name_a.alias("name"),
    )
    b = c.select(
        (k * 2 + 1).alias("rid"),
        entity.alias("entity_key"),
        F.col("c_acctbal"),
        name_b.alias("name"),
    )
    return a.unionAll(b)


def _fp_tokens(name: F.Column) -> F.Column:
    clean = F.trim(F.regexp_replace(F.lower(name), r"[^a-z0-9]+", " "))
    return F.array_sort(F.array_distinct(F.split(clean, " +")))


def _fingerprint(name: F.Column) -> F.Column:
    return F.array_join(_fp_tokens(name), " ")


def _block_key(name: F.Column) -> F.Column:
    return F.array_join(
        F.transform(_fp_tokens(name), lambda t: F.substring(t, 1, 4)), " "
    )


@query(
    "er_fingerprint_entities",
    oracle=f"""
    WITH records AS ({_RECORDS_SQL}),
    keyed AS (
        SELECT rid, entity_key,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
               ({_FP_SQL}) AS fp
        FROM records
    ),
    clusters AS (
        SELECT fp, COUNT(*) AS sz, MIN(rid) AS survivor,
               COUNT(DISTINCT entity_key) AS n_entities,
               MAX(bal_cents) AS golden_cents
        FROM keyed GROUP BY fp
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN n_entities > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mixed,
           CAST(SUM(survivor) AS BIGINT) AS sum_survivor_ids,
           CAST(SUM(golden_cents) AS BIGINT) AS golden_balance_cents
    FROM clusters GROUP BY sz ORDER BY cluster_size
    """,
)
def er_fingerprint_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-key entity clustering with survivorship + purity audit.

    OpenRefine-style key collision: lowercase, strip punctuation, tokenize,
    DISTINCT (collapses duplicated words), sort (collapses token order),
    rejoin. Records sharing the key are one cluster; the golden record takes
    min(rid) identity and max balance (in exact cents, staged to longs
    BEFORE the max so no double aggregation crosses partitions). ``n_mixed``
    counts clusters spanning >1 generative entity — 0 by construction here,
    and the hash-matched 0 is the precision guarantee, not an assumption.
    One shuffle on the key + a tiny rollup on cluster size.
    """
    keyed = _records(spark, sf_dir).select(
        "rid",
        "entity_key",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("bal_cents"),
        _fingerprint(F.col("name")).alias("fp"),
    )
    clusters = keyed.groupBy("fp").agg(
        F.count(F.lit(1)).alias("sz"),
        F.min("rid").alias("survivor"),
        F.countDistinct("entity_key").alias("n_entities"),
        F.max("bal_cents").alias("golden_cents"),
    )
    return (
        clusters.groupBy(F.col("sz").cast("long").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_records"),
            F.sum(F.when(F.col("n_entities") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_mixed"),
            F.sum("survivor").cast("long").alias("sum_survivor_ids"),
            F.sum("golden_cents").cast("long").alias("golden_balance_cents"),
        )
        .orderBy("cluster_size")
    )


@query(
    "er_blocked_match_pairs",
    oracle=f"""
    WITH records AS ({_RECORDS_SQL}),
    blocked AS (
        SELECT rid, ({_FP_SQL}) AS fp, ({_BLK_SQL}) AS blk FROM records
    ),
    pairs AS (
        SELECT a.blk, a.rid AS a_rid, b.rid AS b_rid,
               levenshtein(a.fp, b.fp) AS lev
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.rid < b.rid AND a.fp <> b.fp
    )
    SELECT CAST(lev AS BIGINT) AS lev,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT blk) AS BIGINT) AS n_blocks,
           CAST(SUM(a_rid + b_rid) AS BIGINT) AS sum_pair_ids,
           CAST(MAX(CASE WHEN lev <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS matched
    FROM pairs GROUP BY lev ORDER BY lev
    """,
)
def er_blocked_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking + levenshtein verify: the fuzzy stage fingerprinting misses.

    Records whose fingerprints differ (the ``stor`` deletion typos, and
    duplicated-token variants of them) meet ONLY inside a block — the
    4-char-prefix key of every sorted fingerprint token, an equi-join key —
    and each candidate pair pays one levenshtein verify. Prefix blocking is
    the point: suffix typos keep their block ('stor'/'store' share a
    prefix), while records of different entities get different keys, so
    block size tracks an entity's duplication count, not corpus size
    (sum(block^2) stays linear at 100 TB where a digit-only key would grow
    blocks with the data). The report groups pairs by edit distance with
    membership pinned via ``sum_pair_ids``.
    """
    blocked = _records(spark, sf_dir).select(
        "rid",
        _fingerprint(F.col("name")).alias("fp"),
        _block_key(F.col("name")).alias("blk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.rid") < F.col("b.rid"))
        & (F.col("a.fp") != F.col("b.fp")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.col("a.rid").alias("a_rid"),
        F.col("b.rid").alias("b_rid"),
        F.levenshtein(F.col("a.fp"), F.col("b.fp")).alias("lev"),
    )
    return (
        pairs.groupBy(F.col("lev").cast("long").alias("lev"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("blk").cast("long").alias("n_blocks"),
            F.sum(F.col("a_rid") + F.col("b_rid"))
            .cast("long")
            .alias("sum_pair_ids"),
            F.max(F.when(F.col("lev") <= 2, 1).otherwise(0))
            .cast("long")
            .alias("matched"),
        )
        .orderBy("lev")
    )


# --- SymSpell deletion-neighborhood fuzzy matching ---------------------------
# Candidate generation for edit-distance-1 lookup WITHOUT enumerating edits:
# both sides emit {term} plus every 1-deletion of it (O(length) keys/term —
# vs 26*length+length substitution/insertion enumeration), equal keys mean
# edit distance <= 2 in a deletion/deletion, deletion/match or match/deletion
# configuration, and one levenshtein verify per DISTINCT candidate pair
# confirms. Garbe's SymSpell is the production spell-correction index; the
# same shape serves fuzzy entity lookup against a clean vocabulary.

_VOCAB_SQL = "SELECT c_custkey AS k, lower(c_name) AS term FROM customer"

# Query terms: every third customer's name with ONE digit deleted at a
# k-derived position (11 + k%8 lands inside the numeric tail) — a
# deterministic typo the index must recover.
_QTERMS_SQL = """
    SELECT c_custkey AS qk,
           substr(lower(c_name), 1, CAST(11 + c_custkey % 8 AS INT) - 1)
           || substr(lower(c_name), CAST(11 + c_custkey % 8 AS INT) + 1,
                     length(c_name)) AS qterm
    FROM customer WHERE c_custkey % 3 = 0
"""

_DEL_KEYS = """
    CASE WHEN i = 0 THEN {t}
         ELSE substr({t}, 1, CAST(i AS INT) - 1)
              || substr({t}, CAST(i AS INT) + 1, length({t})) END
"""


def deletion_neighborhood(df: DataFrame, t: str) -> DataFrame:
    """Explode column ``t`` to its SymSpell key set: the term itself plus
    every 1-deletion (O(length) keys per term). Property-tested to surface
    EVERY edit-distance-1 pair through an equi-join on ``key``
    (tests/test_properties.py)."""
    return df.select(
        "*",
        F.explode(
            F.expr(
                f"transform(sequence(0, length({t})), i -> "
                f"CASE WHEN i = 0 THEN {t} "
                f"ELSE substring({t}, 1, CAST(i AS INT) - 1) || "
                f"substring({t}, CAST(i AS INT) + 1, length({t})) END)"
            )
        ).alias("key"),
    )


@query(
    "symspell_match_terms",
    oracle=f"""
    WITH vocab AS ({_VOCAB_SQL}),
    qterms AS ({_QTERMS_SQL}),
    ikeys AS (
        SELECT k, term, ({_DEL_KEYS.format(t="term")}) AS key
        FROM vocab, unnest(generate_series(0, length(term))) AS u(i)
    ),
    qkeys AS (
        SELECT qk, qterm, ({_DEL_KEYS.format(t="qterm")}) AS key
        FROM qterms, unnest(generate_series(0, length(qterm))) AS u(i)
    ),
    cand AS (
        SELECT DISTINCT i.k, i.term, q.qk, q.qterm
        FROM ikeys i JOIN qkeys q ON i.key = q.key
    ),
    verified AS (
        SELECT k, qk, levenshtein(term, qterm) AS lev FROM cand
    )
    SELECT CAST(lev AS BIGINT) AS lev,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT qk) AS BIGINT) AS n_query_terms,
           CAST(SUM(CASE WHEN k = qk THEN 1 ELSE 0 END) AS BIGINT)
               AS n_self_recovered,
           CAST(SUM(k + qk) AS BIGINT) AS sum_pair_keys
    FROM verified GROUP BY lev ORDER BY lev
    """,
)
def symspell_match_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell fuzzy lookup: deletion-neighborhood keys + levenshtein verify.

    Index side emits each vocabulary term plus its 1-deletions; typo'd query
    terms emit theirs; an equi-join on the shared key surfaces every
    edit-1 pair (and some edit-2, e.g. two names differing in one digit —
    both delete it onto the same key) with NO quadratic comparison and no
    26x substitution enumeration. One levenshtein per DISTINCT candidate
    pair verifies; the report buckets pairs by true distance and pins
    membership (``sum_pair_keys``) plus the recall anchor: every query term
    recovers its own source name at lev=1 (``n_self_recovered``). Keys per
    term are O(term length), so index size is linear in corpus size and the
    join stays an equi-join at 100 TB — the complement to the q-gram
    count-filter join (`editdist_join_partnames`), which prunes pairs, vs
    SymSpell, which never forms them.
    """
    c = load_table(spark, sf_dir, "customer")
    vocab = c.select(
        F.col("c_custkey").alias("k"), F.lower("c_name").alias("term")
    )
    pos = (F.lit(11) + F.col("c_custkey") % 8).cast("int")
    lterm = F.lower("c_name")
    qterms = c.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("qk"),
        F.concat(
            F.substring(lterm, F.lit(1), pos - 1),
            lterm.substr(pos + 1, F.length(lterm)),
        ).alias("qterm"),
    )

    ikeys = deletion_neighborhood(vocab, "term")
    qkeys = deletion_neighborhood(qterms, "qterm")
    cand = (
        ikeys.join(qkeys, "key")
        .select("k", "term", "qk", "qterm")
        .distinct()
    )
    verified = cand.select(
        "k", "qk", F.levenshtein("term", "qterm").alias("lev")
    )
    return (
        verified.groupBy(F.col("lev").cast("long").alias("lev"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("qk").cast("long").alias("n_query_terms"),
            F.sum(F.when(F.col("k") == F.col("qk"), 1).otherwise(0))
            .cast("long")
            .alias("n_self_recovered"),
            F.sum(F.col("k") + F.col("qk")).cast("long").alias("sum_pair_keys"),
        )
        .orderBy("lev")
    )


# --- full resolution: pairs -> transitive closure -> resolved entities --------
# Stages 1+2 produce same-entity evidence (key collisions, fuzzy matches);
# RESOLUTION is their transitive closure — A~B (same fingerprint) and B~C
# (typo match) put A and C in one entity even though no stage compared them
# directly. Fingerprint clusters enter as STAR edges (each record -> its
# cluster's min rid): same closure as all-pairs edges, O(records) not
# O(cluster²).


@query(
    "er_resolved_clusters",
    oracle=f"""
    WITH RECURSIVE records AS ({_RECORDS_SQL}),
    keyed AS (
        SELECT rid, entity_key, ({_FP_SQL}) AS fp, ({_BLK_SQL}) AS blk
        FROM records
    ),
    fpm AS (SELECT fp, MIN(rid) AS m FROM keyed GROUP BY fp),
    star AS (
        SELECT f.m AS id_a, k.rid AS id_b
        FROM keyed k JOIN fpm f ON k.fp = f.fp WHERE k.rid <> f.m
    ),
    fuzzy AS (
        SELECT a.rid AS id_a, b.rid AS id_b
        FROM keyed a JOIN keyed b
          ON a.blk = b.blk AND a.rid < b.rid AND a.fp <> b.fp
        WHERE levenshtein(a.fp, b.fp) <= 2
    ),
    pairs AS (SELECT * FROM star UNION SELECT * FROM fuzzy),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    cc AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node),
    resolved AS (
        SELECT k.rid, k.entity_key, COALESCE(cc.lbl, k.rid) AS component
        FROM keyed k LEFT JOIN cc ON cc.node = k.rid
    ),
    clusters AS (
        SELECT component, COUNT(*) AS sz,
               COUNT(DISTINCT entity_key) AS n_entities
        FROM resolved GROUP BY component
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN n_entities > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mixed,
           CAST(SUM(component) AS BIGINT) AS sum_cluster_ids
    FROM clusters GROUP BY sz ORDER BY cluster_size
    """,
)
def er_resolved_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolved entities: closure of fingerprint + fuzzy evidence.

    Distributed min-label propagation (`operators/dedup.py::
    connected_components`) over star edges (record -> fingerprint-cluster
    survivor) unioned with the blocked levenshtein<=2 matches; the oracle
    replays the identical fixpoint as a recursive CTE, so the hash match
    certifies the closure, not just the pair lists. The typo'd records
    that stage 1 isolates (their own fingerprint) land in their entity's
    cluster here — and purity stays measurable: ``n_mixed`` counts
    components mixing generative entities (0 by construction, PROVEN by
    the match). Edge volume is O(records + fuzzy pairs); propagation
    rounds are O(log diameter) and the evidence graph's diameter is small
    by construction (stars joined by verified pairs)."""
    from ..operators import dedup as DD

    keyed = (
        _records(spark, sf_dir)
        .select(
            "rid",
            "entity_key",
            _fingerprint(F.col("name")).alias("fp"),
            _block_key(F.col("name")).alias("blk"),
        )
        # four consumers (fpm/star/fuzzy both sides/resolved) otherwise each
        # re-run the record synthesis + fingerprint string pipeline; the
        # keyed frame is four narrow columns — checkpoint once (r9)
        .localCheckpoint(eager=False)
    )
    fpm = keyed.groupBy("fp").agg(F.min("rid").alias("m"))
    star = (
        keyed.join(fpm, "fp")
        .where(F.col("rid") != F.col("m"))
        .select(F.col("m").alias("id_a"), F.col("rid").alias("id_b"))
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    fuzzy = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.rid") < F.col("b.rid"))
            & (F.col("a.fp") != F.col("b.fp")),
        )
        .where(F.levenshtein(F.col("a.fp"), F.col("b.fp")) <= 2)
        .select(F.col("a.rid").alias("id_a"), F.col("b.rid").alias("id_b"))
    )
    pairs = star.unionAll(fuzzy).distinct()
    cc = DD.connected_components(pairs)
    resolved = keyed.join(cc, keyed.rid == cc.node, "left").select(
        "rid",
        "entity_key",
        F.coalesce(F.col("lbl"), F.col("rid")).alias("component"),
    )
    clusters = resolved.groupBy("component").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("entity_key").alias("n_entities"),
    )
    return (
        clusters.groupBy(F.col("sz").cast("long").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_records"),
            F.sum(F.when(F.col("n_entities") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_mixed"),
            F.sum("component").cast("long").alias("sum_cluster_ids"),
        )
        .orderBy("cluster_size")
    )
