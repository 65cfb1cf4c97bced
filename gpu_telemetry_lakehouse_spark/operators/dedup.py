"""Deduplication operators: exact, shingle-Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB):
- Signatures (MinHash/SimHash/fingerprints) are row-local map-side work —
  no shuffle until the candidate join.
- Candidate generation shuffles on short hash keys (shingle, LSH band bucket),
  never on document text, so exchange payloads stay small.
- Verification (exact Jaccard / signature agreement) runs only on candidate
  pairs, which LSH keeps near-linear in the number of true duplicates.

All hashes are md5-derived so every stage has a DuckDB-oracle twin.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_int, tokens
from .text import shingles


def exact_dedup_keep_first(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Deterministic exact dedup: keep the first row per key under a total
    order (dropDuplicates keeps an arbitrary row — not reproducible)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# Universal-hash permutation family for MinHash: h_i(x) = (a_i*x + b_i) mod P.
# P is the Mersenne prime 2^31-1 so a_i*x stays under 2^63 (no overflow, and
# int64 arithmetic agrees bit-for-bit between Spark and the DuckDB oracle).
MINHASH_P = 2147483647


def perm_consts(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) multiplier/offset pairs, shared with the
    oracle-SQL generator in queries/dedup.py."""
    return [
        (((2654435761 * (i + 1)) % MINHASH_P) or 1, (40503 * (i + 1) + 12345) % MINHASH_P)
        for i in range(k)
    ]


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return df.withColumn("__shingles", shingles(tokens(F.col(text_col)), n))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """k-permutation MinHash over word 3-shingles.

    Each shingle is md5-hashed ONCE into a base value x; the k permutations
    are cheap integer maps (a_i*x+b_i) mod P of that base — not k separate
    string hashes. Shingles explode to rows and the k mins aggregate with
    map-side partial aggregation, so the shuffle payload is k longs per doc
    regardless of document length (scales to 100 TB of text).

    Docs with < 3 tokens keep a NULL-signature row via the [NULL] fallback
    before explode (min over all-NULL is NULL on both engines).
    """
    sh = with_shingles(df, text_col)
    exploded = sh.select(
        id_col,
        F.explode(
            F.when(F.size("__shingles") > 0, F.col("__shingles")).otherwise(
                F.array(F.lit(None).cast("string"))
            )
        ).alias("__s"),
    )
    base = exploded.select(id_col, (md5_int(F.col("__s")) % MINHASH_P).alias("__x"))
    aggs = [
        F.min((F.lit(a) * F.col("__x") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(perm_consts(k))
    ]
    return base.groupBy(id_col).agg(*aggs)


def _banded(sigs: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """Explode a signature frame into one row per (doc, band) keyed by the
    band's raw h-components (no re-hashing needed)."""
    rows = k // bands
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"h{b * rows + j}").alias(f"k{j}") for j in range(rows)
        ]
        band_cols.append(F.struct(F.lit(b).alias("band"), *parts))
    return sigs.select(
        F.col(id_col), *[F.col(f"h{i}") for i in range(k)], F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, *[f"h{i}" for i in range(k)], "bk.band", *[f"bk.k{j}" for j in range(rows)])


def minhash_lsh_pairs(sigs: DataFrame, id_col: str = "doc_id", k: int = 8, bands: int = 4) -> DataFrame:
    """LSH banding: equi-join on each band's raw signature components (the
    band key is the tuple of h-values itself — no re-hashing needed), then
    estimate Jaccard as the fraction of agreeing components.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b."""
    rows = k // bands
    buckets = _banded(sigs, id_col, k, bands)

    a, b = buckets.alias("a"), buckets.alias("b")
    key_eq = (F.col("a.band") == F.col("b.band")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for j in range(rows):
        key_eq = key_eq & (F.col(f"a.k{j}") == F.col(f"b.k{j}"))
    cand = (
        a.join(b, key_eq)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.h{i}").alias(f"ah{i}") for i in range(k)],
            *[F.col(f"b.h{i}").alias(f"bh{i}") for i in range(k)],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = functools.reduce(
        _op.add,
        [F.when(F.col(f"ah{i}") == F.col(f"bh{i}"), 1).otherwise(0) for i in range(k)],
    )
    return cand.select(
        "id_a", "id_b", F.round(agree / F.lit(float(k)), 6).alias("est_jaccard")
    )


def minhash_lsh_pairs_incremental(
    all_sigs: DataFrame,
    new_sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Delta-priced LSH candidate generation: pairs that involve at least
    one NEW document, against the FULL signature corpus.

    The band join probes the whole corpus with only the delta — cost is
    O(|delta| x bucket-collision fan-out), not O(|corpus|^2): the arriving
    batch is the stream side, the standing signature table the build side
    (at 100 TB: bucket-partitioned once, re-probed per batch). Because
    every unordered pair {a, b} involves exactly one LATER-arriving member,
    the per-batch incremental pair sets PARTITION the full-recompute pair
    set — the union over batches equals ``minhash_lsh_pairs`` on the whole
    corpus exactly (pinned in tests/test_kernel_properties.py). Same
    (id_a, id_b, est_jaccard) contract, id_a < id_b.
    """
    rows = k // bands
    a = _banded(all_sigs, id_col, k, bands).alias("a")
    b = _banded(new_sigs, id_col, k, bands).alias("b")
    key_eq = (F.col("a.band") == F.col("b.band")) & (
        F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    )
    for j in range(rows):
        key_eq = key_eq & (F.col(f"a.k{j}") == F.col(f"b.k{j}"))
    cand = (
        a.join(b, key_eq)
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            *[
                F.when(
                    F.col(f"a.{id_col}") < F.col(f"b.{id_col}"), F.col(f"a.h{i}")
                ).otherwise(F.col(f"b.h{i}")).alias(f"ah{i}")
                for i in range(k)
            ],
            *[
                F.when(
                    F.col(f"a.{id_col}") < F.col(f"b.{id_col}"), F.col(f"b.h{i}")
                ).otherwise(F.col(f"a.h{i}")).alias(f"bh{i}")
                for i in range(k)
            ],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = functools.reduce(
        _op.add,
        [F.when(F.col(f"ah{i}") == F.col(f"bh{i}"), 1).otherwise(0) for i in range(k)],
    )
    return cand.select(
        "id_a", "id_b", F.round(agree / F.lit(float(k)), 6).alias("est_jaccard")
    )


def minhash_maintain(
    spark,
    sig_table: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    batch_id: int | None = None,
) -> DataFrame:
    """Standing-dedup maintenance over a tablog signature table: sign the
    arriving batch, emit the incremental candidate pairs it creates against
    everything already signed, then append the new signatures atomically.

    This is how near-dup detection stays online at ingest time — each batch
    pays only its own delta join instead of a corpus-wide recompute; the
    signature table (k longs per doc) is the only standing state. Returns
    the batch's (id_a, id_b, est_jaccard) pairs (already-computed frames:
    the append happens before return so a crash between emit and append
    cannot under-report on replay. Pass the foreachBatch epoch as
    ``batch_id`` for exactly-once appends: a replayed epoch skips the
    ledger-committed append and re-emits the SAME pair set — the delta join
    against a table already containing the batch yields identical pairs).
    """
    from .. import tablog as T

    new_sigs = minhash_signatures(new_docs, text_col=text_col, id_col=id_col, k=k)
    if T.current_version(sig_table) is None:
        T.create_table(new_sigs, sig_table)
        prior = None
    else:
        prior = T.read(spark, sig_table)
        T.append(new_sigs, sig_table, batch_id=batch_id)
    all_sigs = T.read(spark, sig_table).dropDuplicates([id_col])
    if prior is None:
        return minhash_lsh_pairs(all_sigs, id_col=id_col, k=k, bands=bands)
    return minhash_lsh_pairs_incremental(
        all_sigs, new_sigs, id_col=id_col, k=k, bands=bands
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram-Jaccard near-dup pairs: explode distinct shingles, candidate
    pairs via the inverted shingle index, Jaccard from intersection counts.

    The index joins on a 60-bit md5 of the shingle, not the shingle string:
    the shuffle moves 8-byte keys instead of n-gram text, and the join
    compares longs. (Hash collisions would fold two shingles together, but
    at 2^-60 per pair that is a measurement-noise risk, and the oracle SQL
    applies the identical hash so the differential check stays exact.)

    Single-pass design: the per-doc distinct-shingle COUNT rides along with
    every exploded row and through the posting lists, so the union sizes for
    Jaccard need no separate aggregation and no join-back — the text is
    tokenized+hashed exactly once, and the whole operator is two exchanges
    (posting-list groupBy, pair groupBy).

    ``max_df`` is the web-scale stop-list: a shingle appearing in m docs
    emits m(m-1)/2 pairs, so boilerplate n-grams ("terms of service")
    dominate the pair explosion quadratically while carrying no dedup
    signal. Dropping posting lists longer than ``max_df`` bounds every
    list's pair fan-out at max_df²/2 — the standard df-cap from web-dedup
    practice. Intersections then undercount by at most the dropped
    shingles, so the reported Jaccard is a lower bound; per-doc union
    sizes stay uncapped (computed before the filter). None = exact."""
    arr = F.array_distinct(F.transform(shingles(tokens(F.col(text_col)), 3), md5_int))
    sh = df.select(F.col(id_col), arr.alias("__arr")).select(
        id_col, F.size("__arr").alias("n"), F.explode("__arr").alias("s")
    )
    # Posting-list pair generation: ONE shuffle of the (8-byte key, id, n)
    # index builds per-shingle id lists sorted by id (struct sort orders on
    # the first field, and ids are unique) => id_a < id_b for free. A
    # self-join would shuffle the index twice and probe a hash table per
    # row. At web scale, cap/stop-list high-df shingles first — a shingle
    # shared by m docs emits m(m-1)/2 pair rows either way.
    posts = (
        sh.groupBy("s")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("n")))
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
    )
    if max_df is not None:
        posts = posts.filter(F.size("ids") <= max_df)
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["n"].alias("na"),
                    y["n"].alias("nb"),
                ),
            ),
        )
    )
    return (
        posts.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.col("p.na").alias("na"),
            F.col("p.nb").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash over distinct word tokens: per bit, sum ±1 weighted by the
    token hash's bit value; the sign vector packs into an integer."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    ).withColumn("h", md5_int(F.col("tok")))
    contrib = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"c{i}")
            for i in range(bits)
        ]
    )
    packed = functools.reduce(
        _op.add,
        [
            F.when(F.col(f"c{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
            for i in range(bits)
        ],
    )
    return contrib.select(F.col(id_col), packed.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two packed hash columns via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the (undirected) near-dup pair graph:
    ``(node, component)`` where component = min node id reachable — which
    makes the component id itself the canonical "keep this one" document.

    Pair lists are only half the dedup story; training pipelines must drop
    ALL-BUT-ONE of each duplicate *cluster*, and clusters are the transitive
    closure of pairs (A~B, B~C => drop two of {A,B,C} even if A~C was never
    emitted).

    Distributed min-label propagation: each iteration ships every node's
    current label to its neighbors (one shuffle join on the symmetrized edge
    list) and keeps the minimum. Converges in O(cluster diameter) rounds —
    near-dup clusters are shallow (stars/cliques around a common template),
    so a handful of rounds suffices where the O(log n) large-star/small-star
    alternative would pay more per round. Scale guards: the edge list is
    hash-partitioned once and checkpoint-pinned so every round reuses the
    same co-location; labels are localCheckpoint'ed per round to truncate
    the iterative lineage (no exponential plan growth); convergence is
    detected with a LIMIT 1 anti-probe, not a full count.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.repartition("a").localCheckpoint()
    labels = (
        e.select(F.col("a").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        cand = e.join(labels, e.a == labels.node).select(
            F.col("b").alias("node"), F.col("lbl")
        )
        new_labels = (
            labels.union(cand).groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    deep-graph complement to ``connected_components``: min-label
    propagation needs O(component diameter) rounds (fine for shallow
    near-dup clusters, ruinous for chains), star contraction converges in
    O(log n) rounds on ANY topology because both operations repeatedly
    re-hang nodes under the component minimum.

    large-star: per node u, hang every LARGER neighbor under
    m = min(N(u) + {u}). small-star: hang u and every smaller-or-equal
    neighbor under m. Each round is two grouped aggregations + flatMaps on
    the edge list (no joins); lineage is truncated per round and
    convergence is an edge-set equality probe. Returns (node, component)
    with component = min node id, same contract as connected_components."""
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # node universe from the RAW edges: a self-loop-only node has no
    # non-loop edge but is still a (singleton) component
    e = raw.filter(F.col("u") != F.col("v"))

    def _sym(df: DataFrame) -> DataFrame:
        return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def large_star(df: DataFrame) -> DataFrame:
        g = _sym(df).groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        m = F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("u"))))
        return (
            g.select("u", m.alias("m"), F.explode("nbrs").alias("v"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(df: DataFrame) -> DataFrame:
        # orient edges high->low so each u groups its smaller neighbors
        o = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        g = o.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        m = F.array_min(F.col("nbrs"))
        return (
            g.select("u", m.alias("m"), F.explode("nbrs").alias("v"))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                        F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                    )
                ).alias("p")
            )
            .select(F.col("p.a").alias("u"), F.col("p.b").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    cur = e.localCheckpoint()
    for _ in range(max_iter):
        nxt = small_star(large_star(cur)).localCheckpoint()
        same = (
            nxt.exceptAll(cur).limit(1).count() == 0
            and cur.exceptAll(nxt).limit(1).count() == 0
        )
        cur = nxt
        if same:
            break
    nodes = _sym(raw).select(F.col("u").alias("node")).distinct()
    labels = cur.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("lbl", F.col("node")).alias("lbl"))
        .groupBy("node")
        .agg(F.min("lbl").alias("lbl"))
    )


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_df: int | None = 1000,
) -> tuple[DataFrame, DataFrame]:
    """The full training-data cleaning pipeline as one composable operator:

    1. **exact** — byte-identical texts collapse to the first id (hash
       groupBy; only (hash, id) pairs shuffle);
    2. **candidates** — MinHash over shingles, LSH band equi-join (the
       O(n²) pair space never materializes; recall is the banding
       collision probability — raise k/bands for stricter recall);
    3. **verify** — exact shingle-Jaccard ≥ ``jaccard_threshold`` computed
       PER CANDIDATE PAIR (shingle sets joined onto the pair list; cost is
       O(|candidates|), never a corpus-wide pair generation);
    4. **cluster** — transitive closure of verified pairs (min-label
       propagation), component id = canonical survivor;
    5. **keep** — drop every non-canonical member.

    Returns ``(clean_docs, report)`` where ``report`` is a 1-row DataFrame
    of stage counts (docs in/out, exact dups, candidate/verified pairs,
    cluster members dropped) — the observability row a production run logs.

    Scale shape: every stage is a hash shuffle of ids/hashes/signatures
    (the only stages touching text are the one exact-dedup hash pass and
    the per-candidate shingle-set join, both O(corpus) / O(candidates));
    clustering touches only documents that appear in a verified pair —
    at web scale that is a small fraction of the corpus. Intermediate
    frames are localCheckpoint-pinned so the report counts don't re-run
    the upstream joins. ``max_df`` is accepted for signature parity with
    ``shingle_jaccard_pairs`` but unused here (no posting-list stage).
    """
    del max_df  # no inverted-index stage: verification is per-candidate
    n_in = docs.count()

    # 1. exact: first id per identical text wins
    hashed = docs.select(
        F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("__h")
    )
    keep_exact = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    exact_docs = hashed.join(keep_exact, ["__h", id_col]).drop("__h").localCheckpoint()
    n_exact = exact_docs.count()

    # 2. near-dup candidates via LSH banding only
    sigs = minhash_signatures(exact_docs, text_col=text_col, id_col=id_col, k=k)
    cand = minhash_lsh_pairs(sigs, id_col=id_col, k=k, bands=bands).localCheckpoint()
    n_cand = cand.count()

    # 3. exact Jaccard on the CANDIDATE pairs: join each side's distinct
    # shingle-hash set onto the pair, intersect/union row-locally.
    shset = exact_docs.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(shingles(tokens(F.col(text_col)), 3), md5_int)
        ).alias("__sh"),
    )
    a = shset.select(F.col(id_col).alias("ca"), F.col("__sh").alias("__sha"))
    b = shset.select(F.col(id_col).alias("cb"), F.col("__sh").alias("__shb"))
    jacc = F.size(F.array_intersect("__sha", "__shb")) / F.size(
        F.array_union("__sha", "__shb")
    )
    verified = (
        cand.select(F.col("id_a").alias("ca"), F.col("id_b").alias("cb"))
        .join(a, "ca")
        .join(b, "cb")
        .filter(jacc >= jaccard_threshold)
        .select("ca", "cb")
        .localCheckpoint()
    )
    n_ver = verified.count()

    # 4-5. clusters -> keep component minimum
    comp = connected_components(verified, src="ca", dst="cb")
    drop = comp.filter(F.col("node") != F.col("lbl")).select(
        F.col("node").alias(id_col)
    )
    clean = exact_docs.join(drop, id_col, "left_anti")
    n_out = clean.count()

    spark = docs.sparkSession
    report = spark.createDataFrame(
        [
            (
                n_in,
                n_in - n_exact,
                n_cand,
                n_ver,
                n_exact - n_out,
                n_out,
            )
        ],
        "n_docs_in long, n_exact_dups long, n_lsh_candidates long, "
        "n_verified_pairs long, n_neardup_dropped long, n_docs_out long",
    )
    return clean, report


def segment_boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 4,
    max_df: int = 2,
) -> DataFrame:
    """Repeated-segment (boilerplate) removal stats, CCNet/RefinedWeb-style
    paragraph dedup adapted to fixed token windows: chunk each document into
    ``seg_len``-token segments, hash each segment, count the corpus-wide
    document frequency per segment hash, and mark segments appearing in more
    than ``max_df`` documents as boilerplate. Returns the per-document
    retention report (segments/tokens total vs kept) that drives the actual
    strip pass.

    Scale shape: the df index shuffles (8-byte hash, doc_id) pairs — never
    segment text; the boilerplate set (df > max_df) is the quadratically
    repeated slice of the corpus and therefore orders of magnitude smaller
    than the segment universe, so the flag-back join broadcasts under AQE.
    Per-doc rollup is one hash aggregation on doc_id. Every exchange carries
    only (hash, id, count) triples — payload width is constant no matter how
    large the documents are.
    """
    # Segment structs WITHOUT F.slice inside the lambda: slice re-copies the
    # backing array per evaluation (O(tokens) per segment -> O(tokens^2) per
    # document; the r8 mega-doc corpus stalled a task 25+ minutes on one
    # 800k-token document, same defect class as decontam_span_report).
    # try_element_at is O(1) per access on a COLUMN-bound array (NULL past
    # the end, covering the partial tail segment exactly like slice did),
    # so each segment costs O(seg_len) and the document costs O(tokens).
    tk = F.col("__tk")
    n_seg = F.ceil(F.size(tk) / F.lit(float(seg_len))).cast("int")

    def _seg(i):
        elems = F.filter(
            F.array(
                *[F.try_element_at(tk, (i * seg_len + j + 1).cast("int")) for j in range(seg_len)]
            ),
            lambda x: x.isNotNull(),
        )
        return F.struct(
            md5_int(F.array_join(elems, " ")).alias("h"),
            F.size(elems).alias("c"),
        )

    seg_structs = F.transform(F.sequence(F.lit(0), n_seg - 1), _seg)
    segs = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk"))
        .select(F.col(id_col), F.explode(seg_structs).alias("g"))
        .select(id_col, F.col("g.h").alias("h"), F.col("g.c").alias("c"))
    )
    boiler = (
        segs.select(id_col, "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("h", F.lit(True).alias("is_boiler"))
    )
    flagged = segs.join(boiler, "h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_dropped"),
            F.sum("c").alias("toks_total"),
            F.sum(F.when(F.col("is_boiler"), 0).otherwise(F.col("c"))).alias(
                "toks_kept"
            ),
        )
        .withColumn(
            "keep_ratio", F.round(F.col("toks_kept") / F.col("toks_total"), 6)
        )
    )


def ngram_decontam(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    ``min_hits`` distinct word ``n``-grams with ANY benchmark document (the
    n-gram-collision test used to scrub eval sets out of pretraining data).

    Asymmetric by design — the benchmark side collapses to ONE distinct set
    of 8-byte n-gram hashes regardless of how many benchmark docs share a
    gram, so its size is bounded by the eval corpus (tiny next to 100 TB of
    training text) and the membership probe is a broadcast-able equi-join on
    longs. The training side tokenizes+hashes once, keeps per-doc distinct
    grams (a row-local array_distinct, no shuffle), and aggregates hit
    counts per doc in a single exchange.
    """
    def grams(d: DataFrame) -> DataFrame:
        arr = F.array_distinct(F.transform(shingles(tokens(F.col(text_col)), n), md5_int))
        return d.select(F.col(id_col), F.explode(arr).alias("g"))

    bench_set = grams(bench).select("g").distinct().withColumn("hit", F.lit(True))
    tg = grams(train)
    return (
        tg.join(bench_set, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hits"),
        )
        .withColumn(
            "contaminated", (F.col("n_hits") >= min_hits).cast("int")
        )
    )
