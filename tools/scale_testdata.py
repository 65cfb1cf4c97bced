#!/usr/bin/env python
"""Deterministically scale the driver's sf0.1 testdata up to sf1 (10x).

The driver ships read-only parquet at sf in {0.001, 0.01, 0.1} (TESTDATA.md);
BASELINE.md's per-query engine-ratio audit argues the mid-size composites'
Spark/DuckDB ratios "shrink with scale" from fixed-overhead amortization.
This tool turns that assertion into a measurement (VERDICT r7 #2) by
producing an sf1 tier (~6M lineitem rows) that BOTH engines then run
side-by-side (tools/bench_scale_trend.py).

Scale recipe — 10 deterministic replicas with key-stride remapping:

* Fact/dim tables (customer, supplier, part, orders, lineitem, events):
  replica i shifts every key column by ``i * stride`` where stride = the
  table's sf0.1 cardinality, preserving uniqueness, referential integrity
  (orders.o_custkey shifts in lockstep with customer.c_custkey, etc.), and
  every non-key column distribution EXACTLY (values are copied, so group
  cardinalities, date ranges, and null rates match the driver generator's
  own 10x-per-decade shape — including the ``% 250`` ER entity universe,
  whose per-entity duplication grows with sf in the driver's data too).
* Dimension display names that are pure functions of the key (``Customer#%09d``,
  ``Supplier#%09d``) are REGENERATED from the shifted key, so fingerprint/
  fuzzy-match entity structure scales like the real generator instead of
  producing 10-clone name groups (a quadratic artifact no real corpus has).
  ``p_name`` draws from a tiny adjective-noun vocabulary (64 distinct names
  at every sf), so replicas i>0 append a NATO word: distinct-name workload
  grows 10x while cross-replica names stay >2 edits apart (the
  editdist_join_partnames bound), mirroring vocabulary growth.
* documents: replica i>0 applies a seeded word permutation per doc
  (np.random.RandomState(doc_id + 1_000_003 * i)). Corpus volume grows 10x
  with the same unigram distribution, but replicas do not clone shingle
  sets — so near-dup/posting-list workloads grow linearly, as a naturally
  larger corpus would, instead of quadratically via synthetic 10-clone
  groups. n_chars is recomputed from the rebuilt text.
* embeddings: grow 4x (the driver's own sf0.01 -> sf0.1 ratio), replicas
  i>0 perturbed by +-1% seeded uniform noise per component so no exact
  duplicate vectors are minted.
* region/nation: fixed dimensions, copied as-is.

Everything is seeded — no wall-clock, no unseeded RNG — so two runs
produce byte-identical logical content.

The recipe COMPOSES decade over decade (VERDICT r8 #2): building from an
already-scaled tier just multiplies every key stride by the tier's decade
multiplier, so ``--src .scratch/sf1 --mult 10`` produces sf10 (~60M
lineitem rows, ~1.8 GB parquet) with the same referential-integrity and
distribution guarantees. Replica seeds scale with the decade multiplier
(i * mult), so second-decade shuffles are seeded disjointly from
first-decade ones; p_name suffixes draw from a DISJOINT per-decade
vocabulary so no cross-decade name groups are cloned (NATO_BY_DECADE).

Usage:  python tools/scale_testdata.py [DST_DIR] [--src DIR] [--mult N]
        (default: build .scratch/sf1 from /root/testdata/sf0.1, mult 1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
R = 10  # replicas for row tables (one decade)
R_EMB = 4  # embeddings grow 4x per decade in the driver's own data

# key cardinalities of the BASE sf0.1 tier; an already-scaled source tier
# multiplies these by its decade multiplier (sf1 -> mult 10, sf10 -> 100)
STRIDE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "user": 1_500,
    "documents": 5_000,
    "embeddings": 2_000,
}

# pairwise levenshtein >= 3 and length within +-2 of each other is NOT
# required — the editdist join prunes on |len diff| <= 2 AND lev <= 2, and
# every pair below differs by >2 edits from every other and from ''.
# Each decade uses a DISJOINT suffix vocabulary: reusing the first-decade
# list would make second-decade replica j=1 of base name "x" collide with
# first-decade replica i=1 ("x alpha" twice) — cloned name groups, the
# exact quadratic artifact the regeneration exists to avoid.
NATO_BY_DECADE = [
    ["", "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel", "india"],
    ["", "zulu", "yankee", "xray", "whiskey", "victor", "uniform", "tango", "sierra", "romeo"],
    ["", "juliett", "kilo", "lima", "mike", "november", "oscar", "papa", "quebec", "lambda"],
]


def _copy_sql(con: duckdb.DuckDBPyConnection, dst: str, table: str, sql: str) -> None:
    out = os.path.join(dst, f"{table}.parquet")
    con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"  {table:12s} {n:>10,} rows")


def build(dst: str, src_dir: str = SRC, mult: int = 1) -> None:
    """Scale ``src_dir`` (a tier whose keys span mult * STRIDE[t]) by one
    decade into ``dst``. mult=1 builds sf1 from the driver's sf0.1; mult=10
    builds sf10 from a previously-built sf1; and so on."""
    decade = len(str(mult)) - 1  # 1 -> 0, 10 -> 1, 100 -> 2
    assert mult == 10 ** decade, f"mult must be a power of 10, got {mult}"
    # HARD bound, not modulo (review r9): wrapping back to decade-0 words
    # would clone cross-decade name groups — the exact quadratic artifact
    # the per-decade-disjoint vocabulary exists to prevent — and nothing
    # downstream would fail loud about it. Extend NATO_BY_DECADE to go
    # further.
    assert decade < len(NATO_BY_DECADE), (
        f"decade {decade} exceeds the {len(NATO_BY_DECADE)} disjoint p_name "
        "vocabularies; extend NATO_BY_DECADE before scaling further"
    )
    nato = NATO_BY_DECADE[decade]
    emb_mult = R_EMB ** decade  # embeddings grow 4x per decade, not 10x
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count() or 8}")
    src = lambda t: f"'{src_dir}/{t}.parquet'"  # noqa: E731

    # fixed dims: verbatim copies
    for t in ("region", "nation"):
        _copy_sql(con, dst, t, f"SELECT * FROM {src(t)}")

    # sanity: the name columns really are pure functions of the key at i=0,
    # otherwise regenerating them would silently change replica-0 rows.
    bad = con.sql(
        f"SELECT count(*) FROM {src('customer')} "
        "WHERE c_name <> 'Customer#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0')"
    ).fetchone()[0]
    assert bad == 0, f"{bad} customer names are not Customer#%09d of the key"
    bad = con.sql(
        f"SELECT count(*) FROM {src('supplier')} "
        "WHERE s_name <> 'Supplier#' || lpad(CAST(s_suppkey AS VARCHAR), 9, '0')"
    ).fetchone()[0]
    assert bad == 0, f"{bad} supplier names are not Supplier#%09d of the key"

    rep = f"CROSS JOIN range({R}) t(i)"
    _copy_sql(
        con, dst, "customer",
        f"""SELECT c_custkey + i*{STRIDE['customer'] * mult} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + i*{STRIDE['customer'] * mult} AS VARCHAR), 9, '0') AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')} {rep}""",
    )
    _copy_sql(
        con, dst, "supplier",
        f"""SELECT s_suppkey + i*{STRIDE['supplier'] * mult} AS s_suppkey,
                   'Supplier#' || lpad(CAST(s_suppkey + i*{STRIDE['supplier'] * mult} AS VARCHAR), 9, '0') AS s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')} {rep}""",
    )
    nato_list = "[" + ", ".join(f"'{w}'" for w in nato) + "]"
    _copy_sql(
        con, dst, "part",
        f"""SELECT p_partkey + i*{STRIDE['part'] * mult} AS p_partkey,
                   p_name || (CASE WHEN i = 0 THEN '' ELSE ' ' || {nato_list}[i + 1] END) AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM {src('part')} {rep}""",
    )
    _copy_sql(
        con, dst, "orders",
        f"""SELECT o_orderkey + i*{STRIDE['orders'] * mult} AS o_orderkey,
                   o_custkey + i*{STRIDE['customer'] * mult} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')} {rep}""",
    )
    _copy_sql(
        con, dst, "lineitem",
        f"""SELECT l_orderkey + i*{STRIDE['orders'] * mult} AS l_orderkey,
                   l_partkey + i*{STRIDE['part'] * mult} AS l_partkey,
                   l_suppkey + i*{STRIDE['supplier'] * mult} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')} {rep}""",
    )
    _copy_sql(
        con, dst, "events",
        f"""SELECT event_id + i*{STRIDE['events'] * mult} AS event_id, ts,
                   user_id + i*{STRIDE['user'] * mult} AS user_id,
                   event_type, value, props
            FROM {src('events')} {rep}""",
    )

    # documents: seeded per-(doc, replica) word permutation
    docs = con.sql(f"SELECT * FROM {src('documents')} ORDER BY doc_id").df()
    frames = []
    for i in range(R):
        d = docs.copy()
        if i > 0:
            texts = []
            for doc_id, text in zip(d["doc_id"].to_numpy(), d["text"].tolist()):
                words = text.split()
                rs = np.random.RandomState(int(doc_id) + 1_000_003 * i * mult)
                rs.shuffle(words)
                texts.append(" ".join(words))
            d["text"] = texts
        d["doc_id"] = d["doc_id"] + i * STRIDE["documents"] * mult
        d["n_chars"] = d["text"].str.len().astype("int64")
        frames.append(d)
    import pandas as pd

    all_docs = pd.concat(frames, ignore_index=True)
    con.register("all_docs", all_docs)
    _copy_sql(
        con, dst, "documents",
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source, "
        "CAST(n_chars AS BIGINT) AS n_chars FROM all_docs",
    )

    # embeddings: 4 replicas, +-1% seeded relative noise on i>0
    emb = con.sql(f"SELECT * FROM {src('embeddings')} ORDER BY vec_id").df()
    eframes = []
    for i in range(R_EMB):
        e = emb.copy()
        if i > 0:
            vecs = []
            for vec_id, v in zip(e["vec_id"].to_numpy(), e["embedding"].tolist()):
                rs = np.random.RandomState(int(vec_id) + 7_000_003 * i * emb_mult)
                arr = np.asarray(v, dtype=np.float64)
                vecs.append((arr * (1.0 + rs.uniform(-0.01, 0.01, arr.shape))).astype(np.float32).tolist())
            e["embedding"] = vecs
        e["vec_id"] = e["vec_id"] + i * STRIDE["embeddings"] * emb_mult
        eframes.append(e)
    all_emb = pd.concat(eframes, ignore_index=True)
    con.register("all_emb", all_emb)
    _copy_sql(
        con, dst, "embeddings",
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(embedding AS FLOAT[]) AS embedding, "
        "CAST(label AS INTEGER) AS label FROM all_emb",
    )
    con.close()
    print(f"scaled tier (mult {mult * 10}x of sf0.1) written to {dst}")


if __name__ == "__main__":
    args = sys.argv[1:]
    src_dir, mult = SRC, 1
    if "--src" in args:
        j = args.index("--src"); src_dir = args[j + 1]; del args[j:j + 2]
    if "--mult" in args:
        j = args.index("--mult"); mult = int(args[j + 1]); del args[j:j + 2]
    dst = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1" if mult == 1 else f"sf{mult * 10}"
    )
    build(dst, src_dir, mult)
