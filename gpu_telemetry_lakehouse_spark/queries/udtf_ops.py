"""Python UDTF + UDAF coverage (SURVEY.md §2.2 UDF/UDAF/UDTF row).

A UDTF is the extension point for table-generating logic that built-in
generators can't express (stateful row expansion, external lookups). This one
— sentence splitting with ordinal — is deliberately also expressible as
``explode``; that overlap is what makes a DuckDB oracle possible, so the
UDTF execution path itself gets a hash-matched differential check.

Slow-path warning: a UDTF runs Python per input row. In production this
particular transform should be the ``explode(split(...))`` form (JVM
whole-stage codegen); reach for a UDTF only when no builtin composition
exists.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..catalog import register_views
from .registry import query

_SENT_RE = r"[.!?]+"


class _SentenceSplit:
    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
        parts = [p.strip() for p in re.split(_SENT_RE, text or "") if p.strip()]
        for i, p in enumerate(parts, 1):
            yield doc_id, i, p


@query(
    "udtf_sentences",
    oracle=rf"""
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_split_to_array(text, '{_SENT_RE}'),
                       x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))
                   ),
                   x -> x <> ''
               ) AS parts
        FROM documents
    ),
    idx AS (
        SELECT doc_id, parts,
               unnest(generate_series(1, len(parts))) AS i
        FROM s
    )
    SELECT doc_id, CAST(i AS INT) AS sent_no, parts[i] AS sentence
    FROM idx
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["documents"])
    fn = udtf(_SentenceSplit, returnType="doc_id bigint, sent_no int, sentence string")
    spark.udtf.register("sentence_split", fn)
    return spark.sql(
        "SELECT t.doc_id, t.sent_no, t.sentence "
        "FROM documents, LATERAL sentence_split(doc_id, text) t"
    )


# --- UDAF: Arrow-batched grouped-aggregate pandas UDF ------------------------
# The custom-aggregate extension point. Unlike built-in aggs, a grouped-agg
# pandas UDF gets the WHOLE group's columns in one Arrow batch — no map-side
# partials, so the group's rows all shuffle to one reducer. That cost is the
# reason built-ins win when they can express the semantics; this entry keeps
# the execution path itself under the differential gate by picking semantics
# a SQL oracle can mirror (quantity-weighted average price, integer-exact via
# cent-scaled arithmetic so the two engines agree bit-for-bit).
@query(
    "udaf_weighted_avg_price",
    oracle="""
    SELECT l_returnflag,
           (CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS DOUBLE)
            / CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS DOUBLE)) / 100.0
               AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ..catalog import load_table

    @pandas_udf("double")
    def w_avg(price: pd.Series, qty: pd.Series) -> float:
        import numpy as np

        c0, q0 = price.mul(100).round(), qty.round()
        # Domain guard (r8 extreme-magnitude corpus class): numpy's
        # float->int64 astype and int64 products WRAP silently out of range
        # — the one failure mode worse than crashing — while the DuckDB
        # oracle's BIGINT cast refuses. Refuse identically, typed. The
        # product bound is conservative (max|cents| * max|q| * n <= 2^62)
        # so the in-domain fast path stays pure int64 vector math.
        if not (np.isfinite(c0).all() and np.isfinite(q0).all()):
            raise ValueError(
                "w_avg: non-finite price/qty outside the cent-exact domain"
            )
        bound = float(c0.abs().max() or 0) * float(q0.abs().max() or 0) * len(q0)
        if bound >= float(2**62):
            raise ValueError(
                "w_avg: cent-scaled products could exceed int64 — outside "
                "the exact domain (clean extreme magnitudes first)"
            )
        cents = c0.astype("int64")
        q = q0.astype("int64")
        return (int((cents * q).sum()) / int(q.sum())) / 100.0

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        w_avg("l_extendedprice", "l_quantity").alias("w_avg_price")
    )
