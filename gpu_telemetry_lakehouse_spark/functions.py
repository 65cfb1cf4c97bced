"""Column-expression helpers (all JVM-side, codegen-friendly — no Python UDFs).

These mirror the oracle-SQL fragments in ``queries/registry.py`` so Spark and
DuckDB produce bit-identical doubles/ints (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def exact_sum(col: ColumnOrName, scale: int = 4) -> Column:
    """SUM over doubles with a deterministic, partial-aggregation-order-proof
    result: round to ``scale`` decimals as a scaled long, sum longs (exact,
    commutative), divide back in double.

    The staging rounder is floor(x * 10^scale + 0.5) — nearest integer with
    ties toward +inf. Multiply, add and floor are all exactly-specified IEEE
    ops, so Spark and the DuckDB oracle (FLOOR(.. + 0.5)) agree bit-for-bit
    BY CONSTRUCTION, with no dependence on either engine's decimal-rounding
    internals. It is also ~4x faster than ROUND on the Spark side: Spark's
    ROUND on doubles boxes every value through java BigDecimal, which
    measured 2.2s vs 0.5s for a 10-moment aggregation over sf0.1 lineitem.
    Long sums stay codegen-native (a decimal-staged sum is ~4x slower in
    whole-stage codegen). Overflow bound: |x| * 10^scale * rows must stay
    under 2^63 (~9.2e18) — e.g. values to 1e5 at scale 4 allow ~9e9 rows per
    group; beyond that, stage through ``decimal(38,scale)`` instead.

    PRECONDITION: inputs are finite (NULL is fine). A NaN/Infinity raises —
    identically in the DuckDB oracle's CAST(FLOOR(.. + 0.5) AS BIGINT) — by
    design: non-finite sensor glitches are a data-contract violation caught
    loudly, not silently absorbed into an aggregate where IEEE semantics
    would poison the whole group. Spark's floor(double) itself returns LONG
    with NO ANSI check (NaN->0, Inf->Long.MaxValue), so the fail-loud path
    is an explicit guard term ``CAST(x * 0.0 AS BIGINT)``: exactly 0 for
    every finite input (including -0.0), NaN for non-finite, and the cast
    raises CAST_OVERFLOW under ANSI (default-on in Spark 4; the engine never
    disables it). Pinned by tests/test_kernel_properties.py."""
    m = 10**scale
    x = _c(col)
    staged = F.floor(x * m + F.lit(0.5)).cast("long") + (x * F.lit(0.0)).cast(
        "long"
    )
    return F.sum(staged) / F.lit(float(m))


def exact_avg(col: ColumnOrName, scale: int = 6) -> Column:
    """Deterministic mean: exact scaled-long sum / count, divided in double."""
    c = _c(col)
    return exact_sum(c, scale) / F.count(c)


def md5_int(col: ColumnOrName) -> Column:
    """Deterministic 60-bit integer hash from md5 (portable to the DuckDB
    oracle: ``cast('0x'||substring(md5(x),1,15) as bigint)``)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def epoch_floor_s(col: ColumnOrName) -> Column:
    """Whole epoch seconds of a timestamp with FLOOR semantics — the exact
    twin of the oracle's ``CAST(floor(epoch(ts)) AS BIGINT)``.

    ``F.unix_timestamp`` truncates toward zero, which agrees with floor for
    every non-negative epoch but is one second HIGH for every pre-1970
    timestamp carrying a sub-second fraction (1964-01-02 00:00:00.778549:
    unix_timestamp -189302399 vs floor -189302400 — found by the r9
    pre-epoch degenerate corpus in twap_user_daily's covered_s).
    ``CAST(timestamp AS LONG)`` is Spark's floorDiv of the micros and
    matches DuckDB bit-for-bit on both sides of the epoch; use this at
    every site whose input can carry fractional seconds (events.ts and
    anything derived from it)."""
    return _c(col).cast("long")


def guarded_seq_end(
    end_col: Column, n_steps: Column, limit: int, what: str
) -> Column:
    """Loud span guard for timestamp ``sequence`` explodes (r8 extreme-
    timestamp corpus): a corrupt sentinel timestamp (epoch 0, 1900-01-01,
    9999-12-31 — all common in real ingests) otherwise turns ONE row into
    millions of exploded spine rows, a denial-of-service that grinds BOTH
    engines rather than erroring. Returns ``end_col`` unchanged when the
    span is sane and raises a diagnosable error per offending row
    otherwise; the guard never fires on in-domain data, so oracle hashes
    are unaffected."""
    return F.when(n_steps <= F.lit(limit), end_col).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{what}: interval spans "),
                n_steps.cast("string"),
                F.lit(
                    f" steps > {limit} — corrupt sentinel timestamp "
                    "(epoch 0 / 9999-12-31)? clean the interval bounds"
                ),
            )
        )
    )


def tokens(col: ColumnOrName) -> Column:
    """Whitespace tokenization, identical to DuckDB
    ``regexp_split_to_array(trim(x), '\\s+')``."""
    return F.split(F.trim(_c(col)), r"\s+")


def dot_raw(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product over already-double arrays (no per-evaluation cast —
    use in pair-join hot paths where the cast is hoisted to a per-row
    projection)."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Element-order dot product over array<float|double> columns, computed in
    double; matches DuckDB ``list_dot_product`` bit-for-bit."""
    prod = F.zip_with(
        _c(a).cast("array<double>"), _c(b).cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity via explicit dot/norms (element order fixed on both
    engines -> deterministic)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


SQL_FUNCTIONS = {
    # SQL-language UDFs (Spark 4 CREATE FUNCTION ... RETURN <expr>): the
    # engine's core expression helpers exposed to pure-SQL users with ZERO
    # runtime cost — the body inlines into the caller's plan at analysis
    # time (same codegen as writing the expression by hand), unlike a
    # Python UDF which would add a serialization boundary.
    "md5_int60": (
        "(s STRING) RETURNS BIGINT "
        "RETURN CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
    ),
    "ws_tokens": (
        "(s STRING) RETURNS ARRAY<STRING> RETURN split(trim(s), '\\\\s+')"
    ),
    "vec_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    ),
    "vec_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))"
    ),
    "exact_sum_6": (
        # the + CAST(x*0.0 AS BIGINT) term is the non-finite guard: 0 for
        # finite x, ANSI CAST_OVERFLOW for NaN/Inf (see exact_sum docstring)
        "(x DOUBLE) RETURNS BIGINT "
        "RETURN CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) "
        "+ CAST(x * 0.0 AS BIGINT)"
    ),
}


def register_sql_functions(spark) -> None:
    """Register the engine helpers as temporary SQL functions so ad-hoc SQL
    users get the same deterministic primitives the DataFrame API uses."""
    for name, body in SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
