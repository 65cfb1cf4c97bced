"""Central query registry.

Every implemented operator gets a ``@query("name", oracle="...")`` entry:
the callable takes (spark, sf_dir) -> DataFrame, the oracle is equivalent
ANSI SQL DuckDB runs over the same parquet tables (driver contract in
``__spark_entry__.py``). Column names are aliased identically on both sides
(the driver's compare sorts columns by name before value-hashing).

Float-determinism tactics (verified bit-exact vs DuckDB 1.0):
- SUM/AVG over doubles: round the addend to a scaled BIGINT first
  (``floor(x * 10^d + 0.5)`` is a pure function of the identical IEEE double on
  both engines), sum the longs exactly (commutative — parallel fp addition
  order cannot matter), divide back in double. Long sums also stay
  codegen-native, where a decimal-staged sum is ~4x slower. For AVG divide
  the exact sum by the count in double arithmetic.
- exact percentile: Spark ``percentile`` == DuckDB ``quantile_cont`` (both
  interpolate the same order statistics); round(x, 6) retained as
  belt-and-braces on displayed doubles.
- hash-derived ints: md5 hex -> bigint works identically on both engines
  (Spark ``conv(substring(md5(x),1,15),16,10)`` == DuckDB
  ``cast('0x'||substring(md5(x),1,15) as bigint)``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# NOTE: no DataFrame-level plan cache here, deliberately. Caching the returned
# DataFrame and re-executing the same object from concurrent callers shares
# one stateful AdaptiveSparkPlanExec across executions, which measured 2-5x
# SLOWER with wild variance (40s+ suite spikes) than rebuilding the plan.
# Queries must return a fresh DataFrame per call; only driver-side fitted
# artifacts (e.g. IVF centroids) are memoized, in their own modules.


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a genuinely non-SQL-expressible
    op (driver then records the weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# SQL fragment helpers shared by oracle strings -------------------------------

def dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Bit-exact double sum, mirroring functions.exact_sum: stage each addend
    to a scaled BIGINT via floor(x*m + 0.5) (multiply/add/floor are exact
    IEEE ops — identical on both engines by construction), sum exactly,
    divide back in double."""
    m = 10**scale
    return (
        f"(SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT))"
        f" / {float(m)}) AS {alias}"
    )


def davg(expr: str, alias: str, scale: int = 6) -> str:
    """Bit-exact double mean, mirroring functions.exact_avg."""
    m = 10**scale
    return (
        f"((SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) / {float(m)})"
        f" / COUNT({expr})) AS {alias}"
    )
