"""Query registry assembly: importing this package registers all queries."""

from .registry import ORACLE, QUERIES, query  # noqa: F401

# Each import registers its queries via the @query decorator.
from . import core  # noqa: E402,F401

for _mod in (
    "joins",
    "windows",
    "grouping",
    "dedup",
    "similarity",
    "text",
    "strings",
    "stream_batch",
    "ml",
    "extended",
    "subqueries",
    "udtf_ops",
    "tpch_heavy",
    "sampling",
    "timeseries",
    "stats",
):
    try:
        __import__(f"{__name__}.{_mod}")
    except ModuleNotFoundError:
        pass  # module not built yet (incremental rounds)
