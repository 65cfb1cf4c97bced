"""Sequence packing: greedy binning of documents into fixed token budgets.

The sample-packing step of an LLM training pipeline — concatenate documents
into context-length bins so padding waste stays low. Exact bin packing is
NP-hard and inherently sequential; the distributed recipe is greedy next-fit
per partition:

1. hash-repartition rows into a fixed number of partitions (deterministic
   for a given partition count),
2. sort within each partition (deterministic order),
3. one ``mapInPandas`` pass per partition keeps a running token budget and
   opens a new pack when the next row would overflow.

Pack ids are (spark_partition_id, local counter) — globally unique with NO
cross-partition coordination, so the operator is one narrow shuffle plus a
streaming map regardless of corpus size. Packing quality loses a few percent
vs global first-fit-decreasing (each partition packs independently) — the
standard trade accepted at scale. Oversized single rows get their own pack
(truncation policy belongs to the tokenizer upstream).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    size_col: str,
    max_units: int,
    order_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Assign ``pack_id`` (string) and ``pack_pos`` (position in pack) to
    every row. Deterministic: fixed hash partitioning on ``order_col`` +
    in-partition sort; rerunning yields identical assignments."""
    import pandas as pd

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema += ", `pack_id` string, `pack_pos` int"

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        part_id = None
        pack_no = 0
        budget = 0
        pos = 0
        for pdf in batches:
            if pdf.empty:
                continue
            if part_id is None:
                part_id = int(pdf["__pid"].iloc[0])
            ids, poss = [], []
            for size in pdf[size_col]:
                size = int(size) if size is not None and size == size else 0
                if pos > 0 and budget + size > max_units:
                    pack_no += 1
                    budget = 0
                    pos = 0
                budget += size
                ids.append(f"p{part_id}-{pack_no}")
                poss.append(pos)
                pos += 1
            out = pdf.drop(columns=["__pid"])
            out["pack_id"] = ids
            out["pack_pos"] = pd.array(poss, dtype="int32")
            yield out

    return (
        df.repartition(n_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .mapInPandas(pack, schema=out_schema)
    )
