"""Scan-parallelism guard for narrow inputs (guide §2.5 "input skew").

A compact parquet table often lands as one or two file splits — single-file
dims are even written as ONE row group, which Spark can never split — so a
CPU-heavy stage downstream (a vectorized Python UDF, wide string column
math, per-row hashing) serializes onto one or two cores no matter how many
the cluster has. The fix is the same one covers_df has carried since round
3: repartition UP to the cluster's parallelism when (and only when) the
input arrives with fewer partitions. The exchange moves exactly the rows
the stage was going to read anyway, once, and buys core-count parallelism
for everything above it.

The guard only ever RAISES parallelism: a 100 TB table arrives with
thousands of splits and passes through untouched (no accidental
down-partitioning, no extra exchange at scale). The partition-count probe
is a driver-side plan analysis (~ms, no job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition `df` up to min_partitions (default: the
    cluster's defaultParallelism) when it has fewer partitions; returns it
    unchanged otherwise. Round-robin keeps the sort-before-repartition
    determinism guarantee (retried tasks reproduce the same assignment),
    and every caller's downstream result is order-independent."""
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
