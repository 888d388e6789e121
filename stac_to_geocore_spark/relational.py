"""Relational operators Spark lacks as built-ins: as-of (temporal) join.

The classic shape for joining a fact stream to the most recent dimension
row: equi-join on key, filter to right.ts <= left.ts, argmax over the right
timestamp. Expressed as join + groupBy(max(packed)) so Catalyst plans a
shuffle-free broadcast when the right side is a dim, and ties break
deterministically (the pack includes the right key).

At 100 TB the right side is usually bucketed by key; the equi-join then
co-locates and the argmax is a partial aggregation — no extra shuffle
beyond the join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PACK = 100_000_000  # right keys must be < 1e8; epoch_sec * 1e8 stays < 2^63


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: Column,
    right_ts: Column,
    right_id: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """For each left row, the right row with the greatest right_ts <= left_ts
    for the same key (ties broken by greatest right_id). Left rows with no
    match are dropped (inner as-of). Returns left columns + asof_<right_id>
    + asof_ts_epoch."""
    r = right.select(
        F.col(right_key).alias("_rk"),
        (F.unix_timestamp(right_ts) * F.lit(_PACK) + F.col(right_id)).alias("_packed"),
    )
    if broadcast_right:
        r = F.broadcast(r)
    joined = left.join(
        r,
        (F.col(left_key) == F.col("_rk"))
        & (F.col("_packed") <= F.unix_timestamp(left_ts) * F.lit(_PACK) + F.lit(_PACK - 1)),
        "inner",
    )
    best = (
        joined.groupBy(*left.columns)
        .agg(F.max("_packed").alias("_best"))
        # integer div/mod — _best can exceed 2^53 so float paths would corrupt
        .withColumn(f"asof_{right_id}", F.expr(f"_best % {_PACK}").cast("long"))
        .withColumn("asof_ts_epoch", F.expr(f"_best div {_PACK}").cast("long"))
        .drop("_best")
    )
    return best
