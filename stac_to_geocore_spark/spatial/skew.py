"""Skew planning: measure the cell histogram, salt only the hot cells.

BASELINE.json north_rule: "salted keys for skewed coastal/urban cells". The
uniform salt in pip.py/pipeline.py replicates the whole cover side; this
module does the targeted version from SURVEY.md §4.3: a sampled
groupBy(cell).count() finds hot cells, only those get per-row salts, and
only their cover rows replicate — the replication cost is proportional to
the skew, not the table.

Deterministic: the salt is a hash of the point id (not rand()), so retries
and resume produce identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_salts(
    points_with_cell: DataFrame,
    cell_col: str = "cell",
    sample_fraction: float = 0.05,
    hot_multiplier: float = 8.0,
    max_salt: int = 32,
) -> dict[int, int]:
    """Sampled cell histogram -> {hot_cell: salt_factor}.

    A cell is hot when its (estimated) count exceeds hot_multiplier x the
    mean cell count; its salt factor scales with the overshoot, capped.

    Only the HOT rows are ever collected: the mean comes from a two-scalar
    aggregate and the hot filter runs server-side, so the driver transfer
    is proportional to the skew (bounded by the hot-cell count), never to
    the number of distinct cells — at 100 TB the full cell histogram is
    itself a large table.
    """
    sample = points_with_cell.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else points_with_cell
    # ONE action: the mean rides in as a broadcast scalar row, so the hot
    # filter runs server-side in the same job. The histogram subtree appears
    # twice in that plan; the persist (not ReuseExchange, which a conf or a
    # future canonicalization change could switch off) GUARANTEES the
    # expensive upstream (e.g. a sampled cover-generation mapInPandas) runs
    # once — the count and the mean must come from the same materialization.
    # An empty histogram yields a NULL mean, the comparison drops every row,
    # and the result is {}.
    hist = sample.groupBy(cell_col).agg(F.count(F.lit(1)).alias("count")).persist()
    try:
        mean_col = (F.sum("count") / F.count(F.lit(1))).alias("mean")
        hot = (
            hist.crossJoin(F.broadcast(hist.agg(mean_col)))
            .filter(F.col("count") > hot_multiplier * F.col("mean"))
            .collect()
        )
    finally:
        hist.unpersist()
    out = {}
    for r in hot:
        out[int(r[cell_col])] = int(min(max_salt, max(2, round(r["count"] / r["mean"] / hot_multiplier * 4))))
    return out


def salted_cell_join(
    points: DataFrame,
    covers: DataFrame,
    salts: dict[int, int],
    cell_col: str = "cell",
    point_id: str = "image_id",
) -> DataFrame:
    """Equi-join points⋈covers on cell with per-hot-cell salting.

    points gain salt = hash(point_id) % salt_factor(cell) (0 for cold cells);
    covers explode to one row per salt value for hot cells only. The join key
    becomes (cell, salt) — hot cells split across salt_factor reducers, cold
    cells pay nothing.
    """
    if not salts:
        return points.join(covers, cell_col)
    salt_map = F.create_map(*[F.lit(x) for kv in salts.items() for x in kv])
    factor_p = F.coalesce(salt_map[F.col(cell_col)], F.lit(1))
    pts = points.withColumn("salt", F.pmod(F.xxhash64(point_id), factor_p).cast("int"))
    cov = covers.withColumn(
        "salt",
        F.explode(F.sequence(F.lit(0), F.coalesce(salt_map[F.col(cell_col)], F.lit(1)) - 1)),
    )
    return pts.join(cov, [cell_col, "salt"])
