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
    max_hot_cells: int = 1024,
) -> dict[int, int]:
    """Sampled cell histogram -> {hot_cell: salt_factor}.

    A cell is hot when its (estimated) count exceeds hot_multiplier x the
    mean cell count; its salt factor scales with the overshoot, capped.

    ONE job, nothing histogram-sized ever reaches the driver: the per-cell
    counts roll up into a single row carrying (total, n_cells) plus the
    candidate list — cells pre-filtered server-side by count >
    hot_multiplier, which can never drop a true hot cell because the mean
    over SEEN cells is >= 1, sorted hottest-first and sliced to
    max_hot_cells so the transfer stays bounded even on a pathological
    near-flat histogram. The exact hot test (count > hot_multiplier x
    mean) then runs driver-side on those scalars — same arithmetic the old
    two-job persist+broadcast plan evaluated server-side, one job and one
    materialization fewer (the round-5 version persisted the histogram to
    share it between the mean agg and the filter; the rollup makes the
    sharing structural). Beyond max_hot_cells hot cells only the hottest
    are salted — best-effort by design; AQE skew-split backstops the rest.
    An empty input yields n_cells = 0 and the result is {}.
    """
    sample = points_with_cell.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else points_with_cell
    cand = F.when(
        F.col("count") > F.lit(float(hot_multiplier)),
        F.struct(F.col("count").alias("count"), F.col(cell_col).alias("cell")),
    )
    row = (
        sample.groupBy(cell_col).agg(F.count(F.lit(1)).alias("count"))
        .agg(
            F.sum("count").alias("total"),
            F.count(F.lit(1)).alias("n_cells"),
            F.slice(F.sort_array(F.collect_list(cand), asc=False),
                    1, max_hot_cells).alias("cand"),
        )
        .collect()[0]
    )
    if not row["n_cells"]:
        return {}
    mean = row["total"] / row["n_cells"]
    out = {}
    for r in row["cand"]:
        if r["count"] > hot_multiplier * mean:
            out[int(r["cell"])] = int(min(max_salt, max(2, round(r["count"] / mean / hot_multiplier * 4))))
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
