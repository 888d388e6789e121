"""Spark SQL surface for the cell encoders: register h3/s2 functions so
pure-SQL users can build spatial filter-refine pipelines without touching
the Python column API — the scalar complement of the `cover_cells` UDTF
(spatial/cover.register_cover_udtf):

    SELECT image_id, h3_encode(lat, lon, 7)  AS h3_r7,
                     h3_parent(h3_encode(lat, lon, 7), 5) AS cell_p5,
                     s2_encode(lat, lon, 12) AS s2_l12
    FROM images

Unlike the column API (where res/level are Python literals baked into a
cached UDF), SQL passes res as a per-row argument; the kernels need a
scalar res, so each Arrow batch is grouped by the distinct res values it
contains (in practice one) and encoded per group — still fully vectorized.

Reference anchor: the stac-to-geocore reference has no SQL surface at all
(single-threaded dict ETL); this is part of the north-star engine
(BASELINE.json north_rule: H3/S2 index as a first-class engine feature).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import LongType


def _grouped_by_scalar(scalars: pd.Series, valid: pd.Series, kernel) -> pd.Series:
    """Apply kernel(rows_mask, scalar) per distinct scalar in the batch.

    NULL-safe with standard SQL semantics (NULL in -> NULL out): rows where
    any argument is null are excluded from the kernels and return null —
    without this, a NULL res crashed int() on NaN and a NULL coordinate was
    silently cast to INT64_MIN garbage."""
    ok = (valid & scalars.notna()).to_numpy()
    out = pd.array([None] * len(scalars), dtype="Int64")
    sc = scalars.to_numpy()
    for sv in np.unique(sc[ok]):
        m = ok & (sc == sv)
        out[m] = kernel(m, int(sv))
    return pd.Series(out)


def register_spatial_sql(spark: SparkSession) -> None:
    """Register h3_encode(lat, lon, res), h3_parent(cell, res), and
    s2_encode(lat, lon, level) as Spark SQL functions (Arrow-batched
    pandas UDFs). z/x/y tile math needs no UDF — it is plain SQL
    (FLOOR((lon+180)/360*POW(2,z)) etc., see cells/tiles.py)."""
    from pyspark.sql.functions import pandas_udf

    from stac_to_geocore_spark.cells.h3x import h3_encode_np, h3_parent_np
    from stac_to_geocore_spark.cells.s2 import s2_encode_np

    @pandas_udf(LongType())
    def _h3_encode(lat: pd.Series, lon: pd.Series, res: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        return _grouped_by_scalar(
            res, lat.notna() & lon.notna(),
            lambda m, r: h3_encode_np(la[m], lo[m], r),
        )

    @pandas_udf(LongType())
    def _h3_parent(cell: pd.Series, res: pd.Series) -> pd.Series:
        c = cell.fillna(0).to_numpy(np.int64)  # masked rows never reach the kernel
        return _grouped_by_scalar(
            res, cell.notna(), lambda m, r: h3_parent_np(c[m], r)
        )

    @pandas_udf(LongType())
    def _s2_encode(lat: pd.Series, lon: pd.Series, level: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        return _grouped_by_scalar(
            level, lat.notna() & lon.notna(),
            lambda m, lv: s2_encode_np(la[m], lo[m], lv),
        )

    spark.udf.register("h3_encode", _h3_encode)
    spark.udf.register("h3_parent", _h3_parent)
    spark.udf.register("s2_encode", _s2_encode)
