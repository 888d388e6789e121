"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query_id, vec_id, rank[, sim]):

- `brute_topk`: exact cosine top-k — broadcast the query set, JVM-side
  zip_with/aggregate dot products (no Python in the scan), window top-k.
  The correctness baseline; also the right plan when |queries| is small.
- `lsh_topk`: random-hyperplane LSH — signatures are a map-only pandas UDF,
  candidates come from equi-joining bucket keys (multi-probe: the exact
  bucket plus all 1-bit-flip neighbors), exact cosine re-rank on candidates.
  The scale path: the 10^12-row side is never shuffled, only bucketed keys.

Hyperplanes are generated counter-based from the seed, so signatures agree
across executors without shipping the planes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(col: str):
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, x: acc + x))


# Norms are attached per ROW below each join (columns "na"/"nb") and the
# similarity divides by the precomputed columns: the old _cosine(a, b)
# expression re-evaluated the interpreted higher-order norm aggregates once
# per candidate PAIR — 3x the array work, and norms dominate it. Identical
# doubles (same expression, same inputs), so every frozen oracle holds.
def _sim_prenormed(q_vec: str, vec_col: str):
    return F.round(_dot(q_vec, vec_col) / (F.col("na") * F.col("nb")), 6)


def brute_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k of emb rows per query row (queries broadcast)."""
    from stac_to_geocore_spark.partitioning import fan_out

    emb = fan_out(emb).withColumn("nb", _norm(vec_col))
    queries = queries.withColumn("na", _norm(q_vec))
    sim = _sim_prenormed(q_vec, vec_col)
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(q_id))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "rank", "sim")
    )


def _planes(dim: int, n_tables: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_tables, n_planes, dim))


def lsh_bucket_udf(dim: int, n_tables: int = 8, n_planes: int = 6, seed: int = 42):
    """array<long> of per-table bucket keys (table index folded into the key
    so keys never collide across tables)."""
    planes = _planes(dim, n_tables, n_planes, seed)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # (rows, tables, planes)
        bits = np.einsum("rd,tpd->rtp", m, planes) > 0
        keys = (bits * powers).sum(axis=2).astype(np.int64)
        keys = keys + (np.arange(n_tables, dtype=np.int64) << np.int64(32))
        return pd.Series(list(keys))

    return _sig


def lsh_probe_udf(dim: int, n_tables: int = 8, n_planes: int = 6, seed: int = 42):
    """Multi-probe bucket keys for the QUERY side: per table, the exact
    bucket plus every 1-bit-flip neighbor (the n_planes buckets across the
    single nearest hyperplane). Only the tiny query side fans out
    (1 + n_planes keys per table); data rows keep one key per table."""
    planes = _planes(dim, n_tables, n_planes, seed)
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    flips = np.concatenate([[0], powers])  # XOR masks: exact probe + 1-bit flips

    @F.pandas_udf(ArrayType(LongType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = np.einsum("rd,tpd->rtp", m, planes) > 0
        keys = (bits * powers).sum(axis=2).astype(np.int64)        # (rows, tables)
        probed = keys[:, :, None] ^ flips[None, None, :]           # (rows, tables, 1+planes)
        probed = probed + (np.arange(n_tables, dtype=np.int64) << np.int64(32))[None, :, None]
        return pd.Series(list(probed.reshape(len(vecs), -1)))

    return _probe


def lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64,
    n_tables: int = 8, n_planes: int = 6, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "q_emb",
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = union of same-bucket rows over
    n_tables independent random-hyperplane tables, exact cosine re-rank.
    Recall/candidate-fraction trades off via (n_tables, n_planes): more
    planes -> smaller buckets, more tables -> higher recall; multi_probe
    additionally probes each 1-bit-flip neighbor bucket from the query
    side. At warehouse scale the bucket keys are the table's
    bucketing/partition columns, so the probe side prunes file reads
    instead of scanning."""
    from stac_to_geocore_spark.partitioning import fan_out

    sig = lsh_bucket_udf(dim, n_tables, n_planes, seed)
    q_sig = lsh_probe_udf(dim, n_tables, n_planes, seed) if multi_probe else sig
    data = fan_out(emb).withColumn("nb", _norm(vec_col)).withColumn(
        "bucket", F.explode(sig(F.col(vec_col))))
    q = (
        queries.withColumn("na", _norm(q_vec))
        .withColumn("bucket", F.explode(q_sig(F.col(q_vec))))
        .select(q_id, q_vec, "na", "bucket")
    )
    cand = (
        data.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col(q_id))
        .select(q_id, q_vec, "na", id_col, vec_col, "nb")
        .distinct()
    )
    sim = _sim_prenormed(q_vec, vec_col)
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "rank", "sim")
    )


def _kmeans_np(sample: np.ndarray, n_centroids: int, seed: int, iters: int = 12) -> np.ndarray:
    """Plain numpy Lloyd's k-means (driver-side coarse quantizer training)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """array<long> of the n_probe nearest centroid ids per vector."""
    cent = centroids

    @F.pandas_udf(ArrayType(LongType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d, axis=1)[:, :n_probe].astype(np.int64)
        return pd.Series(list(idx))

    return _assign


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64,
    n_centroids: int = 16, n_probe: int = 4, train_sample: int = 4096, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "q_emb",
) -> DataFrame:
    """IVF (inverted-file) ANN: a driver-trained k-means coarse quantizer
    partitions vectors into cells; queries probe their n_probe nearest
    cells; exact cosine re-ranks the candidates.

    The scale story mirrors lsh_topk: data rows carry one int cell id (the
    natural bucketing/partition column at warehouse scale, so probes prune
    file reads), and only the tiny query side fans out over probes."""
    # unbiased seeded cap: order by a seeded hash of the id and take the
    # top-N — executes as per-partition TakeOrdered + driver merge (ONE pass,
    # no count() job, no shuffle). Round 2's sample(frac).limit(N) still
    # preferred the first partitions (limit short-circuits) and paid an
    # extra full count() scan to size the fraction.
    # secondary key = hash of the vector itself, so the order stays
    # deterministic even if id_col has duplicate values
    sample_rows = (
        emb.select(
            vec_col,
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_r"),
            F.xxhash64(F.col(vec_col)).alias("_r2"),
        )
        .orderBy("_r", "_r2")
        .limit(train_sample)
        .select(vec_col)
        .collect()
    )
    sample = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
    centroids = _kmeans_np(sample, n_centroids, seed)

    from stac_to_geocore_spark.partitioning import fan_out

    data = fan_out(emb).withColumn("nb", _norm(vec_col)).withColumn(
        "ivf_cell", ivf_assign_udf(centroids, 1)(F.col(vec_col))[0])
    q = (
        queries.withColumn("na", _norm(q_vec))
        .withColumn("ivf_cell", F.explode(ivf_assign_udf(centroids, n_probe)(F.col(q_vec))))
        .select(q_id, q_vec, "na", "ivf_cell")
    )
    sim = _sim_prenormed(q_vec, vec_col)
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        data.join(F.broadcast(q), "ivf_cell")
        .filter(F.col(id_col) != F.col(q_id))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "rank", "sim")
    )


def embedding_dedup_pairs(
    emb: DataFrame, threshold: float = 0.95, dim: int = 64,
    n_tables: int = 6, n_planes: int = 10, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via LSH self-join + exact verify. High-threshold near-dups collide with
    probability ~(1 - theta/pi)^n_planes per table, so a handful of tables
    suffices at 0.95+ cosine."""
    from stac_to_geocore_spark.partitioning import fan_out

    sig = lsh_bucket_udf(dim, n_tables, n_planes, seed)
    data = fan_out(emb).withColumn("_nrm", _norm(vec_col)).withColumn(
        "bucket", F.explode(sig(F.col(vec_col)))).select(id_col, vec_col, "_nrm", "bucket")
    a = data.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                    F.col("_nrm").alias("na"), "bucket")
    b = data.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                    F.col("_nrm").alias("nb"), "bucket")
    sim = _sim_prenormed("v_a", "v_b")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
        .distinct()
    )
