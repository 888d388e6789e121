"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship north-star pipeline (H3 encode + PIP join + tile
                 assignment) on a deterministic synthetic images table.
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent ANSI SQL for every SQL-expressible query;
                 engine-only ops (cell encoders, minhash, geocore compat)
                 are rows-only checked.

Float discipline: every aggregate/derived float column is rounded in BOTH
engines so the driver's value-hash is stable; synthetic coordinates are
derived with exact integer arithmetic so Spark and DuckDB see identical
doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF_SMOKE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Deterministic synthetic points from customer rows: exact integer math ->
# identical doubles in Spark and DuckDB.
_POINTS_SQL = """
    SELECT c_custkey AS point_id,
           -140.5 + ((c_custkey * 2654435761) % 1000000) / 1000000.0 * 88.0  AS lon,
           41.5  + ((c_custkey * 40503 + 12345) % 1000000) / 1000000.0 * 42.0 AS lat
    FROM customer
"""


def _points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("point_id"),
        (F.lit(-140.5) + ((F.col("c_custkey") * F.lit(2654435761)) % F.lit(1000000)) / F.lit(1000000.0) * F.lit(88.0)).alias("lon"),
        (F.lit(41.5) + ((F.col("c_custkey") * F.lit(40503) + F.lit(12345)) % F.lit(1000000)) / F.lit(1000000.0) * F.lit(42.0)).alias("lat"),
    )


def _fixture_polygons_pdf():
    from stac_to_geocore_spark.fixtures import gen_polygons_pdf

    return gen_polygons_pdf(24, seed=42)


def _polygons_values_sql() -> str:
    p = _fixture_polygons_pdf()
    rows = ", ".join(
        f"('{r.poly_id}', {r.west}, {r.south}, {r.east}, {r.north})"
        for r in p.itertuples(index=False)
    )
    return f"(VALUES {rows}) AS polys(poly_id, west, south, east, north)"


_KNN_QUERIES = [
    ("q-00", -118.319, 54.355), ("q-01", -92.759, 63.429), ("q-02", -68.626, 49.391),
    ("q-03", -135.029, 75.571), ("q-04", -77.736, 70.305),
]


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic images (counter-based, distributed gen) ->
    H3/S2/tile encode -> broadcast cell-bucketed PIP join -> assignments."""
    from stac_to_geocore_spark.fixtures import images_df, polygons_df
    from stac_to_geocore_spark.pipeline import flagship

    images = images_df(spark, 2000, bytes_mode="none")
    polys = polygons_df(spark, 24)
    return flagship(images, polys)


# ---------------------------------------------------------------- queries

def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def _q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "rnk", F.round("c_acctbal", 2).alias("acctbal"))
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("total_value"))
    )


def _q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def _q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_to_geocore_spark.cells.tiles import tile_x_expr, tile_y_expr

    pts = _points_df(spark, sf_dir)
    return pts.select(
        "point_id",
        tile_x_expr(F.col("lon"), 12).alias("tile_x"),
        tile_y_expr(F.col("lat"), 12).alias("tile_y"),
    )


def _q_pip_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_to_geocore_spark.fixtures import POLYGONS_SCHEMA
    from stac_to_geocore_spark.spatial.pip import pip_join

    pts = _points_df(spark, sf_dir)
    polys = spark.createDataFrame(_fixture_polygons_pdf(), POLYGONS_SCHEMA)
    return pip_join(pts, polys, point_id="point_id").select("point_id", "poly_id")


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from stac_to_geocore_spark.spatial.knn import knn_join

    pts = _points_df(spark, sf_dir)
    queries = pd.DataFrame(_KNN_QUERIES, columns=["query_id", "lon", "lat"])
    return knn_join(pts, queries, k=10, point_id="point_id").select("query_id", "point_id", "rank")


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        F.size(words).alias("n_tokens"),
        F.round(F.length("text") / F.size(words), 4).alias("avg_token_len"),
    )


def _q_stopword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # language/quality signal expressible identically in both engines:
    # occurrence counts of common-word patterns via length-difference trick
    d = _t(spark, sf_dir, "documents")

    def occ(pat: str):
        return (F.length("text") - F.length(F.replace(F.col("text"), F.lit(pat)))) / len(pat)

    return d.select(
        "doc_id",
        occ(" the ").cast("long").alias("n_the"),
        occ(" a ").cast("long").alias("n_a"),
        occ(" value ").cast("long").alias("n_value"),
    )


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "embedding", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.transform("q_emb", lambda a: a.cast("double") * a.cast("double")), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("embedding", lambda a: a.cast("double") * a.cast("double")), F.lit(0.0), lambda acc, x: acc + x))
    sim = F.round(dot / (na * nb), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "rank", "sim")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "q5_local_supplier": _q5_local_supplier,
        "top_customers_window": _q_top_customers,
        "events_hourly": _q_events_hourly,
        "events_sessions": _q_events_sessions,
        "tile_assign": _q_tile_assign,
        "pip_assign": _q_pip_assign,
        "knn_ring": _q_knn,
        "dedup_exact": _q_dedup_exact,
        "doc_stats": _q_doc_stats,
        "stopword_score": _q_stopword_score,
        "ann_topk": _q_ann_topk,
    }


def oracle_sql() -> dict[str, str]:
    polys = _polygons_values_sql()
    knn_vals = ", ".join(f"('{q}', {x}, {y})" for q, x, y in _KNN_QUERIES)
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "q5_local_supplier": """
            SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "top_customers_window": """
            SELECT c_nationkey, c_custkey, rnk, acctbal FROM (
              SELECT c_nationkey, c_custkey,
                     ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk,
                     ROUND(c_acctbal, 2) AS acctbal
              FROM customer) WHERE rnk <= 3
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 3) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
              SELECT user_id,
                     CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS new_sess
              FROM events) GROUP BY user_id
        """,
        "tile_assign": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT point_id,
                   GREATEST(0, LEAST(4095, CAST(FLOOR((lon + 180.0) / 360.0 * 4096.0) AS BIGINT))) AS tile_x,
                   GREATEST(0, LEAST(4095, CAST(FLOOR((1.0 - LN(TAN(RADIANS(LEAST(GREATEST(lat, -85.05112877980659), 85.05112877980659)))
                         + 1.0 / COS(RADIANS(LEAST(GREATEST(lat, -85.05112877980659), 85.05112877980659)))) / PI()) / 2.0 * 4096.0) AS BIGINT))) AS tile_y
            FROM pts
        """,
        "pip_assign": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT point_id, poly_id
            FROM pts, {polys}
            WHERE lon >= west AND lon <= east AND lat >= south AND lat <= north
        """,
        "knn_ring": f"""
            WITH pts AS ({_POINTS_SQL}),
            q AS (SELECT * FROM (VALUES {knn_vals}) AS q(query_id, q_lon, q_lat)),
            d AS (
              SELECT q.query_id, pts.point_id,
                     POWER((q.q_lon - pts.lon) * COS(RADIANS((q.q_lat + pts.lat) / 2.0)), 2)
                     + POWER(q.q_lat - pts.lat, 2) AS dist2
              FROM q, pts)
            SELECT query_id, point_id, rank FROM (
              SELECT query_id, point_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2 ASC, point_id ASC) AS rank
              FROM d) WHERE rank <= 10
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keeper_doc_id
            FROM documents GROUP BY 1
        """,
        "doc_stats": """
            SELECT doc_id, LENGTH(text) AS n_chars_computed,
                   len(string_split(text, ' ')) AS n_tokens,
                   ROUND(LENGTH(text) * 1.0 / len(string_split(text, ' ')), 4) AS avg_token_len
            FROM documents
        """,
        "stopword_score": """
            SELECT doc_id,
                   CAST((LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5 AS BIGINT) AS n_the,
                   CAST((LENGTH(text) - LENGTH(REPLACE(text, ' a ', ''))) / 3 AS BIGINT) AS n_a,
                   CAST((LENGTH(text) - LENGTH(REPLACE(text, ' value ', ''))) / 7 AS BIGINT) AS n_value
            FROM documents
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                       / (SQRT(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))
                          * SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 6) AS sim
              FROM embeddings e, q WHERE e.vec_id != q.query_id)
            SELECT query_id, vec_id, rank, sim FROM (
              SELECT query_id, vec_id, sim,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
              FROM sims) WHERE rank <= 10
        """,
    }
