"""as-of join: semantics (greatest right_ts <= left_ts, id tiebreak, inner),
multiplicity preservation, broadcast-vs-merge path agreement, and the plan
contract (no shuffle/explosion of the fact side on the broadcast path)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stac_to_geocore_spark.relational import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2020-01-05 00:00:00")),  # matches right ts 01-04 (id 7)
            (2, 10, _ts("2020-01-02 00:00:00")),  # matches 01-01 (id 3)
            (3, 10, _ts("2020-01-01 00:00:00")),  # equal-ts match included (id 3)
            (4, 20, _ts("2020-01-01 00:00:00")),  # no earlier right row -> dropped
            (5, 30, _ts("2020-06-01 00:00:00")),  # key w/ no right rows -> dropped
            (6, 10, _ts("2020-01-05 00:00:00")),  # duplicate of event 1's (key, ts)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (3, 10, _ts("2020-01-01 00:00:00")),
            (7, 10, _ts("2020-01-04 00:00:00")),
            (8, 10, _ts("2020-01-04 00:00:00")),  # same ts as 7: greatest id wins
            (9, 20, _ts("2020-02-01 00:00:00")),  # later than left -> no match
        ],
        "order_id long, cust_id long, odate timestamp",
    )
    return left, right


EXPECTED = {1: 8, 2: 3, 3: 3, 6: 8}


def _run(frames, broadcast):
    left, right = frames
    return asof_join(
        left, right, "user_id", "cust_id",
        F.col("ts"), F.col("odate"), "order_id", broadcast_right=broadcast,
    )


@pytest.mark.parametrize("broadcast", [True, False])
def test_asof_semantics(frames, broadcast):
    out = {r["event_id"]: r["asof_order_id"] for r in _run(frames, broadcast).collect()}
    assert out == EXPECTED


@pytest.mark.parametrize("broadcast", [True, False])
def test_asof_preserves_duplicates(spark, frames, broadcast):
    left, right = frames
    doubled = left.unionByName(left)  # true duplicate fact rows
    out = asof_join(
        doubled, right, "user_id", "cust_id",
        F.col("ts"), F.col("odate"), "order_id", broadcast_right=broadcast,
    )
    assert out.count() == 2 * len(EXPECTED)


def test_asof_ts_epoch(frames):
    rows = {r["event_id"]: r["asof_ts_epoch"] for r in _run(frames, True).collect()}
    assert rows[2] == int(_ts("2020-01-01 00:00:00").replace(tzinfo=dt.timezone.utc).timestamp())


def test_broadcast_plan_has_no_left_shuffle(frames):
    """The 100TB contract: the fact side must not shuffle or explode. The
    only Exchange allowed is on the small right side (pre-aggregation)."""
    plan = _run(frames, True)._jdf.queryExecution().executedPlan().toString()
    bhj = plan.count("BroadcastHashJoin")
    assert bhj == 1, plan
    # walk the plan: no Exchange between the scan of `left` and the join —
    # cheap proxy: exactly one shuffle Exchange total (right-side groupBy)
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan
    assert "SortMergeJoin" not in plan


def test_merge_plan_single_shuffle(frames):
    plan = _run(frames, False)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan  # union + window, no join at all


def test_range_join_bucket_boundaries(spark):
    """Intervals spanning multiple buckets, sub-bucket intervals, inclusive
    endpoints, and facts in uncovered buckets — vs a brute-force non-equi
    join on the same frames."""
    from stac_to_geocore_spark.relational import range_join

    facts = spark.createDataFrame(
        [(i, _ts(f"2020-01-0{d} {h:02d}:00:00")) for i, (d, h) in enumerate(
            [(1, 0), (1, 12), (2, 0), (3, 6), (5, 23), (7, 1), (9, 0)]
        )],
        "fact_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (100, _ts("2020-01-01 00:00:00"), _ts("2020-01-02 00:00:00")),  # 2 buckets, inclusive ends
            (200, _ts("2020-01-03 05:00:00"), _ts("2020-01-03 07:00:00")),  # sub-bucket
            (300, _ts("2020-01-04 00:00:00"), _ts("2020-01-06 00:00:00")),  # spans 3 buckets
        ],
        "iv_id long, lo timestamp, hi timestamp",
    )
    got = {
        (r.fact_id, r.iv_id)
        for r in range_join(facts, iv, F.col("ts"), F.col("lo"), F.col("hi")).collect()
    }
    brute = {
        (r.fact_id, r.iv_id)
        for r in facts.crossJoin(iv).filter("ts >= lo AND ts <= hi").collect()
    }
    assert got == brute
    assert (0, 100) in got and (2, 100) in got        # inclusive both ends
    assert (3, 200) in got and (4, 300) in got
    assert not any(f == 6 for f, _ in got)            # fact past all windows


def test_range_join_plan_no_fact_shuffle(spark):
    from stac_to_geocore_spark.relational import range_join

    facts = spark.createDataFrame([(1, _ts("2020-01-01 00:00:00"))], "fact_id long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, _ts("2020-01-01 00:00:00"), _ts("2020-01-02 00:00:00"))],
        "iv_id long, lo timestamp, hi timestamp",
    )
    plan = range_join(facts, iv, F.col("ts"), F.col("lo"), F.col("hi"))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # fact side never shuffles
    assert "NestedLoop" not in plan                 # the plan Spark would otherwise pick


def test_knn_empty_queries_returns_empty(spark):
    import pandas as pd

    from stac_to_geocore_spark.spatial.knn import knn_join

    pts = spark.createDataFrame([(1, -100.0, 50.0)], "image_id long, lon double, lat double")
    out = knn_join(pts, pd.DataFrame(columns=["query_id", "lon", "lat"]), k=3)
    assert out.count() == 0
    assert out.schema["point_id"].dataType.simpleString() == "bigint"
