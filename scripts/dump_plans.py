"""Regenerate docs/PLANS.md plan dumps for the audited queries.

Usage: python scripts/dump_plans.py <section> ...
Sections: flagship, q5, q1, pip_assign, minhash, asof
Prints each as '=== <name> ===' + explain('formatted') output.
"""

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from stac_to_geocore_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    targets = sys.argv[1:] or ["flagship", "q5", "q1", "pip_assign", "minhash", "asof"]
    for t in targets:
        if t == "flagship":
            from stac_to_geocore_spark.fixtures import polygons_df
            from stac_to_geocore_spark.pipeline import flagship

            images = spark.read.parquet("/root/repo/.cache/bench_images_2000000")
            df = flagship(images, polygons_df(spark, 24))
        else:
            name = {
                "q5": "q5_local_supplier", "q1": "q1_pricing_summary",
                "pip_assign": "pip_assign", "minhash": "minhash_near_dup",
                "asof": "asof_latest_order", "range_join": "range_join_events",
            }[t]
            df = qs[name](spark, "/root/testdata/sf0.01")
        print(f"=== {t} ===")
        print(fmt(df))


if __name__ == "__main__":
    main()
