from pyspark.sql import functions as F

from execute_sync_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    direct = {
        r.l_returnflag: (r.n, round(r.total, 2), r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("total"),
            F.min("l_quantity").alias("lo"),
            F.max("l_quantity").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.total, 2), r.lo, r.hi)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("count", "*"), "total": ("sum", "l_quantity"),
             "lo": ("min", "l_quantity"), "hi": ("max", "l_quantity")},
            salt=8,
        ).collect()
    }
    assert direct == salted
