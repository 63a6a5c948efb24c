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


def test_jaccard_max_df_monotone_intersections(spark):
    """max_df measures similarity over the rare-shingle space: at threshold 0
    the candidate pair set and every intersection count can only shrink."""
    from execute_sync_spark.functions import dedupe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {(r.id_a, r.id_b): r.n_inter
            for r in dedupe.ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    capped = {(r.id_a, r.id_b): r.n_inter
              for r in dedupe.ngram_jaccard_pairs(docs, threshold=0.0, max_df=3).collect()}
    assert set(capped) <= set(full)
    assert all(capped[k] <= full[k] for k in capped)
    assert len(capped) < len(full)  # the valve actually prunes on this corpus
