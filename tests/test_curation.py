"""Curation invariants that the DuckDB oracle can't express directly:
split stability under repartitioning, approximate split fractions, and the
balanced cap."""

from pyspark.sql import functions as F

from execute_sync_spark.functions import curation


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_hash_split_fractions_and_stability(spark):
    docs = _docs(spark)
    split = curation.hash_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / total - 0.8) < 0.05
    assert abs(counts["val"] / total - 0.1) < 0.03
    # stability: the assignment is a pure function of doc_id — repartitioning
    # (a different physical order) must not move any row
    again = curation.hash_split(docs.repartition(13), "doc_id").select("doc_id", "split")
    assert split.select("doc_id", "split").exceptAll(again).count() == 0


def test_balanced_sample_cap_and_determinism(spark):
    docs = _docs(spark).select("doc_id", "lang")
    capped = curation.balanced_sample(docs, "lang", "doc_id", 7)
    per_group = capped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 7 for r in per_group)
    assert len(per_group) == docs.select("lang").distinct().count()
    # same draw twice
    again = curation.balanced_sample(docs.repartition(5), "lang", "doc_id", 7)
    assert capped.exceptAll(again).count() == 0


def test_stratified_sample_is_subset_and_scale_free(spark):
    docs = _docs(spark).select("doc_id")
    s10 = curation.stratified_hash_sample(docs, "doc_id", 10)
    s20 = curation.stratified_hash_sample(docs, "doc_id", 20)
    n, n10, n20 = docs.count(), s10.count(), s20.count()
    assert abs(n10 / n - 0.10) < 0.03
    # nested property: raising the rate only ADDS rows (bucket < pct*10)
    assert s10.exceptAll(s20).count() == 0
    assert n10 < n20 < n


def test_bloom_contamination_is_superset_of_exact(spark):
    """Bloom filters have no false negatives: every train doc the exact
    cross-contamination join flags must also be flagged by the bloom probe
    (the reverse — false positives — is allowed and expected)."""
    from tests.conftest import SF_DIR
    from execute_sync_spark.plans import workload

    exact_ids = {r.train_id for r in workload.curate_contamination(spark, SF_DIR).collect()}
    bloom_ids = {r.train_id for r in workload.curate_bloom_contamination(spark, SF_DIR).collect()}
    assert exact_ids <= bloom_ids, exact_ids - bloom_ids


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The leakage property itself: every near-dup cluster lands ENTIRELY in
    one split (a per-document hash split cannot guarantee this), and
    unclustered documents get exactly the plain hash_split assignment of
    their own id."""
    from pyspark.sql import functions as F

    from execute_sync_spark.functions import curation
    from execute_sync_spark.plans import workload
    from tests.conftest import SF_DIR

    out = workload.curate_leakage_safe_split(spark, SF_DIR)
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0

    rows = out.collect()
    singles = [r for r in rows if r.cluster_id == r.doc_id]
    assert singles, "expected some unclustered docs in the fixture corpus"
    plain = {
        r.doc_id: r.split
        for r in curation.hash_split(
            workload._docs(spark, SF_DIR).select("doc_id"), "doc_id"
        ).collect()
    }
    assert all(plain[r.doc_id] == r.split for r in singles)


def test_canonical_keep_picks_longest_member(spark):
    """Canonical rule: the kept doc is the longest member of its cluster
    (ties to lowest id), one keeper per cluster, and keepers cover every
    cluster id exactly once."""
    from pyspark.sql import functions as F

    from execute_sync_spark.plans import workload
    from tests.conftest import SF_DIR

    kept = workload.dedup_canonical_keep(spark, SF_DIR)
    assert kept.groupBy("cluster_id").count().filter(F.col("count") > 1).count() == 0

    docs = workload._docs(spark, SF_DIR).select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    clusters = workload.dedup_clusters(spark, SF_DIR)
    members = docs.join(clusters, docs.doc_id == clusters.vec_id, "left").select(
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"), "n_chars"
    )
    max_len = {
        r.cluster_id: r.m
        for r in members.groupBy("cluster_id").agg(F.max("n_chars").alias("m")).collect()
    }
    for r in kept.collect():
        assert r.n_chars == max_len[r.cluster_id], (r, max_len[r.cluster_id])
