"""Deduplication operators for large text corpora.

Scale notes (the 100 TB story):

- **exact**: one hash-groupBy shuffle on a 16-byte digest — the digest
  groupBy is the canonical map-side-combinable aggregation; skew only if the
  corpus contains one massively-duplicated document (AQE skew-join handles
  the subsequent join-back).
- **MinHash + LSH**: per-doc signature is an `explode -> groupBy(doc)` —
  shuffle keyed by doc_id, perfectly balanced. Candidate generation joins on
  (band, band-hash) buckets so the cross-product never materializes; band
  width tunes recall/cost.
- **n-gram Jaccard**: exact pairwise similarity via shingle inverted index
  (explode + self-join on shingle). Quadratic in the worst case — use only
  after LSH bucketing at scale; provided standalone for verification.
- **SimHash**: per-doc 16/64-bit signature via token explode + bit-count agg;
  near-dup = signatures within small Hamming distance.

Everything is built from explode / groupBy / join — no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from execute_sync_spark.functions.hashing import h32, h32_salted
from execute_sync_spark.functions.text import tokens


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group documents by content digest; canonical id = min doc id."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def word_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) pairs: k-word shingles via posexplode + lead() windows.

    The window is per-document (partitioned by id) so it parallelizes across
    documents; shingle text joins tokens with single spaces.
    """
    tok = docs.select(F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "w"))
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, k)]
    return (
        tok.select(F.col(id_col), F.concat_ws(" ", *cols).alias("shingle"), *[c.alias(f"_w{i}") for i, c in enumerate(cols)])
        .filter(F.col(f"_w{k-1}").isNotNull())
        .select(id_col, "shingle")
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: mh_i = min over shingles of H(i # s)."""
    sh = word_shingles(docs, text_col, id_col, k=shingle_k)
    aggs = [
        F.min(h32_salted(F.col("shingle"), i)).alias(f"mh{i}") for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a candidate
    pair. Join key is (band_index, band values) — the full cross product is
    never formed."""
    bands = []
    for b in range(0, num_hashes, band_size):
        band_cols = [F.col(f"mh{i}") for i in range(b, min(b + band_size, num_hashes))]
        bands.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws(":", *[c.cast("string") for c in band_cols]).alias("band_key"),
            )
        )
    buckets = bands[0]
    for other in bands[1:]:
        buckets = buckets.unionByName(other)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above ``threshold``,
    via a shingle inverted index (explode + self-equi-join + count)."""
    sh = word_shingles(docs, text_col, id_col, k=shingle_k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """Per-document SimHash signature over whitespace tokens.

    bit_b(doc) = 1 iff sum over token occurrences of (2*((H(tok)>>b)&1)-1) > 0.
    One explode + one groupBy(doc) — balanced shuffle keyed by doc id.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    tok = tok.withColumn("h", h32("w"))
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))
