"""Large-scale data-pipeline operators (beyond the reference's own surface):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
text analysis, multimodal column plumbing. All built on DataFrame primitives
(JVM-side, codegen-friendly); Python appears only in clearly-marked
mapInPandas paths (multimodal decode)."""
