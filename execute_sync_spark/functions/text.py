"""Text-analysis operators over a document corpus (SURVEY §7.1 step 9).

All pure DataFrame expressions (whole-stage codegen, no Python in the hot
path); each scales linearly and partition-parallel — no shuffles except where
an aggregation is the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from execute_sync_spark.functions.hashing import h32
from execute_sync_spark.functions.matpoint import mat

# "BPE-ish" tokenizer: letter runs, digit runs, single punctuation marks.
# Deliberately RE2-safe so the DuckDB oracle can run the identical pattern.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Tiny per-language stopword sets for the n-gram/stopword language heuristic.
# Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
    "es": ["el", "los", "las", "es", "no", "una", "con", "por", "para", "como"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased, trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), "\\s+")


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: lengths, token counts, alpha ratio."""
    t = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        n_alpha.cast("long").alias("n_alpha"),
        F.round(n_alpha / n_chars, 4).alias("alpha_ratio"),
        F.round(n_chars / F.size(t), 4).alias("avg_token_len"),
    )


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting with the BPE-ish regex (training-data budgeting)."""
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe_tokens"),
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic: count tokens in each language's
    stopword set; highest count wins, ties resolve in LANG_STOPWORDS order."""
    t = tokens(text_col)
    hit_cols = []
    for lang, words in LANG_STOPWORDS.items():
        lit_arr = F.array(*[F.lit(w) for w in words])
        # count token *occurrences* in the stopword set (not distinct membership)
        hits = F.size(F.filter(t, lambda x: F.array_contains(lit_arr, x)))
        hit_cols.append((lang, hits.alias(f"hits_{lang}")))
    out = docs.select(F.col(id_col), *[c for _, c in hit_cols])
    langs = list(LANG_STOPWORDS)
    best = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        cand = F.col(f"hits_{lang}")
        best = F.when(cand > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(cand > best_hits, cand).otherwise(best_hits)
    return out.select(
        F.col(id_col),
        *[F.col(f"hits_{lang}").cast("long").alias(f"hits_{lang}") for lang in langs],
        best.alias("guessed_lang"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", gram: int = 8,
                stride: int = 4) -> DataFrame:
    """Document fingerprint: minimum rolling hash over character n-grams
    (winnowing's min-selection, one window = whole doc), sampling every
    ``stride``-th gram start — hashing is the whole cost of this operator
    and a strided sample keeps the min-hash property (any shared region
    >= gram+stride chars still collides) at 1/stride the work.

    Physical shape mirrors minhash_signatures: explode the gram positions
    (explode_outer — see word_shingles for why), md5 each gram in CODEGEN'd
    expressions, and take a map-side-combined MIN per doc — the shuffle is
    one long per doc per map task. (A transform()-lambda formulation keeps
    everything per-row but runs interpreted, ~3x slower.)"""
    c = F.col(text_col)
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(c) - (gram - 1), F.lit(1)), F.lit(stride)
    )
    # build gram STRINGS per-row (cheap substrings), explode those, then md5
    # in codegen — exploding positions instead would copy the whole text
    # into every gram row
    gram_arr = F.transform(positions, lambda i: c.substr(i, F.lit(gram)))
    grams = (
        docs.select(F.col(id_col), F.explode_outer(gram_arr).alias("__g"))
        .filter(F.col("__g").isNotNull())
        .select(F.col(id_col), h32(F.col("__g")).alias("__h"))
    )
    return grams.groupBy(id_col).agg(F.min("__h").alias("fingerprint")).select(
        F.col(id_col),
        "fingerprint",
        F.round(F.col("fingerprint") / F.lit(2**32), 6).alias("fingerprint_unit"),
    )


def quality_rules(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style heuristic quality gate (Rae et al. 2021, "Scaling
    Language Models" §A.1.1 repetition/format rules, adapted to what a
    whitespace tokenizer can see): token-count bounds, mean token length
    bounds, symbol ratio, and a stopword-presence check. Emits the rule
    verdicts per document plus the combined pass flag, so downstream
    curation can both filter and report per-rule rejection rates.

    All expressions are JVM-side codegen'd string ops — no UDFs — and the
    operator is embarrassingly parallel: no shuffle at any scale."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    # characters that are part of tokens (everything but whitespace)
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    mean_tok_len = n_nonspace / n_tokens
    n_symbols = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[#*\.]{3,}|[#*]", ""))
    symbol_ratio = n_symbols / n_nonspace
    has_stopword = F.lower(F.col(text_col)).rlike(r"(^|\s)(the|and|of|to|in)(\s|$)")
    r_tokens = (n_tokens >= 5) & (n_tokens <= 50000)
    r_tok_len = (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    r_symbols = symbol_ratio <= 0.1
    return docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        r_tokens.alias("ok_token_count"),
        r_tok_len.alias("ok_token_len"),
        r_symbols.alias("ok_symbols"),
        has_stopword.alias("ok_stopword"),
        (r_tokens & r_tok_len & r_symbols & has_stopword).alias("passes"),
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-self unigram language-model score — the CCNet/KenLM-shaped
    quality signal without an external model: P(w) is the token's relative
    frequency in THIS corpus, a document's score is its mean token log-prob
    (typical prose scores high; rare-token soup and boilerplate-free noise
    score low). ``ppl_proxy = exp(-avg_logprob)`` is the familiar
    perplexity-style view of the same number.

    Scale: identical dataflow to tf-idf (same file) — the token→count table
    IS the vocabulary (billions of rows at 100 TB), so it is NEVER
    broadcast; the corpus token total arrives as a broadcast 1-row
    cross-join instead of a separate count job. Two map-side-combined
    aggregations plus one equi-join on token; no UDFs anywhere.
    """
    tok = (
        docs.select(F.col(id_col), F.explode_outer(tokens(text_col)).alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    freq = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("_total"))
    logp = F.col("tf") * F.log(F.col("cnt") / F.col("_total"))
    return (
        tf.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(logp) / F.sum("tf")).alias("_avg"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(F.col("_avg"), 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 4).alias("ppl_proxy"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones; the Okapi BM25 scoring
    every search stack uses) for ONE query over the corpus:
    ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`` and
    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.
    N and avgdl count only docs with ≥1 token (token-free docs can never
    match and are excluded on both engine and oracle sides). Returns the
    top-k docs by (score desc, id) with their matched-term count.

    Scale shape: the corpus token stream is scanned ONCE (doc-length agg);
    per-query work touches only postings of the query's terms — the
    tf table is pre-filtered by an `isin` on the (tiny, literal) term set
    BEFORE any shuffle, so the groupBy aggregates query-term postings
    only. df and the (N, avgdl) scalars are broadcast 1-row/short tables;
    the final top-k is a TakeOrdered, not a global sort. At 100 TB this is
    the query side of an inverted index: with the tf table written out
    bucketed by token, each extra query is a partition-pruned probe."""
    qt = [t.lower() for t in query_terms]
    # doc length is a pure per-row EXPRESSION (array size) — no explode, no
    # shuffle; the only full-token fan-out is the tf branch, and its isin
    # filter drops non-query tokens before the (id, token) shuffle, so the
    # aggregated postings are query-sized, not corpus-sized
    base = docs.select(
        F.col(id_col),
        F.filter(tokens(text_col), lambda x: x != "").alias("__toks"),
    ).select(
        F.col(id_col), "__toks", F.size("__toks").cast("long").alias("dl")
    ).filter(F.col("dl") > 0)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("dl").alias("_avgdl"),
    )
    # dl rides as a GROUP KEY (functionally dependent on the doc id): group
    # keys survive column pruning in every consumer, so the df branch below
    # shares this exact aggregation subtree and Catalyst REUSES the one
    # postings exchange instead of re-scanning the corpus (plan-asserted in
    # tests/test_plan_quality.py)
    tf = (
        base.select(F.col(id_col), "dl", F.explode("__toks").alias("token"))
        .filter(F.col("token").isin(qt))
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    return _bm25_rank(tf, stats, k=k, k1=k1, b=b, id_col=id_col)


def _bm25_rank(
    tf: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """Shared BM25 scorer+ranker: ``tf`` is the query-term postings
    relation (id, dl, token, tf) — from the in-flight corpus scan
    (``bm25_topk``) or from a partition-pruned persisted-index probe
    (``bm25_topk_indexed``); ``stats`` the broadcast 1-row (_n_docs,
    _avgdl). ONE body so the two physical paths cannot drift."""
    df_ = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))
    term_score = idf * (F.col("tf") * (k1 + 1)) / norm
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(term_score), 6).alias("score"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    # rank over the <=k post-limit rows; NON-FOLDABLE constant partition key
    # (substring(col,0,0) — Catalyst has no simplification for it) so the
    # spec survives optimization and WindowExec doesn't emit its global-
    # window warning on every bench run (a plain lit(0) gets constant-folded
    # back to an unpartitioned window spec)
    w = Window.partitionBy(F.substring(F.col(id_col).cast("string"), 0, 0)).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "score", "n_terms_hit"
    )


def ccnet_scored(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The per-document (id, n_tokens, avg_logprob, ppl_proxy, lang)
    relation both CCNet tilings rank — unigram_logprob plus the language
    column. Exposed so a composition that runs BOTH tilings (the
    text_ccnet_buckets_approx agreement row) can materialize this
    corpus-shaped subtree once and feed it to each side via ``scored=``
    (the minhash_signatures(shingles=) precedent)."""
    return unigram_logprob(docs, text_col, id_col).join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    )


def ccnet_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    scored: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    rank every document by its corpus-self LM score WITHIN its language and
    split each language into equal-depth head / middle / tail thirds —
    the standard pretraining-corpus triage (train on head+middle, sample
    or drop tail). The score is ``unigram_logprob``'s mean token log-prob
    (already rounded to 6 dp, so the ordering key is engine-portable);
    ties break on id, making the tiling fully deterministic.

    Scale shape: scoring is the tf-idf dataflow (vocabulary never
    broadcast); the tiling is ONE window per language — an exact
    equal-depth NTILE needs a per-language sort, which at 100 TB is a
    range-partitioned sort per language (Spark's window machinery does
    exactly this). If exactness is not required at that scale, swap the
    window for approx_percentile score thresholds computed in one pass
    and bucket by comparison — same output contract; the exact form is
    declared for the oracle."""
    if scored is None:
        scored = ccnet_scored(docs, text_col, id_col, lang_col)
    w = Window.partitionBy(lang_col).orderBy(F.desc("avg_logprob"), F.asc(id_col))
    tile = F.ntile(3).over(w)
    return scored.select(
        F.col(id_col),
        F.col(lang_col),
        "n_tokens",
        "avg_logprob",
        F.element_at(F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tile).alias("bucket"),
    )


def ccnet_buckets_approx(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    accuracy: int = 10000,
    scored: DataFrame | None = None,
) -> DataFrame:
    """The 100 TB form of ``ccnet_buckets`` (the swap that function's
    docstring declares, now implemented — VERDICT r8 task 7): instead of
    an exact equal-depth NTILE(3) — a range-partitioned global sort per
    language — compute each language's two score thresholds with
    ``percentile_approx`` (Greenwald-Khanna sketch, one aggregation pass,
    rank error ≤ n/accuracy) and bucket every document by COMPARISON
    against its language's broadcast thresholds. No sort anywhere: the
    cost is one partial-aggregated groupBy over languages (tiny) plus a
    broadcast join, which is what survives at corpus scale. Output
    contract matches ccnet_buckets; placement can differ from the exact
    tiling only for documents at the tile boundaries (sketch rank error +
    NTILE's remainder handling), which is the accepted trade of the
    approx form."""
    if scored is None:
        # the scored relation feeds BOTH the threshold aggregation and the
        # bucket join below — materialize the corpus-shaped subtree
        # (tokenize + tf + vocabulary join + per-doc agg) once instead of
        # once per consumer (r16 profile; the shared-subtree pattern of
        # dedupe.word_shingles / curation's NB tf)
        scored = mat(ccnet_scored(docs, text_col, id_col, lang_col), "ccnet_scored")
    # ranking is score-DESC, so the head/middle cut sits at the ascending
    # 2/3 quantile and the middle/tail cut at the ascending 1/3 quantile
    thresholds = scored.groupBy(lang_col).agg(
        F.percentile_approx("avg_logprob", [2.0 / 3.0, 1.0 / 3.0], accuracy).alias("__t")
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.element_at("__t", 1), "head")
        .when(F.col("avg_logprob") >= F.element_at("__t", 2), "middle")
        .otherwise("tail")
    )
    # eqNullSafe: the exact form's window partitions NULL langs into their
    # own tile group, so the approx form must bucket them too — a plain
    # equi-join would silently drop every null-lang document (ADVICE r9).
    # thresholds derives from scored, so alias both sides to keep the
    # self-join attribute resolution unambiguous.
    s = scored.alias("__s")
    t = thresholds.alias("__t_side")
    return s.join(
        F.broadcast(t),
        F.col(f"__s.{lang_col}").eqNullSafe(F.col(f"__t_side.{lang_col}")),
    ).select(
        F.col(f"__s.{id_col}"),
        F.col(f"__s.{lang_col}"),
        F.col("__s.n_tokens"),
        F.col("__s.avg_logprob"),
        bucket.alias("bucket"),
    )


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """The dataset-card query: per (lang, source) corpus statistics a
    pretraining pipeline reports before/after each curation stage — doc
    and token volumes, average length, EXACT-duplicate rate (distinct
    text digests vs docs), and the mean alpha-ratio quality signal. One
    map-side-combined aggregation; the dup rate rides as
    approx-free COUNT(DISTINCT md5) inside the same groupBy (Spark plans
    distinct-agg via expand — still a single shuffle on the group key)."""
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    base = docs.select(
        *[F.col(c) for c in group_cols],
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("__nt"),
        F.length(F.col(text_col)).cast("long").alias("__nc"),
        (n_alpha / F.length(F.col(text_col))).alias("__q"),
        F.md5(F.col(text_col)).alias("__digest"),
    )
    return (
        base.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("n_tokens"),
            F.round(F.avg("__nc"), 4).alias("avg_chars"),
            F.countDistinct("__digest").cast("long").alias("n_unique_texts"),
            F.round(
                (F.count("*") - F.countDistinct("__digest")) / F.count("*"), 6
            ).alias("dup_ratio"),
            F.round(F.avg("__q"), 6).alias("avg_alpha_ratio"),
        )
    )


def boilerplate_chunks(
    docs: DataFrame,
    chunk_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, chunk) — the document sliced into consecutive
    fixed-width word windows, the sub-document dedup unit for corpora
    whose texts carry no line structure (CCNet dedups per LINE, Wenzek et
    al. 2020 §4.1; a fixed word window is the same idea with a
    deterministic splitter). The slicing itself is one JVM-side
    higher-order expression per document — sequence/slice/array_join
    inside whole-stage codegen, no shuffle, no Python — so chunking is
    embarrassingly parallel at any scale."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * chunk_words + 1, chunk_words), " "),
    )
    return docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk"))


def boilerplate_removal(
    docs: DataFrame,
    min_docs: int = 2,
    chunk_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style sub-document deduplication: drop every chunk that
    appears (verbatim) in >= ``min_docs`` DISTINCT documents — the
    boilerplate remover (headers, footers, license blurbs, navigation)
    that runs before document-level near-dedup in CommonCrawl-derived
    pipelines. Returns (id, text_clean, n_chunks, n_removed) with
    text_clean reassembled from the surviving chunks in order.

    100 TB shape: chunk frequency is ONE map-side-combined aggregation on
    the chunk; the boilerplate set (df >= min_docs) is a small fraction
    of distinct chunks, so membership is a BROADCAST left join (CCNet
    ships the same thing as a hash-set side input); reassembly is the
    single data-sized shuffle, keyed on the document id. At deployment
    scale the frequency table keys on xxhash64(chunk) rather than the
    chunk text (same plan, 8-byte keys); the text form here keeps the
    DuckDB oracle exact."""
    ch = boilerplate_chunks(docs, chunk_words, text_col, id_col)
    boiler = (
        ch.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("chunk", F.lit(1).alias("__b"))
    )
    marked = ch.join(F.broadcast(boiler), "chunk", "left")
    # collect_list skips nulls: boilerplate chunks vanish from the rebuilt
    # text while still counting in n_chunks/n_removed
    kept_struct = F.when(F.col("__b").isNull(), F.struct("chunk_id", "chunk"))
    return marked.groupBy(id_col).agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["chunk"]
                ),
                " ",
            ),
            F.lit(""),
        ).alias("text_clean"),
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# persisted BM25 postings index (round 13)
#
# bm25_topk's docstring has always declared the 100 TB deployment: "with
# the tf table written out bucketed by token, each extra query is a
# partition-pruned probe". This materializes that claim with the same
# machinery every other persisted index here uses (functions/
# index_commit.py: replay-idempotent batch appends, per-leaf manifests,
# recoverable two-rename compaction, crash sweep).
#
# Layout under <path>/:
#   postings/tb=<0..63>/batch_id=<id>/  — rows (id, dl, token, tf), tb =
#     portable-hash(token) mod 64 (one dir per TOKEN would explode the
#     namespace at vocabulary scale; 64 buckets keep leaves large and a
#     q-term probe reads <= q of them), rows sorted by token inside each
#     leaf so the pushed token IN (...) filter also skips row groups.
#   stats/batch_id=<id>/ — ONE row (n_docs, sum_dl) per ingest batch:
#     corpus N and avgdl are Σs over these tiny rows, so the scalars stay
#     exact under incremental appends with no index rescan and no mutable
#     counter (a replayed batch overwrites its own stats partition with
#     the same deterministic values — the layout-is-the-ledger idiom).

BM25_TOKEN_BUCKETS = 64
_BM25_TB_SALT = 11


def _bm25_base(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(id_col),
            F.filter(tokens(text_col), lambda x: x != "").alias("__toks"),
        )
        .select(F.col(id_col), "__toks", F.size("__toks").cast("long").alias("dl"))
        .filter(F.col("dl") > 0)
    )


def _bm25_postings_rows(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from execute_sync_spark.functions.hashing import h32_salted

    tf = (
        _bm25_base(docs, text_col, id_col)
        .select(F.col(id_col), "dl", F.explode("__toks").alias("token"))
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    tb = F.pmod(h32_salted("token", _BM25_TB_SALT), F.lit(BM25_TOKEN_BUCKETS))
    return tf.withColumn("tb", tb.cast("long"))


def _bm25_write_stats(docs: DataFrame, path: str, batch_id: str,
                      text_col: str, id_col: str) -> None:
    stats = _bm25_base(docs, text_col, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )
    import os as _os

    stats.coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(path, "stats", f"batch_id={batch_id}")
    )


def build_bm25_index(
    docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Materialize the inverted postings index: the corpus token stream is
    scanned ONCE here; every subsequent query is a partition-pruned probe
    that never re-reads text. ``batch_id=__full__`` is the bootstrap
    build, the convention shared with the other persisted indexes.

    A FULL rebuild resets BOTH sidecars atomically (ADVICE r13): the
    static-overwrite postings write replaces the whole postings/ tree,
    but stale per-batch stats dirs from earlier appends would survive a
    stats/batch_id=__full__ overwrite and silently overcount (N, avgdl)
    against postings that no longer exist — so the stats/ tree is removed
    before writing."""
    import os as _os

    from execute_sync_spark import storage

    stats_dir = _os.path.join(path, "stats")
    if storage.STORE.isdir(stats_dir):
        storage.STORE.rmtree(stats_dir)

    rows = (
        _bm25_postings_rows(docs, text_col, id_col)
        .withColumn("batch_id", F.lit("__full__"))
        .repartition("tb")
        .sortWithinPartitions("token")
    )
    rows.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("tb", "batch_id").parquet(_os.path.join(path, "postings"))
    _bm25_write_stats(docs, path, "__full__", text_col, id_col)
    return path


def append_bm25_index(
    new_docs: DataFrame,
    path: str,
    batch_id,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, ...]]:
    """Incremental maintenance: tokenize ONLY the new batch (the existing
    postings are never read or reshuffled), land it under (tb, batch_id)
    via the shared commit protocol, and record the batch's (n_docs,
    sum_dl) stats row. Replays overwrite their own partitions; batches
    already folded by ``compact_bm25_index`` are skipped through the
    manifests (the stats rewrite is value-identical either way). Assumes
    an append-only corpus, like every persisted index here."""
    import os as _os

    from execute_sync_spark.functions import index_commit

    touched = index_commit.append(
        _bm25_postings_rows(new_docs, text_col, id_col),
        _os.path.join(path, "postings"),
        index_commit.BM25_SPEC,
        batch_id,
    )
    _bm25_write_stats(new_docs, path, str(batch_id), text_col, id_col)
    return touched


def compact_bm25_index(spark, path: str) -> list[tuple[str, ...]]:
    """Collapse each dirty token bucket's batch partitions into one
    ``batch_id=__compacted__`` partition (shared protocol; stats rows are
    one row per batch and never need compaction)."""
    import os as _os

    from execute_sync_spark.functions import index_commit

    return index_commit.compact(
        spark, _os.path.join(path, "postings"), index_commit.BM25_SPEC
    )


def sweep_bm25_index(path: str, min_age_s: float = 0.0) -> dict[str, list[str]]:
    """Crash recovery for ``compact_bm25_index``'s two-rename windows."""
    import os as _os

    from execute_sync_spark.functions import index_commit

    return index_commit.sweep(
        _os.path.join(path, "postings"), index_commit.BM25_SPEC, min_age_s
    )


def bm25_topk_indexed(
    spark,
    index_path: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval against the PERSISTED postings index — identical
    semantics (and one shared ``_bm25_rank`` body) with ``bm25_topk``'s
    in-flight corpus scan, so the two physical paths share one oracle.
    The probe computes the query terms' buckets DRIVER-side with the
    portable hash's Python twin and reads only those tb partitions
    (partition pruning) with ``token IN (...)`` pushed into token-sorted
    row groups; (N, avgdl) are exact Σs over the tiny per-batch stats
    rows. Per-query cost tracks query selectivity, not corpus size."""
    import os as _os

    from pyspark.errors import AnalysisException

    from execute_sync_spark import storage
    from execute_sync_spark.functions import index_commit
    from execute_sync_spark.functions.hashing import h32_salted_py

    postings = _os.path.join(index_path, "postings")
    index_commit.check_not_stranded(postings, index_commit.BM25_SPEC)
    if not storage.STORE.isdir(index_path):
        # a typo'd / nonexistent index path must fail LOUDLY (the
        # lsh_topk_indexed rule)
        raise FileNotFoundError(f"bm25_topk_indexed: no index at {index_path}")

    def _empty():
        return spark.createDataFrame(
            [], f"{id_col} long, rank int, score double, n_terms_hit long"
        )

    qt = sorted({t.lower() for t in query_terms})
    if not qt:
        return _empty()
    tbs = sorted({h32_salted_py(t, _BM25_TB_SALT) % BM25_TOKEN_BUCKETS for t in qt})
    try:
        tf = (
            spark.read.parquet(postings)
            .filter(F.col("tb").isin(tbs) & F.col("token").isin(qt))
            .select(id_col, "dl", "token", "tf")
        )
        stats = (
            spark.read.parquet(_os.path.join(index_path, "stats"))
            .agg(
                F.sum("n_docs").cast("double").alias("_n_docs"),
                (F.sum("sum_dl") / F.sum("n_docs")).alias("_avgdl"),
            )
        )
    except AnalysisException:
        # an index built from an empty corpus has no data files and no
        # inferable schema; with existence checked above, only that case
        # falls back to the empty-result contract
        return _empty()
    return _bm25_rank(tf, stats, k=k, k1=k1, b=b, id_col=id_col)


def char_entropy(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-level Shannon entropy per document, plus the most-frequent
    character's share — the repetition/degenerate-text signals quality
    pipelines use alongside Gopher rules (low entropy = boilerplate or
    repeated filler; high top-char share = separator spam).

    Entropy uses the exact-integer form H = log2(n) - (Σ c·log2 c)/n over
    per-character counts c, so both engines sum the same ~|alphabet| terms.
    Physical shape: explode characters -> (doc, char) hash aggregation
    (map-side combine collapses repeats before the shuffle: the shuffle
    carries at most |alphabet| rows per doc per task, not byte_len) ->
    per-doc aggregation. All codegen'd string ops, no UDF; linear in
    corpus bytes at any scale."""
    c = F.col(text_col)
    chars = docs.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n"),
        # "(?!^)" splits between every pair of adjacent characters; with
        # Spark's default limit=-1 the end-of-string boundary also matches
        # and yields one trailing "" field — dropped below (it would only
        # inflate n_distinct_chars: a cnt=1 field contributes 1*log2(1)=0
        # to the entropy sum)
        F.explode(F.split(c, "(?!^)")).alias("ch"),
    )
    counts = (
        chars.filter(F.col("ch") != "")
        .groupBy(id_col, "n", "ch")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.groupBy(id_col, "n")
        .agg(
            (F.log2(F.col("n")) - F.sum(F.col("cnt") * F.log2("cnt")) / F.col("n")).alias("__h"),
            (F.max("cnt") / F.col("n")).alias("__top"),
            F.count("*").cast("long").alias("n_distinct_chars"),
        )
        .select(
            F.col(id_col),
            F.col("n").alias("n_chars"),
            "n_distinct_chars",
            F.round("__h", 6).alias("entropy_bits"),
            F.round("__top", 6).alias("top_char_frac"),
        )
    )


def zipf_slope(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by_col: str = "lang",
    top_n: int = 100,
    min_count: int = 5,
) -> DataFrame:
    """Zipf-law slope per corpus slice (``by_col``): OLS slope of
    log(freq) on log(rank) over the slice's ``top_n`` most frequent
    tokens — a one-pass corpus-health metric (a natural-language slice
    sits near -1; template/boilerplate floods and synthetic junk bend it).

    Physical shape: one token aggregation (map-side combined) ->
    ``min_count`` valve (drops the long tail BEFORE ranking, so the
    per-slice window sorts a vocabulary capped by the valve, not raw
    corpus vocabulary — the 100 TB guard) -> per-slice rank window ->
    covar_pop/var_pop slope in one tiny aggregation. Ranking ties break
    on the token string, so both engines rank identically."""
    t = tokens(text_col)
    tf = (
        docs.select(F.col(by_col).alias("slice_key"), F.explode(t).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("slice_key", "w")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
    w = Window.partitionBy("slice_key").orderBy(F.desc("freq"), F.asc("w"))
    ranked = tf.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= top_n)
    x = F.log(F.col("rk").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    # a slice with one surviving term has var_pop = 0: its slope is
    # undefined (NULL), not a divide-by-zero (ANSI mode errors on it)
    return (
        ranked.groupBy("slice_key")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(
                F.when(F.var_pop(x) != 0.0, F.covar_pop(x, y) / F.var_pop(x)), 4
            ).alias("zipf_slope"),
        )
        .select(F.col("slice_key").alias(by_col), "n_terms", "zipf_slope")
    )


def backoff_lm(
    docs: DataFrame,
    train_filter: Column | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stupid-Backoff trigram language-model quality score (Brants et al.
    2007, *Large Language Models in Machine Translation* — the LM scheme
    DESIGNED for MapReduce-scale corpora: raw relative frequencies with a
    fixed backoff penalty, no discounting pass, so "training" is nothing
    but three map-side-combined n-gram counts). The model trains on the
    ``train_filter`` slice (None = the whole corpus) and scores EVERY
    document: each position is scored at its maximal order (trigram from
    position 2 on, bigram at position 1, unigram at position 0), backing
    off one order at a time with penalty ``alpha`` where the higher-order
    gram was never seen in training; a token outside the training
    vocabulary scores ``alpha / N`` at the unigram level.

    Output per doc: ``n_tokens``, the mean log-score ``avg_logprob``
    (6 dp), the perplexity-style view ``ppl_proxy = exp(-avg)``, and the
    integer diagnostics ``n_backoff`` (positions scored below their
    maximal order) and ``n_oov`` (tokens unseen in training) — the
    knobs a CCNet-style filter thresholds on.

    Scale: the three count relations are VOCABULARY-shaped (the trigram
    table is billions of rows at 100 TB) and are therefore NEVER
    broadcast — scoring is five equi-joins on n-gram keys against the
    sharded count tables, exactly the distributed-serving layout of the
    Brants paper — plus one broadcast 1-row training total. The only
    corpus-shaped exchange is the per-doc lag window (partitioned by
    ``id_col``, never global). No UDFs; everything stays in codegen.
    """
    # The corpus-shaped gram relation (tokenize + posexplode + two lag
    # windows) feeds FOUR consumers — the three count aggregations and the
    # scoring join chain — so without materialization the tokenize+window
    # pass executes once per consumer (r16 profile: the dominant cost of
    # this row). Eagerly localCheckpoint ONCE; the streaming twin
    # (streaming/backoff_lm.py) keeps the lazy form because its counts come
    # from the persisted sidecar, not from this relation.
    g = mat(backoff_lm_grams(docs, train_filter, text_col, id_col), "lm_grams")
    uni, bi, tri = backoff_lm_counts(g)
    return backoff_lm_score(g, uni, bi, tri, alpha=alpha, id_col=id_col)


def backoff_lm_grams(
    docs: DataFrame,
    train_filter: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The per-position n-gram relation both LM paths share: token with
    its two predecessors (per-doc lag window) plus the ``_is_train``
    flag. Tokenization happens HERE and only here, so the flat and
    stream-maintained models cannot diverge on the token stream."""
    d = docs.withColumn(
        "_is_train", train_filter if train_filter is not None else F.lit(True)
    )
    tok = (
        d.select(
            F.col(id_col), "_is_train",
            F.posexplode(tokens(text_col)).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    return tok.withColumn("w1", F.lag("w", 1).over(win)).withColumn(
        "w2", F.lag("w", 2).over(win)
    )


def backoff_lm_counts(
    grams: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The Stupid-Backoff sufficient statistics from the train slice:
    integer unigram (w, c1), bigram (w1, w, c2), trigram (w2, w1, w, c3)
    count relations. Pure sums — per-batch statistics summed key-wise
    reconstruct the flat-trained model EXACTLY (n-grams never cross
    document, so never cross batch), which is what
    streaming/backoff_lm.py relies on."""
    train = grams.filter(F.col("_is_train"))
    uni = train.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    bi = (
        train.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        train.filter(F.col("w2").isNotNull())
        .groupBy("w2", "w1", "w")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    return uni, bi, tri


def backoff_lm_score(
    grams: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    alpha: float = 0.4,
    id_col: str = "doc_id",
) -> DataFrame:
    """The ONE scoring body (the ``nb_score_tf`` precedent): per-position
    maximal-order scoring with fixed-penalty backoff over whatever count
    relations arrive — inline corpus aggregates (``backoff_lm``) or the
    summed streaming sidecar (``streaming/backoff_lm.py``). The training
    total derives from the unigram relation, so callers cannot hand in an
    inconsistent N."""
    import math

    g = grams
    tot = uni.agg(F.sum("c1").cast("double").alias("n_train"))
    ctx2 = bi.select(
        F.col("w1").alias("w2"), F.col("w").alias("w1"), F.col("c2").alias("ctx2")
    )
    ctx1 = uni.select(F.col("w").alias("w1"), F.col("c1").alias("ctx1"))
    la = math.log(alpha)
    max_order = (
        F.when(F.col("pos") >= 2, 3).when(F.col("pos") == 1, 2).otherwise(1)
    )
    used_order = (
        F.when(F.col("c3").isNotNull(), 3)
        .when(F.col("c2").isNotNull(), 2)
        .otherwise(1)
    )
    logs = (
        F.when(F.col("c3").isNotNull(), F.log(F.col("c3") / F.col("ctx2")))
        .when(
            F.col("c2").isNotNull(),
            F.log(F.col("c2") / F.col("ctx1")) + (max_order - 2) * F.lit(la),
        )
        .otherwise(
            F.log(F.coalesce(F.col("c1"), F.lit(alpha)) / F.col("n_train"))
            + (max_order - 1) * F.lit(la)
        )
    )
    scored = (
        g.join(tri, ["w2", "w1", "w"], "left")
        .join(bi, ["w1", "w"], "left")
        .join(uni, ["w"], "left")
        .join(ctx2, ["w2", "w1"], "left")
        .join(ctx1, ["w1"], "left")
        .crossJoin(F.broadcast(tot))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (F.sum(logs) / F.count(F.lit(1))).alias("_avg"),
            F.sum((used_order < max_order).cast("int")).cast("long").alias("n_backoff"),
            F.sum(F.col("c1").isNull().cast("int")).cast("long").alias("n_oov"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(F.col("_avg"), 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 4).alias("ppl_proxy"),
            "n_backoff",
            "n_oov",
        )
    )


def pmi_collocations(
    docs: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks 1990):
    the ``top_k`` adjacent token bigrams by
    ``PMI = ln( p(ab) / (p(a) · p(b)) )`` with a ``min_count`` evidence
    valve — the standard corpus-exploration / phrase-mining signal (high
    PMI = the pair co-occurs far above chance: multiword expressions,
    templates, boilerplate markers).

    Physical shape mirrors ``zipf_slope``: one bigram aggregation and one
    unigram aggregation (both map-side combined), the two corpus totals
    as a broadcast 1-row cross-join, the valve BEFORE ranking so the
    ranked relation is evidence-capped, and the top-k as
    ``orderBy().limit()`` (TakeOrderedAndProject: per-partition heap +
    driver merge — never a global sort over vocabulary² rows). Ordering
    key is the 4-dp-rounded PMI with the bigram string as tie-break, so
    both engines rank identically."""
    t = tokens(text_col)
    n = F.size(t)
    pair = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bi = (
        docs.select(F.explode_outer(pair).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    uni = (
        docs.select(F.explode(t).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    tot = uni.agg(F.sum("c_w").cast("double").alias("n_uni"))
    # corpus bigram total must count ALL bigrams, not just valved ones:
    # derive it exactly as sum(per-doc max(tokens - 1, 0))
    n_bi_true = docs.select(
        F.sum(F.greatest(F.size(t) - 1, F.lit(0))).cast("double").alias("n_bi")
    )
    pmi = F.round(
        F.log(
            (F.col("c_ab") / F.col("n_bi"))
            / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
        ),
        4,
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("a"), F.col("c_w").alias("c_a")), "a")
        .join(uni.select(F.col("w").alias("b"), F.col("c_w").alias("c_b")), "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_bi_true))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            F.col("c_ab").cast("long").alias("n"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(top_k)
    )
    w = Window.partitionBy(F.substring("bigram", 0, 0)).orderBy(
        F.desc("pmi"), F.asc("bigram")
    )
    return scored.withColumn("rank", F.row_number().over(w))


def _bpe_merge_fold(s_col: Column, a: str, b: str, merged: str) -> Column:
    """Apply ONE BPE merge (a, b) -> merged to a space-padded symbol
    string (`` s p a r k _ ``) as a single left fold — greedy
    left-to-right non-overlapping replacement, the classic BPE
    application order. The accumulator keeps a leading AND trailing
    space, so ``ends_with(acc, " a ")`` tests exactly "last completed
    symbol == a"; a merge can never create a new (a, b) adjacency within
    the same step (the merged symbol is strictly longer than either
    side), so one pass is the fixpoint."""
    return F.aggregate(
        F.split(F.trim(s_col), " "),
        F.lit(" "),
        lambda acc, x: F.when(
            acc.endswith(f" {a} ") & (x == F.lit(b)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - (len(a) + 1)),
                F.lit(merged + " "),
            ),
        ).otherwise(F.concat(acc, x, F.lit(" "))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[tuple[int, str, str, str, int]]]:
    """Train a byte-pair-encoding tokenizer IN-ENGINE (Sennrich et al.
    2016, as productionized by word-frequency BPE trainers): the corpus
    collapses to the distinct-word + count relation ONCE (the standard
    trick — pair statistics over a 100 TB corpus are exactly pair
    statistics over its vocabulary weighted by word frequency), each word
    becomes a space-delimited character sequence with a ``_`` end-of-word
    symbol, and each merge step is one map-side-combined pair-count
    aggregation over the VOCABULARY relation plus a single-row argmax
    collect (the bounded-small collect precedent: centroids, bucket
    lists) — ties break (count desc, left asc, right asc) so training is
    fully deterministic. Merge application is the no-UDF string fold in
    ``_bpe_merge_fold``; chained folds stay narrow over the
    locally-checkpointed vocab, so no step rescans the corpus.

    Returns ``(vocab_df, merges)``: the vocabulary with its final symbol
    sequence column ``s``, and the learned merge list
    ``(step, lhs, rhs, merged, pair_count)``.

    If the corpus runs out of mergeable pairs before ``n_merges`` (every
    word fused to one symbol — or the corpus is EMPTY, which at 100 TB
    is a routine partition-pruned case), training STOPS EARLY and
    returns the merges learned so far, the standard trainer behavior.
    Note the unrolled SQL oracle in plans/workload.py assumes the corpus
    admits all ``n_merges`` steps (true at every gated SF; the
    empty-corpus case agrees trivially — both sides return no rows);
    the in-between degenerate band is covered by pytest, not the gate."""
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "s",
            F.concat(
                F.lit(" "), F.regexp_replace("w", "(.)", "$1 "), F.lit("_ ")
            ),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("s")), " ")
        n = F.size(syms)
        best = (
            vocab.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, n - 1),
                        F.slice(syms, 2, n - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .first()
        )
        if best is None:
            break  # exhausted (or empty) corpus: stop early, keep merges so far
        a, b, pc = best["a"], best["b"], int(best["pc"])
        merges.append((step, a, b, a + b, pc))
        # Re-materialize the (vocabulary-sized, tiny) relation after every
        # fold: _bpe_merge_fold is an interpreted higher-order aggregate
        # with a string-concat accumulator, and without this step k's
        # pair-count pass re-evaluates folds 1..k-1 — ~21 fold evaluations
        # over the 6-merge trajectory (plus 6 more at apply time) collapse
        # to exactly one per merge (r16 profile: the fold chain, not the
        # corpus pass, dominated text_bpe_tokenize/merges).
        vocab = vocab.withColumn(
            "s", _bpe_merge_fold(F.col("s"), a, b, a + b)
        ).localCheckpoint(eager=True)
    return vocab, merges


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The learned BPE merge table: one row per merge step —
    ``(step, lhs, rhs, merged, pair_count)``. See ``bpe_train``."""
    _, merges = bpe_train(docs, n_merges=n_merges, text_col=text_col, id_col=id_col)
    return docs.sparkSession.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, pair_count long"
    )


def bpe_fertility(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the in-engine-trained BPE segmentation back to the corpus and
    report the tokenizer-budgeting stats per document: word count, BPE
    subword count, and fertility (subwords per word — THE tokenizer-
    efficiency metric for pretraining cost models). A standalone ``_``
    end-marker counts with its word's final symbol, so a fully-merged
    word has fertility 1.

    Scale: segmentation is precomputed per DISTINCT word on the vocab
    relation (chained narrow folds over the checkpoint), then applied as
    one word-key equi-join — AQE broadcasts it at bench vocab, shuffles
    at web-scale vocab; never per-token Python."""
    vocab, _ = bpe_train(docs, n_merges=n_merges, text_col=text_col, id_col=id_col)
    n_sub = (
        F.size(F.split(F.trim(F.col("s")), " "))
        - F.when(F.col("s").endswith(" _ "), 1).otherwise(0)
    )
    vstats = vocab.select("w", n_sub.cast("long").alias("n_sub"))
    return (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .join(vstats, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
            F.round(
                F.sum("n_sub") / F.count(F.lit(1)).cast("double"), 4
            ).alias("fertility"),
        )
    )


def llr_collocations(
    docs: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Log-likelihood-ratio collocations (Dunning 1993) — the G² test
    over the bigram contingency table, the collocation statistic that
    stays calibrated at low counts where PMI explodes (the reason
    Dunning wrote the paper). For bigram (a, b): k11 = c(ab),
    k12 = c(a·) − k11, k21 = c(·b) − k11, k22 = N − k12 − k21 − k11,
    with margins taken over the UNVALVED bigram relation, and
    G² = 2·Σ xlogx via the entropy identity — pure integer counts into
    deterministic doubles, rounded at 4 dp before ranking so both
    engines order identically.

    Physical shape: the one bigram aggregation, two margin aggregations
    OVER the bigram relation (vocabulary-bounded, not corpus-bounded),
    margin equi-joins on each word key, the min-count valve before
    ranking, TakeOrdered top-k. Mirrors ``pmi_collocations``; no global
    vocabulary² sort anywhere."""
    t = tokens(text_col)
    n = F.size(t)
    pair = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bi = (
        docs.select(F.explode_outer(pair).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    m1 = bi.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    m2 = bi.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    tot = bi.agg(F.sum("c_ab").cast("double").alias("n_bi"))

    def xlogx(c):
        return F.when(c > 0, c * F.log(c)).otherwise(F.lit(0.0))

    k11 = F.col("c_ab").cast("double")
    k12 = (F.col("c_a") - F.col("c_ab")).cast("double")
    k21 = (F.col("c_b") - F.col("c_ab")).cast("double")
    k22 = F.col("n_bi") - k11 - k12 - k21
    llr = F.round(
        2.0
        * (
            xlogx(k11) + xlogx(k12) + xlogx(k21) + xlogx(k22)
            - xlogx(k11 + k12) - xlogx(k21 + k22)
            - xlogx(k11 + k21) - xlogx(k12 + k22)
            + xlogx(F.col("n_bi"))
        ),
        4,
    )
    scored = (
        bi.filter(F.col("c_ab") >= min_count)
        .join(m1, "a")
        .join(m2, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            F.col("c_ab").cast("long").alias("n"),
            llr.alias("llr"),
        )
        .orderBy(F.desc("llr"), F.asc("bigram"))
        .limit(top_k)
    )
    w = Window.partitionBy(F.substring("bigram", 0, 0)).orderBy(
        F.desc("llr"), F.asc("bigram")
    )
    return scored.withColumn("rank", F.row_number().over(w))
