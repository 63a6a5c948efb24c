"""Dataset curation for training pipelines: deterministic, portable
sampling and splitting.

Random sampling (``df.sample``/``sampleBy``) is not reproducible across
engines, partitionings, or reruns — a training pipeline needs the SAME
example to land in the SAME split on every run and every engine. Everything
here keys off the portable md5-prefix hash (functions/hashing.py), so the
assignment is a pure function of the row id: stable under repartitioning,
shuffle order, scale-out, and re-expressible in any SQL warehouse for
audits.

At 100 TB these are narrow projections + a filter (split / fraction) or one
window per group key (balanced cap) — no shuffle for the filters, one
bounded shuffle for the cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from execute_sync_spark.functions.hashing import h32_salted, h32_salted_sql
from execute_sync_spark.functions.matpoint import mat

__all__ = ["hash_bucket", "hash_split", "stratified_hash_sample", "balanced_sample"]

_BUCKETS = 1000


def hash_bucket(id_col: Column | str, salt: int = 0) -> Column:
    """Stable bucket in [0, 1000) from the row id (JVM-side md5 prefix)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return h32_salted(c.cast("string"), salt) % _BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/... ) by hash-bucket ranges.

    Buckets [0, w1*1000) -> first split, [w1*1000, (w1+w2)*1000) -> second,
    etc. A given id keeps its split across runs, engines, and data growth
    (new rows hash independently; old rows never move)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(id_col, salt)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name] * _BUCKETS
        cond = bucket < int(round(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame, id_col: str, pct: int, salt: int = 0
) -> DataFrame:
    """Keep ~pct/100 of rows, deterministically (bucket < pct*10)."""
    return df.filter(hash_bucket(id_col, salt) < pct * 10)


def balanced_sample(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int, salt: int = 0
) -> DataFrame:
    """Cap every group at ``n_per_group`` rows, chosen by hash order (a
    deterministic uniform draw; ties broken by id). One shuffle on the
    group key; skewed groups are bounded by the cap itself."""
    w = Window.partitionBy(group_col).orderBy(hash_bucket(id_col, salt), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def hash_bucket_sql(expr: str, salt: int = 0) -> str:
    """DuckDB expression computing the same bucket."""
    return f"({h32_salted_sql(f'CAST({expr} AS VARCHAR)', salt)}) % {_BUCKETS}"


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023, DSIR):
    score every raw document by how much more likely its tokens are under
    the TARGET distribution (a small high-quality corpus) than under the
    raw-source distribution — the standard way to pick pretraining data
    that "looks like" a quality target without training a classifier.
    Per-doc weight = mean over tokens of
    ``log(p_target(tok) / p_source(tok))`` with add-one smoothing over the
    SOURCE vocabulary (the union vocab at deployment; source suffices here
    because target ⊆ source). Resample/threshold on the weight downstream
    (``hash_split``-style determinism keeps that reproducible).

    Scale shape: the token→count tables are the tf-idf dataflow —
    vocabulary-sized, NEVER broadcast; the doc-token frequencies join the
    two frequency tables on token (one shuffle each, map-side combined),
    and the scalar totals (token counts + vocab size) arrive as ONE
    broadcast 1-row cross-join. The paper's hashed-n-gram trick (bucket
    tokens into 10k hash buckets so the frequency table is O(1)) drops in
    by replacing ``token`` with ``h32(token) % n_buckets`` on BOTH
    branches — same plan, bounded state; the unhashed form is declared
    for oracle fidelity."""
    from execute_sync_spark.functions.text import tokens

    def _tok(df):
        return (
            df.select(F.col(id_col), F.explode_outer(tokens(text_col)).alias("token"))
            .filter(F.col("token").isNotNull() & (F.col("token") != ""))
        )

    tf = _tok(docs).groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    src_freq = tf.groupBy("token").agg(F.sum("tf").alias("sc"))
    tgt_freq = _tok(target).groupBy("token").agg(F.count("*").alias("tc"))
    totals = src_freq.agg(
        F.sum("sc").cast("double").alias("_ns"),
        F.count("*").cast("double").alias("_v"),
    ).crossJoin(
        # coalesce: an EMPTY target (sum over zero rows -> NULL) must yield
        # pure negative-evidence weights, not NULL weights for every doc
        tgt_freq.agg(F.coalesce(F.sum("tc"), F.lit(0)).cast("double").alias("_nt"))
    )
    joined = (
        tf.join(src_freq, "token")
        .join(tgt_freq, "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("tc", F.coalesce(F.col("tc"), F.lit(0)))
    )
    logratio = F.log(
        ((F.col("tc") + 1) / (F.col("_nt") + F.col("_v")))
        / ((F.col("sc") + 1) / (F.col("_ns") + F.col("_v")))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * logratio) / F.sum("tf"), 6).alias("dsir_weight"),
        )
    )


def dsir_weights_hashed(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10000,
) -> DataFrame:
    """``dsir_weights`` with the paper's hashed-n-gram state bound (Xie et
    al. 2023 §2.2), now implemented (VERDICT r8 task 8): every token maps
    to ``h32(token) % n_buckets`` BEFORE any frequency counting, so both
    frequency tables — the only state the operator carries — are bounded
    at ``n_buckets`` rows regardless of corpus size. At 100 TB the
    unhashed form's source-frequency table is the open-vocabulary web
    (billions of rows, one vocabulary-sized shuffle); the hashed form's
    is 10k rows — small enough to BROADCAST, collapsing the two
    frequency joins into map-side lookups. The log-ratio math is
    unchanged, applied to bucket counts; smoothing's V term becomes the
    occupied-bucket count (≤ n_buckets).

    Collision error: hashing merges tokens that share a bucket, so each
    per-token log-ratio is replaced by its bucket's mass-weighted
    blend. With V distinct tokens uniformly hashed into B buckets, a
    given token shares its bucket with ~(V-1)/B others; the perturbation
    of a document's mean weight is bounded by the colliding probability
    mass (~V/B of the distribution blended per bucket in expectation).
    The paper's finding — 10k buckets preserve selection quality — is
    why B=10k is the default; the md5-prefix hash keeps the bucketing
    engine-portable for the oracle (COVERAGE.md knob table)."""
    from execute_sync_spark.functions.hashing import h32
    from execute_sync_spark.functions.text import tokens

    def _tok(df):
        return (
            df.select(F.col(id_col), F.explode_outer(tokens(text_col)).alias("token"))
            .filter(F.col("token").isNotNull() & (F.col("token") != ""))
            .select(F.col(id_col), (h32(F.col("token")) % n_buckets).alias("bucket"))
        )

    tf = _tok(docs).groupBy(id_col, "bucket").agg(F.count("*").alias("tf"))
    src_freq = tf.groupBy("bucket").agg(F.sum("tf").alias("sc"))
    tgt_freq = _tok(target).groupBy("bucket").agg(F.count("*").alias("tc"))
    totals = src_freq.agg(
        F.sum("sc").cast("double").alias("_ns"),
        F.count("*").cast("double").alias("_v"),
    ).crossJoin(
        tgt_freq.agg(F.coalesce(F.sum("tc"), F.lit(0)).cast("double").alias("_nt"))
    )
    # bounded state is what buys the broadcast: both frequency sides are
    # ≤ n_buckets rows, so neither join shuffles the doc-token stream
    joined = (
        tf.join(F.broadcast(src_freq), "bucket")
        .join(F.broadcast(tgt_freq), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("tc", F.coalesce(F.col("tc"), F.lit(0)))
    )
    logratio = F.log(
        ((F.col("tc") + 1) / (F.col("_nt") + F.col("_v")))
        / ((F.col("sc") + 1) / (F.col("_ns") + F.col("_v")))
    )
    return joined.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(F.sum(F.col("tf") * logratio) / F.sum("tf"), 6).alias("dsir_weight"),
    )


def token_budget_select(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Greedy quality-first selection under a per-group token budget — the
    mixture-application step of a pretraining pipeline: each source/domain
    contributes at most ``budget`` tokens, filled by the highest-quality
    documents first (quality = alpha ratio, the cheap per-row Gopher-style
    signal; swap in any score column at deployment). A document is kept
    while the group's RUNNING token total stays within budget — the
    deterministic relational form of "take docs until the budget is full"
    (ordering ties break on id, so the kept set is reproducible across
    engines and reruns, unlike sample-until-full).

    Scale shape: the quality signal is a narrow per-row expression; the
    running total is ONE cumulative-sum window per group (single shuffle
    on the group key). Budgets per group are how 100 TB mixtures are
    actually applied — no global coordination, each group's window is
    independent."""
    from execute_sync_spark.functions.text import tokens as _tokens

    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    scored = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
        F.round(n_alpha / F.length(F.col(text_col)), 6).alias("quality"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.select(
        id_col,
        group_col,
        "n_tokens",
        "quality",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    ).withColumn("kept", F.col("cum_tokens") <= F.lit(budget))


def domain_cap(
    docs: DataFrame,
    per_domain: int,
    domain_col: str = "source",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (RefinedWeb / Gopher-style source
    balancing): keep at most ``per_domain`` documents from each domain,
    preferring higher ``quality_col`` (ties break on id, so the kept set
    is reproducible across engines and reruns). A handful of mega-domains
    otherwise dominate a crawl-derived corpus; the cap is applied AFTER
    dedup and BEFORE mixture weighting in a typical pipeline.

    Scale shape: ONE window per domain key — a single shuffle on the
    domain, with rank pushed as a TakeOrdered-like top-K inside each
    partition. A mega-domain that skews the shuffle gets the two-phase
    salted form (top-K per (domain, salt) first, then top-K of the
    K*salts survivors — q_skew_salted_agg demonstrates the idiom); rank
    semantics are identical because top-K is associative."""
    w = Window.partitionBy(domain_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return (
        docs.select(id_col, domain_col, quality_col)
        .withColumn("rank_in_domain", F.row_number().over(w))
        .filter(F.col("rank_in_domain") <= per_domain)
    )


def gumbel_topk_resample(
    weighted: DataFrame,
    n: int,
    weight_col: str = "dsir_weight",
    id_col: str = "doc_id",
    salt: int = 23,
) -> DataFrame:
    """Importance RESAMPLING over log-weights — the step DSIR (Xie et al.
    2023 §2) runs after scoring: draw ``n`` examples without replacement
    with probability proportional to exp(weight), via the Gumbel top-k
    trick (Kool et al. 2019): key = log_weight + Gumbel noise, keep the n
    largest keys. The "noise" here is a PURE FUNCTION of the row id
    (u = (h32(salt#id)+0.5)/2^32, g = -ln(-ln(u))) so the drawn sample is
    identical across engines, reruns, and repartitionings — the same
    portability contract as hash_split, extended to weighted draws.

    Scale shape: one narrow projection over the weight relation, then a
    global top-n — Spark plans orderBy(...).limit(n) as TakeOrdered
    (per-partition heaps + an n-row driver merge), so there is NO global
    sort and NO extra shuffle beyond what the weight computation already
    did. Keys are rounded to 6 dp before ranking (ties break on id) so
    the selected SET is reproducible bit-for-bit in any engine."""
    u = (h32_salted(id_col, salt) + F.lit(0.5)) / F.lit(float(2**32))
    key = F.round(F.col(weight_col) - F.log(-F.log(u)), 6)
    return (
        weighted.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(n)
    )


def gumbel_key_sql(weight_expr: str, id_expr: str, salt: int = 23) -> str:
    """DuckDB expression computing the same Gumbel key."""
    u = f"(({h32_salted_sql(id_expr, salt)}) + 0.5) / 4294967296.0"
    return f"ROUND({weight_expr} - ln(-ln({u})), 6)"


def shard_assign(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    shuffle_salt: int = 31,
    order_salt: int = 37,
) -> DataFrame:
    """Deterministic global shuffle + balanced shard assignment — the
    export step every pretraining pipeline ends with: examples must reach
    the trainer in a fixed pseudo-random order, split into equal-sized
    shard files, and both properties must survive reruns and engine
    swaps. shard = h32(salt#id) mod n_shards (balanced in expectation,
    like hash_split's buckets); position within the shard orders by an
    INDEPENDENT hash (different salt), so intra-shard order is decorrelated
    from shard assignment.

    Scale shape: ONE shuffle, on the shard key, then a per-shard local
    sort (window) — never a global sort. At 100 TB this is literally the
    writer layout: df.repartition(n_shards, shard).sortWithinPartitions
    (order_key) streams each shard to its file; 10k shards of a 100 TB
    corpus are ~10 GB each, one task apiece."""
    shard = F.pmod(h32_salted(id_col, shuffle_salt), F.lit(n_shards)).cast("int")
    okey = h32_salted(id_col, order_salt)
    w = Window.partitionBy("shard").orderBy(F.asc("order_key"), F.asc(id_col))
    return (
        docs.select(id_col, shard.alias("shard"), okey.alias("order_key"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
    )


def temperature_mixture(
    docs: DataFrame,
    temperature: float = 0.7,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Temperature-scaled domain mixture weights — the multilingual/
    multi-domain rebalancing rule used by large pretraining runs (mT5,
    XLM-R style): a domain's share of the training mix is proportional to
    ``n_tokens ** T`` with T in (0, 1], which up-weights small domains and
    damps dominant ones (T=1 reproduces natural proportions; T->0
    approaches uniform). Emits, per domain: its natural token share, its
    temperature-scaled mix weight, the resulting ``sample_factor``
    (mix_weight / natural_share — >1 means the domain is repeated/epoched,
    <1 means it is subsampled), and the expected token count the mix
    assigns it.

    Scale shape: one map-side-combined per-domain aggregate (the ONLY
    corpus-scale pass — a narrow token-count expression, no explode); the
    corpus totals arrive as a broadcast 1-row cross join, and everything
    after runs on the domain-count relation (tens of rows at any corpus
    size). Deterministic: integer token counts aggregate exactly, and the
    double-valued shares are rounded at 6 dp only after the divisions."""
    from execute_sync_spark.functions.text import tokens as _tokens

    if not 0 < temperature <= 1:
        raise ValueError(f"temperature must be in (0, 1], got {temperature}")
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_tokens(text_col))).cast("long").alias("n_tokens"),
    )
    return mixture_from_counts(counts, temperature, group_col=group_col)


def mixture_from_counts(
    counts: DataFrame, temperature: float = 0.7, group_col: str = "source"
) -> DataFrame:
    """The mixture math over a pre-aggregated per-domain (n_docs,
    n_tokens) relation — ONE body shared by ``temperature_mixture`` (which
    derives counts from a corpus scan) and the streaming-maintained stats
    path (``streaming/mixture.py``), so the two physical forms cannot
    drift. Integer counts aggregate exactly; every double rounds at 6 dp
    only after the divisions, so any counts-equal inputs produce
    bit-equal mixtures."""
    if not 0 < temperature <= 1:
        raise ValueError(f"temperature must be in (0, 1], got {temperature}")
    scaled = F.pow(F.col("n_tokens").cast("double"), F.lit(float(temperature)))
    totals = counts.select(scaled.alias("__s"), F.col("n_tokens")).agg(
        F.sum("__s").alias("__pow_total"),
        F.sum("n_tokens").cast("double").alias("__tok_total"),
    )
    mix = scaled / F.col("__pow_total")
    natural = F.col("n_tokens") / F.col("__tok_total")
    return counts.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(natural, 6).alias("natural_share"),
        F.round(mix, 6).alias("mix_weight"),
        F.round(mix / natural, 6).alias("sample_factor"),
        F.round(mix * F.col("__tok_total"), 2).alias("expected_tokens"),
    )


def apply_mixture(
    docs: DataFrame,
    factors: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    factor_col: str = "sample_factor",
    salt: int = 71,
) -> DataFrame:
    """Turn per-domain sampling factors into the ACTUAL training corpus —
    the application step after ``temperature_mixture``: a domain with
    factor f contributes ``floor(f)`` full epochs of every document plus
    one more copy for the deterministic ``frac(f)``-fraction of documents
    (portable-hash unit draw keyed on the id — the same example gets the
    same epoch count on every engine, rerun, and partitioning, unlike
    ``df.sample``). f < 1 degenerates to plain deterministic subsampling;
    f = 1 is the identity corpus. Emits one row per (document, epoch)
    with the document's total copy count.

    Scale shape: the factor relation is domains-sized and BROADCASTS into
    the corpus scan; the expansion is a per-row ``sequence`` + explode —
    output rows ≈ Σ_d f_d·|d| (exactly the token budget the mixture
    planned), no shuffle anywhere. At 100 TB this runs inside the shard
    writer: expansion, shard assignment, and the per-shard sort compose
    into the one export shuffle (curate_shard_assign)."""
    fac = factors.select(group_col, F.col(factor_col).cast("double"))
    unit = h32_salted(F.col(id_col).cast("string"), salt) / F.lit(2.0 ** 32)
    n_full = F.floor(F.col(factor_col)).cast("int")
    frac = F.col(factor_col) - F.floor(F.col(factor_col))
    n_copies = (n_full + F.when(unit < frac, 1).otherwise(0)).cast("int")
    expanded = (
        docs.select(id_col, group_col)
        .join(F.broadcast(fac), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            n_copies.alias("n_copies"),
        )
        .filter(F.col("n_copies") > 0)
    )
    return expanded.select(
        id_col,
        group_col,
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("epoch"),
        "n_copies",
    ).select(id_col, group_col, "epoch", "n_copies")


def sqrt_stratified_sample(
    docs: DataFrame,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    quota_scale: float = 4.0,
    salt: int = 77,
) -> DataFrame:
    """Deterministic square-root stratified sampling: each stratum (e.g.
    (lang, source)) keeps ``ceil(quota_scale * sqrt(n_stratum))`` documents
    — the standard balancing move when a corpus's strata span orders of
    magnitude (proportional sampling keeps the head's dominance, uniform
    flattens real signal; sqrt sits between). Selection inside a stratum
    is hash-ordered (``hash_bucket`` with ``salt``, ties on id), so the
    sample is reproducible, seed-controlled, and independent of physical
    row order.

    Physical shape: one count aggregation per stratum (tiny relation,
    broadcast back) + one rank window per stratum. The window sorts each
    stratum once — the shuffle is keyed on the strata columns, and skew is
    bounded by the largest stratum; for quota-exact semantics that sort is
    irreducible (a threshold-hash variant — keep iff bucket < quota/n·1000
    — is shuffle-free but only approximates the quota; documented
    trade-off, not the default)."""
    strata = strata_cols or ["lang", "source"]
    counts = docs.groupBy(*strata).agg(F.count("*").alias("__n"))
    quotas = counts.select(
        *strata,
        F.ceil(F.lit(quota_scale) * F.sqrt("__n")).cast("long").alias("quota"),
        F.col("__n").alias("stratum_size"),
    )
    w = Window.partitionBy(*strata).orderBy(
        hash_bucket(id_col, salt), F.col(id_col)
    )
    ranked = docs.join(F.broadcast(quotas), strata).withColumn(
        "__rk", F.row_number().over(w)
    )
    return ranked.filter(F.col("__rk") <= F.col("quota")).select(
        id_col, *strata, "stratum_size", "quota"
    )


def nb_quality_classifier(
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learned quality classifier — the CCNet/GPT-3 fastText-filter
    pattern (Wenzek et al. 2020; Brown et al. 2020 Appendix A) trained
    IN-ENGINE: a multinomial Naive-Bayes token model over a labeled split
    of the corpus (``positive`` marks the reference/high-quality class),
    then every document scored by its token log-odds sum. At pretraining
    scale this is the standard "train a cheap linear classifier on a
    trusted reference corpus, keep documents it scores as reference-like"
    filter; Naive Bayes makes the weights DETERMINISTIC aggregates (token
    log-odds = two smoothed frequency ratios) instead of an SGD artifact,
    so the whole model is reconstructible by the DuckDB oracle — the
    ``dsir_weights`` precedent (reference: GPT-3's WebText-vs-CommonCrawl
    logistic filter; the NB form is the closed-form member of that linear
    family).

    Model: per token t, ``log_odds(t) = ln((c_pos(t)+1)/(N_pos+V)) -
    ln((c_neg(t)+1)/(N_neg+V))`` (Laplace smoothing over the SHARED
    vocabulary V); per doc, ``nb_score = ln(n_pos_docs/n_neg_docs) +
    sum_t tf(t)*log_odds(t)`` and ``pred_hq = nb_score > 0`` — exact MAP
    classification under multinomial NB.

    Physical shape (the dsir_weights dataflow): one explode -> one
    (doc, token) count aggregation (map-side combined); BOTH class
    frequency tables come from ONE conditional aggregation over that
    relation (sum(tf) filtered by label — a single token-keyed shuffle,
    not one per class); totals are a broadcast 1-row cross-join; scoring
    joins tf to the token-weights relation (vocabulary-sized, never
    broadcast, never collected) and re-aggregates per doc. No iteration,
    no driver-side model state — at 100 TB the 'model' is a DataFrame."""
    lab, tf = nb_labeled_tf(docs, positive, text_col, id_col)
    # tf feeds BOTH the frequency-table build and the scoring join; without
    # materialization each consumer re-runs the scan+tokenize+explode+count
    # chain (r16 profile: the tf subtree executed 3x inside the composed
    # pipelines). One eager checkpoint = one tokenization pass (guide §2.4).
    tf = mat(tf, "nb_tf")
    freq = nb_token_freq(tf)
    return nb_score_tf(tf, freq, nb_doc_counts(lab), id_col)


def nb_labeled_tf(
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The (labeled-docs, per-doc token-frequency) relations every NB path
    starts from: ``lab`` = (id, __pos, text), ``tf`` = (id, __pos, token,
    tf). ONE body shared by the batch classifier and the streaming stats
    sidecar (``streaming/classifier.py``) so tokenization cannot drift
    between the two physical forms — the ``mixture_from_counts``
    precedent."""
    from execute_sync_spark.functions.text import tokens

    lab = docs.select(
        F.col(id_col), positive.cast("boolean").alias("__pos"),
        F.col(text_col),
    )
    tok = lab.select(
        F.col(id_col), "__pos", F.explode_outer(tokens(text_col)).alias("token")
    ).filter(F.col("token").isNotNull() & (F.col("token") != ""))
    tf = tok.groupBy(id_col, "__pos", "token").agg(F.count("*").alias("tf"))
    return lab, tf


def nb_token_freq(tf: DataFrame) -> DataFrame:
    """The NB model's sufficient statistics: (token, cp, cn) — BOTH class
    frequency tables from ONE conditional aggregation (a single
    token-keyed shuffle, not one per class). Integer counts, so per-batch
    tables summed token-wise reconstruct the flat-trained model EXACTLY
    (the streaming sidecar's merge)."""
    return tf.groupBy("token").agg(
        F.sum(F.when(F.col("__pos"), F.col("tf")).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("__pos"), F.col("tf")).otherwise(0)).alias("cn"),
    )


def nb_doc_counts(lab: DataFrame) -> DataFrame:
    """Per-class document counts (the prior's inputs) as a 1-row
    (_dp, _dn) relation."""
    return lab.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0))
        .cast("double").alias("_dp"),
        F.sum(F.when(~F.col("__pos"), 1).otherwise(0))
        .cast("double").alias("_dn"),
    )


def nb_score_tf(
    tf: DataFrame,
    freq: DataFrame,
    doc_counts: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a (id, __pos, token, tf) relation against an NB model given
    as its sufficient statistics — the ONE scoring body shared by the
    batch classifier and the streaming-maintained model, so the two can
    never drift. Laplace smoothing over the model's vocabulary (V = freq
    row count), ``nb_score = ln(dp/dn) + Σ tf·log_odds``, MAP decision at
    0. The weights relation joins UNHINTED (the open vocabulary must not
    be force-broadcast; the hashed twin is the broadcast form); totals
    are broadcast 1-row cross-joins."""
    totals = freq.agg(
        F.sum("cp").cast("double").alias("_np"),
        F.sum("cn").cast("double").alias("_nn"),
        F.count("*").cast("double").alias("_v"),
    ).crossJoin(F.broadcast(doc_counts))
    log_odds = F.log((F.col("cp") + 1) / (F.col("_np") + F.col("_v"))) - F.log(
        (F.col("cn") + 1) / (F.col("_nn") + F.col("_v"))
    )
    prior = F.log(F.col("_dp") / F.col("_dn"))
    scored = (
        tf.join(freq, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col, "__pos")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.first(prior) + F.sum(F.col("tf") * log_odds), 6
            ).alias("nb_score"),
        )
    )
    return scored.select(
        id_col,
        F.col("__pos").alias("label_hq"),
        "n_tokens",
        "nb_score",
        (F.col("nb_score") > 0).alias("pred_hq"),
    )


def nb_quality_classifier_hashed(
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10000,
) -> DataFrame:
    """``nb_quality_classifier`` with the hashed-vocabulary state bound —
    the production twin at 100 TB, mirroring ``dsir_weights_hashed``
    exactly: every token maps to ``h32(token) % n_buckets`` BEFORE any
    counting, so the model state (the two class frequency tables) is
    bounded at ``n_buckets`` rows regardless of corpus size — small
    enough to BROADCAST, collapsing the scoring join into a map-side
    lookup. The unhashed form's weights relation is the open vocabulary
    (billions of rows at web scale, one vocabulary-keyed shuffle to build
    + one to score); the hashed form shuffles ≤ n_buckets rows total.

    The NB math is unchanged, applied to bucket counts: Laplace smoothing
    over V = occupied buckets (≤ n_buckets), log-odds per bucket, doc
    score = prior + Σ tf·log_odds. Collision error is the
    dsir_weights_hashed analysis verbatim: a token shares its bucket with
    ~(V_tokens-1)/B others, blending its log-odds with the colliding
    probability mass — the fastText hashing-trick bucket count (the
    2M-bucket default in the paper; 10k here matches the DSIR default
    and the paper-measured selection-quality preservation)."""
    from execute_sync_spark.functions.hashing import h32
    from execute_sync_spark.functions.text import tokens

    lab = docs.select(
        F.col(id_col), positive.cast("boolean").alias("__pos"), F.col(text_col)
    )
    tok = lab.select(
        F.col(id_col), "__pos", F.explode_outer(tokens(text_col)).alias("token")
    ).filter(F.col("token").isNotNull() & (F.col("token") != ""))
    tf = tok.select(
        F.col(id_col), "__pos", (h32(F.col("token")) % n_buckets).alias("bucket")
    ).groupBy(id_col, "__pos", "bucket").agg(F.count("*").alias("tf"))
    # same one-pass materialization as the exact twin: tf feeds the model
    # build and the scoring join
    tf = mat(tf, "nb_tf_hashed")
    freq = tf.groupBy("bucket").agg(
        F.sum(F.when(F.col("__pos"), F.col("tf")).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("__pos"), F.col("tf")).otherwise(0)).alias("cn"),
    )
    totals = freq.agg(
        F.sum("cp").cast("double").alias("_np"),
        F.sum("cn").cast("double").alias("_nn"),
        F.count("*").cast("double").alias("_v"),
    ).crossJoin(
        F.broadcast(
            lab.agg(
                F.sum(F.when(F.col("__pos"), 1).otherwise(0))
                .cast("double").alias("_dp"),
                F.sum(F.when(~F.col("__pos"), 1).otherwise(0))
                .cast("double").alias("_dn"),
            )
        )
    )
    log_odds = F.log((F.col("cp") + 1) / (F.col("_np") + F.col("_v"))) - F.log(
        (F.col("cn") + 1) / (F.col("_nn") + F.col("_v"))
    )
    prior = F.log(F.col("_dp") / F.col("_dn"))
    # bounded state buys the broadcast: the weights relation is ≤ n_buckets
    # rows, so scoring never shuffles the doc-token stream on the vocab key
    scored = (
        tf.join(F.broadcast(freq), "bucket")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col, "__pos")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.first(prior) + F.sum(F.col("tf") * log_odds), 6
            ).alias("nb_score"),
        )
    )
    return scored.select(
        id_col,
        F.col("__pos").alias("label_hq"),
        "n_tokens",
        "nb_score",
        (F.col("nb_score") > 0).alias("pred_hq"),
    )
