"""Round-16 second wave: Stupid-Backoff LM, PMI collocations,
paragraph-level dedup rewrite — semantic invariants and hand-computed
tiny-corpus checks (the gate hash pins exact values at sf0.01; these pin
the MEANING, so they survive testdata regeneration)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from execute_sync_spark.functions import dedupe, text
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# ---------------------------------------------------------------------------
# Stupid-Backoff trigram LM


def test_backoff_lm_self_trained_never_backs_off(spark):
    """Training on the scored corpus itself means every observed n-gram is
    in the model: zero backoffs, zero OOV, all log-scores <= 0."""
    from execute_sync_spark.plans.workload import _docs_wide

    out = text.backoff_lm(_docs_wide(spark, SF_DIR)).collect()
    assert out
    assert all(r.n_backoff == 0 and r.n_oov == 0 for r in out)
    assert all(r.avg_logprob <= 0.0 for r in out)
    assert all(r.ppl_proxy >= 1.0 for r in out)


def test_backoff_lm_held_out_exercises_backoff(spark):
    """With src0 held out of training, the src0 docs must actually hit the
    backoff path (otherwise the row is indistinguishable from the unigram
    LM), and train-slice docs still never back off."""
    from execute_sync_spark.plans.workload import _docs_wide

    docs = _docs_wide(spark, SF_DIR)
    out = text.backoff_lm(docs, train_filter=F.col("source") != "src0")
    rows = out.join(docs.select("doc_id", "source"), "doc_id").collect()
    eval_rows = [r for r in rows if r.source == "src0"]
    train_rows = [r for r in rows if r.source != "src0"]
    assert eval_rows and train_rows
    assert sum(r.n_backoff for r in eval_rows) > 0
    assert all(r.n_backoff == 0 and r.n_oov == 0 for r in train_rows)


def test_backoff_lm_hand_computed(spark):
    """2-doc corpus, train on doc 0 ('a b a b'), score doc 1 ('a b c'):
    every backoff level and the OOV floor computed by hand."""
    docs = _docs(
        spark,
        [(0, "a b a b", "train"), (1, "a b c", "score")],
    )
    out = {
        r.doc_id: r
        for r in text.backoff_lm(
            docs, train_filter=F.col("source") == "train"
        ).collect()
    }
    a = 0.4
    n = 4.0  # train tokens: a b a b
    # doc 0 scores itself: pos0 unigram a: 2/4; pos1 bigram (a,b): 2/2;
    # pos2 trigram (a,b,a): 1/1 over ctx2 c(a,b)=2 -> 1/2; pos3 trigram
    # (b,a,b): 1/1 over ctx2 c(b,a)=1 -> 1/1
    exp0 = (math.log(2 / n) + math.log(2 / 2) + math.log(1 / 2) + math.log(1 / 1)) / 4
    assert out[0].n_backoff == 0 and out[0].n_oov == 0
    assert out[0].avg_logprob == pytest.approx(exp0, abs=1e-6)
    # doc 1: pos0 unigram a: 2/4; pos1 bigram (a,b): 2/2; pos2 trigram
    # (b,?,c) unseen, bigram (b,c) unseen -> unigram OOV floor with two
    # backoff steps: 2*ln(a) + ln(a/n)
    exp1 = (
        math.log(2 / n)
        + math.log(2 / 2)
        + (2 * math.log(a) + math.log(a / n))
    ) / 3
    assert out[1].n_backoff == 1 and out[1].n_oov == 1
    assert out[1].avg_logprob == pytest.approx(exp1, abs=1e-6)
    assert out[1].ppl_proxy == pytest.approx(math.exp(-exp1), abs=1e-3)


# ---------------------------------------------------------------------------
# PMI collocations


def test_pmi_hand_computed(spark):
    """'x y' always adjacent (5 times) vs frequent-but-independent filler:
    PMI of the glued pair computed by hand; the valve drops pairs under
    min_count."""
    rows = [(i, "x y " + "f g f h", "s") for i in range(5)]
    docs = _docs(spark, rows)
    out = {r.bigram: r for r in text.pmi_collocations(docs, min_count=5).collect()}
    # corpus: 5 docs x 6 tokens = 30 tokens; bigrams per doc 5 -> 25 total
    # c(x y)=5, c(x)=5, c(y)=5 -> pmi = ln((5/25)/((5/30)*(5/30)))
    assert "x y" in out
    exp = math.log((5 / 25) / ((5 / 30) * (5 / 30)))
    assert out["x y"].pmi == pytest.approx(exp, abs=1e-4)
    assert out["x y"].n == 5
    # 'y f' also occurs 5x (adjacent across the fixed template) — present;
    # but 'g f' occurs 5x too; anything with count < 5 is valved out
    assert all(r.n >= 5 for r in out.values())
    # ranks are contiguous from 1 and ordered by (pmi desc, bigram)
    ranked = sorted(out.values(), key=lambda r: r.rank)
    assert [r.rank for r in ranked] == list(range(1, len(ranked) + 1))
    keys = [(-r.pmi, r.bigram) for r in ranked]
    assert keys == sorted(keys)


def test_pmi_corpus_topk_shape(spark):
    from execute_sync_spark.plans.workload import text_pmi_top

    out = text_pmi_top(spark, SF_DIR).collect()
    assert len(out) == 20
    assert all(r.n >= 5 for r in out)
    keys = [(-r.pmi, r.bigram) for r in sorted(out, key=lambda r: r.rank)]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# paragraph-level dedup rewrite


def test_paragraph_dedup_removes_cross_doc_repeats(spark):
    """A boilerplate paragraph shared by three docs survives only in the
    first (min doc_id); unique paragraphs survive everywhere; a fully-
    duplicated doc rewrites to the empty string."""
    boiler = " ".join(f"b{i}" for i in range(4))
    u1 = " ".join(f"u{i}" for i in range(4))
    u2 = " ".join(f"v{i}" for i in range(4))
    docs = _docs(
        spark,
        [
            (0, f"{boiler} {u1}", "s"),
            (1, f"{boiler} {u2}", "s"),
            (2, boiler, "s"),
        ],
    )
    out = {
        r.doc_id: r
        for r in dedupe.paragraph_dedup(docs, para_words=4).collect()
    }
    assert out[0].n_paras == 2 and out[0].n_kept == 2
    assert out[0].new_text == f"{boiler} {u1}"
    assert out[1].n_paras == 2 and out[1].n_kept == 1
    assert out[1].new_text == u2
    assert out[2].n_paras == 1 and out[2].n_kept == 0
    assert out[2].new_text == "" and out[2].new_n_tokens == 0
    assert all(r.n_paras == r.n_kept + r.n_removed for r in out.values())


def test_paragraph_dedup_global_uniqueness_and_conservation(spark):
    """Corpus-level contract at the fixture SF: every surviving paragraph
    text is globally unique, token counts are conserved (kept paragraphs'
    tokens = new_n_tokens), and a doc's surviving paragraphs keep their
    original relative order."""
    from execute_sync_spark.plans.workload import _PARA_WORDS, _docs_wide

    docs = _docs_wide(spark, SF_DIR)
    out = dedupe.paragraph_dedup(docs, para_words=_PARA_WORDS)
    rows = out.collect()
    seen: set[str] = set()
    for r in rows:
        if not r.new_text:
            continue
        toks = r.new_text.split(" ")
        assert len(toks) == r.new_n_tokens
        # re-window the rewritten text: all but the final window of each
        # doc's ORIGINAL paragraphs are full-width, so splitting the
        # rewrite is not windowable — instead assert global uniqueness of
        # the kept windows via the operator's own relation below
    paras = (
        docs.select(
            F.col("doc_id"), F.posexplode(text.tokens("text")).alias("pos", "w")
        )
        .filter(F.col("w") != "")
        .withColumn("p", (F.col("pos") / _PARA_WORDS).cast("int"))
        .groupBy("doc_id", "p")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("ptext")
        )
    )
    kept_concat = {r.doc_id: r.new_text for r in rows}
    ordered = paras.orderBy("doc_id", "p").collect()
    rebuilt: dict[int, list[str]] = {}
    for r in ordered:
        if r.ptext in seen:
            continue
        seen.add(r.ptext)
        rebuilt.setdefault(r.doc_id, []).append(r.ptext)
    for doc_id, expect in kept_concat.items():
        assert " ".join(rebuilt.get(doc_id, [])) == expect


# ---------------------------------------------------------------------------
# in-engine BPE training


def test_bpe_hand_computed_trajectory(spark):
    """Corpus 'aaa' x3 + 'ab' x2: the full 5-step merge trajectory computed
    by hand, including the lexicographic tie-break at step 2 ((a,_) vs
    (aa,a) both weigh 3 -> 'a' < 'aa' wins) and the overlap-free greedy
    application (' a a a _ ' + (a,a) -> ' aa a _ ', not ' aa aa?')."""
    docs = _docs(
        spark,
        [(0, "aaa aaa ab", "s"), (1, "aaa ab", "s")],
    )
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in text.bpe_merges(docs, n_merges=5).orderBy("step").collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 6),
        (2, "a", "_", "a_", 3),
        (3, "aa", "a_", "aaa_", 3),
        (4, "a", "b", "ab", 2),
        (5, "ab", "_", "ab_", 2),
    ]


def test_bpe_exhaustion_stops_early(spark):
    """Asking for more merges than the corpus admits stops early with the
    merges learned so far (standard trainer behavior; also the
    empty-input contract at 100 TB) — and the final vocab is fully
    fused."""
    docs = _docs(spark, [(0, "aaa ab", "s")])
    m = text.bpe_merges(docs, n_merges=20).collect()
    assert 0 < len(m) < 20
    vocab, _ = text.bpe_train(docs, n_merges=20)
    assert {r.s for r in vocab.collect()} == {" aaa_ ", " ab_ "}
    # empty corpus: zero merges, empty (well-typed) output
    empty = _docs(spark, [])
    assert text.bpe_merges(empty, n_merges=3).collect() == []
    assert text.bpe_fertility(empty, n_merges=3).collect() == []


def test_bpe_greedy_nonoverlapping_application(spark):
    """'bbbb' under merge (b,b): overlapping pairs COUNT (3, the classic
    get_stats), but application is greedy non-overlapping left-to-right
    (' bb bb _ ', never a re-merge across the fresh symbol)."""
    docs = _docs(spark, [(0, "bbbb", "s")])
    m = text.bpe_merges(docs, n_merges=1).collect()
    assert (m[0].lhs, m[0].rhs, m[0].pair_count) == ("b", "b", 3)
    vocab, _ = text.bpe_train(docs, n_merges=1)
    assert vocab.collect()[0].s == " bb bb _ "


def test_bpe_fertility_semantics(spark):
    """n_sub counts a standalone end-marker with the last symbol; more
    merges never increase the subword total; fully-merged words hit
    fertility 1."""
    docs = _docs(spark, [(0, "aaa aaa ab", "s"), (1, "aaa ab", "s")])
    f3 = {r.doc_id: r for r in text.bpe_fertility(docs, n_merges=3).collect()}
    # after 3 merges: 'aaa' -> ' aaa_ ' (1 sub), 'ab' -> ' a b _ ' (2 subs)
    assert f3[0].n_words == 3 and f3[0].n_subwords == 1 + 1 + 2
    assert f3[1].n_words == 2 and f3[1].n_subwords == 1 + 2
    f5 = {r.doc_id: r for r in text.bpe_fertility(docs, n_merges=5).collect()}
    assert f5[0].n_subwords == 3 and f5[0].fertility == 1.0
    assert all(
        f5[k].n_subwords <= f3[k].n_subwords for k in f3
    )


def test_bpe_corpus_monotone_and_bounded(spark):
    from execute_sync_spark.plans.workload import _docs_wide

    docs = _docs_wide(spark, SF_DIR)
    f2 = text.bpe_fertility(docs, n_merges=2)
    f6 = text.bpe_fertility(docs, n_merges=6)
    j = {
        r.doc_id: (r.s2, r.s6)
        for r in f2.select("doc_id", F.col("n_subwords").alias("s2"))
        .join(
            f6.select("doc_id", F.col("n_subwords").alias("s6"), "fertility"),
            "doc_id",
        )
        .collect()
    }
    assert j and all(s6 <= s2 for s2, s6 in j.values())
    assert all(r.fertility >= 1.0 for r in f6.collect())


# ---------------------------------------------------------------------------
# stream-maintained Stupid-Backoff LM (the third streaming twin)


def _lm_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_lm_maintenance_equals_flat(spark, tmp_path):
    """After ANY prefix of micro-batches, score_from_lm_stats equals
    text.backoff_lm trained flat on the same delivered train slice —
    cadence, restart, and duplicate delivery included. Exact equality:
    the model is three integer n-gram tables (pure sums, n-grams never
    cross documents), and both paths share backoff_lm_score/_grams."""
    import os

    from execute_sync_spark.streaming.backoff_lm import (
        score_from_lm_stats,
        stream_lm_maintenance,
        write_lm_stats,
    )

    trainf = F.col("source") != "src0"
    base = _docs(spark, [
        (1, "a b a b c", "src1"),
        (2, "b c b c a", "src2"),
        (3, "c a c a b", "src0"),  # eval slice: scored, never trained on
    ])
    stats = str(tmp_path / "lm_stats")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    write_lm_stats(base, stats, "__base__", trainf)
    assert _lm_rows(score_from_lm_stats(spark, stats, base)) == _lm_rows(
        text.backoff_lm(base, trainf)
    )

    b1 = _docs(spark, [(4, "a b c a b", "src1")])
    b2 = _docs(spark, [(5, "b a b a", "src0"), (6, "c b a c", "src2")])
    b1.coalesce(1).write.mode("append").parquet(feed)
    stream_lm_maintenance(spark, feed, stats, ckpt, train_filter=trainf)
    flat1 = base.unionByName(b1)
    assert _lm_rows(score_from_lm_stats(spark, stats, flat1)) == _lm_rows(
        text.backoff_lm(flat1, trainf)
    )

    # restart with the same checkpoint: only the NEW file is processed
    b2.coalesce(1).write.mode("append").parquet(feed)
    stream_lm_maintenance(spark, feed, stats, ckpt, train_filter=trainf)
    flat2 = flat1.unionByName(b2)
    assert _lm_rows(score_from_lm_stats(spark, stats, flat2)) == _lm_rows(
        text.backoff_lm(flat2, trainf)
    )

    # replayed batch overwrites itself: never double-counted
    write_lm_stats(base, stats, "__base__", trainf)
    assert _lm_rows(score_from_lm_stats(spark, stats, flat2)) == _lm_rows(
        text.backoff_lm(flat2, trainf)
    )


def test_stream_lm_starts_on_empty_feed(spark, tmp_path):
    import os

    from execute_sync_spark.streaming.backoff_lm import (
        score_from_lm_stats,
        stream_lm_maintenance,
        write_lm_stats,
    )

    feed = str(tmp_path / "empty_feed")
    os.makedirs(feed)
    stats = str(tmp_path / "stats")
    seed = _docs(spark, [(1, "a b c", "src1"), (2, "c b a", "src2")])
    write_lm_stats(seed, stats, "__base__")
    stream_lm_maintenance(spark, feed, stats, str(tmp_path / "ck"))
    assert score_from_lm_stats(spark, stats, seed).count() == 2


def test_stream_lm_continuous_returns_live_query(spark, tmp_path):
    """available_now=False must return a LIVE query (the ADVICE r14
    conditional-trigger contract)."""
    import os

    from execute_sync_spark.streaming.backoff_lm import stream_lm_maintenance

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _docs(spark, [(1, "a b", "src1")]).coalesce(1).write.mode("append").parquet(feed)
    q = stream_lm_maintenance(
        spark, feed, str(tmp_path / "stats"), str(tmp_path / "ck"),
        available_now=False,
    )
    try:
        assert q.isActive
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# LLR collocations


def test_llr_hand_computed(spark):
    """Dunning G² for the glued pair computed from the contingency table
    by an independent pure-Python evaluation of the entropy identity."""
    rows = [(i, "x y f g f h", "s") for i in range(5)]
    docs = _docs(spark, rows)
    out = {r.bigram: r for r in text.llr_collocations(docs, min_count=5).collect()}
    # per doc bigrams: (x,y),(y,f),(f,g),(g,f),(f,h) -> each count 5, N=25
    def xlogx(x):
        return x * math.log(x) if x > 0 else 0.0

    def g2(k11, k12, k21, k22):
        n = k11 + k12 + k21 + k22
        return 2.0 * (
            xlogx(k11) + xlogx(k12) + xlogx(k21) + xlogx(k22)
            - xlogx(k11 + k12) - xlogx(k21 + k22)
            - xlogx(k11 + k21) - xlogx(k12 + k22) + xlogx(n)
        )

    assert out["x y"].llr == pytest.approx(g2(5, 0, 0, 20), abs=1e-3)
    # f appears as first word in (f,g) and (f,h): margin c_a(f)=10
    assert out["f g"].llr == pytest.approx(g2(5, 5, 0, 15), abs=1e-3)
    assert all(r.n >= 5 for r in out.values())
    ranked = sorted(out.values(), key=lambda r: r.rank)
    keys = [(-r.llr, r.bigram) for r in ranked]
    assert keys == sorted(keys)
