"""Property-based tests (SURVEY §5 plan item 3): dedup invariants under
random version/batch permutations; chunk-split/flatten round-trip; duplicate
detection on constructed corpora. Few examples, Spark jobs are seconds each."""

import json
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from execute_sync_spark.landing import land_ndjson_lines
from execute_sync_spark.operators import latest, latest_all_versions, create_views
from execute_sync_spark.schema import load_root_schema

BASE = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _doc(doc_id: int, version: int, n_items: int = 0):
    rec = {
        "$TYPE": "TICKET",
        "DOCUMENT_ID": f"t-{doc_id}",
        "$VERSION": version,
        "$AUTHOR_ID": "u",
        "$DATE": "2026-01-01T00:00:00Z",
        "$DELETED": False,
        "SUBJECT": f"s-{doc_id}-{version}",
    }
    if n_items:
        rec["LINES"] = [
            {"LISTITEM_ID": f"{doc_id}-{version}-{i}", "QTY": i, "COST": float(i)}
            for i in range(n_items)
        ]
    return json.dumps(rec)


# each example: a set of (doc, version) copies assigned to batches 0..2
copies = st.lists(
    st.tuples(st.integers(0, 2), st.integers(1, 3), st.integers(0, 2)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(copies=copies, seed=st.randoms(use_true_random=False))
def test_latest_invariant_under_batch_replay_and_row_order(spark, copies, seed):
    """D2 depends only on (a) the max version per doc and (b) which batch a
    copy last landed in — never on row order within batches, and re-landing
    every batch again later must not change the (batch_date-stripped) result."""
    batches = {0: [], 1: [], 2: []}
    for doc, version, batch in copies:
        batches[batch].append(_doc(doc, version))

    def land_all(batch_dates):
        dfs = []
        for b, lines in batches.items():
            if lines:
                shuffled = list(lines)
                seed.shuffle(shuffled)
                dfs.append(land_ndjson_lines(spark, shuffled, batch_dates[b]))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    dates = {b: BASE + timedelta(days=b) for b in batches}
    base = land_all(dates)
    # replay every batch 10 days later (crash-replay / force refresh)
    replay_dates = {b: d + timedelta(days=10) for b, d in dates.items()}
    doubled = base.unionByName(land_all(replay_dates))

    def content(df):
        return {tuple(r) for r in latest(df).drop("batch_date").collect()}

    assert content(base) == content(doubled)
    # D1 keeps every distinct (doc, version) exactly once per landing copy-set
    d1 = latest_all_versions(doubled).drop("batch_date").collect()
    assert len(d1) == len({(r.id, r.version) for r in d1})


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_items=st.integers(0, 40),
    chunk_size=st.integers(1, 15),
)
def test_chunk_flatten_roundtrip(spark, root_schema, n_items, chunk_size):
    """split(list, chunk_size) then V6-explode == V6-explode of the unsplit
    document, for any list length and chunk size (SURVEY §7.3 risk e)."""
    lines = [_doc(0, 1, n_items=n_items)]
    plain = land_ndjson_lines(spark, lines, BASE)
    chunked = land_ndjson_lines(spark, lines, BASE, chunk_size=chunk_size)

    import math

    expected_rows = 1 + (math.ceil(n_items / chunk_size) if n_items > chunk_size else 0)
    assert chunked.count() == expected_rows

    def lines_view(landing):
        views = create_views(latest(landing), root_schema, register=False)
        return {tuple(r) for r in views["TICKET_LINES"].collect()}

    assert lines_view(plain) == lines_view(chunked)


def test_duplicate_detection_on_constructed_corpus(spark):
    """Identical texts -> identical minhash/simhash signatures, exact-dup
    groups, and LSH candidate pairs; a perturbed copy stays LSH-adjacent."""
    from execute_sync_spark.functions import dedupe

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    perturbed = base.replace("lazy", "sleepy")
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, perturbed), (4, "completely different words entirely unrelated text body here")],
        "doc_id long, text string",
    )

    exact = {r.canonical_id: r.n_copies for r in dedupe.exact_duplicates(docs).collect()}
    assert exact[1] == 2  # docs 1,2 identical

    sigs = {r.doc_id: tuple(r)[1:] for r in dedupe.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]

    pairs = {(r.id_a, r.id_b) for r in dedupe.lsh_candidate_pairs(dedupe.minhash_signatures(docs)).collect()}
    assert (1, 2) in pairs
    # near-dup shares most shingles -> at least one band collides
    assert (1, 3) in pairs and (2, 3) in pairs
    assert (1, 4) not in pairs

    sims = {r.doc_id: r.simhash for r in dedupe.simhash(docs).collect()}
    assert sims[1] == sims[2]
    ham_near = bin(sims[1] ^ sims[3]).count("1")
    ham_far = bin(sims[1] ^ sims[4]).count("1")
    assert ham_near <= ham_far

    jac = {(r.id_a, r.id_b): r.jaccard for r in dedupe.ngram_jaccard_pairs(docs, threshold=0.05).collect()}
    assert jac[(1, 2)] == 1.0
    assert 0.5 < jac[(1, 3)] < 1.0


def test_feature_extraction_deterministic(spark):
    """mapInPandas multimodal path: deterministic features, stable schema."""
    from execute_sync_spark.functions import multimodal

    docs = spark.createDataFrame([(1, "hello world"), (2, "")], "doc_id long, text string")
    bm = multimodal.binary_with_meta(docs)
    feats = {r.doc_id: r for r in multimodal.extract_features(bm).collect()}
    assert feats[1].byte_len == 11
    assert len(feats[1].features) == multimodal.FEATURE_DIM
    assert abs(sum(feats[1].features) - 1.0) < 1e-6  # normalized histogram
    assert feats[2].features == [0.0] * multimodal.FEATURE_DIM
    # run twice -> identical
    again = {r.doc_id: r for r in multimodal.extract_features(bm).collect()}
    assert feats[1].features == again[1].features


def test_decoder_backend_selection(spark):
    """Backend resolution: stub is the oracle-stable default; 'auto' falls
    back to the stub when Pillow is absent and picks pil_decode when
    present; both backends share one output contract (FEATURE_DIM
    normalized histogram)."""
    import importlib.util

    import pytest

    from execute_sync_spark.functions import multimodal

    assert multimodal.get_decoder("stub") is multimodal.decode_stub
    with pytest.raises(ValueError):
        multimodal.get_decoder("nope")

    has_pil = importlib.util.find_spec("PIL") is not None
    auto = multimodal.get_decoder("auto")
    if not has_pil:
        assert auto is multimodal.decode_stub
        return

    # feature-parity leg: runs only where Pillow is installed
    assert auto is multimodal.pil_decode
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    png = buf.getvalue()

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bm = multimodal.binary_with_meta(docs).withColumn(
        "content", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(png)
    )
    feats = multimodal.extract_features(bm, backend="pil").collect()[0]
    assert len(feats.features) == multimodal.FEATURE_DIM
    assert abs(sum(feats.features) - 1.0) < 1e-6


words = st.sampled_from("aa bb cc dd ee ff gg hh".split())
texts = st.lists(words, min_size=0, max_size=30).map(" ".join)


@given(corpus=st.lists(texts, min_size=2, max_size=6), data=st.data())
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_span_invariants(spark, corpus, data):
    """Structural invariants of exact-substring spans on random small-alphabet
    corpora (which repeat heavily by construction): every span lies inside
    its document, is at least k tokens long, spans of one document never
    overlap or touch (maximal islands), and removal never removes more
    tokens than the document has."""
    from execute_sync_spark.functions import dedupe

    k = 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    n_tok = {i: len(t.split()) if t.strip() else 0 for i, t in enumerate(corpus)}
    spans = dedupe.duplicate_spans(docs, k=k).collect()
    by_doc: dict[int, list] = {}
    for r in spans:
        assert r.span_tokens == r.span_end - r.span_start + 1 >= k
        assert 0 <= r.span_start <= r.span_end < n_tok[r.doc_id]
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for d, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert e1 + 1 < s2, f"doc {d}: islands not maximal: {ss}"

    removed = dedupe.remove_duplicate_spans(docs, k=k).collect()
    for r in removed:
        assert 0 <= r.n_tokens_removed <= r.n_tokens
        expect_removed = sum(e - s + 1 for s, e in by_doc.get(r.doc_id, []))
        assert r.n_tokens_removed == expect_removed


budget_rows = st.lists(
    st.tuples(
        st.text(alphabet="abc123 ", min_size=1, max_size=12).filter(str.strip),
        st.sampled_from(["s1", "s2"]),
    ),
    min_size=1,
    max_size=10,
)


@given(rows=budget_rows, budget=st.integers(min_value=0, max_value=12))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_token_budget_invariants(spark, rows, budget):
    """Structural invariants of budget selection on random corpora: kept
    docs' running totals never exceed the budget, the kept set is a PREFIX
    of each group's (quality desc, id) order (greedy — no doc is kept
    after the first dropped one), and every doc appears exactly once."""
    from execute_sync_spark.functions import curation

    docs = spark.createDataFrame(
        [(i, t, "en", src) for i, (t, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )
    out = curation.token_budget_select(docs, budget=budget).collect()
    assert len(out) == len(rows)
    by_src: dict[str, list] = {}
    for r in out:
        if r.kept:
            assert r.cum_tokens <= budget
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (-r.quality, r.doc_id))
        flags = [r.kept for r in rs]
        # prefix property: once False, never True again
        assert flags == sorted(flags, reverse=True), (src, flags)
        # cum_tokens really is the running sum in that order
        run = 0
        for r in rs:
            run += r.n_tokens
            assert r.cum_tokens == run


@given(rows=st.lists(st.sampled_from(["en", "de"]), min_size=1, max_size=12))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ccnet_bucket_depth_invariants(spark, rows):
    """Equal-depth tiling on random language mixes: every doc is bucketed
    exactly once, and within each language the three bucket sizes differ
    by at most one with head >= middle >= tail (NTILE remainder rule)."""
    from execute_sync_spark.functions import text

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared shared", lang, "s") for i, lang in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )
    out = text.ccnet_buckets(docs).collect()
    assert len(out) == len(rows)
    for lang in set(rows):
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in out:
            if r.lang == lang:
                sizes[r.bucket] += 1
        n = sum(sizes.values())
        assert n == rows.count(lang)
        assert sizes["head"] >= sizes["middle"] >= sizes["tail"]
        assert sizes["head"] - sizes["tail"] <= 1
