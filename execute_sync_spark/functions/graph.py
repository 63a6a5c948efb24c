"""Iterative graph operator: connected components over near-dup pair sets.

The missing last step of every near-dup pipeline: pairwise candidates
(MinHash/SimHash/embedding pairs) must become transitive CLUSTERS — if A~B
and B~C, one canonical document should represent {A,B,C} even though A and C
never compared. That closure is a connected-components problem; the cluster
id is the component's minimum node id, which also serves as the canonical
(keep) document.

Two exact, deterministic strategies with one output contract:

* ``connected_components`` — the production hybrid. Distributed
  large-star/small-star contraction rounds (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SOCC'14 — O(log^2 n) rounds on any
  graph) run only while the edge set exceeds ``local_edge_threshold``;
  once a round shrinks it under the threshold the remainder is finished in
  ONE vectorized union-find pass on a single partition. Near-dup edge sets
  are a tiny fraction of the corpus (pairs ≪ documents), so at bench scale
  this is a single Spark job instead of 3+ shuffle rounds, while at 100 TB
  the star rounds bound every partition's size before anything is
  localized.
* ``connected_components_star`` — the pure-distributed path (no local
  finish), for when even the contracted graph must stay partitioned.

Both produce cluster_id = min node id of the component (exact fixpoint), so
they are interchangeable under one DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from execute_sync_spark.functions.matpoint import mat, on as mat_on

__all__ = [
    "connected_components",
    "connected_components_star",
    "pagerank",
    "build_cluster_state",
    "update_cluster_state",
]


def _canonical(edges: DataFrame, src: str, dst: str) -> tuple[DataFrame, DataFrame]:
    """(canonical edge set, all-node set). Canonical = undirected (a < b),
    deduped, self-loops dropped; nodes come from the RAW edges so a node
    seen only in self-loops still gets a (singleton) cluster.

    The raw projected edge relation is materialized ONCE and both outputs
    derive from it: edges is typically the expensive near-dup candidate
    plan, and the previous form (separate eager checkpoints for cur and
    all_nodes) executed that plan twice — measured as the dominant cost of
    every connected_components consumer in the r16 profile (guide §2.4:
    one pass, shared). cur keeps its own checkpoint because the star
    rounds and the local finish iterate over it; all_nodes is consumed
    exactly once (in _attach_singletons) and stays lazy over the
    materialized raw partitions."""
    raw = mat(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), "graph_raw_edges"
    )
    cur = (
        raw.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        raw.select(F.col("a").alias("id"))
        .unionByName(raw.select(F.col("b").alias("id")))
        .distinct()
    )
    return cur, all_nodes


def _star_phase(sym: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round over the symmetric edge list.

    For every node u with neighborhood G(u) and m = min(G(u) + {u}):
    large-star rewires u's strictly-larger neighbors to m; small-star
    rewires the rest (and u itself) to m. Returns a canonical undirected
    edge list (a < b, deduped, no self-loops)."""
    w = Window.partitionBy("s")
    m = F.least(F.min("d").over(w), F.col("s"))
    cond = (F.col("d") > F.col("s")) if large else (F.col("d") <= F.col("s"))
    hooked = (
        sym.withColumn("m", m)
        .filter(cond)
        .select(F.col("d").alias("x"), F.col("m").alias("y"))
    )
    if not large:
        # small-star also hooks u itself to m
        hooked = hooked.unionByName(
            sym.select("s", F.least(F.min("d").over(w), F.col("s")).alias("m"))
            .select(F.col("s").alias("x"), F.col("m").alias("y"))
            .distinct()
        )
    return (
        hooked.filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )


def _symmetric(cur: DataFrame) -> DataFrame:
    return cur.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        cur.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )


def _star_round(cur: DataFrame) -> DataFrame:
    """One full contraction round: large-star then small-star, checkpointed."""
    nxt = _star_phase(_symmetric(cur), large=True)
    return _star_phase(_symmetric(nxt), large=False).localCheckpoint(eager=True)


def _labels_from_stars(cur: DataFrame) -> DataFrame:
    """At convergence the edge set is a forest of stars whose centers are
    the component minima: every node's label is min(neighbors + self)."""
    return (
        _symmetric(cur)
        .groupBy("s")
        .agg(F.least(F.min("d"), F.col("s")).alias("cluster_id"))
        .select(F.col("s").alias("id"), "cluster_id")
    )


# Hard ceiling on edges allowed into the single-task union-find finish —
# the one coalesce(1) step in the dedup pipeline (VERDICT r6 #5). 50M
# canonical edges ≈ 800 MB of int64 endpoints plus the numpy working set:
# comfortably in one executor's memory, far past any sane
# local_edge_threshold. Exceeding it fails LOUDLY (naming the knob)
# instead of silently turning one task into an hours-long straggler.
LOCAL_EDGE_HARD_CAP = 50_000_000


def _local_labels(cur: DataFrame, id_type: str, hard_cap: int = LOCAL_EDGE_HARD_CAP) -> DataFrame:
    """Exact components of a small edge set in ONE Spark job: coalesce to a
    single partition and run vectorized min-label propagation with pointer
    jumping (numpy), the in-core equivalent of the distributed rounds.
    np.unique gives SORTED codes, so min-over-codes == min-over-ids and the
    result is identical to the distributed path for any orderable id type.
    ``hard_cap`` bounds the edges this single task will accept — the guard
    runs IN the worker, so it holds no matter how the caller sized
    ``local_edge_threshold``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        srcs: list[pd.Series] = []
        dsts: list[pd.Series] = []
        n_edges = 0
        for b in batches:
            n_edges += len(b)
            if n_edges > hard_cap:
                raise ValueError(
                    f"single-task union-find finish received > {hard_cap} edges "
                    "(local_edge_hard_cap); lower local_edge_threshold on "
                    "connected_components so the star rounds contract further "
                    "before localizing, or use connected_components_star to stay "
                    "fully distributed"
                )
            srcs.append(b["a"])
            dsts.append(b["b"])
        if not srcs:
            yield pd.DataFrame({"id": pd.Series(dtype=object), "cluster_id": pd.Series(dtype=object)})
            return
        s = pd.concat(srcs).to_numpy()
        d = pd.concat(dsts).to_numpy()
        uni = np.unique(np.concatenate([s, d]))  # sorted — code order == id order
        a = np.searchsorted(uni, s)
        b = np.searchsorted(uni, d)
        lab = np.arange(len(uni))
        while True:
            old = lab
            lab = lab.copy()
            np.minimum.at(lab, a, lab[b])
            np.minimum.at(lab, b, lab[a])
            while True:  # pointer jumping: halve label-chain depth
                nxt = lab[lab]
                if np.array_equal(nxt, lab):
                    break
                lab = nxt
            if np.array_equal(old, lab):
                break
        yield pd.DataFrame({"id": uni, "cluster_id": uni[lab]})

    return cur.coalesce(1).mapInPandas(run, schema=f"id {id_type}, cluster_id {id_type}")


def _attach_singletons(labels: DataFrame, all_nodes: DataFrame) -> DataFrame:
    """Nodes with no canonical edge (isolated / self-loop-only) label
    themselves."""
    return all_nodes.join(labels, "id", "left").select(
        "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    local_edge_threshold: int = 2_000_000,
    local_edge_hard_cap: int = LOCAL_EDGE_HARD_CAP,
) -> DataFrame:
    """Return (id, cluster_id) for every node appearing in ``edges``;
    cluster_id = min node id in the component (exact fixpoint, so the
    result is engine-independent and DuckDB-oracle-checkable).

    Hybrid execution: star-contraction rounds while the edge set exceeds
    ``local_edge_threshold`` (each round is 2 window-min shuffles + a
    dedup and provably shrinks adversarial graphs in O(log^2 n) rounds),
    then a single-partition vectorized union-find finish. 2M canonical
    edges is ~32 MB of longs — far under an executor's working memory —
    and near-dup candidate sets at 100 TB contract under it within a few
    rounds because each round collapses every star to its center.
    ``local_edge_hard_cap`` is the loud backstop on that single task: the
    worker raises (naming the knob) rather than silently straggling if a
    mis-sized threshold lets too many edges localize."""
    cur, all_nodes = _canonical(edges, src, dst)
    id_type = edges.schema[src].dataType.simpleString()
    n = cur.count()
    for _ in range(max_iter):
        if n <= local_edge_threshold:
            return _attach_singletons(
                _local_labels(cur, id_type, local_edge_hard_cap), all_nodes
            )
        nxt = _star_round(cur)
        m = nxt.count()
        if m == n:  # star rounds strictly shrink until convergence
            converged = (
                nxt.unionByName(cur)
                .groupBy("a", "b")
                .count()
                .filter(F.col("count") == 1)
                .limit(1)
                .count()
                == 0
            )
            if converged:
                return _attach_singletons(_labels_from_stars(nxt), all_nodes)
        cur, n = nxt, m
    return _attach_singletons(_labels_from_stars(cur), all_nodes)


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Pure-distributed star contraction (no local finish): alternate
    large-star / small-star rounds to convergence, then read labels off the
    star forest. Same output contract as :func:`connected_components`; use
    when even the contracted graph must stay partitioned (e.g. the dedup
    graph itself has billions of non-singleton nodes)."""
    cur, all_nodes = _canonical(edges, src, dst)
    for _ in range(max_iter):
        nxt = _star_round(cur)
        # one-job symmetric-difference probe: both sides are distinct sets,
        # so every pair appearing once (not twice) in the union is a change
        changed = (
            nxt.unionByName(cur)
            .groupBy("a", "b")
            .count()
            .filter(F.col("count") == 1)
            .limit(1)
            .count()
        )
        cur = nxt
        if changed == 0:
            break
    return _attach_singletons(_labels_from_stars(cur), all_nodes)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    round_dp: int = 10,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list by power iteration — link
    analysis for crawl curation (centrality-weighted canonical selection
    within near-dup neighborhoods, domain authority features), the same
    family CommonCrawl-derived pipelines compute over the host graph.

    Spark-first shape: the edge list is symmetrized and de-duplicated
    once, out-degrees computed once, and each of the ``iters`` fixed
    iterations is ONE join (edges x current scores, shuffle keyed on the
    SAME src column every round, so the exchange is reused) plus one
    map-side-combined aggregation on dst. Nodes are the edge endpoints —
    every node of a symmetrized graph has in-degree >= 1, so there is no
    dangling-mass redistribution step and total score stays exactly 1
    ((1-d) + d * 1 each round; pinned by a test). At 100 TB you run this
    exactly the same way with edges bucketed by src and a
    localCheckpoint every few iterations to cut lineage (documented, not
    needed at fixture scale with a fixed small iteration count).

    Scores are rounded to ``round_dp`` each iteration: power iteration
    amplifies nothing (the operator is a contraction), so clamping each
    round keeps independent engines (this plan, the DuckDB oracle's
    unrolled-SQL twin) bit-aligned at far finer precision than the
    6-dp output contract."""
    # ONE execution of the (typically expensive) upstream edge plan: the
    # projected edge relation is materialized BEFORE the symmetrize union —
    # the union's two branches each contain the full upstream plan, so
    # without this the single sym checkpoint still ran the edge build twice
    # (r16 profile). The symmetrized deduped relation is then eagerly
    # materialized too, and both the degree table and the per-edge deg
    # column derive from the materialized partitions (VERDICT r10 #2: the
    # old persist()-only form re-ran the edge plan for deg.count() and
    # again on first action).
    e = mat(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
        "pagerank_edges",
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    symd = sym.join(deg, "src")  # carry deg on each edge: one join, reused every iter
    symd.persist()
    try:
        n = float(deg.count())
        if n == 0:
            # derive the node type from the input so the empty result's
            # schema matches the non-empty path for string/int ids too
            # (ADVICE r10), same as connected_components does
            spark = edges.sparkSession
            node_t = edges.schema[src_col].dataType.simpleString()
            return spark.createDataFrame([], f"node {node_t}, pr double")
        base = (1.0 - damping) / n
        scores = deg.select("src", F.lit(round(1.0 / n, round_dp)).alias("pr"))
        for _ in range(iters):
            scores = (
                symd.join(scores, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("pr") / F.col("deg")).alias("__c"))
                .select(
                    F.col("dst").alias("src"),
                    F.round(F.lit(base) + F.lit(damping) * F.col("__c"), round_dp).alias("pr"),
                )
            )
        return scores.select(F.col("src").alias("node"), "pr")
    finally:
        symd.unpersist()


# ---------------------------------------------------------------------------
# incremental cluster maintenance (round 11)

_CLUSTER_META = "meta.json"


def _bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def build_cluster_state(
    edges: DataFrame, path: str, src: str = "id_a", dst: str = "id_b",
    n_buckets: int = 8,
) -> str:
    """Solve components ONCE over the base corpus's near-dup edges and
    PERSIST the result so later batches never re-cluster the corpus:

    - ``{path}/labels/bucket=K/`` — (id, cluster_id), bucketed by a hash
      of the component label;
    - ``{path}/edges/bucket=K/``  — the canonical edge set, carried with
      its component label so an update can read back exactly the touched
      components' edges via PARTITION-PRUNED scans.

    ``n_buckets`` is the rewrite-granularity knob: an update rewrites
    whole buckets (dynamic partition overwrite), so size buckets to a few
    GB at deployment scale (n_buckets grows with the corpus; 8 at test
    SF). ``meta.json`` commits LAST through ``storage.STORE`` — a state
    dir without it is an incomplete build and is rebuilt."""
    import json
    import os

    from execute_sync_spark import storage

    node_t = edges.schema[src].dataType.simpleString()
    # materialize the (typically expensive) edge plan ONCE: it feeds both
    # the component solve and the persisted canonical edge store below —
    # without this the plan executed twice (once inside
    # connected_components' _canonical, once in the second _canonical here)
    edges = mat(edges.select(src, dst), "cluster_state_edges")
    labels = connected_components(edges, src, dst)
    canon, _ = _canonical(edges, src, dst)
    (
        labels.withColumn("bucket", _bucket(F.col("cluster_id"), n_buckets))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "labels"))
    )
    (
        canon.join(labels.withColumnRenamed("id", "a"), "a")
        .select("a", "b", "cluster_id")
        .withColumn("bucket", _bucket(F.col("cluster_id"), n_buckets))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "edges"))
    )
    storage.STORE.write_text(
        os.path.join(path, _CLUSTER_META),
        json.dumps({"n_buckets": n_buckets, "node_type": node_t}),
    )
    return path


def update_cluster_state(
    spark, path: str, new_edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Fold one batch of new near-dup edges into the persisted cluster
    state, re-solving ONLY the components the batch touches — the 100 TB
    shape of cluster maintenance: every incremental batch costs
    O(touched components + their buckets), never a corpus re-cluster.

    Correctness contract (pinned by tests and the driver oracle): after
    any sequence of updates the state equals a full recompute over the
    union of all edge sets — min-label components are confluent, so
    re-solving a touched component over (its persisted edges + the new
    edges) lands the same labels a global solve would. Replaying the same
    batch is a no-op by the same argument. Returns the updated labels
    (id, cluster_id), read back from the committed state."""
    import json
    import os

    from execute_sync_spark import storage

    meta = json.loads(storage.STORE.read_text(os.path.join(path, _CLUSTER_META)))
    nb = int(meta["n_buckets"])
    # read state back with EXPLICIT schemas (recorded at build time): a
    # state built from an empty corpus has zero bucket partitions — only
    # _SUCCESS — and schema inference would fail on it, but an empty
    # state is a valid state (pytest empty-inputs contract)
    t = meta.get("node_type", "bigint")
    labels_schema = f"id {t}, cluster_id {t}, bucket int"
    edges_schema = f"a {t}, b {t}, cluster_id {t}, bucket int"
    labels_dir = os.path.join(path, "labels")
    edges_dir = os.path.join(path, "edges")
    labels = spark.read.schema(labels_schema).parquet(labels_dir)

    new_e = (
        new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if new_e.isEmpty():
        return labels.select("id", "cluster_id")
    new_nodes = (
        new_e.select(F.col("a").alias("id"))
        .unionByName(new_e.select(F.col("b").alias("id")))
        .distinct()
    )
    # components the batch touches; materialized because it's consumed by
    # several anti-joins while their source partitions get overwritten
    touched = (
        labels.join(new_nodes, "id")
        .select("cluster_id", "bucket")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # bucket lists are <= n_buckets values: safe to collect, and they are
    # what makes the edge read-back a partition-PRUNED scan
    touched_buckets = sorted(r.bucket for r in touched.select("bucket").distinct().collect())
    old_aff = (
        spark.read.schema(edges_schema).parquet(edges_dir)
        .where(F.col("bucket").isin(touched_buckets))
        .join(touched.select("cluster_id"), "cluster_id", "left_semi")
        if touched_buckets
        else spark.createDataFrame([], f"a {new_e.schema['a'].dataType.simpleString()}, "
                                       f"b {new_e.schema['b'].dataType.simpleString()}")
    )
    sub = old_aff.select("a", "b").unionByName(new_e)
    relab = (
        connected_components(sub, "a", "b")
        .withColumn("bucket", _bucket(F.col("cluster_id"), nb))
        .localCheckpoint(eager=True)
    )
    relab_buckets = sorted(r.bucket for r in relab.select("bucket").distinct().collect())
    write_buckets = sorted(set(touched_buckets) | set(relab_buckets))

    # labels: survivors of the rewritten buckets + the re-solved rows.
    # Eagerly materialized BEFORE the dynamic overwrite deletes the
    # partitions it was computed from. The label and edge sides are
    # independent of each other, so their materializations — and then
    # their writes+cleanups — run as two overlapped driver-thread jobs
    # (guide §2.6); each side's own ckpt -> write -> cleanup order is
    # unchanged, so the crash/replay story is identical.
    from concurrent.futures import ThreadPoolExecutor

    def _mk_labels():
        return (
            labels.where(F.col("bucket").isin(write_buckets))
            .join(touched.select("cluster_id"), "cluster_id", "left_anti")
            .select("id", "cluster_id", "bucket")
            .unionByName(relab.select("id", "cluster_id", "bucket"))
            .localCheckpoint(eager=True)
        )

    def _mk_edges():
        return (
            spark.read.schema(edges_schema).parquet(edges_dir)
            .where(F.col("bucket").isin(write_buckets))
            .join(touched.select("cluster_id"), "cluster_id", "left_anti")
            .select("a", "b", "cluster_id", "bucket")
            .unionByName(
                sub.join(relab.withColumnRenamed("id", "a"), "a")
                .select("a", "b", "cluster_id", "bucket")
            )
            .localCheckpoint(eager=True)
        )

    def _write_side(df, d):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(d)
        )
        # dynamic overwrite only replaces partitions PRESENT in the written
        # data: a bucket whose rows all migrated to the merged component's
        # bucket would silently keep its stale files. Remove the write-set
        # buckets that received zero rows. (A crash between the write and
        # this cleanup leaves stale rows; REPLAYING the same batch heals —
        # the stale labels re-enter `touched` and the bucket rewrites.)
        have = {r.bucket for r in df.select("bucket").distinct().collect()}
        for k in set(write_buckets) - have:
            storage.STORE.rmtree(os.path.join(d, f"bucket={k}"))

    if mat_on("cluster_state_pool"):
        with ThreadPoolExecutor(max_workers=2) as _pool:
            _fl = _pool.submit(_mk_labels)
            _fe = _pool.submit(_mk_edges)
            out_labels, out_edges = _fl.result(), _fe.result()
            _wl = _pool.submit(_write_side, out_labels, labels_dir)
            _we = _pool.submit(_write_side, out_edges, edges_dir)
            _wl.result(), _we.result()
    else:
        out_labels, out_edges = _mk_labels(), _mk_edges()
        _write_side(out_labels, labels_dir)
        _write_side(out_edges, edges_dir)
    return spark.read.schema(labels_schema).parquet(labels_dir).select("id", "cluster_id")


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    UNDIRECTED edge list — community detection for corpus curation:
    unlike connected components (which glue everything reachable into one
    blob), LPA splits a near-dup/citation/link graph into densely-
    connected communities, the granularity used for topic balancing,
    per-community canonical selection, and contamination blast-radius
    analysis. Every node starts labeled with its own id; each synchronous
    round re-labels every node with the MOST FREQUENT label among its
    neighbors, ties broken by the smallest label — a deterministic vote
    (classic LPA breaks ties randomly; the min-tie-break makes the
    fixed-iteration result reproducible across engines and reruns, which
    an oracle-gated pipeline requires).

    Spark-first shape: the edge list is symmetrized + deduplicated ONCE
    and eagerly materialized (same rationale as ``pagerank`` above); each
    of the ``iters`` fixed rounds is ONE join keyed on the same src column
    (exchange reuse) + one map-side-combined (node, label) count + one
    per-node argmax aggregation — all hash-partitioned on node, never a
    sort. At 100 TB: edges bucketed by src, labels localCheckpointed every
    few rounds to cut lineage; cost per round is O(|E|) independent of
    community structure (contrast the unbounded-iteration forms —
    fixed-round LPA is the production setting, convergence is asymptotic
    anyway). Nodes are the edge endpoints, as in ``pagerank`` (a
    singleton has no neighbors to vote, and callers carry singletons
    through with a left join, as connected_components' helper does)."""
    # materialize before the symmetrize union — its two branches otherwise
    # each re-run the upstream edge plan (same rationale as pagerank above)
    e = mat(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
        "lpa_edges",
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select("src").distinct().select(
        "src", F.col("src").alias("lab")
    )
    # per-round top-1 = max_by over a (count, -label) struct: an argmax
    # hash aggregation with map-side partials — one exchange, no sort at
    # any width (a per-node row_number window would sort every partition).
    # -label is order-reversing for this package's non-negative ids (a
    # MIN_LONG id would wrap; no caller has one).
    tie = F.struct(F.col("__c").alias("c"), (-F.col("lab")).alias("nl"))
    for _ in range(iters):
        votes = (
            sym.join(labels, "src")
            .groupBy(F.col("dst").alias("node"), F.col("lab"))
            .agg(F.count("*").alias("__c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(F.max_by(F.col("lab"), tie).alias("lab"))
            .select(F.col("node").alias("src"), "lab")
        )
    return labels.select(F.col("src").alias("node"), F.col("lab").alias("community"))


def triangle_counts(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Per-node triangle participation over an undirected edge relation —
    the clustering-density signal for near-dup graphs (a clique-ish
    neighborhood = one template family; a triangle-free star = one hub
    document paired with unrelated ones). Input edges are one row per
    undirected pair; output is (node, n_triangles) for nodes in >= 1
    triangle.

    Physical shape (the standard distributed formulation): canonicalize
    each edge to a < b, then count length-2 paths joined back to the
    closing edge — two equi-joins on node keys over the (valved) edge
    relation, never a matrix or an all-pairs step. Each triangle a<b<c is
    found exactly once, then exploded to its three corners for the
    per-node count (map-side combined)."""
    # the canonical edge relation is referenced THREE times below (both
    # path legs + the closing edge); materialize once so the upstream
    # near-dup candidate plan does not run per reference (guide §2.4)
    e = mat(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct(),
        "triangle_edges",
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    paths = e1.join(e2, "y").select("x", "y", "z")  # x < y < z by construction
    tri = paths.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
