"""Iterative graph operator: connected components by min-label propagation.

The missing last step of every near-dup pipeline: pairwise candidates
(MinHash/SimHash/embedding pairs) must become transitive CLUSTERS — if A~B
and B~C, one canonical document should represent {A,B,C} even though A and C
never compared. That closure is a connected-components problem; the cluster
id is the component's minimum node id, which also serves as the canonical
(keep) document.

Implementation is the textbook DataFrame fixpoint: each node takes the min
label among itself and its neighbors until nothing changes. Convergence in
O(diameter) rounds; near-dup graphs are overwhelmingly tiny stars/cliques
(diameter 2-4). Each round is one shuffle on node id, and
``localCheckpoint`` truncates the growing plan lineage (without it the plan
doubles every round and Catalyst analysis time, not the data, becomes the
bottleneck). At 100 TB scale, swap the plain propagation for the
alternating large-star/small-star rounds of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14) — same per-round join shape,
provably O(log^2 n) rounds on adversarial graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["connected_components", "connected_components_star"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, cluster_id) for every node appearing in ``edges``;
    cluster_id = min node id in the component. Deterministic (exact
    fixpoint), so the result is engine-independent."""
    # checkpoint BEFORE deriving anything: edges is typically the expensive
    # near-dup candidate plan, and every derivation from the raw plan would
    # recompute it (labels, round-1 joins, the round-1 convergence count)
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.s == labels.id)
            .groupBy("d")
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = labels.join(neighbor_min, labels.id == neighbor_min.d, "left").select(
            "id",
            F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))).alias("lab"),
        )
        # pointer doubling: follow lab -> lab(lab) so label distance halves
        # every round — a diameter-21 chain converges in ~5 rounds, not 21
        mapping = stepped.select(F.col("id").alias("mid"), F.col("lab").alias("mlab"))
        new_labels = (
            stepped.join(mapping, stepped.lab == mapping.mid, "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce(F.col("mlab"), F.col("lab"))).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("lab").alias("cluster_id"))


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
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14): provably O(log^2 n) rounds on any graph, versus the
    O(diameter) of plain min-label propagation — the difference between 4
    and 20+ shuffles on chain-shaped near-dup graphs. Each round is one
    window-min per node plus a dedup; at convergence the edge set is a
    forest of stars whose centers are the component minima.

    Same output contract as :func:`connected_components` (exact, so the two
    are interchangeable under one oracle)."""
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        cur.select(F.col("a").alias("id"))
        .unionByName(cur.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        sym = cur.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
            cur.select(F.col("b").alias("s"), F.col("a").alias("d"))
        )
        nxt = _star_phase(sym, large=True)
        sym2 = nxt.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
            nxt.select(F.col("b").alias("s"), F.col("a").alias("d"))
        )
        nxt = _star_phase(sym2, large=False).localCheckpoint(eager=True)
        diff = nxt.exceptAll(cur).limit(1).count() + cur.exceptAll(nxt).limit(1).count()
        cur = nxt
        if diff == 0:
            break
    # converged: stars — every non-root neighbors its root (the min)
    sym = cur.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        cur.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )
    labels = sym.groupBy("s").agg(F.least(F.min("d"), F.col("s")).alias("cluster_id"))
    return (
        all_nodes.join(labels, all_nodes.id == labels.s, "left")
        .select(
            "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
        )
    )
