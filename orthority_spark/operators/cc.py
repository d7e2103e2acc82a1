"""Distributed connected components over an edge list (DataFrame-only).

Why it exists: the dedup keep-rules in this repo (`embedding_dedup_keep`,
corpus_clean's text path) are PAIR-based — drop the higher id of every
detected near-dup pair. That rule is not transitive: with detected pairs
(1,3) and (2,3) it keeps BOTH 1 and 2 even though they are connected
through 3. A training pipeline that wants one canonical document per
duplicate CLUSTER needs the transitive closure — i.e. connected
components over the near-dup pair graph, with the component minimum as
the canonical id.

Algorithm: min-label propagation accelerated with pointer jumping
(the alternating-star family of Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public literature). Each iteration is

    c(n) <- min(c(n), min over neighbours m of c(m))   (one equi-join + agg)
    c(n) <- c(c(n))                                    (pointer jump: self-join)

Invariants (each step preserves both, so the fixpoint is the component
minimum — proof sketch in test_cc.py): c(n) <= n, and c(n) is always the
id of a node in n's component. Pointer jumping halves the distance to
the component root each round, so convergence is O(log diameter)
iterations, NOT O(diameter) — the property that makes this viable on a
web-scale dup graph where chains of near-identical documents are long.

Scale notes: every step is an equi-join / aggregation (shuffle on node
id, AQE-splittable); there is no all-pairs stage and nothing is
collected to the driver except the per-iteration convergence count (one
long). Lineage is truncated with an eager ``localCheckpoint`` per
iteration — without it the pointer-jump self-join doubles the logical
plan every round and the analyzer, not the data, becomes the bottleneck.
On a long-lived cluster job prefer a reliable ``checkpoint`` directory
(localCheckpoint does not survive executor loss); a gate query run is
short-lived, so the local variant is the right default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it.

    ``nodes``: one column ``node`` (every vertex, including isolated
    ones — they come back labelled with themselves; ``nodes`` is the
    vertex universe, so an edge endpoint missing from it is silently
    ignored — both gate callers derive edges from the same corpus scan,
    which guarantees containment). ``edges``: columns
    ``src``/``dst``, undirected (direction and duplicates don't matter).
    Returns (node, comp) with comp = min id of the node's component —
    deterministic, so oracle-checkable exactly.

    Raises RuntimeError if not converged after ``max_iter`` pointer-jump
    iterations (2^max_iter diameter budget — never binds in practice).
    """
    fwd = edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
    rev = edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    # materialize the adjacency ONCE: the edge plan (often an expensive
    # LSH pair detection) must not be recomputed every iteration
    adj = fwd.union(rev).localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(node).alias("n"), F.col(node).alias("c")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            adj.alias("e")
            .join(labels.alias("l"), F.col("e.m") == F.col("l.n"))
            .groupBy(F.col("e.n").alias("n"))
            .agg(F.min("l.c").alias("nc"))
        )
        prop = labels.join(nbr_min, "n", "left").select(
            "n",
            F.least(F.col("c"), F.coalesce(F.col("nc"), F.col("c"))).alias("c"),
        )
        jump_tbl = prop.select(F.col("n").alias("c"), F.col("c").alias("cc"))
        new = (
            prop.alias("x")
            .join(jump_tbl.alias("y"), "c", "left")
            .select("n", F.coalesce(F.col("y.cc"), F.col("c")).alias("c"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("a")
            .join(labels.alias("b"), "n")
            .where(F.col("a.c") != F.col("b.c"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels.select(F.col("n").alias(node), F.col("c").alias("comp"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )
