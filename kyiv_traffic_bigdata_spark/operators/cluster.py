"""Connected components over near-duplicate pair lists — the dedup
*resolution* step: pair operators (minhash_lsh_pairs, simhash_neardup_pairs,
cosine_neardup_pairs) emit edges; choosing ONE canonical document per
duplicate group needs the transitive closure of those edges.

Scale design: iterative **min-label propagation** (hash-to-min) expressed
as DataFrame joins. Each round every node adopts the smallest label among
itself and its neighbors; rounds repeat until no label changes. Cost per
round is one equi-join + one aggregate on the (symmetrized) edge list —
shuffle-partitioned by node id, no driver-side graph. Lineage is
truncated per round via operators.staging.stage (localCheckpoint by
default, reliable checkpoint on clusters — the standard iterative-Spark
pattern; a plan that doubles every round otherwise re-executes from the
source and overwhelms the optimizer).

Convergence: rounds = graph diameter. Near-dup components are
clique-like (diameter ≤ ~3), so the loop exits after 2-4 rounds with the
convergence check, independent of corpus size. For adversarially long
path graphs, the alternating large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond") converges in
O(log²n) rounds — the same join-shape per round; this module keeps the
simpler recursion because duplicate clusters are shallow by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staging import stage


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the smallest node id reachable from the node.

    Raises after ``max_iter`` non-converged rounds instead of silently
    returning partial labels — wrong components merge documents that are
    not duplicates, which is corpus corruption, not degraded accuracy.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().transform(stage)
    # Seed with round 1 fused into initialization: label(v) =
    # min(v, min(neighbors)) is ONE aggregation over the edge list when
    # every label is still the identity — no join needed, one whole
    # propagation round saved before the loop starts.
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("component"))
        .withColumnRenamed("a", "node")
        .transform(stage)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("component").alias("_nc")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_nc").alias("_mn"))
            .withColumnRenamed("a", "node")
        )
        # Convergence check fused into the propagation round (r12,
        # guide §1.3/§5.1): the old/new label comparison IS this
        # join's own output, so carry a per-row changed flag through
        # the staged frame instead of re-joining the two label
        # snapshots afterwards — that re-join was a second shuffle
        # job per round. The check is then an any-row scan of the
        # just-materialized checkpoint blocks (isEmpty = limit-1
        # take, no shuffle), and each round runs one propagation job
        # instead of two.
        newc = F.least(
            F.col("component"), F.coalesce(F.col("_mn"), F.col("component"))
        )
        staged_round = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                newc.alias("_newc"),
                (newc != F.col("component")).alias("_chg"),
            )
            .transform(stage)
        )
        labels = staged_round.select(
            "node", F.col("_newc").alias("component")
        )
        if staged_round.where(F.col("_chg")).isEmpty():
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds the near-dup assumption; use "
        "large-star/small-star for general graphs"
    )


def duplicate_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Resolution summary per duplicate component: canonical (min) doc id,
    member count — the table a keep-one-per-group filter joins against."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical_id"),
    )


def bfs_depths(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    seed_mod: int = 4,
    max_depth: int = 4,
) -> DataFrame:
    """(node, depth) multi-source BFS over the undirected pair graph:
    depth = unweighted hop distance to the NEAREST seed, seeds being
    the graph nodes with ``node % seed_mod == 0``; nodes farther than
    ``max_depth`` from every seed are excluded. Completes the graph
    family (components / LPA / k-core / triangles / PageRank / link
    prediction) with the hop-distance primitive.

    The depth BOUND is part of the operator's definition, not a
    convergence heuristic — it makes the result identical to a
    depth-capped recursive-CTE oracle, and it is the scale contract:
    each round is one frontier ⋈ edges equi-join + one anti-join
    against the settled set, so total work is O(max_depth) bounded
    passes whatever the graph size (near-dup graphs are shallow — a
    duplicate family's diameter is tiny — so a small cap loses nothing
    while keeping the iteration count corpus-independent). Frontiers
    are staged (lineage-truncated) every round, the same discipline as
    connected_components.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .transform(stage)
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    depths = (
        nodes.where(F.col("node") % seed_mod == 0)
        .select("node", F.lit(0).cast("long").alias("depth"))
        .transform(stage)
    )
    frontier = depths.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(depths, "node", "left_anti")
            .select("node", F.lit(d).cast("long").alias("depth"))
            .transform(stage)
        )
        if nxt.isEmpty():
            # an empty frontier stays empty — skipping the remaining
            # rounds changes nothing (every later union is a no-op) and
            # saves max_depth-d staged join rounds; near-dup graphs
            # usually settle in 1-2 hops
            break
        # nxt is already a checkpoint; the settled set is a union of
        # checkpoints whose anti-join probe reads them directly —
        # re-staging the growing union each round was a second full
        # materialization per round for no lineage benefit (r12).
        depths = depths.unionByName(nxt)
        frontier = nxt.select("node")
    return depths
