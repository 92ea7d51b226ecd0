"""Fixed-iteration PageRank over an edge list — iterative graph
analytics as DataFrame joins (the centrality companion to
operators.cluster.connected_components).

Scale design: each iteration is ONE equi-join (edge × rank, partitioned
by node id) and ONE aggregate — the standard Pregel-free Spark shape;
no driver-side graph, no windows. Ranks live in a nodes-sized frame;
corpus growth adds join tasks, not rounds. The iteration count is a
fixed parameter (k sweeps), which is both what bounded-latency
production jobs run and what makes the result ORACLE-CHECKABLE: the
same k sweeps unroll into k chained CTEs in the DuckDB twin.

Cross-engine determinism (the interesting part): float sums over a
node's in-neighbors are accumulation-order-dependent, so a naive
implementation diverges from any other engine at the ulp level and
drifts further every iteration. This implementation quantizes each
rank state to 6 decimals (the repo's portable floor-form) and sums
per-edge contributions IN DECIMAL — decimal addition is exact and
order-free — so every iteration's state is bit-identical across Spark,
DuckDB, and any partitioning. Determinism costs nothing structurally:
the decimal cast rides the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.gridsum import grid_sum
from ..functions.rounding import round6
from .staging import stage

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = DAMPING,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(node, deg, rank) after ``n_iter`` sweeps over the symmetrized
    edge list. Nodes are the endpoints of ``edges``; every node of a
    symmetric graph has out-degree ≥ 1, so there is no dangling-mass
    term. Rank states are 6-decimal-quantized and contributions are
    decimal-summed — see the module docstring."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # stage the symmetrized edge list ONCE: every sweep joins against it,
    # and without truncation each sweep would re-execute the (possibly
    # expensive) upstream pair-generation pipeline through its lineage
    sym = stage(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    )
    # deg is ALSO staged (r12): it appears in every sweep's join and in
    # the final projection, and un-staged Catalyst re-ran the degree
    # aggregate over sym once per appearance (4x for 3 sweeps); the
    # node-sized checkpoint also makes the count() below a block read.
    deg = stage(
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("a", "node")
    )
    n = deg.count()  # driver scalar — node count is metadata
    if n == 0:
        return deg.select("node", "deg", F.lit(0.0).alias("rank"))
    r = deg.select(
        "node", "deg", round6(F.lit(1.0) / F.lit(n)).alias("rank")
    )
    teleport = F.lit(1.0 - damping) / F.lit(n)
    for _ in range(n_iter):
        contrib = sym.join(r, sym.a == r.node).select(
            F.col("b").alias("node"),
            round6(F.col("rank") / F.col("deg")).alias("_c"),
        )
        # _c is a round6 output, i.e. a 6-dp grid value in [0, 1]: the
        # int64 grid split-sum equals the old decimal(18,6) cast-sum
        # bit-for-bit without the per-edge BigDecimal cast (r12; see
        # functions/gridsum.py — the SQL twin keeps the decimal formula
        # and the oracle re-proves the equality per sweep)
        inflow = contrib.groupBy("node").agg(
            grid_sum(F.col("_c"), 6).alias("_s")
        )
        r = (
            deg.join(inflow, "node", "left")
            .select(
                "node",
                "deg",
                round6(
                    teleport + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return r
