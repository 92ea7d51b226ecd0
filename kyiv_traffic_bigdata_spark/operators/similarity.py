"""Similarity search over embedding columns — brute-force cosine top-k
baseline plus an LSH-bucketed ANN scale path (north-star operators over the
driver's ``embeddings`` table).

Scale design: brute force is a broadcast of the (small) query set against a
full scan of the corpus — linear, shuffle-free except the final per-query
top-k (TakeOrdered-style). The ANN variant buckets both sides by a
random-hyperplane signature so each query only scores its bucket —
sub-linear scoring at the cost of recall, with multi-probe (bit-flip)
expansion to claw recall back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot, hyperplane_sign_bits, norm
from .topk import top_k_per_group


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``broadcast(queries) × corpus`` — the corpus never shuffles; scoring is
    one codegen'd expression per (query, doc). Self-matches excluded.
    Scores rounded to 6 decimals (cross-engine float stability); ranking
    uses the unrounded score with id tiebreak for determinism.
    """
    # norms are per-row, not per-pair: attach them to each side before the
    # join so the O(|q| x |c|) scoring loop does one dot product per pair
    # instead of re-folding both vectors' norms 4M times. sqrt-then-multiply
    # keeps the float result identical to cosine()'s denominator.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    denom = F.col("_qn") * F.col("_cn")
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(
        dot(F.col("qvec"), F.col("cvec")) / denom
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", sim.alias("_sim")
    )
    ranked = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )
    return ranked.select(
        "query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("cosine_sim")
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 10,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + in-bucket scoring.

    Both sides compute the same deterministic signature; queries probe
    their own bucket plus every bucket within ``multiprobe_bits`` bit-flips
    (n_planes choose 1 extra buckets for 1 bit — cheap, large recall win).
    Join is an equi-join on the bucket key: co-partitioned, skew-safe under
    AQE. Recall vs. the exact baseline is asserted in tests, not assumed.
    """
    sig = hyperplane_sign_bits(F.col(vec_col), dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
        sig.alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("_qn"),
        sig.alias("sig"),
    )
    probes = [F.col("sig")]
    if multiprobe_bits >= 1:
        for i in range(n_planes):
            flipped = F.concat(
                F.substring(F.col("sig"), 1, i),
                F.when(F.substring(F.col("sig"), i + 1, 1) == "1", F.lit("0")).otherwise(
                    F.lit("1")
                ),
                F.substring(F.col("sig"), i + 2, n_planes - i - 1),
            )
            probes.append(flipped)
    q = q0.select(
        "query_id", "qvec", "_qn", F.explode(F.array(*probes)).alias("bucket")
    ).distinct()
    denom = F.col("_qn") * F.col("_cn")
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(
        dot(F.col("qvec"), F.col("cvec")) / denom
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        # multiprobe can reach the same neighbor via several buckets
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("_sim").alias("_sim"))
    )
    ranked = top_k_per_group(
        scored, ["query_id"], [F.col("_sim").desc(), F.col("neighbor_id").asc()], k
    )
    return ranked.select(
        "query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("cosine_sim")
    )
