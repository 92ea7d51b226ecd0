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


#: banding layout for cosine_neardup_pairs — 4 bands x 4 sign bits.
#: P[same band bucket] = (1 - theta/pi)^4 per band; for cos=0.3
#: (theta~72.5 deg) that's ~0.13/band, ~0.42 overall — the moderate-recall
#: blocking tradeoff. More bands => recall up, candidate volume up.
NEARDUP_BANDS = 4
NEARDUP_ROWS = 4


def cosine_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = NEARDUP_BANDS,
    rows_per_band: int = NEARDUP_ROWS,
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (north-star dedup op #5).

    Banded random-hyperplane LSH blocking + exact cosine verification —
    the signature-space analogue of operators.dedup.minhash_lsh_pairs:

    1. each vector gets ``bands * rows_per_band`` deterministic sign bits
       (literal hyperplane coefficients, functions.vector);
    2. per band, vectors sharing the band's bit-slice are candidates —
       a self-equi-join on (band, slice), hash-partitioned, no cross join;
    3. DISTINCT candidate id pairs (a pair can collide in several bands)
       are verified with the exact cosine >= threshold predicate.

    Verification runs INSIDE each bucket as one numpy gram matrix
    (``applyInPandas``): materializing the candidate pair list through a
    shuffle costs more than the dot products themselves at LSH's dense-
    bucket worst case (a 4-bit band over n rows has only 16 buckets, so
    candidate volume is ~n^2/16 per band — 460k pairs at just 2k vectors).
    Per-bucket BLAS turns those into a few hundred sub-ms matmuls and
    emits only the >= threshold survivors, so the only shuffles are the
    bands x corpus bucket exchange (vectors ride along: bands x row_size,
    bounded) and a final tiny pair dedup. A pair colliding in several
    bands is deduped by max(sim) — matmul blocking may differ per bucket
    shape, so the two sims can differ in final ulps; max() + round(6)
    makes the output deterministic.
    """
    import numpy as np
    import pandas as pd

    n_planes = bands * rows_per_band
    sig = hyperplane_sign_bits(F.col(vec_col), dim, n_planes)
    bucketed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(sig, b * rows_per_band + 1, rows_per_band).alias(
                            "bkey"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select("id", "vec", "_bb.band", "_bb.bkey")

    def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        if len(pdf) < 2:
            return empty
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["vec"].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        gram = mat @ mat.T
        denom = np.outer(norms, norms)
        sims = np.divide(gram, denom, out=np.zeros_like(gram), where=denom != 0)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "sim": sims[ia[keep], ib[keep]]}
        )

    pairs = bucketed.groupBy("band", "bkey").applyInPandas(
        verify_bucket, "id_a long, id_b long, sim double"
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.max("sim").alias("_sim"))
        .select("id_a", "id_b", F.round(F.col("_sim"), 6).alias("cosine_sim"))
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
