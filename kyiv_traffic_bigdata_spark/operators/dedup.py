"""Document deduplication suite — exact, n-gram Jaccard, MinHash+LSH,
SimHash — the LLM-training-corpus operators mandated by the north star
(BASELINE.json), built over the driver's ``documents`` table.

Scale design. The naive near-dup formulation is an O(n²) pairwise compare —
a non-starter at 100 TB. Every operator here goes through the standard
candidate-generation shape instead:

    per-doc features (map-only) → inverted index (explode) →
    equi-join on feature bucket (shuffle on bucket key) →
    exact verification on the candidate pairs only.

All hashing is :func:`functions.text.portable_hash` (md5-prefix), so
signatures are reproducible across engines/runs — required both for the
DuckDB oracle and for incrementally deduplicating a growing corpus without
recomputing old signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, portable_hash, tokens, word_ngrams

#: MinHash parameters. 16 permutations in 4 bands × 4 rows ⇒ LSH s-curve
#: threshold (1/b)^(1/r) ≈ 0.71 Jaccard. Permutation i is the universal
#: hash (a_i·h + b_i) mod PRIME over the portable 32-bit shingle hash.
NUM_PERM = 16
LSH_BANDS = 4
LSH_ROWS = NUM_PERM // LSH_BANDS
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne); products stay < 2^63


def perm_coeffs(i: int) -> tuple[int, int]:
    """Deterministic permutation coefficients (odd a, spread b)."""
    return 2 * i + 1, 7919 * i + 17


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via normalized-text fingerprint (md5) hash-groupBy.

    Output: one row per distinct content — representative id (min),
    copy count. A single hash aggregate on a 32-hex key; at 100 TB this is
    the cheapest possible dedup (no pairwise anything).
    """
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("copies"))
    )


def shingle_index(
    docs: DataFrame, id_col: str, text_col: str, ngram: int
) -> DataFrame:
    """Inverted index: (doc_id, shingle) with DISTINCT word n-gram shingles.

    Staged projections on purpose: ``tokens`` (regex normalize + split) is
    materialized once per row before the n-gram lambda references it.
    Higher-order functions get no common-subexpression elimination, so the
    inlined composition re-runs the tokenizer per reference — measured 12×
    slower at sf0.1. CollapseProject keeps the stages separate because the
    alias is non-cheap and multiply-referenced.
    """
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tok")
    )
    grams = toked.select("doc_id", word_ngrams(F.col("_tok"), ngram).alias("_g"))
    # explode_outer + post-filter, NOT plain explode: InferFiltersFromGenerate
    # would add size(_g) > 0 under a plain explode, and predicate pushdown
    # then substitutes the whole n-gram expression into a scan-level Filter,
    # re-evaluating the expensive pipeline per row (measured 2x the whole
    # query). A filter on the *generated* column cannot sink below the
    # Generate, and dropping the null rows is semantically identical.
    return (
        grams.select("doc_id", F.explode_outer("_g").alias("shingle"))
        .where(F.col("shingle").isNotNull())
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard similarity.

    Candidate generation = self-join of the shingle inverted index (only
    docs sharing ≥1 shingle ever meet — the 100 TB-safe pruning); exact
    Jaccard = |∩| / (|A|+|B|−|∩|) on candidates. Output (a<b) pairs with
    jaccard ≥ threshold, rounded to 6 for engine portability.

    Skew note: a stop-shingle shared by millions of docs would explode the
    self-join; production path caps posting-list length (drop shingles with
    document frequency above a cutoff) — harmless for recall at sensible
    thresholds because near-dup pairs share many rare shingles.
    """
    idx = shingle_index(docs, id_col, text_col, ngram)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_shingles", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_perm: int = NUM_PERM,
) -> DataFrame:
    """Wide MinHash signature: one column ``mh_i`` per permutation.

    explode shingles → portable hash → num_perm universal-hash minima via
    conditional aggregation (single hash aggregate, no pivot shuffle).
    Docs with no shingles get no row (nothing to hash) — callers union
    them back if they must survive.
    """
    hashed = shingle_index(docs, id_col, text_col, ngram).select(
        "doc_id", portable_hash(F.col("shingle")).alias("h")
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in ((j, perm_coeffs(j)) for j in range(num_perm))
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash → banded LSH candidates → exact-Jaccard verification.

    The full scale path: signatures are fixed-width (NUM_PERM ints/doc
    regardless of doc length); candidates come from equi-joins on
    (band, band_signature) so cost tracks true near-dup density, not n².
    Verification recomputes exact Jaccard on candidates only, so the output
    has NO false positives — misses only pairs the s-curve filters out.
    """
    sig = minhash_signatures(docs, id_col, text_col, ngram)
    band_cols = [
        F.md5(
            F.concat_ws(
                ",", *[F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
        ).alias(f"band_{b}")
        for b in range(LSH_BANDS)
    ]
    banded = sig.select("doc_id", *band_cols)
    buckets = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(b, ["band", "bh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verification bounded by the candidate set: intersect
    # shingles only for LSH-surfaced pairs (candidates ⋈ index_a ⋈ index_b)
    # instead of re-running the full inverted-index self-join — that would
    # cost the same as ngram_jaccard_pairs and defeat LSH's purpose. Work
    # here tracks |candidates| x shingles/doc, independent of corpus size.
    idx = shingle_index(docs, id_col, text_col, ngram)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ia, ib = idx.alias("ia"), idx.alias("ib")
    inter = (
        candidates.join(ia, F.col("id_a") == F.col("ia.doc_id"))
        .join(
            ib,
            (F.col("id_b") == F.col("ib.doc_id"))
            & (F.col("ia.shingle") == F.col("ib.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_shingles", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash over word-token features (portable 32-bit hashes).

    bit_j(doc) = 1 iff Σ_tokens (bit_j(h(token)) ? +1 : −1) > 0.
    Computed by exploding (token × bit-position) and one aggregate —
    all integer math, so the oracle reproduces it exactly. Hamming-distance
    bucketing over the resulting key is the near-dup query path.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tokn"),
    ).select("doc_id", portable_hash(F.col("tokn")).alias("h"))
    contrib = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).withColumn(
        # shiftright/shiftleft builtins need a literal shift count; expr
        # form accepts a column one.
        "w",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
    )
    return (
        contrib.groupBy("doc_id", "bit")
        .agg(F.sum("w").alias("s"))
        .withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )
