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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.rounding import round6

from ..functions.text import fingerprint, portable_hash, tokens, word_ngrams
from .staging import stage

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
    docs: DataFrame, id_col: str, text_col: str, ngram: int,
    engine: str = "expr",
) -> DataFrame:
    """Inverted index: (doc_id, shingle) with DISTINCT word n-gram shingles.

    ``engine="expr"`` (default since r12) keeps the whole chain
    pure-Catalyst — no Python boundary at all. The r12 alternating A/B
    at sf0.1 (6 runs each, warm session) measured the higher-order
    expression chain FASTER than the Arrow UDF (median 0.42 s vs
    0.58 s, min 0.25 s vs 0.51 s for the full index build), reversing
    the earlier measurement that made Arrow the default — and the expr
    path additionally avoids shipping the token arrays across the
    JVM↔Python boundary twice (guide §4: prefer built-ins when they
    exist). ``engine="arrow"`` keeps the Arrow-batched UDF
    (functions.text.word_ngrams_arrow), bit-identical
    (property-tested), for re-measurement.

    Staged projections on purpose: ``tokens`` (regex normalize + split) is
    materialized once per row before the n-gram stage references it.
    Higher-order functions get no common-subexpression elimination, so the
    inlined composition re-runs the tokenizer per reference — measured 12×
    slower at sf0.1. CollapseProject keeps the stages separate because the
    alias is non-cheap and multiply-referenced.
    """
    from ..functions.text import word_ngrams_arrow
    # Partitioning contract: the interpreted higher-order chain below is
    # the dominant per-row cost, so the INPUT must already be spread
    # across cores — the query layer does this once (_docs_with_tokens
    # round-robins the single-split local corpus; measured 5.7s of an
    # 11s query on one core otherwise). No repartition here: operators
    # stacking their own shuffles on top of the caller's doubles the
    # exchange of raw text for nothing.
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tok")
    )
    gram_fn = word_ngrams_arrow if engine == "arrow" else word_ngrams
    grams = toked.select("doc_id", gram_fn(F.col("_tok"), ngram).alias("_g"))
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


#: Stop-shingle document-frequency cap for ngram_jaccard_pairs candidate
#: generation. A shingle shared by more than this many documents is a
#: "stop shingle" (boilerplate): its posting list contributes O(df²)
#: candidate pairs — one hot shingle shared by millions of docs is a
#: quadratic join blow-up at 100 TB — while carrying ~no near-dup signal,
#: because genuinely similar docs share many RARE shingles. Pruning
#: applies to candidate generation ONLY; verification still computes
#: Jaccard over the FULL shingle sets, so surfaced pairs keep their exact
#: score (recall-only, zero-false-positive pruning — same contract as LSH).
NGRAM_MAX_DOC_FREQ = 100

#: Join hint for the fat per-doc shingle-ARRAY sides of jaccard_verify.
#: Production value is ``shuffle_merge`` (sorts and SPILLS — the r10
#: 100× finding: shuffle-hash builds a non-spillable in-memory hash
#: relation, which OOMs on fat array partitions once the unified region
#: fragments). The env override exists ONLY so tools/spill_rung_ab.py
#: can measure the merge-vs-hash cost on identical code — never set it
#: in production, and never to ``broadcast`` (every side here scales
#: with the corpus; tests/test_plans.py pins no-broadcast).
ARRAY_SIDE_JOIN_HINT = os.environ.get(
    "SPARK_GRAFT_ARRAY_JOIN_HINT", "shuffle_merge"
)


def jaccard_verify(
    candidates: DataFrame, idx: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs against a
    (doc_id, shingle) inverted index.

    Work is bounded by |candidates| × shingles/doc, independent of corpus
    size. Output has NO false positives; shared by the n-gram-Jaccard
    and MinHash-LSH paths so both report identical scores for the same
    pair.

    Shape (r09, found by the 100× scale point): the index collapses to
    ONE row per doc — its distinct shingle array — before any pair
    work, so the per-pair intersection is in-row ``array_intersect``
    math and the only joins are candidates ⋈ doc-array equi-joins by
    doc id. The previous shape joined candidates against the EXPLODED
    index twice (a candidates × shingles/doc fan-out shuffle) and let
    the planner pick join strategies; size estimates for the
    checkpoint-staged index undershoot so badly that the 36.8M-row
    index became a broadcast build side and OOM'd an 8 GB driver at
    100× sf0.1. Every table here scales with the corpus (candidates ∝
    near-dup density × n, doc arrays = one row per doc), so the
    doc-array sides carry explicit join hints — nothing in this
    function may ever broadcast.

    Hint choice (r10, found by the 100× BFS scale point): the doc-array
    sides pin ``shuffle_merge``, NOT ``shuffle_hash`` — a shuffle-hash
    join must materialize its whole build partition as an in-memory
    hash relation (NON-spillable by design), and a partition of
    shingle ARRAYS is fat: at 100× the 64 MB relation page could not be
    acquired once concurrent tasks fragmented the unified region
    (r09's shuffle_hash pin fixed the broadcast OOM but parked the
    fragility one level down). Sort-merge streams both sorted sides
    and SPILLS — the extra sort of the one-row-per-doc array table is
    noise next to the pipeline, and the no-broadcast pin is exactly as
    satisfied. The narrow-row bucket self-joins keep shuffle_hash
    (their builds are bounded and thin; no sort needed).
    """
    doc_sh = idx.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("_sh")
    )
    a = doc_sh.select(
        F.col("doc_id").alias("id_a"), F.col("_sh").alias("_sha")
    ).hint(ARRAY_SIDE_JOIN_HINT)
    b = doc_sh.select(
        F.col("doc_id").alias("id_b"), F.col("_sh").alias("_shb")
    ).hint(ARRAY_SIDE_JOIN_HINT)
    paired = candidates.join(a, "id_a").join(b, "id_b")
    n_inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    denom = (F.size("_sha") + F.size("_shb") - n_inter).cast("double")
    return (
        paired.select(
            "id_a",
            "id_b",
            round6(n_inter / denom).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = NGRAM_MAX_DOC_FREQ,
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard similarity.

    Skew-safe single-pass shape. The inverted-index self-join runs only
    over *rare* shingles (document frequency ≤ ``max_doc_freq`` — the
    same posting-list cap winnow_overlap_pairs applies), so join volume
    is Σ_rare df² — bounded by cap·|index| — instead of the df² of the
    hottest boilerplate phrase: one shingle shared by millions of docs
    can never quadratically blow up the shuffle. That pass counts each
    pair's rare-shingle intersection directly (groupBy pair — no
    distinct, no second join against the index).

    Exactness is restored by **hot-shingle completion**: each doc's
    above-cap shingles are collected into a tiny per-doc array (≤ a few
    boilerplate phrases by construction — a doc is mostly rare shingles),
    and for surviving pairs ``n_inter = n_rare +
    |hot_A ∩ hot_B|`` via array_intersect. So every pair that shares at
    least one rare shingle gets its EXACT full-set Jaccard; the only
    recall loss is pairs sharing *exclusively* boilerplate — which a
    near-dup score should ignore anyway. A cheap upper bound
    (n_rare + min(|hot_A|,|hot_B|)) pre-filters before the array work.
    Output (a<b) pairs with jaccard ≥ threshold, rounded to 6 for engine
    portability.
    """
    # Materialize the index once: it feeds the df split, both join sides,
    # sizes, and hot arrays; the tokenize→n-gram chain is interpreted
    # higher-order lambdas and must not run per consumer.
    #
    # Int-id self-join (r13, guide §2.3 — same move as
    # prefix_filter_pairs): the rare self-join shuffles the pruned index
    # TWICE keyed by the n-gram string; n_rare only needs shingle
    # IDENTITY, so the df table assigns each distinct shingle an
    # injective int64 ``_sid`` (mono-id, collision-free by construction)
    # and the self-join ships (doc_id, long) rows instead of
    # (doc_id, ~27-byte string). The df table is STAGED so the id
    # assignment is frozen before its two consumers (rare and hot
    # splits) read it — an unstaged mono-id recomputed under a task
    # retry could disagree between consumers (see prefix_filter_pairs).
    idx = shingle_index(docs, id_col, text_col, ngram).transform(stage)
    dfreq = (
        idx.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn("_sid", F.monotonically_increasing_id())
        .transform(stage)
    )
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    rare = dfreq.where(F.col("_df") <= max_doc_freq).select("shingle", "_sid")
    hot_arrs = (
        idx.join(dfreq.where(F.col("_df") > max_doc_freq).select("shingle"), "shingle")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("hot"))
    )
    pruned = idx.join(rare, "shingle").select("doc_id", "_sid")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(b, "_sid")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    empty = F.array().cast("array<string>")
    joined = (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_shingles", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            "id_b",
        )
        .join(
            hot_arrs.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "hot", "hot_a"
            ),
            "id_a",
            "left",
        )
        .join(
            hot_arrs.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "hot", "hot_b"
            ),
            "id_b",
            "left",
        )
        .withColumn("hot_a", F.coalesce(F.col("hot_a"), empty))
        .withColumn("hot_b", F.coalesce(F.col("hot_b"), empty))
    )
    # upper bound on the full intersection; J is increasing in n_inter, so
    # ub(1+t) < t(n_a+n_b) proves jaccard < t without touching the arrays
    ub = F.col("n_rare") + F.least(F.size("hot_a"), F.size("hot_b"))
    n_inter = F.col("n_rare") + F.size(F.array_intersect("hot_a", "hot_b"))
    return (
        joined.where(
            ub * (1.0 + threshold) >= threshold * (F.col("n_a") + F.col("n_b"))
        )
        .withColumn(
            "jaccard",
            round6(
                n_inter / (F.col("n_a") + F.col("n_b") - n_inter).cast("double")
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """ALL pairs with exact shingle-set Jaccard ≥ ``threshold`` via
    **lossless prefix filtering** (the AllPairs / PPJoin candidate rule).

    Unlike :func:`ngram_jaccard_pairs` (whose df-cap trades recall on
    pairs overlapping only in boilerplate) this operator is exact with
    NO recall caveat: order the shingle universe globally by
    (document-frequency asc, shingle asc) and keep only each doc's first
    ``n - ceil(t·n) + 1`` shingles in that order (its *prefix*). Two
    sets with Jaccard ≥ t must overlap in ≥ ceil(t·n) elements, so by
    pigeonhole their prefixes share at least one shingle — joining on
    prefix shingles alone loses nothing. Verification then computes the
    exact Jaccard from the full sorted shingle arrays.

    Scale shape: the self-join runs ONLY over prefix shingles, and the
    rarest-first ordering means hot boilerplate shingles are the first
    ones *excluded* from prefixes — candidate volume is Σ df_p² over
    near-rarest shingles, the same skew-safety the df-cap buys, but
    earned without giving up exactness. The per-doc ranking window
    partitions by doc_id (bounded by doc length); full shingle arrays
    ride two equi-joins exactly like ngram_jaccard_pairs' hot arrays.

    Shuffle budget (r07 VERDICT ask): the index crosses the wire twice
    — once by shingle for the document-frequency join, once by doc_id
    for a single window pass that computes the set size (_n) AND the
    rank (_pos) together; the verification arrays aggregate the SAME
    staged enriched frame, so the index is never re-shuffled a third
    time (the old aggregate-then-join form shuffled it per derived
    table, and without staging the self-join's a/b aliases re-derive
    the whole join+window chain four times — measured 8 exchanges).
    _df stays a groupBy+join on purpose: a window-count over
    partitionBy(shingle) would put a hot boilerplate shingle's whole
    posting list in one task (windows can't be skew-split), while the
    join form is AQE-skew-splittable.

    Int-id verify (r13, guide §2.3 "shuffle keys and metadata instead
    of payloads"): the r12 dissection showed the VERIFY tail — two
    shuffle_merge joins shipping each candidate pair its full sorted
    SHINGLE-STRING arrays — at ~65% of the query (4.5 s of 7.0 s at
    sf0.1; staging 2.4 s, candidates 0.6 s). Every downstream decision
    only needs shingle IDENTITY, never the text, so each distinct
    shingle gets an injective int64 ``_sid`` (monotonically_increasing_id
    on the df table — partition id ⊕ offset, collision-free BY
    CONSTRUCTION, unlike a hash) and everything past the one
    idx ⋈ dfreq join — the window rank, the prefix self-join key, the
    sorted verify arrays, the array_intersect — runs on 8-byte longs
    instead of ~30-byte n-gram strings. The df table is staged FIRST:
    mono-ids are assigned per partition at evaluation time, so an
    unstaged df table recomputed under a task retry (shuffle fetch
    order is nondeterministic) could hand two consumers different ids
    for the same shingle; the localCheckpoint freezes one assignment
    (lost blocks fail the job — no silent recompute; same argument as
    guide §2.5's deterministic-synthetic-key rule). Output is
    invariant: prefix filtering is lossless under ANY global total
    order, and (_df asc, _sid asc) is one; the exact Jaccard per pair
    is id-representation-independent because _sid is injective. The
    naive all-pairs DuckDB twin (no ids, no candidates) re-proves both
    claims at every SF.
    """
    from pyspark.sql.window import Window

    idx = shingle_index(docs, id_col, text_col, ngram).transform(stage)
    dfreq = (
        idx.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn("_sid", F.monotonically_increasing_id())
        .transform(stage)
    )
    w_n = Window.partitionBy("doc_id")
    w = Window.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("_sid").asc())
    enriched = (
        idx.join(dfreq, "shingle")
        .withColumn("_n", F.count(F.lit(1)).over(w_n))
        .withColumn("_pos", F.row_number().over(w))
        .select("doc_id", "_sid", "_n", "_pos")
        .transform(stage)
    )
    arrs = enriched.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("_sid")).alias("_arr"),
        F.count(F.lit(1)).alias("_n"),
    )
    prefix = enriched.where(
        F.col("_pos")
        <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")).cast("long") + F.lit(1)
    ).select("doc_id", "_sid", "_n", "_pos")
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin POSITIONAL filter (Xiao/Wang/Lin/Yu, WWW 2008 — lossless,
    # r12): at a prefix hit on shingle s at global-order positions
    # (p_a, p_b), every common element other than s that could still be
    # counted ranks after s in BOTH docs, so the overlap is bounded by
    # ubound = 1 + min(n_a − p_a, n_b − p_b). J ≥ t needs overlap ≥
    # t·(n_a+n_b)/(1+t); pairs whose ubound can't reach that die HERE,
    # before the distinct and the fat-array verify joins (measured 409k
    # → far fewer candidates at sf0.1; the filter also subsumes the
    # AllPairs length filter — for n_a = min the bound reduces to
    # n_a ≥ t·n_b). OR-semantics across multiple prefix hits of the
    # same pair are automatic (distinct runs after the filter), which
    # is what makes the per-hit bound lossless: the FIRST shared
    # element in global order has no common elements before it, and it
    # sits in both prefixes whenever J ≥ t (the AllPairs prefix
    # guarantee), so at least that hit always survives for a true
    # pair. The 1e-9 slack keeps float rounding from ever rejecting an
    # exact-boundary pair (an extra candidate is free; a lost pair is
    # corruption). Verified independently by the naive-oracle gate at
    # sf0.001/0.01/0.1 — the oracle computes ALL pairs with no
    # candidate step, so any recall loss fails the hash compare.
    ubound = F.lit(1) + F.least(
        F.col("a._n") - F.col("a._pos"), F.col("b._n") - F.col("b._pos")
    )
    cand = (
        a.join(b, "_sid")
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.lit(1.0 + threshold) * ubound
                >= F.lit(threshold) * (F.col("a._n") + F.col("b._n"))
                - F.lit(1e-9)
            )
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    n_inter = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("id_a"),
                F.col("_arr").alias("arr_a"),
                F.col("_n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("id_b"),
                F.col("_arr").alias("arr_b"),
                F.col("_n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            round6(
                n_inter.cast("long")
                / (F.col("n_a") + F.col("n_b") - n_inter).cast("double")
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    window: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Blocked **sorted-neighborhood** candidate pairs (the classic
    entity-resolution blocking method): sort records within a blocking
    key, slide a fixed window down the sort order, and score only
    records that fall into the same window — O(n·w) comparisons instead
    of O(n²).

    Block = first token of the normalized text; sort key = the full
    normalized text (doc_id tie-break, so the order — and therefore the
    output — is deterministic). Each doc is paired with its next
    ``window`` neighbors in sort order and scored with the exact
    shingle-set Jaccard; pairs below ``threshold`` are dropped. This is
    the *multi-pass blocking* variant: windows never span blocks, which
    is exactly what makes it scale — the ranking window partitions by
    block, never one global sort on a single task. Recall is bounded by
    the blocking choice (documented, standard for the method); exact
    near-dup recall is ngram_jaccard_pairs / prefix_filter_pairs' job.
    """
    from pyspark.sql.window import Window
    from ..functions.text import normalize_text

    idx = shingle_index(docs, id_col, text_col, ngram).transform(stage)
    arrs = idx.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("_arr"),
        F.count(F.lit(1)).alias("_n"),
    )
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            normalize_text(F.col(text_col)).alias("_k"),
        )
        .withColumn("_blk", F.substring_index(F.col("_k"), " ", 1))
        .join(arrs, "doc_id")
    )
    w = Window.partitionBy("_blk").orderBy(F.col("_k").asc(), F.col("doc_id").asc())
    led = base.select(
        F.col("doc_id").alias("id_a"),
        F.col("_arr").alias("arr_a"),
        F.col("_n").alias("n_a"),
        *[
            c
            for i in range(1, window + 1)
            for c in (
                F.lead("doc_id", i).over(w).alias(f"_id{i}"),
                F.lead("_arr", i).over(w).alias(f"_ar{i}"),
                F.lead("_n", i).over(w).alias(f"_nn{i}"),
            )
        ],
    )
    neigh = led.select(
        "id_a",
        "arr_a",
        "n_a",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"_id{i}").alias("id_b"),
                        F.col(f"_ar{i}").alias("arr_b"),
                        F.col(f"_nn{i}").alias("n_b"),
                        F.lit(i).cast("long").alias("gap"),
                    )
                    for i in range(1, window + 1)
                ]
            )
        ).alias("nb"),
    ).select("id_a", "arr_a", "n_a", "nb.*").where(F.col("id_b").isNotNull())
    n_inter = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        neigh.withColumn(
            "jaccard",
            round6(
                n_inter.cast("long")
                / (F.col("n_a") + F.col("n_b") - n_inter).cast("double")
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "gap", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = NGRAM_MAX_DOC_FREQ,
) -> DataFrame:
    """Near-dup pairs by n-gram CONTAINMENT — the asymmetric measure
    ``C(A→B) = |A∩B| / |A|`` that catches sub-document duplication
    (a short doc copied inside a long one) which symmetric Jaccard
    dilutes to ~|A|/|B| and misses entirely.

    Same skew-safe single-pass shape as ngram_jaccard_pairs: the
    rare-shingle (df ≤ ``max_doc_freq``) inverted-index self-join
    counts each pair's rare intersection DIRECTLY (groupBy pair — no
    distinct, no second join against the index), and exactness is
    restored by hot-shingle completion (``n_inter = n_rare +
    |hot_A ∩ hot_B|`` over tiny per-doc above-cap arrays). Join volume
    is bounded by cap·|index|, never the df² of a boilerplate phrase.
    Emits one row per unordered pair (id_a < id_b) whose max directed
    containment ≥ ``threshold``, with both directions. Recall loss:
    only pairs sharing exclusively hot shingles (which carry no dup
    signal by construction).
    """
    # Int-id self-join (r13): same §2.3 narrow-key move as
    # ngram_jaccard_pairs above — see the comment there (staged mono-id
    # df table; n_rare is id-representation-independent).
    idx = shingle_index(docs, id_col, text_col, ngram).transform(stage)
    dfreq = (
        idx.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn("_sid", F.monotonically_increasing_id())
        .transform(stage)
    )
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    rare = dfreq.where(F.col("_df") <= max_doc_freq).select("shingle", "_sid")
    hot_arrs = (
        idx.join(dfreq.where(F.col("_df") > max_doc_freq).select("shingle"), "shingle")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("hot"))
    )
    pruned = idx.join(rare, "shingle").select("doc_id", "_sid")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(b, "_sid")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    empty = F.array().cast("array<string>")
    joined = (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_shingles", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            "id_b",
        )
        .join(
            hot_arrs.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "hot", "hot_a"
            ),
            "id_a",
            "left",
        )
        .join(
            hot_arrs.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "hot", "hot_b"
            ),
            "id_b",
            "left",
        )
        .withColumn("hot_a", F.coalesce(F.col("hot_a"), empty))
        .withColumn("hot_b", F.coalesce(F.col("hot_b"), empty))
    )
    # upper bound prunes before the array intersect: containment is
    # increasing in n_inter and n_inter <= n_rare + min(|hot_a|,|hot_b|)
    ub = F.col("n_rare") + F.least(F.size("hot_a"), F.size("hot_b"))
    ub_c = F.greatest(
        ub / F.col("n_a").cast("double"), ub / F.col("n_b").cast("double")
    )
    n_inter = F.col("n_rare") + F.size(F.array_intersect("hot_a", "hot_b"))
    scored = (
        joined.where(ub_c >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            n_inter.cast("long").alias("n_inter"),
            round6(n_inter / F.col("n_a").cast("double")).alias("c_a_in_b"),
            round6(n_inter / F.col("n_b").cast("double")).alias("c_b_in_a"),
        )
    )
    return scored.where(
        F.greatest(F.col("c_a_in_b"), F.col("c_b_in_a")) >= F.lit(threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_perm: int = NUM_PERM,
    index: DataFrame | None = None,
) -> DataFrame:
    """Wide MinHash signature: one column ``mh_i`` per permutation.

    explode shingles → portable hash → num_perm universal-hash minima via
    conditional aggregation (single hash aggregate, no pivot shuffle).
    Docs with no shingles get no row (nothing to hash) — callers union
    them back if they must survive. ``index`` lets a caller supply an
    already-materialized (doc_id, shingle) inverted index so the
    tokenize→n-gram chain is not recomputed (minhash_lsh_pairs shares one
    with its verification joins).
    """
    idx = index if index is not None else shingle_index(docs, id_col, text_col, ngram)
    hashed = idx.select("doc_id", portable_hash(F.col("shingle")).alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in ((j, perm_coeffs(j)) for j in range(num_perm))
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def lsh_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bh) bucket memberships from a wide MinHash
    signature frame — the banded-LSH index rows. Band hashes are md5
    over the band's row slice, so the SAME doc always lands in the same
    buckets on any engine/run (portable-hash property the incremental
    path depends on)."""
    band_cols = [
        F.md5(
            F.concat_ws(
                ",", *[F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
        ).alias(f"band_{b}")
        for b in range(LSH_BANDS)
    ]
    banded = sig.select("doc_id", *band_cols)
    return banded.select(
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


def incremental_lsh_pairs(
    docs: DataFrame,
    new_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection for a corpus increment (the daily
    crawl batch): verified pairs where AT LEAST ONE side is new —
    exactly ``minhash_lsh_pairs(all)`` minus the old-vs-old pairs a
    previous run already emitted.

    The probe side of the bucket join is restricted to new docs BEFORE
    the join, so per-bucket cost drops from |bucket|² to
    |bucket| x |new ∩ bucket| — the increment's cost tracks the
    increment, not the corpus. Signatures/buckets are deterministic
    (portable hashes, prefix-stable seeds), so old-side buckets computed
    today equal the ones a stored index would hold; a production run
    passes the persisted (doc_id, band, bh) table instead of recomputing
    (same join from then on).

    ``new_ids``: a 1-column DataFrame of new ``doc_id``s.
    """
    idx = shingle_index(docs, id_col, text_col, ngram).transform(stage)
    sig = minhash_signatures(docs, id_col, text_col, ngram, index=idx)
    buckets = lsh_buckets(sig)
    new_buckets = buckets.join(
        new_ids.select(F.col(new_ids.columns[0]).alias("doc_id")), "doc_id"
    )
    # the full-corpus bucket side must never broadcast (see
    # minhash_lsh_pairs); the new-batch probe side MAY be small, but a
    # shuffle join costs it nothing extra — it shuffles either way
    a = buckets.alias("a").hint("shuffle_hash")
    b = new_buckets.alias("b")
    candidates = (
        a.join(b, ["band", "bh"])
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
        .distinct()
    )
    return jaccard_verify(candidates, idx, threshold)


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

    The shingle inverted index is materialized once (operators.staging.stage) and
    shared between signature generation and the verification joins — the
    interpreted tokenize→n-gram chain is the dominant per-row cost and
    must not run once per consumer.
    """
    idx = shingle_index(docs, id_col, text_col, ngram).transform(stage)
    sig = minhash_signatures(docs, id_col, text_col, ngram, index=idx)
    buckets = lsh_buckets(sig)
    # the bucket table is corpus × bands rows — like everything else in
    # this pipeline it must never be a broadcast build side (the
    # jaccard_verify docstring's r09 OOM rationale), so the self-join
    # is pinned shuffle_hash
    a = buckets.alias("a").hint("shuffle_hash")
    b = buckets.alias("b")
    candidates = (
        a.join(b, ["band", "bh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verification bounded by the candidate set (shared
    # jaccard_verify): intersect shingles only for LSH-surfaced pairs
    # instead of re-running the full inverted-index self-join — that would
    # cost the same as an uncapped ngram_jaccard_pairs and defeat LSH's
    # purpose.
    return jaccard_verify(candidates, idx, threshold)


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash over word-token features (portable 32-bit hashes).

    bit_j(doc) = 1 iff Σ_tokens (bit_j(h(token)) ? +1 : −1) > 0.
    Computed as ONE conditional aggregate (``bits`` sums over the token
    stream in a single groupBy, the minhash_signatures shape) — the
    earlier (token × bit-position) explode multiplied the
    pre-aggregation row stream ×``bits``; map-side partials contained
    it, but this form shuffles ~``bits``× less. All integer math, so
    the oracle reproduces it exactly. Hamming-distance bucketing over
    the resulting key is the near-dup query path.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tokn"),
    ).select("doc_id", portable_hash(F.col("tokn")).alias("h"))
    bit_sums = [
        F.sum(F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)).alias(f"s_{j}")
        for j in range(bits)
    ]
    # one parsed expr, not a bits-deep Column tree (plan-build cost)
    combine = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return (
        tok.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", F.expr(combine).alias("simhash"))
    )


#: SimHash banding parameters: 32-bit keys split into 4 bands of 8 bits.
#: Pigeonhole guarantee: any pair within hamming distance 3 differs in at
#: most 3 bands, so at least one band matches — banding loses NO pairs at
#: the default threshold (it is an exact algorithm, not an approximation).
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Near-duplicate doc pairs by SimHash hamming distance ≤ ``max_hamming``.

    The scale path for hamming search: instead of the O(n²) all-pairs
    XOR, split each key into ``bands`` bit-bands and self-equi-join on
    (band index, band value) — only docs agreeing on some band ever meet,
    and with ``max_hamming < bands`` the pigeonhole principle makes that
    blocking lossless. Each band join is a plain shuffle-hash/sort-merge
    equi-join on a compact int key, so it partitions cleanly at 100 TB;
    a candidate pair surfacing in several bands is collapsed by distinct
    before the exact bit_count(xor) verify.
    """
    assert max_hamming < bands, "pigeonhole guarantee needs max_hamming < bands"
    width = bits // bands
    sh = simhash(docs, id_col, text_col, bits)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "bval", F.expr(f"(simhash >> (band * {width})) & {(1 << width) - 1}")
    )
    a = banded.select("band", "bval", F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = banded.select("band", "bval", F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")).cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


#: Winnowing parameters. k=7 char grams, window w=4 ⇒ any shared substring
#: of ≥ 10 chars is guaranteed a shared fingerprint; expected fingerprint
#: density 2/(w+1) = 40% of grams. MAX_DOC_FREQ drops "stop fingerprints"
#: (grams shared by half the corpus carry no dedup signal and are exactly
#: the skewed keys that would blow up the pair join at scale).
WINNOW_K = 7
WINNOW_W = 4
WINNOW_MAX_DOC_FREQ = 20
WINNOW_MIN_SHARED = 3


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    engine: str = "arrow",
) -> DataFrame:
    """Per-doc winnowed rolling-hash fingerprints (north-star text op:
    document fingerprinting via rolling hash).

    Output: (doc_id, n_grams, fps:array<long>) — gram count plus the
    winnowed fingerprint set. Map-only (no shuffle) on either engine.

    ``engine="arrow"`` (default) computes the hash+winnow arithmetic in
    one Arrow-vectorized UDF (functions.text.winnowed_fps_arrow) —
    measured ~3× the whole-query throughput at sf0.1; ``"expr"`` is the
    pure-Catalyst higher-order-lambda path, bit-identical values
    (property-tested), kept for environments where Python workers are
    unavailable. In the expr path each stage of the char→codepoint→
    gram-hash→winnow chain is materialized as its own projection because
    higher-order lambdas get no common-subexpression elimination (same
    staging rationale as queries.q_doc_stats).
    """
    from ..functions.text import (
        ascii_normalize,
        codepoints,
        gram_rolling_hashes,
        winnow,
        winnowed_fps_arrow,
    )

    # Partitioning contract: same as shingle_index — the caller spreads
    # the corpus across cores once (_docs_with_tokens); the ~ms/doc
    # hash work here then parallelizes without a second exchange.
    norm = docs.select(
        F.col(id_col).alias("doc_id"), ascii_normalize(F.col(text_col)).alias("_a")
    )
    if engine == "arrow":
        gram_count = F.greatest(
            F.lit(0).cast("long"), (F.length("_a") - F.lit(k - 1)).cast("long")
        )
        return norm.select(
            "doc_id",
            gram_count.alias("n_grams"),
            winnowed_fps_arrow(F.col("_a"), k, w).alias("fps"),
        )
    staged = norm.select("doc_id", codepoints(F.col("_a")).alias("_cp"))
    hashed = staged.select(
        "doc_id", gram_rolling_hashes(F.col("_cp"), k).alias("_h")
    )
    return hashed.select(
        "doc_id",
        F.size("_h").cast("long").alias("n_grams"),
        winnow(F.col("_h"), w).alias("fps"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_doc_freq: int = WINNOW_MAX_DOC_FREQ,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """Doc pairs sharing ≥ ``min_shared`` winnowed fingerprints (MOSS-style
    overlap detection) with a containment-style score.

    The standard inverted-index candidate shape: explode fingerprints,
    drop fingerprints appearing in > ``max_doc_freq`` docs (stop-gram
    filter — kills both noise and join skew), self-equi-join on the
    fingerprint, count per pair, then join per-doc set sizes for
    ``overlap = shared / (n_a + n_b - shared)`` (Jaccard over fp sets).

    Plan-shape constraint: the explode projection emits ONLY (doc_id, fp).
    Higher-order expressions run interpreted (no codegen), and any column
    derived from the fps array that survives past the Generate gets
    inlined by projection collapse and re-evaluated per EXPLODED row —
    measured as a >100x blowup. Set sizes are therefore recounted from the
    exploded rows (fps is distinct, so count == size) and joined back at
    the end, exactly like ngram_jaccard_pairs.
    """
    fpi = winnow_fingerprints(docs, id_col, text_col, k, w)
    # Materialize the exploded inverted index ONCE: it feeds four
    # consumers (set sizes, stop-gram doc-freq filter, both join sides),
    # and recomputing the interpreted rolling-hash chain per consumer is
    # the dominant cost. localCheckpoint (not .persist()): a persist'd
    # plan lives in the shared CacheManager until someone explicitly
    # unpersists it — and this function returns a lazy DataFrame, so
    # there is no correct place to do that; the entry leaked per call.
    # A local checkpoint materializes eagerly to executor-local
    # MEMORY_AND_DISK, truncates lineage, and is reclaimed by the
    # ContextCleaner when the RDD is GC'd. The index is orders of
    # magnitude smaller than the corpus (exactly what an inverted-index
    # build materializes at 100 TB too); cluster runs set
    # SPARK_GRAFT_STAGING=reliable (operators.staging) to swap this for
    # a fault-tolerant checkpoint, since local checkpoints don't survive
    # executor loss.
    #
    # explode_OUTER, not explode: for plain explode, Catalyst's
    # InferFiltersFromGenerate synthesizes `size(fps) > 0` and pushes it
    # below every staged projection, inlining the whole winnow chain into
    # one expression where the window lambda re-evaluates the gram array
    # per position — O(n·k) becomes O(n²·k) per doc (measured: hang at
    # 500 docs). The rule skips outer generates; the isNotNull filter on
    # the generator OUTPUT cannot be pushed below the Generate, so the
    # staging survives. (Lineage truncation makes this belt-and-braces
    # for downstream consumers, but the rule fires during THIS plan's
    # materialization too, so the staging protection still matters.)
    e = (
        fpi.select("doc_id", F.explode_outer("fps").alias("fp"))
        .where(F.col("fp").isNotNull())
        .transform(stage)
    )
    sizes = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fps"))
    ok = (
        e.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_doc_freq)
        .select("fp")
    )
    f = e.join(ok, "fp")
    a = f.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = f.select(F.col("fp"), F.col("doc_id").alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_fps", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_fps", "n_b"
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.col("shared").cast("long").alias("shared"),
            round6(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
            ).alias("overlap"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    gram_len: int = 40,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "arrow",
) -> DataFrame:
    """EXACT repeated-substring spans — the ExactSubstr dedup semantic of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): every maximal character span covered by some ``gram_len``-
    gram occurring ≥ ``min_count`` times in the corpus (same-doc repeats
    included). Those spans are what a curation run clips out of the
    training text. The suffix-array construction of the paper is
    replaced by the Spark-shaped equivalent: position-local rolling
    hashes + a frequency gate + exact confirmation.

    Three bounded phases (the winnow_overlap machinery's exact, dense
    cousin — winnowing samples ~2/(w+1) of grams, this keeps them all):

    1. **int-only shuffle**: every gram position hashes via the portable
       Rabin-Karp fold (functions.text.gram_rolling_hashes); frequency
       gate on the int hash — the full-corpus shuffle moves (hash, 1)
       pairs, never text;
    2. **exact confirm**: only gate survivors extract their substring
       and re-count grouped by the text itself, eliminating rolling-hash
       collisions — shuffle volume bounded by the candidate count;
    3. **island merge**: per-doc window (bounded by doc length — never a
       corpus-sized partition) merges overlapping/adjacent gram
       positions (equal-length intervals: merge iff the position gap
       ≤ gram_len) into maximal spans.

    Returns one row per maximal span: ``(doc_id, span_start, span_end,
    n_grams)`` with 1-based inclusive char offsets into the
    ascii-normalized text (the rolling-hash domain, see
    functions.text.ascii_normalize).
    """
    from pyspark.sql import Window

    from ..functions.text import (
        ascii_normalize,
        codepoints,
        gram_rolling_hashes,
        gram_rolling_hashes_arrow,
    )

    k = gram_len
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ascii_normalize(F.col(text_col)).alias("_t"),
    )
    # engine="arrow" (default): vectorized hash fold, bit-identical to
    # the expression path (see winnow_fingerprints) — at k=40 the
    # interpreted fold is the dominant query cost.
    if engine == "arrow":
        hs = gram_rolling_hashes_arrow(F.col("_t"), k)
    else:
        hs = gram_rolling_hashes(codepoints(F.col("_t")), k)
    # Materialize the position index ONCE (dedup-module rule, cf.
    # winnow_overlap_pairs): it feeds the frequency gate AND the hit
    # extraction, and the interpreted rolling-hash chain is the dominant
    # per-row cost — recomputing it per consumer measured ~4x the query.
    # INTS ONLY in the checkpoint: carrying the doc text per position
    # would materialize ~gram_len x the corpus; survivors re-join the
    # (corpus-sized but keyed) text side instead.
    pos = (
        base.select("doc_id", F.posexplode(hs).alias("_p0", "_h"))
        .select("doc_id", (F.col("_p0") + 1).alias("pos"), "_h")
        .transform(stage)
    )
    cand = (
        pos.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h")
    )
    # hits is bounded by the true repeat mass (tiny vs the corpus) and
    # feeds the confirm aggregate AND the final projection. NOT staged
    # (r12): recomputing the survivor/base join twice off the staged
    # ``pos`` costs the same as the checkpoint's own materialization at
    # sf0.1 (A/B 2.25 s vs 2.25 s end-to-end) and at 100 TB it removes
    # a repeat-mass-sized write+read in 'reliable' staging. A window-
    # count rewrite of BOTH the gate and this confirm (no checkpoints,
    # one shuffle each) measured 1.6 s vs 2.25 s at sf0.1 but was
    # REJECTED: count-over-window has no partial aggregation and no
    # AQE skew split, so one boilerplate 40-gram shared by ~every doc
    # of a crawl sorts its entire position mass in a single task —
    # precisely the data ExactSubstr dedup exists for. The agg+semi
    # shape keeps map-side combine on the int gate and an AQE-
    # splittable join on both phases (guide §2.4/§3).
    hits = (
        pos.join(cand, "_h", "semi")
        .join(base, "doc_id")
        .select("doc_id", "pos", F.expr(f"substring(_t, pos, {k})").alias("_s"))
    )
    confirmed_grams = (
        hits.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_c2"))
        .where(F.col("_c2") >= min_count)
        .select("_s")
    )
    conf = hits.join(confirmed_grams, "_s", "semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
        F.lit(1)
    )
    marked = conf.select("doc_id", "pos", brk.alias("_brk"))
    grouped = marked.select(
        "doc_id",
        "pos",
        F.sum("_brk")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("_isle"),
    )
    return grouped.groupBy("doc_id", "_isle").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    ).drop("_isle")


def clip_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY step of ExactSubstr dedup: remove character ranges from each
    doc's ascii-normalized text (the ranges :func:`repeated_spans` found).
    ``spans`` rows are (doc_id, span_start, span_end), 1-based inclusive,
    NON-OVERLAPPING per doc — exactly the island-merged output shape.

    Surgery is relational, not procedural: each span contributes the
    segment between the previous span's end and its own start (a lag
    window over the doc's spans — bounded by spans-per-doc, never corpus-
    sized), one tail segment closes the doc, and the segments concatenate
    in position order. Docs with no spans pass through unchanged via the
    left join. Output: (doc_id, clipped_text, n_clipped_chars).
    """
    from pyspark.sql import Window

    from ..functions.text import ascii_normalize

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ascii_normalize(F.col(text_col)).alias("_t"),
    )
    sp = spans.select(
        F.col(id_col).alias("doc_id"),
        F.col("span_start").alias("_s"),
        F.col("span_end").alias("_e"),
    ).join(base, "doc_id")
    w = Window.partitionBy("doc_id").orderBy("_s")
    seg_start = F.coalesce(F.lag("_e").over(w), F.lit(0)) + 1
    # seg_start must exist before the substring referencing it: compute in
    # two hops (expressions can't reference a sibling alias in one select)
    segs = (
        sp.withColumn("seg_start", seg_start)
        .select(
            "doc_id",
            "_s",
            "_e",
            F.expr("substring(_t, seg_start, _s - seg_start)").alias("_seg"),
        )
    )
    heads = segs.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_s", "_seg"))),
                lambda x: x["_seg"],
            ),
            "",
        ).alias("_head"),
        F.max("_e").alias("_me"),
    )
    joined = base.join(heads, "doc_id", "left")
    clipped = F.when(
        F.col("_me").isNull(), F.col("_t")
    ).otherwise(
        F.concat(
            F.col("_head"),
            F.expr("substring(_t, _me + 1, length(_t) - _me)"),
        )
    )
    return joined.select(
        "doc_id",
        clipped.alias("clipped_text"),
        (F.length("_t") - F.length(clipped)).cast("long").alias(
            "n_clipped_chars"
        ),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------

#: CDC rolling-hash gram width (chars).
CDC_K = 16

#: CDC boundary divisor: a gram ending at position p cuts the text when
#: its Rabin hash % CDC_DIV == 0 — expected chunk length ~ CDC_DIV.
CDC_DIV = 64


def cdc_chunk_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = CDC_K,
    div: int = CDC_DIV,
) -> DataFrame:
    """Content-defined chunking (the Rabin/LBFS/rsync family, no
    min/max clamp): cut the ascii-normalized text after every position
    whose k-gram Rabin hash is ≡ 0 (mod ``div``), so chunk boundaries
    are CONTENT-anchored — an insertion re-chunks only its own
    neighborhood, which is what makes chunk-hash storage dedup work
    across document revisions (the fixed-size splitter
    queries.q_doc_chunks cannot give this: one inserted byte shifts
    every later chunk).

    Returns one row per chunk: (doc_id, ascii_len, chunk_hash,
    chunk_len) — the chunk TEXT never leaves the map task (md5 + length
    are computed in the same projection), so downstream dedup joins
    shuffle 16-byte hashes, not documents. Empty docs emit no rows
    (callers LEFT JOIN, see queries.q_doc_cdc_chunks). Boundary
    positions derive from the SAME Rabin fold as the winnowing
    fingerprints (functions.text.gram_rolling_hashes_arrow — Arrow
    path, bit-identical to the expression fold by property test), so
    any engine reproduces the exact cuts.
    """
    from ..functions.text import ascii_normalize, gram_rolling_hashes_arrow

    a = docs.select(
        F.col(id_col).alias("doc_id"),
        ascii_normalize(F.col(text_col)).alias("_a"),
    ).withColumn("_h", gram_rolling_hashes_arrow(F.col("_a"), k))
    # gram start positions (1-based) whose hash hits the boundary; the
    # cut falls after the gram's LAST char (i + k - 1). Spark's
    # sequence(1, 0) steps DOWNWARD, so the no-gram case is guarded.
    pos = F.when(
        F.size("_h") >= 1,
        F.filter(
            F.sequence(F.lit(1), F.size("_h")),
            lambda i: F.element_at(F.col("_h"), i) % div == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.transform(pos, lambda i: (i + F.lit(k - 1)).cast("long"))
    allp = F.array_distinct(
        F.concat(
            F.array(F.lit(0).cast("long")),
            cuts,
            F.array(F.length("_a").cast("long")),
        )
    )
    staged = a.select("doc_id", "_a", allp.alias("_p"))
    nseg = F.size("_p") - 1
    chunks = F.when(
        nseg >= 1,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda j: F.substring(
                F.col("_a"),
                (F.get("_p", j) + 1).cast("int"),
                (F.get("_p", j + 1) - F.get("_p", j)).cast("int"),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rows = staged.select(
        "doc_id",
        F.length("_a").cast("long").alias("ascii_len"),
        F.explode(chunks).alias("_c"),
    )
    return rows.select(
        "doc_id",
        "ascii_len",
        F.md5(F.encode(F.col("_c"), "UTF-8")).alias("chunk_hash"),
        F.length("_c").cast("long").alias("chunk_len"),
    )
