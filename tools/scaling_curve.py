"""Measure how headline queries scale from sf0.1 to a k×-derived scale.

Runs a curated query set at the source scale and at the
tools/scaleup.py-derived k× scale, best-of-N each, and reports the
runtime ratio next to k. A ratio ≤ ~k is the pass bar on local[32]
(fixed parallelism: a perfectly linear operator costs k× the wall
time); materially above k means superlinear work — the thing the plan
tests argue can't happen, now measured.

r09: the pair-producing dedup/ANN family is ON the curve (VERDICT #5).
tools/scaleup.py now plants BOUNDED near-dup families (copy 1 is the
only cross-copy near-dup; copies ≥ 2 carry interleaved salt) and
perturbs replicated vectors, so pair output grows ~k and the timings
are engine signal. Each pair-query row carries a ``bar`` note stating
the expected growth law: minhash_lsh_pairs and the fixed-anchor
serving ANN are ~k; ann_hamming is ~k² BY DEFINITION (its query set is
``vec_id % 100``, so queries AND corpus both grow k× — the registered
query is the oracle shape; the serving shape with a fixed query set is
emb_hard_negatives_mined, which is the ~k row next to it).

Usage: python tools/scaling_curve.py [k] [src_dir] [scaled_dir]
Writes one JSON line per query to stdout and a summary to stderr.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

#: scale-stable headliners: TPC-H shapes, event analytics, map-only or
#: join-bounded doc/text queries, and the sketch family.
CURVE_QUERIES = [
    "pricing_summary",
    "top_parts",
    "min_cost_supplier",
    "important_part_value",
    "salted_supplier_stats",
    "sales_cube",
    "orders_profile",
    "fk_integrity_audit",
    "join_skew_profile",
    "order_price_quantiles",
    "top_customers",
    "promo_revenue",
    "hourly_event_stats",
    "user_sessions",
    "event_funnel",
    "latest_event_per_user",
    "user_hll_sketch",
    "event_top_paths",
    "user_distinct_sketch",
    "event_cms_heavy_hitters",
    "doc_gopher_quality",
    "doc_tfidf_terms",
    "doc_unigram_logprob",
    "doc_hash_sample",
    "doc_chunks",
    # r09 late additions
    "event_hopping_stats",
    "user_cumulative_uniques",
    "part_name_fuzzy_matches",
    "doc_token_heavy_hitters",
    "event_trailing_window_stats",
    # r10 additions
    "doc_kn_logprob",
    "event_ks_drift",
    "event_value_mad",
    "brand_price_ols",
    "token_chi2_drift",
    # r11 additions (VERDICT r10 #7 + the three new drift/change-point
    # queries): gate agreement joins two corpus-scale gates on doc_id
    # (~k); MWU/Welch are midpoint pass + bounded-slab window/aggregate
    # (~k); CUSUM is one scan + windows over the types*hours slab (~k)
    "doc_gate_agreement",
    "event_mwu_drift",
    "event_welch_drift",
    "event_cusum_shift",
    "event_psi_drift",
    "event_winsor_stats",
    # r11 batch 2: all single-fact-pass + bounded-slab shapes (~k) —
    # benford collapses to priorities*9 cells, JS to |types| cells,
    # Kaplan-Meier to the life table, the Poisson bootstrap's x32
    # explode is map-side into the same one shuffle, the skyline's
    # windows run on per-x points then candidates, and the Morton grid
    # aggregates <= 4^bits cells
    "order_benford_digits",
    "event_js_divergence",
    "user_kaplan_meier",
    "event_poisson_bootstrap",
    "part_price_skyline",
    "geo_morton_density",
    # trend pack: the pairwise slab is corpus-INDEPENDENT (720 hours
    # fixed span), so growth is the cells aggregate alone (~k); the
    # AUC is one corpus scan into a bounded score histogram (~k)
    "event_trend_robust",
    "doc_quality_auc",
    # info-theory + UQ pack: lag pairs -> |types|^2 cells (~k); the
    # conformal chain is 4 bounded passes with collected slab bounds
    "event_markov_entropy",
    "event_conformal_interval",
]

#: r09 heavyweights added to the curve in r10 (VERDICT #6): each with
#: an explicit growth-law note like the pair family.
NOTED_CURVE_QUERIES = {
    "doc_unigram_tokenize": (
        "EM cost rides the DISTINCT-WORD vocabulary, not the corpus: "
        "scaleup's salted copies add salt tokens so the vocab grows "
        "sublinearly with k; encode is map-only ~k"
    ),
    "doc_cdc_chunks": (
        "~k: Rabin boundary fold is map-only per doc; shuffles carry "
        "16-byte chunk hashes only"
    ),
    "order_price_rank_sketch": (
        "~k fact explode into a BOUNDED groups*levels*depth*width "
        "counter table; descent is driver-side constant work"
    ),
    # r12 (r11 VERDICT #3): the only r11 addition that was missing from
    # the curve after its md5-register-HLL rewrite changed its cost
    # shape (a per-(type, register) shuffle the native-sketch version
    # did not have)
    "approx_event_stats": (
        "~k fact pass; the register table is BOUNDED at m=2^p registers "
        "per type, so the shuffle and everything after it are "
        "corpus-independent slab work"
    ),
}

#: pair-producing dedup/ANN representatives (r09): measurable because
#: scaleup plants bounded near-dup families; ``bar`` states the growth
#: law the ratio is judged against on local[32] (fixed parallelism).
PAIR_CURVE_QUERIES = {
    "minhash_lsh_pairs": (
        "~k: planted 2-copy families + per-copy internal pairs; "
        "band buckets stay bounded"
    ),
    "emb_cosine_neardups": (
        "~k: banded LSH buckets re-width via neardup_rows_per_band, "
        "keeping expected bucket population flat"
    ),
    "ann_hamming": (
        "~k^2 BY DEFINITION: the oracle shape scales its query set "
        "(vec_id % 100) with the corpus; see emb_hard_negatives_mined "
        "for the fixed-query serving law"
    ),
    "emb_hard_negatives_mined": (
        "~k: fixed 20-anchor serving shape — corpus scan grows, "
        "anchors do not"
    ),
    "neardup_bfs_depths": (
        "~k: rides the LSH pair pipeline (planted bounded families); "
        "frontier rounds are corpus-independent (<= max_depth) and "
        "exit early on an empty frontier"
    ),
}


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from kyiv_traffic_bigdata_spark.queries import QUERIES
    from kyiv_traffic_bigdata_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    scaled = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_scaled_x{k}"
    spark = get_spark("scaling_curve")
    rows = []
    plan = (
        [(n, None) for n in CURVE_QUERIES]
        + list(NOTED_CURVE_QUERIES.items())
        + list(PAIR_CURVE_QUERIES.items())
    )
    # Incremental re-measurement (r12): SPARK_GRAFT_CURVE_ONLY=a,b,c
    # restricts the run to the named queries so a round that changes
    # two queries can refresh exactly their rows instead of paying the
    # full multi-hour 100x sweep.
    only = os.environ.get("SPARK_GRAFT_CURVE_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        unknown = wanted - {n for n, _ in plan}
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_CURVE_ONLY names unknown queries: {sorted(unknown)}")
        plan = [(n, b) for n, b in plan if n in wanted]
    for name, bar in plan:
        if name in PAIR_CURVE_QUERIES:
            # fresh JVM for EVERY pair-family query: r09 restarted once
            # before the block (~30 headliners of accumulated state
            # OOM'd minhash at 100x); r10 found the same dynamic INSIDE
            # the block — each pair query localCheckpoints corpus-sized
            # staged frames whose storage blocks outlive the query (they
            # free on Python GC, not query end) and squeeze execution
            # memory until a pinned shuffle-hash BUILD (non-spillable by
            # design) can't acquire its page: neardup_bfs_depths at 100x
            # died at 4-queries-deep accumulation. Per-query restart =
            # the single-JVM analogue of per-job executor hygiene; it
            # also makes each pair measurement independent.
            spark.stop()
            spark = get_spark(f"scaling_curve_{name}")
        fn = QUERIES[name]
        t_base = time_query(fn, spark, src)
        t_scaled = time_query(fn, spark, scaled)
        ratio = t_scaled / t_base if t_base > 0 else float("inf")
        row = {
            "query": name,
            "t_base_s": round(t_base, 3),
            "t_scaled_s": round(t_scaled, 3),
            "ratio": round(ratio, 2),
            "k": k,
        }
        if bar is not None:
            row["bar"] = bar
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()
    worst = sorted(rows, key=lambda r: -r["ratio"])[:5]
    print(
        f"# {len(rows)} queries, k={k}; worst ratios: "
        + ", ".join(f"{r['query']}={r['ratio']}" for r in worst),
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
