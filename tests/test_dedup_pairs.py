"""Semantic tests for the near-dup pair operators added on top of the
signature generators: identical docs must always pair, disjoint docs
never, and scores must sit in the documented ranges."""

from __future__ import annotations

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.operators.dedup import (
    simhash_neardup_pairs,
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LOREM = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar execution with vectorized operators at petabyte scale"
)


def test_identical_docs_pair_everywhere(spark):
    d = _docs(spark, [(1, LOREM), (2, LOREM), (3, OTHER)])
    sh = simhash_neardup_pairs(d).collect()
    assert {(r.id_a, r.id_b) for r in sh} >= {(1, 2)}
    assert all(r.hamming == 0 for r in sh if (r.id_a, r.id_b) == (1, 2))

    wn = winnow_overlap_pairs(d, max_doc_freq=10).collect()
    ours = [r for r in wn if (r.id_a, r.id_b) == (1, 2)]
    assert len(ours) == 1 and ours[0].overlap == 1.0


def test_disjoint_docs_never_pair_in_winnow(spark):
    d = _docs(spark, [(1, LOREM), (2, OTHER)])
    assert winnow_overlap_pairs(d).count() == 0


def test_winnow_fingerprints_shape(spark):
    d = _docs(spark, [(1, LOREM), (2, ""), (3, "tiny")])
    rows = {r.doc_id: r for r in winnow_fingerprints(d).collect()}
    # n_grams = len(ascii_normalized) - k + 1 for long docs
    assert rows[1].n_grams == len(LOREM) - 6
    # winnowed set is deduped, nonempty, within gram hash domain
    assert 0 < len(rows[1].fps) <= rows[1].n_grams
    assert len(set(rows[1].fps)) == len(rows[1].fps)
    assert all(0 <= h < 1_000_000_007 for h in rows[1].fps)
    # empty and shorter-than-k docs: no grams, no fingerprints
    assert rows[2].n_grams == 0 and rows[2].fps == []
    assert rows[3].n_grams == 0 and rows[3].fps == []


def test_overlap_score_monotone_in_shared_content(spark):
    half = LOREM[: len(LOREM) // 2] + " " + OTHER
    d = _docs(spark, [(1, LOREM), (2, LOREM), (3, half)])
    wn = {(r.id_a, r.id_b): r.overlap for r in winnow_overlap_pairs(d, max_doc_freq=10).collect()}
    assert wn[(1, 2)] == 1.0
    if (1, 3) in wn:
        assert wn[(1, 3)] < wn[(1, 2)]
