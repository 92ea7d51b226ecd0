"""Recall tests for the approximate-NN scale paths (operators/similarity.py).

ann_lsh_topk and ann_ivf_topk trade recall for sub-linear scoring; these
tests pin the tradeoff against the exact brute-force baseline on the
driver's sf0.001 embeddings so a regression in bucketing/probing logic
(wrong band slicing, off-by-one cell ids, broken multiprobe) shows up as
a recall collapse rather than going unnoticed behind "rows returned".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_pairs(emb):
    q = emb.where(F.col("vec_id") % 50 == 0)
    return {
        (r.query_id, r.neighbor_id)
        for r in SIM.cosine_topk(q, emb, k=10).collect()
    }


def _recall(approx_rows, exact):
    found = {(r.query_id, r.neighbor_id) for r in approx_rows}
    return len(found & exact) / len(exact)


def test_ann_lsh_recall(emb, exact_pairs):
    q = emb.where(F.col("vec_id") % 50 == 0)
    rows = SIM.ann_lsh_topk(q, emb, k=10).collect()
    # every query answered with a full k, and ids come from the corpus
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 10 for v in by_q.values())
    # observed 0.42 on sf0.001 with 4 planes + 1-bit multiprobe (uniform
    # random embeddings are LSH's adversarial case — see operator docstring)
    assert _recall(rows, exact_pairs) >= 0.3


def test_ann_ivf_recall(emb, exact_pairs):
    q = emb.where(F.col("vec_id") % 50 == 0)
    rows = SIM.ann_ivf_topk(q, emb, k=10, n_probe=4).collect()
    # observed ~0.57 on sf0.001 with 16 cells / 4 probes
    assert _recall(rows, exact_pairs) >= 0.4


def test_ann_ivf_more_probes_more_recall(emb, exact_pairs):
    """Probing every cell must recover the exact result set."""
    q = emb.where(F.col("vec_id") % 50 == 0)
    rows = SIM.ann_ivf_topk(q, emb, k=10, n_cells=8, n_probe=8).collect()
    assert _recall(rows, exact_pairs) == 1.0
