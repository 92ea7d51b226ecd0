"""Distributed PCA (operators/pca.py): accuracy contract via property
tests (no SQL oracle can check eigenvectors), plus the plan contract
that projection is map-only."""

from __future__ import annotations

import numpy as np
import pytest

from kyiv_traffic_bigdata_spark.operators.pca import fit_pca, gram_stats, project


def _df_from(spark, x):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )


def _anisotropic(n=400, d=6, seed=7):
    rng = np.random.RandomState(seed)
    # variance concentrated on axis 0, then 1, ... (stds 8, 4, 2, 1, .5, .25)
    stds = 8.0 / (2.0 ** np.arange(d))
    x = rng.randn(n, d) * stds
    x += rng.rand(d) * 3.0  # nonzero mean — centering must handle it
    return x


def test_gram_stats_match_numpy(spark):
    x = _anisotropic(n=100, d=4)
    gram, sums, n = gram_stats(_df_from(spark, x))
    assert n == 100
    np.testing.assert_allclose(gram, x.T @ x, rtol=1e-9)
    np.testing.assert_allclose(sums, x.sum(axis=0), rtol=1e-9)


def test_fit_recovers_principal_axes_and_variance_order(spark):
    x = _anisotropic()
    comps, var, mean = fit_pca(_df_from(spark, x), k=3)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9)
    # eigenvalues strictly descending, all positive
    assert var[0] > var[1] > var[2] > 0
    # components orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # match numpy's full eigendecomposition of the centered covariance
    c = x - x.mean(axis=0)
    ref_vals, ref_vecs = np.linalg.eigh(c.T @ c / len(x))
    order = np.argsort(ref_vals)[::-1][:3]
    np.testing.assert_allclose(var, ref_vals[order], rtol=1e-9)
    for i, j in enumerate(order):
        v = ref_vecs[:, j]
        agree = abs(float(np.dot(comps[i], v)))
        assert agree == pytest.approx(1.0, abs=1e-9)


def test_fit_is_deterministic_across_runs(spark):
    x = _anisotropic(n=150, d=5)
    d = _df_from(spark, x)
    c1, v1, m1 = fit_pca(d, k=2)
    c2, v2, m2 = fit_pca(d, k=2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)


def test_projection_matches_numpy_and_is_map_only(spark):
    x = _anisotropic(n=80, d=4)
    df = _df_from(spark, x)
    comps, _, mean = fit_pca(df, k=2)
    out = project(df, comps, mean)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r.vec_id: np.array(r.pca) for r in out.collect()}
    ref = (x - mean) @ comps.T
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-8, atol=1e-10)


def test_fit_rejects_tiny_input(spark):
    df = _df_from(spark, np.ones((1, 3)))
    with pytest.raises(ValueError):
        fit_pca(df, k=1)


def test_invariants_query_checks_hold_and_trace_matches_numpy(spark, sf_dir):
    """emb_pca_invariants (r11 VERDICT ask #4): the partial oracle for
    the eigensolve. All four CHECK booleans must hold on the real
    corpus, and the portably-computed trace must equal numpy's
    covariance trace on the same data (the identity the oracle pins)."""
    import pyarrow.parquet as pq

    from kyiv_traffic_bigdata_spark.queries import QUERIES

    rows = QUERIES["emb_pca_invariants"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.eigsum_matches_trace and r.eigs_nonnegative
    assert r.eigs_descending and r.components_orthonormal
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()["embedding"]
    x = np.array([np.asarray(v, dtype=np.float64) for v in emb])
    ref_trace = float(np.trace(np.cov(x, rowvar=False, bias=True)))
    assert r.dim == x.shape[1] and r.n_vecs == len(x)
    assert r.trace6 == pytest.approx(ref_trace, rel=1e-5)
