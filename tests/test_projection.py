"""PCA projection (operators/projection.py): invariants instead of a
DuckDB oracle — float accumulation order and LAPACK specifics make the
bottom bits plan-dependent (documented in the module docstring)."""

from __future__ import annotations

import numpy as np
import pytest

from database_replicator_spark.operators.projection import (
    fit_pca,
    gram_and_mean,
    pca_components,
    project_vectors,
)


def _clustered(n_per=60, dim=16, k_clusters=4, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, size=(k_clusters, dim))
    rows, labels = [], []
    for c in range(k_clusters):
        pts = centers[c] + rng.normal(0, 0.5, size=(n_per, dim))
        rows.append(pts)
        labels += [c] * n_per
    return np.vstack(rows), np.array(labels)


@pytest.fixture(scope="module")
def fixture_df(spark):
    mat, labels = _clustered()
    data = [
        (i, [float(x) for x in mat[i]], int(labels[i])) for i in range(len(mat))
    ]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, label int"
    ).repartition(6)
    return df, mat, labels


class TestGram:
    def test_distributed_gram_matches_numpy(self, spark, fixture_df):
        df, mat, _ = fixture_df
        gram, mean, n = gram_and_mean(df, "embedding", 16)
        assert n == len(mat)
        np.testing.assert_allclose(gram, mat.T @ mat, rtol=1e-12)
        np.testing.assert_allclose(mean, mat.mean(axis=0), rtol=1e-12)

    def test_partition_layout_invariance_within_tolerance(self, spark, fixture_df):
        df, _, _ = fixture_df
        g1, m1, _ = gram_and_mean(df.repartition(2), "embedding", 16)
        g2, m2, _ = gram_and_mean(df.repartition(11), "embedding", 16)
        np.testing.assert_allclose(g1, g2, rtol=1e-12)
        np.testing.assert_allclose(m1, m2, rtol=1e-12)


class TestComponents:
    def test_orthonormal_and_spectrally_ordered(self, spark, fixture_df):
        df, _, _ = fixture_df
        comps, mean, var = fit_pca(df, k=5, vec_col="embedding", dim=16)
        np.testing.assert_allclose(comps.T @ comps, np.eye(5), atol=1e-10)
        assert all(var[i] >= var[i + 1] - 1e-12 for i in range(4))

    def test_matches_local_pca_up_to_tolerance(self, spark, fixture_df):
        df, mat, _ = fixture_df
        comps, mean, var = fit_pca(df, k=3, vec_col="embedding", dim=16)
        centered = mat - mat.mean(axis=0)
        cov = centered.T @ centered / len(mat)
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:3]
        ref = vecs[:, order]
        for j in range(3):
            i = int(np.abs(ref[:, j]).argmax())
            if ref[i, j] < 0:
                ref[:, j] = -ref[:, j]
        np.testing.assert_allclose(comps, ref, atol=1e-8)
        np.testing.assert_allclose(var, vals[order], rtol=1e-8)

    def test_sign_convention_deterministic(self, spark, fixture_df):
        df, _, _ = fixture_df
        gram, mean, n = gram_and_mean(df, "embedding", 16)
        c1, _ = pca_components(gram, mean, n, 4)
        c2, _ = pca_components(gram.copy(), mean.copy(), n, 4)
        np.testing.assert_array_equal(c1, c2)


class TestProjection:
    def test_projection_beats_truncation_and_random(self, spark, fixture_df):
        """Reconstruction error of k=4 PCA must beat both keeping the
        first 4 raw coordinates and a random orthonormal 4-dim projection
        — the reason to spend the Gram pass at all."""
        df, mat, _ = fixture_df
        comps, mean, _ = fit_pca(df, k=4, vec_col="embedding", dim=16)
        proj = project_vectors(df, comps, mean).toPandas()
        proj_m = np.array(proj.sort_values("vec_id")["projected"].tolist())
        centered = mat - mat.mean(axis=0)

        def recon_err(W):
            z = centered @ W
            back = z @ W.T
            return float(((centered - back) ** 2).sum())

        err_pca = recon_err(comps)
        # truncation = identity columns
        trunc = np.eye(16)[:, :4]
        rng = np.random.default_rng(0)
        rand_w, _ = np.linalg.qr(rng.normal(size=(16, 4)))
        assert err_pca < recon_err(trunc)
        assert err_pca < recon_err(rand_w)
        # the distributed projection IS centered @ comps
        np.testing.assert_allclose(proj_m, centered @ comps, atol=1e-8)

    def test_projection_preserves_cluster_separation(self, spark, fixture_df):
        """After dim 16 → 4, intra-cluster distances must stay far below
        inter-cluster distances (the property ANN recall depends on)."""
        df, mat, labels = fixture_df
        comps, mean, _ = fit_pca(df, k=4, vec_col="embedding", dim=16)
        proj = project_vectors(df, comps, mean).toPandas().sort_values("vec_id")
        z = np.array(proj["projected"].tolist())
        intra, inter = [], []
        for c in np.unique(labels):
            zc = z[labels == c]
            intra.append(np.linalg.norm(zc - zc.mean(axis=0), axis=1).mean())
            inter.append(np.linalg.norm(zc.mean(axis=0) - z.mean(axis=0)))
        assert max(intra) < min(inter)
