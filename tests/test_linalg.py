"""Distributed covariance vs numpy ground truth."""

import numpy as np
import pandas as pd

import ray.data as rd

from crn_meta_validate_ray.stages.linalg import covariance


def test_covariance_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    m = rng.normal(size=(257, 6)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "embedding": [row.tolist() for row in m]})).repartition(5)
    out = covariance(ds, ndigits=None).to_pandas()
    got = np.zeros((6, 6))
    got[out["i"] - 1, out["j"] - 1] = out["cov"]
    want = np.cov(m.astype(np.float64), rowvar=False, bias=True)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_covariance_empty(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"embedding": []}))
    assert covariance(ds).num_rows == 0


def test_pca_matches_numpy(ray_session):
    from crn_meta_validate_ray.stages.linalg import pca_project

    rng = np.random.default_rng(11)
    # anisotropic data so components are well separated
    base = rng.normal(size=(300, 5)) * np.array([10.0, 5.0, 2.0, 1.0, 0.5])
    mix = rng.normal(size=(5, 5))
    m = base @ mix
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": range(300),
        "embedding": [r.tolist() for r in m]})).repartition(4)
    out, info = pca_project(ds, n_components=3)
    df = out.to_pandas().sort_values("vec_id")
    got = np.vstack(df["pc"].to_numpy())

    cov = np.cov(m, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    comps = v[:, order]
    want = (m - m.mean(axis=0)) @ comps
    # per-component sign freedom vs LAPACK: align before comparing
    for k in range(3):
        if np.sign(got[0, k]) != np.sign(want[0, k]):
            want[:, k] *= -1
    # E[xy]-μμ vs numpy's centered sums differ at ~1e-6 absolute; the
    # eigenvectors inherit that
    np.testing.assert_allclose(got, want, atol=1e-3)
    np.testing.assert_allclose(info["eigenvalues"], w[order], rtol=1e-6)
    assert info["explained_ratio"][0] > info["explained_ratio"][2]
    # projected variance equals the eigenvalues
    np.testing.assert_allclose(got.var(axis=0), w[order], rtol=1e-6)
