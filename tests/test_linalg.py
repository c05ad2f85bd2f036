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
