"""ordered_prefix_sum (distributed scan) vs numpy cumsum ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.scan import ordered_prefix_sum


def test_prefix_sum_integer_multiblock(ray_session):
    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({"k": rng.permutation(n),
                       "v": rng.integers(0, 100, n)})
    ds = rd.from_pandas(df).repartition(7)
    out = ordered_prefix_sum(ds, "k", "v", out_col="run",
                             integer=True).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    want = df.sort_values("k").reset_index(drop=True)
    assert (out["run"].to_numpy() == want["v"].cumsum().to_numpy()).all()
    assert out["run"].dtype == np.int64


def test_prefix_sum_float(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": np.arange(999), "v": rng.normal(size=999)})
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(4)
    out = ordered_prefix_sum(ds, "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(out["run_sum"].to_numpy(),
                               df["v"].cumsum().to_numpy(), rtol=1e-9)


def test_prefix_sum_empty(ray_session):
    ds = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())}))
    out = ordered_prefix_sum(ds, "k", "v")
    assert out.count() == 0


def test_rank_normalize_ties_match_pandas(ray_session):
    from crn_meta_validate_ray.pipelines.queries import rank_normalize_events
    out = rank_normalize_events("/root/testdata/sf0.001").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = out.sort_values("event_id")["value"] \
        .rank(method="min").astype(int) - 1
    assert (out["rank_lt"].to_numpy() == want.to_numpy()).all()
    n = len(out)
    np.testing.assert_allclose(out["pr"], out["rank_lt"] / (n - 1))
