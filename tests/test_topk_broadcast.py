"""Grouped top-k (no global sort) and broadcast dimension join."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.broadcast import broadcast_lookup_join
from crn_meta_validate_ray.stages.topk import grouped_topk


def test_grouped_topk_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "key": pa.array(rng.integers(0, 40, n), type=pa.int64()),
        "val": pa.array(np.round(rng.random(n) * 100, 3)),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
    })
    # force multiple batches so the per-batch prune actually prunes
    ds = rd.from_arrow(t).repartition(8)
    got = grouped_topk(ds, keys=["key"], order_col="val", k=3,
                       descending=True, tiebreak_col="rid").to_pandas()
    got = got.sort_values(["key", "rk"]).reset_index(drop=True)

    df = t.to_pandas().sort_values(["key", "val", "rid"],
                                   ascending=[True, False, True],
                                   kind="stable")
    want = df.groupby("key").head(3).copy()
    want["rk"] = want.groupby("key").cumcount()
    want = want.sort_values(["key", "rk"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["key"].to_numpy() == want["key"].to_numpy()).all()
    assert (got["rid"].to_numpy() == want["rid"].to_numpy()).all()
    assert (got["rk"].to_numpy() == want["rk"].to_numpy()).all()


def test_grouped_topk_duplicate_values_deterministic(ray_session):
    t = pa.table({
        "key": pa.array([1, 1, 1, 1], type=pa.int64()),
        "val": pa.array([5.0, 5.0, 5.0, 1.0]),
        "rid": pa.array([30, 10, 20, 40], type=pa.int64()),
    })
    got = grouped_topk(rd.from_arrow(t), keys=["key"], order_col="val",
                       k=2, tiebreak_col="rid").to_pandas() \
        .sort_values("rk")
    assert got["rid"].tolist() == [10, 20]  # ties break ascending by rid


def test_broadcast_lookup_join_hits_and_misses(ray_session):
    fact = pa.table({
        "k": pa.array([1, 2, 3, 99], type=pa.int64()),
        "x": pa.array([10.0, 20.0, 30.0, 40.0]),
    })
    dim = pa.table({
        "dk": pa.array([3, 1, 2], type=pa.int64()),  # unsorted on purpose
        "name": pa.array(["c", "a", "b"]),
        "grp": pa.array([30, 10, 20], type=pa.int64()),
    })
    out = broadcast_lookup_join(
        rd.from_arrow(fact), rd.from_arrow(dim), left_key="k",
        right_key="dk", carry_cols=["name", "grp"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["name"].tolist()[:3] == ["a", "b", "c"]
    assert out["grp"].tolist()[:3] == [10, 20, 30]
    assert pd.isna(out["name"].iloc[3]) and pd.isna(out["grp"].iloc[3])


def test_broadcast_lookup_join_chained(ray_session):
    fact = pa.table({"k": pa.array([1, 2], type=pa.int64())})
    d1 = pa.table({"dk": pa.array([1, 2], type=pa.int64()),
                   "mid": pa.array([7, 8], type=pa.int64())})
    d2 = pa.table({"mk": pa.array([7, 8], type=pa.int64()),
                   "name": pa.array(["seven", "eight"])})
    step1 = broadcast_lookup_join(rd.from_arrow(fact), rd.from_arrow(d1),
                                  left_key="k", right_key="dk",
                                  carry_cols=["mid"])
    out = broadcast_lookup_join(step1, rd.from_arrow(d2), left_key="mid",
                                right_key="mk", carry_cols=["name"]) \
        .to_pandas().sort_values("k")
    assert out["name"].tolist() == ["seven", "eight"]


def test_grouped_topk_null_key_is_own_group(ray_session):
    """SQL PARTITION BY semantics: a null key forms its own group instead
    of being dropped (pandas groupby default would discard it)."""
    t = pa.table({
        "key": pa.array([None, None, None, "a"], type=pa.string()),
        "val": pa.array([3.0, 1.0, 2.0, 9.0]),
        "rid": pa.array([0, 1, 2, 3], type=pa.int64()),
    })
    got = grouped_topk(rd.from_arrow(t), keys=["key"], order_col="val",
                       k=2, tiebreak_col="rid").to_pandas()
    nulls = got[got["key"].isna()].sort_values("rk")
    assert nulls["rid"].tolist() == [0, 2]  # top-2 by val desc
    assert got[got["key"] == "a"]["rid"].tolist() == [3]


def test_broadcast_lookup_join_empty_dim_yields_nulls(ray_session):
    fact = pa.table({"k": pa.array([1, 2], type=pa.int64())})
    dim = pa.table({"dk": pa.array([], type=pa.int64()),
                    "name": pa.array([], type=pa.string())})
    out = broadcast_lookup_join(rd.from_arrow(fact), rd.from_arrow(dim),
                                left_key="k", right_key="dk",
                                carry_cols=["name"]).to_pandas()
    assert len(out) == 2 and out["name"].isna().all()


def test_broadcast_lookup_join_duplicate_dim_key_raises(ray_session):
    import pytest
    import ray

    fact = pa.table({"k": pa.array([7], type=pa.int64())})
    dim = pa.table({"dk": pa.array([7, 7], type=pa.int64()),
                    "name": pa.array(["a", "b"])})
    with pytest.raises(Exception, match="not.*unique|RayTaskError"):
        broadcast_lookup_join(rd.from_arrow(fact), rd.from_arrow(dim),
                              left_key="k", right_key="dk",
                              carry_cols=["name"]).take_all()


def test_lookup_join_auto_shuffle_fallback(ray_session):
    """Past the broadcast budget the auto strategy must produce the same
    enrichment through the shuffle hash join."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from crn_meta_validate_ray.stages.broadcast import lookup_join_auto

    rng = np.random.default_rng(4)
    fact = pd.DataFrame({"k": rng.integers(0, 30, 300),
                         "v": np.arange(300)})
    dim = pd.DataFrame({"dk": np.arange(0, 30, 2),
                        "name": [f"d{i}" for i in range(0, 30, 2)]})

    def run(budget):
        out = lookup_join_auto(rd.from_pandas(fact), rd.from_pandas(dim),
                               left_key="k", right_key="dk",
                               carry_cols=["name"],
                               broadcast_max_rows=budget).to_pandas()
        return out.sort_values(["v"]).reset_index(drop=True)[
            ["k", "v", "name"]]

    bc = run(10**6)   # broadcast path
    sj = run(1)       # forced shuffle path
    pd.testing.assert_frame_equal(bc, sj, check_dtype=False)
