"""hash_join (large-large shuffle equi-join) vs pandas merge ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.stages.shufflejoin import hash_join


def _mk(seed=7, n_left=500, n_right=300):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 120, n_left),
        "lv": rng.normal(size=n_left).round(3),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 120, n_right),
        "rv": rng.integers(0, 10, n_right),
    }).drop_duplicates("rk")  # unique build side, like a dimension table
    return left, right


def _sorted(df):
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns), kind="stable")
            .reset_index(drop=True))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas(ray_session, how):
    left, right = _mk()
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", how=how,
                    num_buckets=5).to_pandas()
    want = left.merge(right, how=how, left_on="k", right_on="rk",
                      suffixes=("", "_r")).drop(columns=["rk"])
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_hash_join_semi_anti(ray_session, how):
    left, right = _mk(seed=11)
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", how=how,
                    num_buckets=4).to_pandas()
    mask = left["k"].isin(right["rk"])
    want = left[mask] if how == "semi" else left[~mask]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_hash_join_post_fuses_partial_agg(ray_session):
    left, right = _mk(seed=3)

    def post(df):
        return (df.groupby("rv", sort=False)
                .agg(s=("lv", "sum"), n=("lv", "size")).reset_index())

    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", post=post,
                    num_buckets=4).to_pandas()
    folded = out.groupby("rv").agg(s=("s", "sum"), n=("n", "sum"))
    want = (left.merge(right, left_on="k", right_on="rk")
            .groupby("rv").agg(s=("lv", "sum"), n=("lv", "size")))
    pd.testing.assert_frame_equal(folded.sort_index().round(6),
                                  want.sort_index().round(6),
                                  check_dtype=False)


def test_hash_join_empty_right(ray_session):
    left, _ = _mk()
    empty = pd.DataFrame({"rk": pd.Series([], dtype=np.int64),
                          "rv": pd.Series([], dtype=np.int64)})
    anti = hash_join(rd.from_pandas(left), rd.from_pandas(empty),
                     left_on="k", right_on="rk", how="anti",
                     num_buckets=3).to_pandas()
    assert len(anti) == len(left)
    inner = hash_join(rd.from_pandas(left), rd.from_pandas(empty),
                      left_on="k", right_on="rk", how="inner",
                      num_buckets=3)
    # Ray's to_pandas drops columns on an all-empty dataset; the block
    # schema is the source of truth
    assert set(inner.schema().names) == {"k", "lv", "rv"}
    assert inner.count() == 0


def test_hash_join_string_keys(ray_session):
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": [f"u{i}" for i in rng.integers(0, 40, 200)],
                         "x": np.arange(200)})
    right = pd.DataFrame({"k": [f"u{i}" for i in range(0, 40, 2)],
                          "y": np.arange(20)})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", num_buckets=4).to_pandas()
    want = left.merge(right, on="k")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_hash_join_single_bucket(ray_session):
    left, right = _mk(seed=21)
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", num_buckets=1).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk").drop(columns=["rk"])
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_hash_join_left_schema_unified(ray_session):
    # unmatched left rows must NOT promote right int columns to float64 in
    # some buckets only — every bucket casts to one explicit schema
    left = pd.DataFrame({"k": np.arange(100), "lv": np.arange(100)})
    right = pd.DataFrame({"rk": np.arange(0, 100, 7),
                          "rv": np.arange(0, 100, 7) * 10})
    ds = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                   left_on="k", right_on="rk", how="left", num_buckets=5)
    assert dict(zip(ds.schema().names,
                    [str(t) for t in ds.schema().types]))["rv"] == "int64"
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["rv"].notna().sum() == len(right)
    matched = got[got["k"] % 7 == 0]
    assert (matched["rv"].to_numpy() == matched["k"].to_numpy() * 10).all()


def test_hash_join_null_keys_sql_semantics(ray_session):
    # SQL equi-joins never match NULL keys; pandas merge matches NaN==NaN
    left = pd.DataFrame({"k": [1.0, 2.0, np.nan, np.nan],
                         "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2.0, np.nan], "rv": [200, 999]})
    inner = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      left_on="k", num_buckets=2).to_pandas()
    assert len(inner) == 1 and inner["lv"].iloc[0] == 20
    anti = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     left_on="k", how="anti", num_buckets=2).to_pandas()
    # NOT EXISTS keeps null-key left rows (predicate is never true)
    assert sorted(anti["lv"]) == [10, 30, 40]
    semi = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     left_on="k", how="semi", num_buckets=2).to_pandas()
    assert sorted(semi["lv"]) == [20]
    leftj = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      left_on="k", how="left", num_buckets=2).to_pandas()
    assert len(leftj) == 4
    assert leftj.loc[leftj["lv"] == 30, "rv"].isna().all()


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_salted_parity(ray_session, how):
    # skewed left: one hot key dominates; salted results must be
    # identical to unsalted for every join mode
    rng = np.random.default_rng(13)
    k = rng.integers(0, 50, 800)
    k[:600] = 7  # hot key
    left = pd.DataFrame({"k": k, "lv": np.arange(800)})
    right = pd.DataFrame({"rk": np.arange(0, 50, 3),
                          "rv": np.arange(0, 50, 3) * 2})
    plain = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      left_on="k", right_on="rk", how=how,
                      num_buckets=4).to_pandas()
    salted = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                       left_on="k", right_on="rk", how=how,
                       num_buckets=4, salt=3).to_pandas()
    assert "__salt" not in salted.columns
    pd.testing.assert_frame_equal(_sorted(plain), _sorted(salted),
                                  check_dtype=False)


def test_hash_join_salted_with_post(ray_session):
    # post must see a salt-free frame; partials must fold to the same
    # totals as the unsalted plan
    left, right = _mk(seed=31)

    def post(df):
        assert "__salt" not in df.columns and "__salt_r" not in df.columns
        return (df.groupby("rv", sort=False)
                .agg(s=("lv", "sum"), n=("lv", "size")).reset_index())

    def run(**kw):
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        left_on="k", right_on="rk", post=post,
                        num_buckets=4, **kw).to_pandas()
        return out.groupby("rv").agg(s=("s", "sum"), n=("n", "sum")) \
            .sort_index().round(6)

    pd.testing.assert_frame_equal(run(), run(salt=3), check_dtype=False)


def test_hash_join_outer(ray_session):
    left = pd.DataFrame({"k": [1.0, 2.0, np.nan], "lv": [10, 20, 30]})
    right = pd.DataFrame({"rk": [2.0, 4.0, np.nan], "rv": [200, 400, 999]})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", how="outer",
                    num_buckets=3).to_pandas()
    # matched: (2,20,200); left-only: 1, NaN-left; right-only: 4, NaN-right
    assert len(got) == 5
    m = got[got["lv"] == 20]
    assert m["rv"].iloc[0] == 200 and m["k"].iloc[0] == 2.0
    right_only = got[got["rv"] == 400]
    assert right_only["k"].iloc[0] == 4.0  # coalesced USING-style key
    assert right_only["lv"].isna().all()
    null_right = got[got["rv"] == 999]
    assert null_right["k"].isna().all() and null_right["lv"].isna().all()
    assert got[got["lv"] == 30]["rv"].isna().all()
    with pytest.raises(ValueError):
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  left_on="k", right_on="rk", how="outer", salt=2)


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_hash_join_left_data_column_named_like_right_key(ray_session, how):
    """A LEFT data column that happens to share the right key's name must
    survive untouched; pandas suffixes the right key instead, and the
    coalesce/drop must target the suffixed right key, not the left data."""
    left = pd.DataFrame({"k": [1, 2, 3], "rk": ["a", "b", "c"],
                         "lv": [10, 20, 30]})
    right = pd.DataFrame({"rk": [2, 3, 4], "rv": [200, 300, 400]})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", how=how,
                    num_buckets=3).to_pandas()
    matched = got[got["lv"] == 20]
    assert matched["rv"].iloc[0] == 200
    assert matched["rk"].iloc[0] == "b"  # left data column intact
    if how == "inner":
        assert len(got) == 2
    elif how == "left":
        assert len(got) == 3
        assert got[got["lv"] == 10]["rv"].isna().all()
    else:
        assert len(got) == 4
        right_only = got[got["rv"] == 400]
        assert right_only["k"].iloc[0] == 4  # coalesced from right key
        assert right_only["rk"].isna().all()


def test_hash_join_validate_unique_right(ray_session):
    left = pd.DataFrame({"k": [1, 2], "lv": [10, 20]})
    dup = pd.DataFrame({"rk": [2, 2, 3], "rv": [200, 201, 300]})
    uniq = dup.drop_duplicates("rk")
    ok = hash_join(rd.from_pandas(left), rd.from_pandas(uniq),
                   left_on="k", right_on="rk", how="left",
                   num_buckets=3, validate_unique_right=True).to_pandas()
    assert len(ok) == 2
    with pytest.raises(Exception, match="not unique|RayTaskError"):
        hash_join(rd.from_pandas(left), rd.from_pandas(dup),
                  left_on="k", right_on="rk", how="left",
                  num_buckets=3, validate_unique_right=True).take_all()


def test_lookup_join_auto_string_keys_and_dup_contract(ray_session):
    """String join keys are ineligible for the int64 broadcast lookup and
    must take the shuffle path at ANY size; duplicate dim keys raise on
    BOTH paths (identical lookup semantics across the gate)."""
    from crn_meta_validate_ray.stages.broadcast import lookup_join_auto

    fact = pd.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    dim = pd.DataFrame({"dk": ["a", "b"], "name": ["A", "B"]})
    out = lookup_join_auto(rd.from_pandas(fact), rd.from_pandas(dim),
                           left_key="k", right_key="dk",
                           carry_cols=["name"]).to_pandas()
    assert sorted(out["name"]) == ["A", "A", "B"]

    dup = pd.DataFrame({"dk": ["a", "a"], "name": ["A1", "A2"]})
    with pytest.raises(Exception, match="not unique|RayTaskError"):
        lookup_join_auto(rd.from_pandas(fact), rd.from_pandas(dup),
                         left_key="k", right_key="dk",
                         carry_cols=["name"]).take_all()
