"""Property test: hash_join matches DuckDB's SQL join semantics on random
frames with null keys, for every join mode."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crn_meta_validate_ray.stages.shufflejoin import hash_join

_key = st.one_of(st.none(), st.integers(min_value=0, max_value=12))


def _frames(draw):
    lk = draw(st.lists(_key, min_size=0, max_size=40))
    rk = draw(st.lists(_key, min_size=0, max_size=25))
    left = pd.DataFrame({"k": pd.array(lk, dtype="Int64"),
                         "lv": np.arange(len(lk))})
    right = pd.DataFrame({"rk": pd.array(rk, dtype="Int64"),
                          "rv": np.arange(len(rk)) * 10})
    return left, right


_SQL = {
    "inner": "SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.rk",
    "left": "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.rk",
    "outer": ("SELECT coalesce(l.k, r.rk) AS k, l.lv, r.rv "
              "FROM l FULL OUTER JOIN r ON l.k = r.rk"),
    "semi": ("SELECT l.k, l.lv FROM l WHERE EXISTS "
             "(SELECT 1 FROM r WHERE r.rk = l.k)"),
    "anti": ("SELECT l.k, l.lv FROM l WHERE NOT EXISTS "
             "(SELECT 1 FROM r WHERE r.rk = l.k)"),
}


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = pd.to_numeric(df[c], errors="coerce").fillna(-10**9) \
            .astype(np.int64)
    return df.sort_values(sorted(df.columns), kind="stable") \
        .reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left", "outer", "semi", "anti"])
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_hash_join_matches_duckdb(ray_session, how, data):
    left, right = _frames(data.draw)
    if len(left) == 0:
        return  # empty-left returns an empty schemaless dataset; covered
        # separately in test_shufflejoin.py
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_on="k", right_on="rk", how=how,
                    num_buckets=3).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(_SQL[how]).df()
    if len(got) == 0 and len(want) == 0:
        return
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_group_quantile_rank_rule_matches_duckdb(ray_session, data):
    """The engine's discrete-quantile rank (1-based max(ceil(q*n),1))
    must agree with DuckDB quantile_disc for arbitrary group sizes."""
    import math

    vals = data.draw(st.lists(st.integers(0, 50), min_size=1, max_size=60))
    q = data.draw(st.sampled_from([0.25, 0.5, 0.75, 0.875]))
    v = np.sort(np.asarray(vals, dtype=np.float64))
    engine = v[max(math.ceil(q * len(v)), 1) - 1]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(
        f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
    assert engine == want
