"""Range (interval) join operator: counts and capped pair emission
(stages/rangejoin.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.rangejoin import (range_join_count,
                                                    range_join_pairs)


def _sides():
    lts = pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 12:00:00",
                          "2024-01-02 09:00:00", "2024-01-01 10:30:00"])
    left = pa.table({
        "lid": pa.array([100, 101, 102, 103], type=pa.int64()),
        "key": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array(lts.values.astype("datetime64[us]")),
    })
    rts = pd.to_datetime([
        "2024-01-01 09:30:00",  # 30 min before lid=100
        "2024-01-01 10:00:00",  # exactly AT lid=100 (excluded: hi bound)
        "2024-01-01 11:59:59",  # 1 s before lid=101
        "2024-01-01 06:00:00",  # 4 h before lid=100 (outside 1 h window)
        "2024-01-01 10:15:00",  # key 2, 15 min before lid=103
    ])
    right = pa.table({
        "rid": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "key": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array(rts.values.astype("datetime64[us]")),
    })
    return left, right


def _brute(left, right, lo_s, hi_s):
    l = left.to_pandas()
    r = right.to_pandas()
    out = {}
    for _, lr in l.iterrows():
        n = 0
        for _, rr in r.iterrows():
            if rr["key"] != lr["key"]:
                continue
            d = (rr["ts"] - lr["ts"]).total_seconds()
            if lo_s <= d < hi_s:
                n += 1
        out[int(lr["lid"])] = n
    return out


def test_range_join_count_matches_brute_force(ray_session):
    left, right = _sides()
    got = {r["left_id"]: r["n_matches"]
           for r in range_join_count(
               rd.from_arrow(left), rd.from_arrow(right),
               left_key="key", right_key="key", left_ts="ts", right_ts="ts",
               lo_s=-3600, hi_s=0, left_id="lid").take_all()}
    assert got == _brute(left, right, -3600, 0)
    # boundary semantics: rid=2 at exactly left ts is EXCLUDED (hi bound
    # exclusive), rid=1 at -30 min included → lid=100 sees exactly 1
    assert got[100] == 1
    assert got[102] == 0  # next day: nothing in window


def test_range_join_count_randomized(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 200, 400
    base = pd.Timestamp("2024-01-01").value // 10**3  # µs
    left = pa.table({
        "lid": pa.array(np.arange(n_l, dtype=np.int64)),
        "key": pa.array(rng.integers(0, 12, n_l), type=pa.int64()),
        "ts": pa.array((base + rng.integers(0, 86_400_000_000, n_l))
                       .astype("datetime64[us]")),
    })
    right = pa.table({
        "rid": pa.array(np.arange(n_r, dtype=np.int64)),
        "key": pa.array(rng.integers(0, 12, n_r), type=pa.int64()),
        "ts": pa.array((base + rng.integers(0, 86_400_000_000, n_r))
                       .astype("datetime64[us]")),
    })
    got = {r["left_id"]: r["n_matches"]
           for r in range_join_count(
               rd.from_arrow(left), rd.from_arrow(right),
               left_key="key", right_key="key", left_ts="ts", right_ts="ts",
               lo_s=-7200, hi_s=3600, left_id="lid").take_all()}
    assert got == _brute(left, right, -7200, 3600)


def test_range_join_pairs_and_cap(ray_session):
    left, right = _sides()
    rows = range_join_pairs(
        rd.from_arrow(left), rd.from_arrow(right),
        left_key="key", right_key="key", left_ts="ts", right_ts="ts",
        lo_s=-3600, hi_s=0, left_id="lid", right_id="rid").take_all()
    pairs = {(r["left_id"], r["right_id"]) for r in rows}
    assert pairs == {(100, 1), (101, 3), (103, 5)}
    assert not any(r["truncated"] for r in rows)
    # cap: widen the window so lid=100 matches 3 rights, cap at 2
    rows = range_join_pairs(
        rd.from_arrow(left), rd.from_arrow(right),
        left_key="key", right_key="key", left_ts="ts", right_ts="ts",
        lo_s=-6 * 3600, hi_s=1, left_id="lid", right_id="rid",
        max_matches_per_left=2).take_all()
    lid100 = [r for r in rows if r["left_id"] == 100]
    assert len(lid100) == 2 and all(r["truncated"] for r in lid100)
    # earliest rights win: rid=4 (06:00) then rid=1 (09:30)
    assert {r["right_id"] for r in lid100} == {4, 1}
