"""Windowed / session operators over the events table shape."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.window import sessionize, tumbling_aggregate


def _events():
    ts = pd.to_datetime([
        "2024-01-01 00:10:00", "2024-01-01 00:20:00", "2024-01-01 01:05:00",
        "2024-01-01 00:30:00", "2024-01-01 02:00:00", "2024-01-01 02:10:00",
    ])
    return pa.table({
        "ts": pa.array(ts.values.astype("datetime64[us]")),
        "event_type": ["click", "click", "click", "view", "view", "view"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "user_id": pa.array([1, 1, 1, 2, 2, 2], type=pa.int64()),
    })


def test_tumbling_aggregate_matches_pandas(ray_session):
    ds = rd.from_arrow(_events())
    got = {(r["event_type"], r["window_start"]): r
           for r in tumbling_aggregate(ds, window_s=3600).take_all()}
    df = _events().to_pandas()
    df["w"] = (df["ts"].astype("int64") // 10**6 // 3600) * 3600  # µs→s
    want = df.groupby(["event_type", "w"])["value"].agg(
        ["count", "sum", "mean"])
    assert len(got) == len(want)
    for (et, w), row in want.iterrows():
        g = got[(et, int(w))]
        assert g["n_events"] == row["count"]
        assert abs(g["sum_value"] - row["sum"]) < 1e-9
        assert abs(g["mean_value"] - row["mean"]) < 1e-9


def test_sessionize_gap_splits(ray_session):
    ds = rd.from_arrow(_events())
    rows = sessionize(ds, gap_s=1800).take_all()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: 00:10,00:20 then 01:05 (gap 45min > 30min) → 2 sessions
    assert len(by_user[1]) == 2
    s0, s1 = sorted(by_user[1], key=lambda r: r["session_idx"])
    assert s0["n_events"] == 2 and s1["n_events"] == 1
    assert s0["duration_s"] == 600.0
    # user 2: 00:30 then 02:00 (gap 90min) then 02:10 → 2 sessions
    assert len(by_user[2]) == 2
    assert sorted(r["n_events"] for r in by_user[2]) == [1, 2]
    assert abs(sum(r["sum_value"] for r in by_user[2]) - 15.0) < 1e-9


def test_asof_join_backward(ray_session):
    """As-of join: each left row gets the latest right row at or before its
    timestamp within the key (custom operator; see stages/asof.py)."""
    import math

    import numpy as np

    from crn_meta_validate_ray.stages.asof import asof_join

    t = lambda s: np.datetime64(s, "us")  # noqa: E731
    left = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([t("2024-01-01T10:00"), t("2024-01-01T12:00"),
                        t("2024-01-01T09:00"), t("2024-01-02T00:00"),
                        t("2024-01-01T00:00")]),
        "event_type": ["click", "view", "click", "view", "click"]}))
    right = rd.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
        "o_orderdate": pa.array([t("2024-01-01T09:30"),
                                 t("2024-01-01T11:00"),
                                 t("2024-01-01T12:00")]),
        "o_totalprice": [10.0, 20.0, 99.0]}))
    out = asof_join(left, right, left_key="user_id", right_key="o_custkey",
                    left_ts="ts", right_ts="o_orderdate",
                    right_value_cols=["o_totalprice"]).to_pandas()
    out = out.sort_values(["user_id", "ts"]).reset_index(drop=True)
    vals = out["o_totalprice"].tolist()
    assert math.isnan(vals[0]) and vals[1] == 10.0 and vals[2] == 20.0
    assert math.isnan(vals[3]) and vals[4] == 99.0
    assert list(out.columns) == ["user_id", "ts", "event_type",
                                 "o_orderdate", "o_totalprice"]


def test_hopping_aggregate_covering_windows(ray_session):
    """Every event lands in window_s/hop_s overlapping windows; totals per
    window match a brute-force pandas expansion."""
    from crn_meta_validate_ray.stages.window import hopping_aggregate
    ds = rd.from_arrow(_events())
    got = {(r["event_type"], r["window_start"]): r
           for r in hopping_aggregate(ds, window_s=3600,
                                      hop_s=900).take_all()}
    df = _events().to_pandas()
    rows = {}
    for _, r in df.iterrows():
        e = r["ts"].value // 10**9  # ns → s
        base = (e // 900) * 900
        for i in range(4):  # 3600 / 900 covering windows
            w = base - i * 900
            key = (r["event_type"], w)
            n, s = rows.get(key, (0, 0.0))
            rows[key] = (n + 1, s + r["value"])
    assert set(got) == set(rows)
    for key, (n, s) in rows.items():
        assert got[key]["n_events"] == n
        assert abs(got[key]["sum_value"] - s) < 1e-9


def test_running_aggregate_matches_pandas(ray_session):
    from crn_meta_validate_ray.stages.window import running_aggregate
    rng = np.random.default_rng(5)
    n = 2000
    base = pd.Timestamp("2024-01-01").value // 10**3
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 25, n), type=pa.int64()),
        "ts": pa.array((base + rng.integers(0, 10**9, n))
                       .astype("datetime64[us]")),
        "value": pa.array(np.round(rng.random(n), 3)),
    })
    got = running_aggregate(rd.from_arrow(t).repartition(4)) \
        .to_pandas().set_index("event_id").sort_index()
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                   kind="stable")
    df["run_n"] = df.groupby("user_id").cumcount() + 1
    df["run_sum"] = df.groupby("user_id")["value"].cumsum()
    want = df.set_index("event_id").sort_index()
    assert (got["run_n"] == want["run_n"]).all()
    assert np.allclose(got["run_sum"], want["run_sum"], atol=1e-12)


def test_exact_quantiles_disc_semantics(ray_session):
    from crn_meta_validate_ray.stages.quantile import exact_quantiles
    vals = [5.0, 1.0, 3.0]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    out = {r["q"]: r["value"]
           for r in exact_quantiles(ds, "x", [0.0, 0.33, 0.34, 0.5, 1.0])
           .to_pylist()}
    # quantile_disc: value at 1-based rank max(ceil(q*n), 1)
    assert out[0.0] == 1.0 and out[0.33] == 1.0 and out[0.34] == 3.0
    assert out[0.5] == 3.0 and out[1.0] == 5.0
    # nulls excluded from ranks
    ds2 = rd.from_arrow(pa.table({"x": pa.array([None, 2.0, None, 4.0])}))
    out2 = {r["q"]: r["value"]
            for r in exact_quantiles(ds2, "x", [0.5, 1.0]).to_pylist()}
    assert out2[0.5] == 2.0 and out2[1.0] == 4.0


def test_exact_quantiles_cardinality_autoguard(ray_session):
    """mode='auto' keeps quantile_disc exactness for bounded-cardinality
    columns but reroutes high-cardinality ones to the t-digest path
    instead of collecting an unbounded value census on the driver."""
    import numpy as np

    from crn_meta_validate_ray.stages.quantile import exact_quantiles

    rng = np.random.default_rng(3)
    cont = rng.normal(size=20_000)          # ~all-distinct continuous
    disc = rng.integers(0, 50, size=20_000).astype(float)
    ds_c = rd.from_arrow(pa.table({"x": pa.array(cont)}))
    ds_d = rd.from_arrow(pa.table({"x": pa.array(disc)}))

    # bounded column: auto == exact (disc semantics preserved)
    got = exact_quantiles(ds_d, "x", [0.25, 0.5, 0.9], mode="auto",
                          max_distinct=1000).to_pylist()
    want = exact_quantiles(ds_d, "x", [0.25, 0.5, 0.9],
                           mode="exact").to_pylist()
    assert got == want

    # unbounded column under a tiny budget: auto == approx (interpolated,
    # rank-accurate within digest tolerance)
    out = {r["q"]: r["value"]
           for r in exact_quantiles(ds_c, "x", [0.5], mode="auto",
                                    max_distinct=1000).to_pylist()}
    approx = {r["q"]: r["value"]
              for r in exact_quantiles(ds_c, "x", [0.5],
                                       mode="approx").to_pylist()}
    assert out == approx
    assert abs(out[0.5] - float(np.quantile(cont, 0.5))) < 0.05


def test_moving_aggregate_matches_pandas_rolling(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from crn_meta_validate_ray.stages.window import moving_aggregate

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 40, n),
        "ts": rng.integers(0, 10_000, n),
        "value": rng.normal(size=n).round(3),
    })
    out = moving_aggregate(rd.from_pandas(df).repartition(6), window=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    want = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    roll = want.groupby("user_id", sort=False)["value"] \
        .rolling(4, min_periods=1).sum().reset_index(level=0, drop=True)
    want = want.assign(win_sum=roll).sort_values("event_id") \
        .reset_index(drop=True)
    np.testing.assert_allclose(out["win_sum"], want["win_sum"], atol=1e-9)
    # win_n against an independent rolling count, not its own definition
    wantn = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    rolln = wantn.groupby("user_id", sort=False)["value"] \
        .rolling(4, min_periods=1).count().reset_index(level=0, drop=True)
    wantn = wantn.assign(win_n=rolln).sort_values("event_id") \
        .reset_index(drop=True)
    assert (out["win_n"].to_numpy() ==
            wantn["win_n"].to_numpy(dtype=np.int64)).all()
    np.testing.assert_allclose(out["win_avg"],
                               out["win_sum"] / out["win_n"], atol=1e-12)
