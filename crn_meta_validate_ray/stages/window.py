"""Windowed / stream-shaped operators over an ordered event table.

Ray Data has no event-time windows; these implement the standard shapes on
top of its batch primitives (the pattern recommended for stream-shaped
references): assign window keys vectorized in ``map_batches``, then
``groupby(window key)`` — or sort-within-group for session windows.

Ordering assumption: rows may arrive in any order; each operator sorts
within its (key, window/session) group, never globally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def add_tumbling_window(ds: "rd.Dataset", ts_col: str, window_s: int,
                        out_col: str = "window_start") -> "rd.Dataset":
    """Append the tumbling-window start (epoch seconds, int64)."""

    def assign(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64())  # µs since epoch
        start = pc.multiply(
            pc.divide(epoch, 1_000_000 * window_s), window_s)
        return t.append_column(out_col, pc.cast(start, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def tumbling_aggregate(ds: "rd.Dataset", *, ts_col: str = "ts",
                       key_col: str = "event_type", value_col: str = "value",
                       window_s: int = 3600) -> "rd.Dataset":
    """count/sum/mean/min/max of ``value_col`` per (key, tumbling window)."""
    win = add_tumbling_window(
        ds.select_columns([ts_col, key_col, value_col]), ts_col, window_s)
    return win.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"),
        Mean(value_col, alias_name="mean_value"),
        Min(value_col, alias_name="min_value"),
        Max(value_col, alias_name="max_value"),
    )


def sessionize(ds: "rd.Dataset", *, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800,
               value_col: str | None = "value") -> "rd.Dataset":
    """Session windows per user: events sorted by ts within the user group;
    a gap > ``gap_s`` starts a new session.  Output: one row per session
    (user, session_idx, n_events, start/end ts, duration_s[, sum_value])."""
    cols = [user_col, ts_col] + ([value_col] if value_col else [])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_session = np.zeros(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = np.diff(ts) > gap_s * 1_000_000
        sid = np.cumsum(new_session)
        out = {"user_id": [], "session_idx": [], "n_events": [],
               "start_ts": [], "end_ts": [], "duration_s": []}
        if value_col:
            out["sum_value"] = []
        for s in range(sid.max() + 1 if len(sid) else 0):
            mask = sid == s
            out["user_id"].append(g[user_col].iloc[0])
            out["session_idx"].append(int(s))
            out["n_events"].append(int(mask.sum()))
            out["start_ts"].append(int(ts[mask][0]))
            out["end_ts"].append(int(ts[mask][-1]))
            out["duration_s"].append(float((ts[mask][-1] - ts[mask][0]) / 1e6))
            if value_col:
                out["sum_value"].append(float(g[value_col].to_numpy()[mask].sum()))
        return pd.DataFrame(out)

    return ds.select_columns(cols).groupby(user_col).map_groups(
        per_user, batch_format="pandas")
