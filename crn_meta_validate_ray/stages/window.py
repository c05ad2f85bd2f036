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

from crn_meta_validate_ray.stages.common import pd_to_arrow

import ray.data as rd


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
    """count/sum/mean/min/max of ``value_col`` per (key, tumbling window).

    Two-phase: batch-local partial aggregates (the combiner — one row per
    (key, window) per batch) then a bounded hash-bucket merge; only the tiny
    partial stream moves through the exchange, never the raw events."""
    from crn_meta_validate_ray.stages.common import grouped_map

    win = add_tumbling_window(
        ds.select_columns([ts_col, key_col, value_col]), ts_col, window_s)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby([key_col, "window_start"], sort=False)[value_col] \
            .agg(n_events="size", sum_value="sum", min_value="min",
                 max_value="max").reset_index()
        return pd_to_arrow(g)

    parts = win.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key_col, "window_start"], sort=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"), max_value=("max_value", "max"),
        ).reset_index()
        g["mean_value"] = g["sum_value"] / g["n_events"]
        return g[[key_col, "window_start", "n_events", "sum_value",
                  "mean_value", "min_value", "max_value"]]

    return grouped_map(parts, [key_col, "window_start"], merge)


def hopping_aggregate(ds: "rd.Dataset", *, ts_col: str = "ts",
                      key_col: str = "event_type", value_col: str = "value",
                      window_s: int = 7200, hop_s: int = 1800
                      ) -> "rd.Dataset":
    """Hopping (sliding) windows: every event lands in ``window_s / hop_s``
    overlapping windows; count/sum per (key, window_start).

    Same two-phase shape as :func:`tumbling_aggregate` — the in-batch
    combiner emits the replicated window keys AND pre-aggregates them, so
    the exchange still moves one partial row per (key, window) per batch,
    not ``window/hop`` copies of every event."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    n_win = window_s // hop_s
    from crn_meta_validate_ray.stages.common import grouped_map

    narrow = ds.select_columns([ts_col, key_col, value_col])

    def partial(t: pa.Table) -> pa.Table:
        epoch = np.asarray(_ts_epoch_s(t, ts_col))
        base = (epoch // hop_s) * hop_s  # newest covering window start
        starts = (base[:, None]
                  - np.arange(n_win, dtype=np.int64)[None, :] * hop_s)
        keys = t[key_col].to_pandas()
        vals = np.asarray(t[value_col].to_pandas(), dtype=np.float64)
        df = pd.DataFrame({
            key_col: np.repeat(np.asarray(keys, dtype=object), n_win),
            "window_start": starts.reshape(-1),
            value_col: np.repeat(vals, n_win)})
        g = df.groupby([key_col, "window_start"], sort=False)[value_col] \
            .agg(n_events="size", sum_value="sum").reset_index()
        return pd_to_arrow(g)

    parts = narrow.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key_col, "window_start"], sort=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"),
        ).reset_index()

    return grouped_map(parts, [key_col, "window_start"], merge)


def _ts_epoch_s(t: pa.Table, ts_col: str) -> pa.Array:
    """Timestamp column → int64 epoch seconds (floor)."""
    c = pc.cast(pc.floor_temporal(t[ts_col], unit="second"),
                pa.timestamp("s"))
    out = pc.cast(c, pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def running_aggregate(ds: "rd.Dataset", *, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      id_col: str = "event_id",
                      num_buckets: int | None = None) -> "rd.Dataset":
    """Per-key running (cumulative) aggregates in event-time order — the
    ROWS-UNBOUNDED-PRECEDING window function, without a global sort: keys
    co-locate through one hash-bucket exchange, then ONE vectorized sort +
    grouped cumsum handles every key in the bucket.

    Emits one row per input row (id, key, run_n, run_sum); ``run_sum``
    accumulates in (ts, id) order, so it is bit-identical to a sequential
    left-to-right fold (and to SQL's window-function semantics)."""
    from crn_meta_validate_ray.stages.common import grouped_map

    narrow = ds.select_columns([key_col, ts_col, value_col, id_col])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                key_col: pd.Series(dtype=np.int64),
                "run_n": pd.Series(dtype=np.int64),
                "run_sum": pd.Series(dtype=np.float64)})
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        g = df.groupby(key_col, sort=False)
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            key_col: df[key_col].to_numpy(),
            "run_n": (g.cumcount() + 1).to_numpy(dtype=np.int64),
            "run_sum": g[value_col].cumsum().to_numpy(dtype=np.float64)})
        return out

    return grouped_map(narrow, [key_col], per_bucket,
                       num_buckets=num_buckets)


def sessionize(ds: "rd.Dataset", *, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800,
               value_col: str | None = "value") -> "rd.Dataset":
    """Session windows per user: events sorted by ts within the user group;
    a gap > ``gap_s`` starts a new session.  Output: one row per session
    (user, session_idx, n_events, start/end ts, duration_s[, sum_value])."""
    from crn_meta_validate_ray.stages.common import grouped_map

    cols = [user_col, ts_col] + ([value_col] if value_col else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all events of a user are co-located in this bucket; one sort and
        # one vectorized pass assigns session ids across *all* users at once
        df = df.sort_values([user_col, ts_col], kind="stable")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = df[user_col].to_numpy()
        new_session = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same_user = users[1:] == users[:-1]
            small_gap = np.diff(ts) <= gap_s * 1_000_000
            new_session[1:] = ~(same_user & small_gap)
        sid_global = np.cumsum(new_session) - 1
        df = df.assign(__sid=sid_global, __ts_us=ts)
        agg = {"__ts_us": ["size", "min", "max"]}
        g = df.groupby([user_col, "__sid"], sort=False)
        out = g["__ts_us"].agg(n_events="size", start_ts="min",
                               end_ts="max").reset_index()
        # session_idx = per-user 0-based rank of the global session id
        out["session_idx"] = out.groupby(user_col, sort=False)["__sid"] \
            .rank(method="dense").astype(np.int64) - 1
        out["duration_s"] = (out["end_ts"] - out["start_ts"]) / 1e6
        res = out.rename(columns={user_col: "user_id"})[
            ["user_id", "session_idx", "n_events", "start_ts", "end_ts",
             "duration_s"]]
        res["n_events"] = res["n_events"].astype(np.int64)
        if value_col:
            sums = g[value_col].sum().reset_index(drop=True)
            res["sum_value"] = sums.astype(np.float64)
        return res

    return grouped_map(ds.select_columns(cols), [user_col], per_bucket)


def moving_aggregate(ds: "rd.Dataset", *, key_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     id_col: str = "event_id", window: int = 4,
                     num_buckets: int | None = None) -> "rd.Dataset":
    """Per-key moving-window aggregates over the last ``window`` rows in
    event-time order — the ROWS-(k-1)-PRECEDING window function (rolling
    count/sum/mean), the smoothing/trend feature builder.  Same
    partitioning shape as ``running_aggregate``: one hash-bucket exchange
    co-locates keys, then one vectorized sort + grouped cumsum-difference
    (cs - cs.shift(window)) computes every key's rolling sums at once —
    no per-row loop, no global sort."""
    from crn_meta_validate_ray.stages.common import grouped_map

    narrow = ds.select_columns([key_col, ts_col, value_col, id_col])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                key_col: pd.Series(dtype=np.int64),
                "win_n": pd.Series(dtype=np.int64),
                "win_sum": pd.Series(dtype=np.float64),
                "win_avg": pd.Series(dtype=np.float64)})
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        # SQL window sum() ignores NULL values (count(*) still counts
        # the row); a null propagating through cumsum would poison every
        # later window of the key
        df[value_col] = df[value_col].fillna(0.0)
        g = df.groupby(key_col, sort=False)
        cs = g[value_col].cumsum().to_numpy(dtype=np.float64)
        pos = g.cumcount().to_numpy(dtype=np.int64)
        # keys are contiguous after the sort and pos restarts per key, so
        # the per-key lag is a plain array shift gated on pos >= window —
        # no second groupby
        lag = np.concatenate([np.zeros(min(window, len(cs))),
                              cs[:-window]]) if len(cs) else cs
        win_n = np.minimum(pos + 1, window)
        win_sum = np.where(pos >= window, cs - lag, cs)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            key_col: df[key_col].to_numpy(),
            "win_n": win_n,
            "win_sum": win_sum,
            "win_avg": win_sum / win_n})

    return grouped_map(narrow, [key_col], per_bucket,
                       num_buckets=num_buckets)
