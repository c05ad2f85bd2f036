"""Range (interval) join: for each left row, the right rows of the SAME
key whose timestamp falls in ``[left_ts + lo_s, left_ts + hi_s)``.

The custom-operator composition the brief calls out next to the as-of join
(`stages/asof.py`): Ray Data has no inequality joins, so this co-locates
both sides by join key through one hash-bucket exchange (``grouped_map``)
and resolves every interval inside the bucket with a single vectorized
rank computation — no per-key Python loop:

1. tag both sides and union them (only key/ts/id columns shuffle);
2. per bucket, lexsort right rows by (key, ts) ONCE;
3. for each left row, the count of right rows in its window is
   ``rank(key, ts+hi) − rank(key, ts+lo)`` where ``rank`` is the number of
   right rows strictly below the probe — computed for ALL probes at once
   by lexsorting right rows together with synthetic probe markers (marker
   flag sorts before an equal-ts right row, giving the strict "<" bound)
   and reading a cumulative right-row count at the marker positions.

Partitioning assumption: all rows of one key fit one bucket task (same
contract as every ``grouped_map`` stage); skewed keys should be salted by
the CALLER only when window semantics allow splitting (they usually do
not — a salted key would sever left rows from right rows).

At 100 TB both sides stream through the exchange as narrow derived rows;
the pair-emitting variant is additionally capped per left row so one hot
key cannot emit a quadratic pair set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crn_meta_validate_ray.stages.common import grouped_map


def _ts_us(t: pa.Table, col: str) -> pa.Array:
    """Timestamp column → int64 microseconds since epoch."""
    c = t[col]
    if pa.types.is_timestamp(c.type):
        c = pc.cast(c, pa.timestamp("us"))
    out = pc.cast(c, pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _rank_below(r_key: np.ndarray, r_ts: np.ndarray, p_key: np.ndarray,
                p_ts: np.ndarray) -> np.ndarray:
    """#right rows with (key, ts) strictly below each probe (key ties:
    ts < probe ts).  One lexsort over rights + probes; probes carry flag
    -1 so they sort before right rows with the same (key, ts)."""
    nr, npr = len(r_key), len(p_key)
    keys = np.concatenate([r_key, p_key])
    ts = np.concatenate([r_ts, p_ts])
    flag = np.concatenate([np.zeros(nr, dtype=np.int8),
                           np.full(npr, -1, dtype=np.int8)])
    order = np.lexsort((flag, ts, keys))
    is_right = order < nr
    cum = np.cumsum(is_right)
    pos = np.empty(nr + npr, dtype=np.int64)
    pos[order] = np.arange(nr + npr)
    at_probe = cum[pos[nr:]]
    # cumsum at the probe's own slot counts the probe (0) plus rights at or
    # before it; the probe contributes nothing, so this IS the strict rank
    return at_probe


def range_join_count(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lo_s: float,
    hi_s: float,
    left_id: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per left row: (left_id, left_key, n_matches) where n_matches counts
    right rows of the same key with ``left_ts + lo_s <= right_ts <
    left_ts + hi_s``.  Left rows with zero matches are included (n=0)."""
    lo_us = int(lo_s * 1_000_000)
    hi_us = int(hi_s * 1_000_000)

    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t[left_key], pa.int64()),
            "ts_us": _ts_us(t, left_ts),
            "lid": pc.cast(t[left_id], pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def tag_right(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t[right_key], pa.int64()),
            "ts_us": _ts_us(t, right_ts),
            "lid": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    both = left.map_batches(tag_left, batch_format="pyarrow") \
        .union(right.map_batches(tag_right, batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["side"] == 0]
        r = df[df["side"] == 1]
        if not len(l):
            return pd.DataFrame({
                "left_id": pd.Series(dtype=np.int64),
                "key": pd.Series(dtype=np.int64),
                "n_matches": pd.Series(dtype=np.int64)})
        r_key = r["key"].to_numpy(dtype=np.int64)
        r_ts = r["ts_us"].to_numpy(dtype=np.int64)
        p_key = l["key"].to_numpy(dtype=np.int64)
        p_ts = l["ts_us"].to_numpy(dtype=np.int64)
        n = (_rank_below(r_key, r_ts, p_key, p_ts + hi_us)
             - _rank_below(r_key, r_ts, p_key, p_ts + lo_us))
        return pd.DataFrame({
            "left_id": l["lid"].to_numpy(dtype=np.int64),
            "key": p_key,
            "n_matches": n.astype(np.int64)})

    return grouped_map(both, ["key"], per_bucket, num_buckets=num_buckets)


def range_join_pairs(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lo_s: float,
    hi_s: float,
    left_id: str,
    right_id: str,
    max_matches_per_left: int = 4096,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Pair-emitting variant: one row per (left, right) match, capped at
    ``max_matches_per_left`` matches per left row (earliest right rows win;
    a ``truncated`` flag marks capped left rows) so a hot key cannot emit a
    quadratic pair set."""
    lo_us = int(lo_s * 1_000_000)
    hi_us = int(hi_s * 1_000_000)

    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t[left_key], pa.int64()),
            "ts_us": _ts_us(t, left_ts),
            "rid": pc.cast(t[left_id], pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def tag_right(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t[right_key], pa.int64()),
            "ts_us": _ts_us(t, right_ts),
            "rid": pc.cast(t[right_id], pa.int64()),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    both = left.map_batches(tag_left, batch_format="pyarrow") \
        .union(right.map_batches(tag_right, batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "left_id": pd.Series(dtype=np.int64),
            "right_id": pd.Series(dtype=np.int64),
            "truncated": pd.Series(dtype=bool)})
        l = df[df["side"] == 0]
        r = df[df["side"] == 1]
        if not len(l) or not len(r):
            return empty
        order = np.lexsort((r["ts_us"].to_numpy(), r["key"].to_numpy()))
        r_key = r["key"].to_numpy(dtype=np.int64)[order]
        r_ts = r["ts_us"].to_numpy(dtype=np.int64)[order]
        r_id = r["rid"].to_numpy(dtype=np.int64)[order]
        p_key = l["key"].to_numpy(dtype=np.int64)
        p_ts = l["ts_us"].to_numpy(dtype=np.int64)
        lo = _rank_below(r_key, r_ts, p_key, p_ts + lo_us)
        hi = _rank_below(r_key, r_ts, p_key, p_ts + hi_us)
        n = hi - lo
        trunc = n > max_matches_per_left
        n_emit = np.minimum(n, max_matches_per_left)
        tot = int(n_emit.sum())
        if not tot:
            return empty
        # gather indices lo[i] .. lo[i]+n_emit[i] for every left row
        starts = np.repeat(lo, n_emit)
        offs = np.arange(tot) - np.repeat(
            np.concatenate(([0], np.cumsum(n_emit)))[:-1], n_emit)
        lids = l["rid"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "left_id": np.repeat(lids, n_emit),
            "right_id": r_id[starts + offs],
            "truncated": np.repeat(trunc, n_emit)})

    return grouped_map(both, ["key"], per_bucket, num_buckets=num_buckets)
