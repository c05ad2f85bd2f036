"""Exact distributed quantiles for bounded-cardinality columns.

The t-digest drift sketches (`state/sketches.py`) answer quantile queries
approximately at any cardinality; this is the EXACT complement for columns
whose distinct-value space is small (enum codes, ratings, quantities,
bucketed measures): a value-counts ``groupby`` (combiner-backed, narrow)
reduces the dataset to one row per distinct value, and the driver folds
that tiny stream into discrete quantiles.

Semantics match SQL ``quantile_disc``: the value at 1-based rank
``max(ceil(q*n), 1)`` of the sorted column.  Pick binary-exact ``q``
values (k/2^m, e.g. 0.25/0.5/0.75/0.875) when hash-comparing against a
SQL engine so ``q*n`` carries no float rounding.

At 100 TB the only moving data is (value, count) pairs — but the driver
fold requires distinct values to be bounded (≲1e6); use the t-digest path
for continuous high-cardinality columns.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count


def _estimate_distinct(ds: "rd.Dataset", col: str) -> float:
    """Cheap distinct-count probe: per-batch HLL partials over ONE pruned
    narrow pass (no shuffle), merged on the driver — O(registers) bytes
    per block regardless of input size."""
    from ..state.sketches import HyperLogLog, hash64

    def _partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog()
        vals = pc.drop_null(batch.column(col))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if len(vals):
            hll.update_hashes(hash64(np.asarray(vals)))
        return pa.table({"hll": pa.array([hll.to_bytes()],
                                         type=pa.binary())})

    merged = HyperLogLog()
    for b in ds.select_columns([col]) \
            .map_batches(_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for d in b.column("hll"):
            merged.merge(HyperLogLog.from_bytes(d.as_py()))
    return merged.estimate()


def exact_quantiles(ds: "rd.Dataset", col: str, qs: list[float],
                    mode: str = "auto",
                    max_distinct: int = 1_000_000) -> pa.Table:
    """Discrete quantiles of ``col`` (quantile_disc semantics): returns an
    Arrow table (q, value) with one row per requested quantile.

    The exact path folds the full (value, count) census on the driver, so
    it requires bounded distinct cardinality.  ``mode='auto'`` (default)
    probes the distinct count with a merged HLL (one narrow pass, no
    shuffle) and routes columns beyond ``max_distinct`` to
    :func:`approx_quantiles` (t-digest, interpolated) instead of
    attempting an unbounded driver collect — the same guard pattern as
    the embedding near-dup router (stages/similarity.py).  ``'exact'`` /
    ``'approx'`` force a path."""
    if mode not in ("auto", "exact", "approx"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "approx" or (
            mode == "auto"
            # 1.1 headroom: HLL error is ~1%; only a decisive overshoot
            # reroutes (borderline columns still fit on the driver)
            and _estimate_distinct(ds, col) > 1.1 * max_distinct):
        return approx_quantiles(ds, col, qs)
    counts = ds.groupby(col).aggregate(Count(alias_name="n")).to_pandas()
    counts = counts.dropna(subset=[col]).sort_values(col, kind="stable")
    vals = counts[col].to_numpy()
    cum = counts["n"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            out_q.append(float(q))
            out_v.append(None)
            continue
        rank = max(math.ceil(q * n), 1)  # 1-based
        idx = int(np.searchsorted(cum, rank))
        out_q.append(float(q))
        out_v.append(float(vals[idx]))
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.float64())})


def approx_quantiles(ds: "rd.Dataset", col: str, qs: list[float],
                     max_centroids: int = 200) -> pa.Table:
    """Approximate quantiles of a continuous column via merging t-digests
    (the scale path `exact_quantiles` defers to for unbounded-cardinality
    columns): every block folds into ONE ~`max_centroids`-centroid digest
    inside ``map_batches``, a second merge stage collapses digests
    1024-at-a-time, and the driver folds only the surviving handful —
    data moved is O(blocks × max_centroids) floats regardless of input
    size.  Returns an Arrow table (q, value) with interpolated
    (quantile_cont-style) values; rank error is ~O(1/max_centroids) at
    the median and tighter at the tails (arcsin scale)."""
    from ..state.sketches import TDigest

    def _partial(batch: pa.Table) -> pa.Table:
        td = TDigest(max_centroids)
        vals = pc.drop_null(batch.column(col)).cast(pa.float64())
        td.update(vals.to_numpy(zero_copy_only=False))
        return pa.table({"digest": pa.array([td.to_bytes()],
                                            type=pa.binary())})

    def _merge(batch: pa.Table) -> pa.Table:
        td = TDigest(max_centroids)
        for d in batch.column("digest"):
            td.merge(TDigest.from_bytes(d.as_py()))
        return pa.table({"digest": pa.array([td.to_bytes()],
                                            type=pa.binary())})

    parts = (ds.select_columns([col])
             .map_batches(_partial, batch_format="pyarrow")
             .map_batches(_merge, batch_format="pyarrow", batch_size=1024))
    td = TDigest(max_centroids)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for d in b.column("digest"):
            td.merge(TDigest.from_bytes(d.as_py()))
    out_q = [float(q) for q in qs]
    out_v = [td.quantile(q) if td.count else None for q in out_q]
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.float64())})


def _rank_counts(v: np.ndarray, vals) -> tuple:
    """Exact strictly-below / at-or-below counts of ``vals`` within the
    FINITE values of ``v`` — the one place the rank-check denominator
    semantics live (the digest ranks over finite values only; NaN is a
    value to Arrow, not a null)."""
    v = v[np.isfinite(v)]
    lo = np.array([int((v < x).sum())
                   if x is not None and np.isfinite(x) else 0
                   for x in vals], dtype=np.int64)
    hi = np.array([int((v <= x).sum())
                   if x is not None and np.isfinite(x) else 0
                   for x in vals], dtype=np.int64)
    return lo, hi, int(len(v))


def _rank_within(q: float, value, lo: int, hi: int, n: int,
                 tol: float) -> bool:
    """True iff the requested q falls in the widened true-rank interval."""
    if not n or value is None or not np.isfinite(value):
        return False
    return lo / n - tol <= q <= hi / n + tol


def _norm_key(k):
    """Null-safe group key: pandas NaN/NA group labels → None (Arrow
    null), everything else → str (the output group column is STRING —
    the engine's normalized-view convention, and the only way every
    exchange bucket emits one stable Arrow schema)."""
    import pandas as pd
    return None if pd.isna(k) else str(k)


def group_approx_quantiles(ds: "rd.Dataset", group_col: str, col: str,
                           qs: list[float],
                           max_centroids: int = 200) -> "rd.Dataset":
    """Per-group approximate quantiles via merging t-digests — the group
    analogue of ``approx_quantiles`` for continuous per-group
    distributions (e.g. latency percentiles per role) whose groups are
    too many or too heavy for ``exact_quantiles``\' value-counts fold.

    Scale shape: each batch folds into ONE digest row per (group ∩
    batch); only (group, ~max_centroids-float digest) rows enter the
    hash-bucket exchange, never the raw values.  Returns a Dataset with
    one row per (group, q): ``(group_col:string, q, value)``.  The group
    universe is groups with ≥1 FINITE value (a group of only
    null/NaN/inf values has no quantiles and emits no rows); a null
    group label is kept as an Arrow null."""
    import pandas as pd

    from ..state.sketches import TDigest
    from .common import grouped_map

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, col]).to_pandas()
        vals = pd.to_numeric(df[col], errors="coerce").to_numpy(np.float64)
        df = df[np.isfinite(vals)]
        groups, digests = [], []
        for k, sub in df.groupby(group_col, sort=False, dropna=False):
            td = TDigest(max_centroids)
            td.update(sub[col].to_numpy(dtype=np.float64))
            groups.append(_norm_key(k))
            digests.append(td.to_bytes())
        return pa.table({group_col: pa.array(groups, type=pa.string()),
                         "digest": pa.array(digests, type=pa.binary())})

    partials = ds.select_columns([group_col, col]).map_batches(
        _partial, batch_format="pyarrow")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, sub in df.groupby(group_col, sort=False, dropna=False):
            td = TDigest(max_centroids)
            for b in sub["digest"]:
                td.merge(TDigest.from_bytes(b))
            for q in qs:
                rows.append((_norm_key(k), float(q), td.quantile(q)))
        # explicit columns + dtypes so EMPTY buckets emit the same Arrow
        # schema as populated ones (string, double, double)
        out = pd.DataFrame(rows, columns=[group_col, "q", "value"])
        out[group_col] = out[group_col].astype("string")
        out["q"] = out["q"].astype("float64")
        out["value"] = out["value"].astype("float64")
        return out

    return grouped_map(partials, [group_col], _merge)


def group_quantile_rank_check(ds: "rd.Dataset", group_col: str, col: str,
                              qs: list[float], max_centroids: int = 200,
                              tol: float | None = None) -> pa.Table:
    """Tolerance-checked verdict for ``group_approx_quantiles``: the
    (small, groups × qs) answer table is collected, then ONE distributed
    pass exactly counts each group\'s values below / at-or-below its
    answers, and the requested q must fall in the widened true-rank
    interval.  Bounded by group cardinality × len(qs) on the driver —
    use with grouping columns of bounded cardinality (enum-like).
    Group universe and key normalization follow
    ``group_approx_quantiles`` (≥1 finite value; string keys)."""
    import pandas as pd

    tol = tol if tol is not None else 3.0 / max_centroids
    approx = group_approx_quantiles(ds, group_col, col, qs,
                                    max_centroids).to_pandas()
    per_group: dict = {}
    for k, sub in approx.groupby(group_col, sort=False, dropna=False):
        per_group[_norm_key(k)] = np.asarray(
            sub.sort_values("q")["value"], dtype=float)
    narrow = ds.select_columns([group_col, col])
    qs_sorted = sorted(float(q) for q in qs)

    def _counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for k, sub in df.groupby(group_col, sort=False, dropna=False):
            key = _norm_key(k)
            vals = per_group.get(key)
            if vals is None:
                continue
            v = pd.to_numeric(sub[col], errors="coerce") \
                .to_numpy(np.float64)
            lo, hi, n = _rank_counts(v, vals)
            rows.append({group_col: key, "lo": lo.tolist(),
                         "hi": hi.tolist(), "n": n})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            (group_col, pa.string()),
            ("lo", pa.list_(pa.int64())), ("hi", pa.list_(pa.int64())),
            ("n", pa.int64())]))

    acc: dict = {}
    for b in narrow.map_batches(_counts, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            k = row[group_col]
            lo, hi, n = acc.setdefault(
                k, [np.zeros(len(qs_sorted), np.int64),
                    np.zeros(len(qs_sorted), np.int64), 0])
            lo += np.asarray(row["lo"], np.int64)
            hi += np.asarray(row["hi"], np.int64)
            acc[k][2] = n + row["n"]
    out_g, out_q, out_ok = [], [], []
    for k in sorted(per_group, key=lambda x: (x is None, x)):
        vals = per_group[k]
        lo, hi, n = acc.get(k, [np.zeros(len(qs_sorted), np.int64),
                                np.zeros(len(qs_sorted), np.int64), 0])
        for q, v, l, h in zip(qs_sorted, vals, lo, hi):
            out_g.append(k)
            out_q.append(q)
            out_ok.append(_rank_within(q, v, int(l), int(h), n, tol))
    return pa.table({group_col: pa.array(out_g, type=pa.string()),
                     "q": pa.array(out_q, type=pa.float64()),
                     "within_tol": pa.array(out_ok, type=pa.bool_())})


def quantile_rank_check(ds: "rd.Dataset", col: str, qs: list[float],
                        max_centroids: int = 200,
                        tol: float | None = None) -> pa.Table:
    """Tolerance-checked verdict for ``approx_quantiles``: for each q,
    re-derive the TRUE rank fraction of the digest's answer by an exact
    distributed count (rows strictly below / at-or-below the value — one
    extra narrow pass, no digest involved) and assert the requested q
    falls inside that interval widened by ``tol``.  Output (q, within_tol)
    is hash-comparable against a constant-TRUE oracle because within_tol
    is a data-derived exact statement, not a digest self-report."""
    tol = tol if tol is not None else 3.0 / max_centroids
    approx = approx_quantiles(ds, col, qs, max_centroids)
    vals = approx.column("value").to_pylist()
    narrow = ds.select_columns([col])

    def _counts(batch: pa.Table) -> pa.Table:
        arr = pc.drop_null(batch.column(col)).cast(pa.float64())
        v = arr.to_numpy(zero_copy_only=False)
        lo, hi, n = _rank_counts(v, vals)
        return pa.table({
            "lo": pa.array([lo.tolist()], type=pa.list_(pa.int64())),
            "hi": pa.array([hi.tolist()], type=pa.list_(pa.int64())),
            "n": pa.array([n], type=pa.int64()),
        })

    lo = np.zeros(len(vals), dtype=np.int64)
    hi = np.zeros(len(vals), dtype=np.int64)
    n = 0
    for b in narrow.map_batches(_counts, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            lo += np.asarray(row["lo"], dtype=np.int64)
            hi += np.asarray(row["hi"], dtype=np.int64)
            n += row["n"]
    ok = [_rank_within(q, v, int(l), int(h), n, tol)
          for q, l, h, v in zip(approx.column("q").to_pylist(),
                                lo, hi, vals)]
    return pa.table({"q": approx.column("q"),
                     "within_tol": pa.array(ok, type=pa.bool_())})
