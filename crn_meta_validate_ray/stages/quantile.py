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

import ray.data as rd
from ray.data.aggregate import Count


def exact_quantiles(ds: "rd.Dataset", col: str,
                    qs: list[float]) -> pa.Table:
    """Discrete quantiles of ``col`` (quantile_disc semantics): returns an
    Arrow table (q, value) with one row per requested quantile."""
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
