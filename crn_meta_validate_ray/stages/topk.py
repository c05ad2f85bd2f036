"""Grouped top-k: the k best rows per key WITHOUT a global sort.

``Dataset.sort`` is an all-to-all range shuffle of every row; top-k per
group needs none of that:

1. per-batch combiner: each batch keeps at most k rows per key it sees
   (vectorized pandas sort + ``groupby.head``) — the surviving stream is
   ≤ k × keys-per-batch rows;
2. one hash-bucket exchange co-locates the survivors by key and takes the
   final k with a deterministic tie-break, assigning dense ranks 0..k-1.

The per-batch prune is what makes this scale: with B batches the exchange
moves at most ``k × keys × min(B, batches-touching-key)`` narrow rows,
independent of row count per key (a hot key's rows collapse to k per
batch map-side, the same shape as a combiner-backed aggregation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.common import grouped_map, pd_to_arrow


def grouped_topk(
    ds: "rd.Dataset",
    *,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
    rank_col: str = "rk",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Top ``k`` rows per ``keys`` group ordered by ``order_col`` (ties
    broken ascending by ``tiebreak_col`` for determinism), with a dense
    0-based ``rank_col`` appended.  Only ≤k rows per (key, batch) survive
    the map side; the exchange never sees the full table."""
    sort_cols = keys + [order_col] + ([tiebreak_col] if tiebreak_col else [])
    ascending = [True] * len(keys) + [not descending] \
        + ([True] if tiebreak_col else [])

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(sort_cols, ascending=ascending,
                                       kind="stable")
        # dropna=False: a null key is a group of its own (SQL PARTITION BY
        # semantics), not silently discarded
        return pd_to_arrow(df.groupby(keys, sort=False, dropna=False).head(k))

    survivors = ds.map_batches(prune, batch_format="pyarrow",
                               zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable")
        out = df.groupby(keys, sort=False, dropna=False).head(k).copy()
        out[rank_col] = out.groupby(keys, sort=False, dropna=False) \
            .cumcount().astype(np.int64)
        return out

    return grouped_map(survivors, keys, final, num_buckets=num_buckets)
