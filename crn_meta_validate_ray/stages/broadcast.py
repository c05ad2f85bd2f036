"""Broadcast (map-side) dimension join — the scale answer to enriching a
huge fact table with small-dimension attributes without a shuffle.

The dimension is folded into sorted lookup arrays by a Ray task (the
arrays live in the object store, never on the driver — same pattern as
``similarity._build_ref_matrix``), ``ray.put`` once, and every fact batch
resolves its keys with one ``np.searchsorted`` + ``take``.  Chaining two
``broadcast_lookup_join`` stages walks a snowflake (fact → dim → subdim)
with zero exchanges; the wide fact table itself never moves.

Contract: the dimension must fit a worker's heap (keys + carried columns);
that is the definition of a broadcast join — use a shuffle join (or the
refcheck shuffle mode's pattern) when it does not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _build_dim(key_col: str, carry_cols: list[str], *tbls: pa.Table):
    """Ray task: concat dimension blocks → (sorted keys, carry arrays)."""
    good = [t for t in tbls if t.num_rows]
    if not good:
        return np.empty(0, dtype=np.int64), {}
    t = pa.concat_tables(good)
    keys = np.asarray(pc.cast(t[key_col], pa.int64()).combine_chunks()
                      if isinstance(t[key_col], pa.ChunkedArray)
                      else pc.cast(t[key_col], pa.int64()))
    order = np.argsort(keys, kind="stable")
    sorted_t = t.take(pa.array(order))
    carries = {c: sorted_t[c].combine_chunks()
               if isinstance(sorted_t[c], pa.ChunkedArray) else sorted_t[c]
               for c in carry_cols}
    return keys[order], carries


class _LookupStage:
    """Actor-pool stage: fetch the broadcast dim once per actor, then one
    searchsorted + take per batch.  Unmatched keys yield nulls."""

    def __init__(self, dim_ref, left_key: str, carry_cols: list[str]):
        res = dim_ref if isinstance(dim_ref, tuple) else ray.get(dim_ref)
        self.keys, self.carries = res
        self.left_key = left_key
        self.carry_cols = carry_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        lk = np.asarray(pc.cast(batch[self.left_key],
                                pa.int64()).combine_chunks()
                        if isinstance(batch[self.left_key], pa.ChunkedArray)
                        else pc.cast(batch[self.left_key], pa.int64()))
        if len(self.keys):
            pos = np.searchsorted(self.keys, lk)
            pos_c = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos_c] == lk
        else:
            pos_c = np.zeros(len(lk), dtype=np.int64)
            hit = np.zeros(len(lk), dtype=bool)
        out = batch
        # gather with a null slot: append one null to the carry array and
        # route misses to it (vectorized, no per-row branching)
        take_idx = pa.array(np.where(hit, pos_c, len(self.keys)),
                            type=pa.int64())
        for c in self.carry_cols:
            arr = self.carries[c]
            padded = pa.concat_arrays(
                [arr, pa.array([None], type=arr.type)])
            out = out.append_column(c, padded.take(take_idx))
        return out


def broadcast_lookup_join(
    ds: "rd.Dataset",
    dim: "rd.Dataset",
    *,
    left_key: str,
    right_key: str,
    carry_cols: list[str],
    concurrency=None,
) -> "rd.Dataset":
    """Left join ``ds`` to the small ``dim`` on ``left_key = right_key``,
    appending ``carry_cols`` (null where unmatched).  The dim is shipped
    once via the object store; the fact side streams map-only.

    Runs as stateless tasks by default — ``ray.get`` of the dim inside a
    task is a zero-copy shared-memory read after the first touch per node,
    so an actor pool would only add spin-up latency.  Pass a
    ``concurrency`` tuple to use an actor pool anyway (e.g. when composing
    with stages that need one)."""
    mat = dim.select_columns([right_key] + carry_cols).materialize()
    refs = mat.to_arrow_refs()
    build = ray.remote(_build_dim)
    dim_ref = build.remote(right_key, carry_cols, *refs)
    if concurrency is not None:
        return ds.map_batches(
            _LookupStage, fn_constructor_args=(dim_ref, left_key, carry_cols),
            batch_format="pyarrow", concurrency=concurrency,
            zero_copy_batch=True)

    def lookup(batch: pa.Table) -> pa.Table:
        return _LookupStage(dim_ref, left_key, carry_cols)(batch)

    return ds.map_batches(lookup, batch_format="pyarrow",
                          zero_copy_batch=True)
