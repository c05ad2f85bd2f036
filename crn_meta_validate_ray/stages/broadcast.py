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
    """Ray task: concat dimension blocks → (sorted keys, carry arrays).
    An empty dimension still yields typed empty carry arrays (misses then
    resolve to nulls); a duplicate dimension key raises — this is a
    LOOKUP join, one carry row per key, and silently picking one of
    several matches would diverge from SQL join semantics."""
    from crn_meta_validate_ray.stages.common import as_i64

    t = pa.concat_tables(list(tbls)) if tbls else None
    if t is None or t.num_rows == 0:
        empty = {c: (t[c].combine_chunks()
                     if t is not None and isinstance(t[c], pa.ChunkedArray)
                     else (t[c] if t is not None
                           else pa.array([], type=pa.null())))
                 for c in carry_cols}
        return np.empty(0, dtype=np.int64), empty
    keys = np.asarray(as_i64(t, key_col))
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    if len(keys) > 1 and bool((keys[1:] == keys[:-1]).any()):
        dup = int(keys[1:][keys[1:] == keys[:-1]][0])
        raise ValueError(
            f"broadcast_lookup_join: dimension key {key_col!r} is not "
            f"unique (e.g. {dup}); a lookup join needs one carry row per "
            "key — deduplicate the dimension first")
    sorted_t = t.take(pa.array(order))
    carries = {c: sorted_t[c].combine_chunks()
               if isinstance(sorted_t[c], pa.ChunkedArray) else sorted_t[c]
               for c in carry_cols}
    return keys, carries


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
    """LOOKUP (left-equi) join of ``ds`` to the small ``dim`` on
    ``left_key = right_key``, appending ``carry_cols`` (null where
    unmatched).  The dimension key must be unique — one carry row per key
    (duplicates raise in the build task); use a shuffle join when a key
    legitimately matches several dimension rows.  The dim is shipped once
    via the object store; the fact side streams map-only.

    Runs as stateless tasks by default — ``ray.get`` of the dim inside a
    task is a zero-copy shared-memory read after the first touch per node,
    so an actor pool would only add spin-up latency.  Pass a
    ``concurrency`` tuple to use an actor pool anyway (e.g. when composing
    with stages that need one)."""
    from ray.data.dataset import MaterializedDataset

    cols = [right_key] + carry_cols
    if isinstance(dim, MaterializedDataset) and \
            [f.name for f in (getattr(dim.schema(), "base_schema", None)
                              or [])] == cols:
        # already the exact narrow projection (e.g. from lookup_join_auto's
        # gate) — a second select+materialize would copy the dim again
        mat = dim
    else:
        mat = dim.select_columns(cols).materialize()
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


BROADCAST_MAX_DIM_ROWS = 5_000_000
BROADCAST_MAX_DIM_BYTES = 256 * 1024 * 1024  # keys + carries per worker heap


def _arrow_field_type(ds: "rd.Dataset", name: str):
    try:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema) and name in base.names:
            return base.field(name).type
    except Exception:
        pass
    return None


def lookup_join_auto(
    ds: "rd.Dataset",
    dim: "rd.Dataset",
    *,
    left_key: str,
    right_key: str,
    carry_cols: list[str],
    broadcast_max_rows: int = BROADCAST_MAX_DIM_ROWS,
    broadcast_max_bytes: int = BROADCAST_MAX_DIM_BYTES,
) -> "rd.Dataset":
    """Dimension enrichment with a size-gated strategy: broadcast lookup
    (map-only, zero fact-side shuffle) while the dim fits the object-store
    budget, else the large-large shuffle hash join — the broadcast
    assumption must NEVER be implicit at 100-TB scale, where a "dimension"
    like customers can be billions of rows.

    Semantics are IDENTICAL on both paths — this is a LOOKUP join, one
    carry row per key: the broadcast build raises on duplicate dim keys
    and the shuffle path enforces the same contract per bucket
    (``validate_unique_right``).  Eligibility for the broadcast path is
    rows AND bytes (the budget is a worker heap, not a row count) AND
    integer join keys on both sides (the sorted-array lookup is int64);
    any other key type takes the shuffle path at every size, so results
    never depend on which side of the gate the data lands."""
    narrow = dim.select_columns([right_key] + carry_cols).materialize()
    kt_dim = _arrow_field_type(narrow, right_key)
    kt_fact = _arrow_field_type(ds, left_key)
    int_keys = (kt_dim is not None and pa.types.is_integer(kt_dim)
                and kt_fact is not None and pa.types.is_integer(kt_fact))
    # count()/size_bytes() are metadata reads on the materialized dim —
    # no second execution of the dim plan
    if (int_keys and narrow.count() <= broadcast_max_rows
            and narrow.size_bytes() <= broadcast_max_bytes):
        return broadcast_lookup_join(ds, narrow, left_key=left_key,
                                     right_key=right_key,
                                     carry_cols=carry_cols)
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    return hash_join(ds, narrow, left_on=left_key, right_on=right_key,
                     how="left", validate_unique_right=True)
