"""Large-large shuffle hash join.

When BOTH sides of an equi-join are too big to broadcast
(stages/broadcast.broadcast_lookup_join covers the small-side case), the
only scale-correct shape is a co-partitioned exchange: hash both sides on
the join key with the SAME bucket function, gather each bucket's left and
right parts onto one task, and join locally.  This reuses the core
exchange of stages/common (argsort+slice map side, per-bucket gather) with
a two-sided reduce: pandas ``merge`` inside the bucket — C-speed, one
Python call per bucket.

``post`` fuses a local transform (typically a partial aggregation) into
the reduce task so wide joined rows never re-enter the object store — the
classic "co-partitioned join + local agg" plan.  A reference engine would
express this as JOIN ... GROUP BY; here the caller finishes with a tiny
``groupby`` over the per-bucket partials.

Scale notes: bucket count must be sized so ONE bucket of both sides fits
a worker heap (see common.resolve_num_buckets); skewed join keys should be
pre-salted by the caller (replicate the small side per salt) — this stage
asserts nothing about skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.common import (DEFAULT_NUM_BUCKETS,
                                                 _split_block,
                                                 resolve_num_buckets)

_HOW = ("inner", "left", "semi", "anti")


def _join_bucket(left_on, right_on, how, suffix, post, n_left,
                 empty_left, empty_right, *parts) -> pa.Table:
    """Reduce task: gather this bucket's left/right parts and join."""
    lparts = [p for p in parts[:n_left] if p is not None and p.num_rows]
    rparts = [p for p in parts[n_left:] if p is not None and p.num_rows]
    lt = pa.concat_tables(lparts) if lparts else empty_left
    rt = pa.concat_tables(rparts) if rparts else empty_right
    ldf = lt.to_pandas()
    rdf = rt.to_pandas()
    if how in ("semi", "anti"):
        mask = ldf[left_on].isin(rdf[right_on].unique())
        out = ldf[mask] if how == "semi" else ldf[~mask]
    else:
        out = ldf.merge(rdf, how=how, left_on=left_on, right_on=right_on,
                        suffixes=("", suffix))
        if right_on != left_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
    if post is not None:
        out = post(out)
    if isinstance(out, pa.Table):
        return out
    return pa.Table.from_pandas(out, preserve_index=False)


def hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int | None = DEFAULT_NUM_BUCKETS,
    suffix: str = "_r",
    post=None,
) -> "rd.Dataset":
    """Distributed equi-join of two Datasets on a hashed key exchange.

    ``how``: 'inner' | 'left' | 'semi' | 'anti' (semi/anti return left
    rows filtered by key membership on the right — no right columns).
    ``post(df) -> df | pa.Table`` runs inside each bucket task on the
    joined frame (use it to partial-aggregate before the rows ship).
    Callers should ``select_columns`` both sides first — every shipped
    column crosses the exchange."""
    import ray

    if how not in _HOW:
        raise ValueError(f"how must be one of {_HOW}")
    right_on = right_on or left_on
    num_buckets = resolve_num_buckets(num_buckets)

    split_task = ray.remote(num_returns=num_buckets)(_split_block)
    join_task = ray.remote(_join_bucket)

    lrefs = left.to_arrow_refs()
    rrefs = right.to_arrow_refs()
    if not lrefs:
        return rd.from_arrow(pa.table({}))

    def _empty(refs, key):
        for r in refs[:16]:
            t = ray.get(r)
            if key in t.column_names:
                return t.slice(0, 0)
        return ray.get(refs[0]).slice(0, 0) if refs else pa.table({})

    empty_left = _empty(lrefs, left_on)
    empty_right = _empty(rrefs, right_on)
    if right_on not in empty_right.column_names:
        # no right blocks at all: synthesize a key-only empty frame
        empty_right = pa.table({right_on: pa.array([], empty_left[
            left_on].type if left_on in empty_left.column_names
            else pa.string())})
    el_ref, er_ref = ray.put(empty_left), ray.put(empty_right)

    def _split(refs, key):
        if not refs:
            return []
        n_split = max(1, min(len(refs), num_buckets))
        chunk = -(-len(refs) // n_split)
        chunks = [refs[i:i + chunk] for i in range(0, len(refs), chunk)]
        per = [split_task.remote([key], num_buckets, *c) for c in chunks]
        if num_buckets == 1:
            per = [[r] for r in per]
        return per

    lsplit = _split(lrefs, left_on)
    rsplit = _split(rrefs, right_on)
    out_refs = [
        join_task.remote(left_on, right_on, how, suffix, post, len(lsplit),
                         el_ref, er_ref,
                         *[s[b] for s in lsplit], *[s[b] for s in rsplit])
        for b in range(num_buckets)
    ]
    return rd.from_arrow_refs(out_refs)
