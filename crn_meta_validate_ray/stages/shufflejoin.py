"""Large-large shuffle hash join.

When BOTH sides of an equi-join are too big to broadcast
(stages/broadcast.broadcast_lookup_join covers the small-side case), the
only scale-correct shape is a co-partitioned exchange: hash both sides on
the join key with the SAME bucket function, gather each bucket's left and
right parts onto one task, and join locally.  This reuses the core
exchange of stages/common (argsort+slice map side, coalesced split chunks,
per-bucket gather) with a two-sided reduce: pandas ``merge`` inside the
bucket — C-speed, one Python call per bucket.

Semantics follow SQL equi-joins, not raw pandas: NULL keys never match
(right-side null keys are dropped; left-side null keys are dropped for
``inner``, kept-with-null-right for ``left``, kept for ``anti``, excluded
for ``semi``).  For ``inner``/``left`` without ``post``, every bucket's
output is cast to one explicit schema (left fields + right carry fields,
collisions suffixed) so partially-matched buckets cannot drift to
float64/null types.

``post`` fuses a local transform (typically a partial aggregation) into
the reduce task so wide joined rows never re-enter the object store — the
classic "co-partitioned join + local agg" plan; the caller finishes with a
tiny ``groupby`` over the per-bucket partials.

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
                                                 flatten_parts,
                                                 resolve_num_buckets,
                                                 split_exchange)

_HOW = ("inner", "left", "semi", "anti")


def _join_schema(left_schema: pa.Schema, right_schema: pa.Schema,
                 right_on: str, suffix: str) -> pa.Schema:
    """Explicit output schema for inner/left joins: left fields, then
    right fields minus the join key, collisions renamed with ``suffix``."""
    fields = list(left_schema)
    names = set(left_schema.names)
    for f in right_schema:
        if f.name == right_on:
            continue
        name = f.name + suffix if f.name in names else f.name
        fields.append(pa.field(name, f.type))
    return pa.schema(fields)


def _join_bucket(left_on, right_on, how, suffix, post, n_left,
                 empty_left, empty_right, out_schema, *parts) -> pa.Table:
    """Reduce task: gather this bucket's left/right parts and join."""
    parts = flatten_parts(parts)
    lparts = [p for p in parts[:n_left] if p is not None and p.num_rows]
    rparts = [p for p in parts[n_left:] if p is not None and p.num_rows]
    lt = pa.concat_tables(lparts) if lparts else empty_left
    rt = pa.concat_tables(rparts) if rparts else empty_right
    ldf = lt.to_pandas()
    rdf = rt.to_pandas()
    # SQL NULL-key semantics: a null never equi-matches (pandas would
    # match NaN == NaN); right nulls can never produce a match, and for
    # inner joins neither can left nulls.  Left nulls stay for left/anti
    # (unmatched) and drop out of semi via non-membership.
    rdf = rdf[rdf[right_on].notna()]
    if how in ("semi", "anti"):
        mask = ldf[left_on].isin(rdf[right_on].unique())
        out = ldf[mask] if how == "semi" else ldf[~mask]
    else:
        if how == "inner":
            ldf = ldf[ldf[left_on].notna()]
        out = ldf.merge(rdf, how=how, left_on=left_on, right_on=right_on,
                        suffixes=("", suffix))
        if right_on != left_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
    if post is not None:
        out = post(out)
        if isinstance(out, pa.Table):
            return out
        return pa.Table.from_pandas(out, preserve_index=False)
    if out_schema is not None:
        # pin every bucket to one schema: unmatched left rows promote
        # right ints to float64-with-NaN in pandas; casting back restores
        # int64-with-null and keeps empty buckets from inferring null types
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False)
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

    def _arrow_schema(ds, refs):
        # schema() is metadata-only after the to_arrow_refs
        # materialization — no row data crosses to the driver
        try:
            s = ds.schema()
            base = getattr(s, "base_schema", None)
            if isinstance(base, pa.Schema):
                return base
        except Exception:
            pass
        return ray.get(refs[0]).schema if refs else pa.schema([])

    lschema = _arrow_schema(left, lrefs)
    rschema = _arrow_schema(right, rrefs)
    if right_on not in rschema.names:
        key_type = lschema.field(left_on).type \
            if left_on in lschema.names else pa.string()
        rschema = pa.schema([pa.field(right_on, key_type)])
    empty_left = lschema.empty_table()
    empty_right = rschema.empty_table()
    out_schema = None
    if how in ("semi", "anti"):
        out_schema = lschema
    elif post is None:
        out_schema = _join_schema(lschema, rschema, right_on, suffix)
    el_ref, er_ref = ray.put(empty_left), ray.put(empty_right)

    lsplit = split_exchange(split_task, lrefs, [left_on], num_buckets)
    rsplit = split_exchange(split_task, rrefs, [right_on], num_buckets)
    out_refs = [
        join_task.remote(left_on, right_on, how, suffix, post, len(lsplit),
                         el_ref, er_ref, out_schema,
                         *[s[b] for s in lsplit], *[s[b] for s in rsplit])
        for b in range(num_buckets)
    ]
    return rd.from_arrow_refs(out_refs)
