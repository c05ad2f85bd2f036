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
                                                 pd_to_arrow,
                                                 resolve_num_buckets,
                                                 split_exchange)

_HOW = ("inner", "left", "outer", "semi", "anti")


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
                 empty_left, empty_right, out_schema, salted,
                 unique_right, *parts) -> pa.Table:
    """Reduce task: gather this bucket's left/right parts and join."""
    parts = flatten_parts(parts)
    lparts = [p for p in parts[:n_left] if p is not None and p.num_rows]
    rparts = [p for p in parts[n_left:] if p is not None and p.num_rows]
    lt = pa.concat_tables(lparts) if lparts else empty_left
    rt = pa.concat_tables(rparts) if rparts else empty_right
    ldf = lt.to_pandas()
    rdf = rt.to_pandas()
    if unique_right and not salted:
        # lookup contract: one right row per key.  Equal keys always land
        # in the same bucket, so the check is bucket-local and free of any
        # extra exchange.
        nn = rdf[rdf[right_on].notna()]
        dup = nn[right_on][nn[right_on].duplicated()]
        if len(dup):
            raise ValueError(
                f"hash_join: right key {right_on!r} is not unique "
                f"(e.g. {dup.iloc[0]!r}) but validate_unique_right was "
                "requested — deduplicate the right side first")
    # SQL NULL-key semantics: a null never equi-matches (pandas would
    # match NaN == NaN); right nulls can never produce a match, and for
    # inner joins neither can left nulls.  Left nulls stay for left/anti
    # (unmatched) and drop out of semi via non-membership.  FULL OUTER
    # keeps right null-key rows as unmatched — peel them off before the
    # merge and append them after.
    rnull = rdf[rdf[right_on].isna()] if how == "outer" else None
    rdf = rdf[rdf[right_on].notna()]
    keys_l = [left_on, "__salt"] if salted else [left_on]
    if salted:
        # a bucket can hold several salts of one key (hash collisions);
        # joining on the bare key would then match each right replica —
        # the salt must stay part of the join predicate
        rdf = rdf.rename(columns={"__salt": "__salt_r"})
    keys_r = [right_on, "__salt_r"] if salted else [right_on]
    if how in ("semi", "anti"):
        if salted:
            probe = ldf.merge(rdf[keys_r].drop_duplicates(), how="left",
                              left_on=keys_l, right_on=keys_r,
                              indicator=True)
            mask = (probe["_merge"] == "both").to_numpy()
        else:
            mask = ldf[left_on].isin(rdf[right_on].unique()).to_numpy()
        out = ldf[mask] if how == "semi" else ldf[~mask]
    else:
        if how == "inner":
            ldf = ldf[ldf[left_on].notna()]
        out = ldf.merge(rdf, how=how, left_on=keys_l, right_on=keys_r,
                        suffixes=("", suffix))
        # the right KEY column survives the merge when the names differ;
        # if the left side also carries a data column named ``right_on``,
        # pandas suffixed the right key instead — resolve the actual name
        # so we never coalesce from / drop an unrelated left column
        rkey_col = None
        if right_on != left_on:
            rkey_col = (right_on + suffix if right_on in ldf.columns
                        else right_on)
        if how == "outer" and rkey_col is not None \
                and rkey_col in out.columns:
            # USING-style coalesced key for right-only rows
            out[left_on] = out[left_on].where(out[left_on].notna(),
                                              out[rkey_col])
        if rkey_col is not None and rkey_col in out.columns:
            out = out.drop(columns=[rkey_col])
        if rnull is not None and len(rnull):
            # right rows with NULL keys: unmatched in SQL FULL OUTER; the
            # coalesced key stays NULL.  Map right column names through
            # the same suffix rule the merge used.
            lnames = set(ldf.columns)
            ext = pd.DataFrame({
                (c + suffix if c in lnames else c): rnull[c].to_numpy()
                for c in rnull.columns if c != right_on})
            out = pd.concat([out, ext.reindex(columns=out.columns)],
                            ignore_index=True)
    salt_cols = [c for c in ("__salt", "__salt_r") if c in out.columns]
    if salt_cols:
        out = out.drop(columns=salt_cols)
    if post is not None:
        out = post(out)
        if isinstance(out, pa.Table):
            return out
        return pd_to_arrow(out)
    if out_schema is not None:
        # pin every bucket to one schema: unmatched left rows promote
        # right ints to float64-with-NaN in pandas; casting back restores
        # int64-with-null and keeps empty buckets from inferring null types
        for f in out_schema:
            # a null-typed field means the SOURCE column was all-null
            # (arrow infers `null` for it) — every joined value is null
            # too, but pandas extension dtypes can't cast to arrow null;
            # force plain all-None objects
            if pa.types.is_null(f.type) and f.name in out.columns:
                out[f.name] = pd.Series([None] * len(out), dtype=object)
        return pd_to_arrow(out, schema=out_schema)
    return pd_to_arrow(out)


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
    salt: int | None = None,
    validate_unique_right: bool = False,
) -> "rd.Dataset":
    """Distributed equi-join of two Datasets on a hashed key exchange.

    ``how``: 'inner' | 'left' | 'outer' | 'semi' | 'anti' (semi/anti
    return left rows filtered by key membership on the right — no right
    columns; 'outer' is a FULL OUTER join with a USING-style coalesced
    key in ``left_on`` and no ``salt`` support).
    ``post(df) -> df | pa.Table`` runs inside each bucket task on the
    joined frame (use it to partial-aggregate before the rows ship).
    Callers should ``select_columns`` both sides first — every shipped
    column crosses the exchange.

    ``salt=s`` spreads HOT LEFT KEYS over ``s`` sub-buckets: each left
    row gets a round-robin salt, the right side is replicated ``s``×
    (one copy per salt value), and the exchange hashes (key, salt) —
    a single dominant key then occupies ``s`` reduce tasks instead of
    one.  Every left row still joins exactly one right copy, so results
    are identical for all ``how`` modes; the price is ``s``× right-side
    shuffle bytes (salt a join only when the right side is the smaller
    one).

    ``validate_unique_right=True`` enforces the LOOKUP contract (one
    right row per non-null key) inside each bucket and raises on a
    duplicate — use it when a silent fan-out would corrupt downstream
    aggregates.  Ignored for salted joins (the right side is replicated
    by construction)."""
    import ray

    if how not in _HOW:
        raise ValueError(f"how must be one of {_HOW}")
    right_on = right_on or left_on
    num_buckets = resolve_num_buckets(num_buckets)

    join_keys_l, join_keys_r = [left_on], [right_on]
    if salt and salt > 1 and how == "outer":
        # replicated right rows would each emit an unmatched copy
        raise ValueError("salt is not supported for how='outer'")
    if salt and salt > 1:
        s = int(salt)

        def _salt_left(t: pa.Table) -> pa.Table:
            v = np.arange(t.num_rows, dtype=np.int64) % s
            return t.append_column("__salt", pa.array(v))

        def _replicate_right(t: pa.Table) -> pa.Table:
            n = t.num_rows
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), s))
            rep = t.take(idx)
            sv = pa.array(np.repeat(np.arange(s, dtype=np.int64), n))
            return rep.append_column("__salt", sv)

        left = left.map_batches(_salt_left, batch_format="pyarrow",
                                zero_copy_batch=True)
        right = right.map_batches(_replicate_right, batch_format="pyarrow",
                                  zero_copy_batch=True)
        join_keys_l = [left_on, "__salt"]
        join_keys_r = [right_on, "__salt"]

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
        # skip zero-schema empty blocks (map_batches skips empty inputs
        # and emits schema-less blocks; ref order is nondeterministic)
        for r in refs[:64]:
            s = ray.get(r).schema
            if s.names:
                return s
        return pa.schema([])

    salted = len(join_keys_l) > 1
    lschema_full = _arrow_schema(left, lrefs)
    rschema_full = _arrow_schema(right, rrefs)
    if right_on not in rschema_full.names:
        key_type = lschema_full.field(left_on).type \
            if left_on in lschema_full.names else pa.string()
        fields = [pa.field(right_on, key_type)]
        if salted:
            fields.append(pa.field("__salt", pa.int64()))
        rschema_full = pa.schema(fields)
    if not lschema_full.names:
        # fully-empty left side (all blocks schema-less): synthesize the
        # key so bucket tasks never index a missing column.  A non-empty
        # left that merely lacks left_on must still fail loudly.
        key_type = rschema_full.field(right_on).type \
            if right_on in rschema_full.names else pa.string()
        fields = [pa.field(left_on, key_type)]
        if salted:
            fields.append(pa.field("__salt", pa.int64()))
        lschema_full = pa.schema(fields)
    # empty exemplars keep the (possibly salted) exchange schema; the
    # OUTPUT schema is always salt-free
    empty_left = lschema_full.empty_table()
    empty_right = rschema_full.empty_table()

    def _saltless(schema: pa.Schema) -> pa.Schema:
        return pa.schema([f for f in schema if f.name != "__salt"])

    out_schema = None
    if how in ("semi", "anti"):
        out_schema = _saltless(lschema_full)
    elif post is None:
        out_schema = _join_schema(_saltless(lschema_full),
                                  _saltless(rschema_full), right_on, suffix)
        if how == "outer" and left_on in out_schema.names:
            # the outer key column is COALESCED (left, right): if the left
            # key is null-typed (all-null source), the right key's type
            # governs — otherwise right-only rows lose their key values
            lt = out_schema.field(left_on).type
            if pa.types.is_null(lt) and right_on in rschema_full.names:
                out_schema = out_schema.set(
                    out_schema.get_field_index(left_on),
                    pa.field(left_on, rschema_full.field(right_on).type))
    el_ref, er_ref = ray.put(empty_left), ray.put(empty_right)

    lsplit = split_exchange(split_task, lrefs, join_keys_l, num_buckets)
    rsplit = split_exchange(split_task, rrefs, join_keys_r, num_buckets)
    out_refs = [
        join_task.remote(left_on, right_on, how, suffix, post, len(lsplit),
                         el_ref, er_ref, out_schema, salted,
                         validate_unique_right,
                         *[s[b] for s in lsplit], *[s[b] for s in rsplit])
        for b in range(num_buckets)
    ]
    return rd.from_arrow_refs(out_refs)
