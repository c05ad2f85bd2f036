"""As-of join — a custom operator Ray Data lacks (SURVEY §2 "custom
operators": as-of / range joins composed from co-location + per-bucket
``pd.merge_asof``).

Semantics: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (backward as-of).  Partitioning
assumption (documented per the build mandate): both sides are hash-bucketed
on the join key via a padded tagged union, so every key's rows from both
sides land in one bucket; within the bucket a single sorted
``pd.merge_asof(by=key)`` computes the join vectorized.  Skew note: a hot
key concentrates in one bucket — at scale, salt the *left* side by a
time-range bucket and replicate the small right-side slice per salt range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crn_meta_validate_ray.stages.common import grouped_map


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_r",
) -> "rd.Dataset":
    """Backward as-of join of two Datasets on (key, ts).  Output columns:
    all left columns plus ``right_ts``/``right_value_cols`` (suffixed when
    they collide with a left column name)."""
    left_cols = list(left.schema().names)
    r_sel = sorted({right_ts, *right_value_cols})
    rename = {c: (f"{c}{suffix}" if c in set(left_cols) else c)
              for c in r_sel}
    r_out = [rename[c] for c in r_sel]
    r_ts_out = rename[right_ts]

    # padded tagged union: one shared schema, missing side columns null
    def l_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__key": pc.cast(t[left_key], pa.string()),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in left_cols:
            cols[c] = t[c]
        for c in r_sel:
            cols[rename[c]] = pa.nulls(n, _r_types[c])
        return pa.table(cols)

    def r_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__key": pc.cast(t[right_key], pa.string()),
                "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in left_cols:
            cols[c] = pa.nulls(n, _l_types[c])
        for c in r_sel:
            cols[rename[c]] = t[c]
        return pa.table(cols)

    _l_types = {}
    _r_types = {}
    lsch = left.schema()
    rsch = right.schema()
    for c in left_cols:
        _l_types[c] = lsch.base_schema.field(c).type \
            if hasattr(lsch, "base_schema") else pa.string()
    for c in r_sel:
        _r_types[c] = rsch.base_schema.field(c).type \
            if hasattr(rsch, "base_schema") else pa.string()

    lt = left.map_batches(l_tag, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.select_columns(sorted({right_key, *r_sel})).map_batches(
        r_tag, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][["__key"] + left_cols]
        r = df[df["__side"] == 1][["__key"] + r_out]
        if not len(l):
            return pd.DataFrame(columns=left_cols + r_out)
        # align timestamp resolutions (Arrow round-trips can differ in unit)
        l = l.assign(**{left_ts: l[left_ts].astype("datetime64[us]")})
        r = r.assign(**{r_ts_out: r[r_ts_out].astype("datetime64[us]")})
        l = l.sort_values(left_ts, kind="stable")
        r = r.sort_values(r_ts_out, kind="stable")
        merged = pd.merge_asof(l, r, left_on=left_ts, right_on=r_ts_out,
                               by="__key", direction="backward")
        return merged.drop(columns=["__key"])

    return grouped_map(both, ["__key"], bucket)
