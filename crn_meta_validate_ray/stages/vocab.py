"""Corpus-frequency token filtering (boilerplate / stop-token removal).

The two-phase shape of C4-style boilerplate removal, at token
granularity: tokens that occur in at least ``min_df`` distinct documents
form a corpus-wide stop list; a second map-only pass strips them from
every document, preserving the order and spacing of the surviving
tokens.  (On natural text the same machinery runs at line granularity —
the unit is whatever ``split_sep`` yields.)

Scale shape:
- Phase 1 is the classic combiner: per-batch per-doc-distinct token
  counts, so ONLY (token, partial_count) rows cross the ``groupby``
  exchange — never token instances.  The resulting stop list is
  inherently small (it is the head of the Zipf curve) and is broadcast
  once via ``ray.put``; every filter task reads it zero-copy from the
  object store.
- Phase 2 is embarrassingly parallel and fully vectorized: one Arrow
  ``split_pattern`` per batch, one ``is_in`` membership kernel over the
  flattened token array, list reassembly via offsets + ``binary_join``
  — no per-row Python loop.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def token_document_frequency(ds: "rd.Dataset", *, text_col: str = "text",
                             split_sep: str = " ") -> "rd.Dataset":
    """(token, df) rows: in how many documents each exact split token
    occurs.  Tokens are the literal ``split_sep`` split of the raw text
    (no case folding — the filter phase must see identical tokens)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        lst = pc.split_pattern(txt, split_sep)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        df = pd.DataFrame({
            "p": np.asarray(pc.list_parent_indices(lst)),
            "t": np.asarray(pc.list_flatten(lst)).astype(object),
        }).drop_duplicates()
        vc = df["t"].value_counts()
        return pa.table({
            "token": pa.array(vc.index.to_numpy().astype(str)),
            "df": pa.array(vc.to_numpy().astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = parts.groupby("token").aggregate(Sum("df", alias_name="df"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"token": pc.cast(t["token"], pa.string()),
                         "df": pc.cast(t["df"], pa.int64())})

    return agg.map_batches(cast, batch_format="pyarrow")


def remove_frequent_tokens(ds: "rd.Dataset", *, text_col: str = "text",
                           id_col: str = "doc_id",
                           min_df_frac: float = 0.5,
                           split_sep: str = " ") -> "rd.Dataset":
    """Strip tokens whose document frequency is >= ceil(min_df_frac *
    n_docs) from every document.  Returns (id_col, clean_text, n_kept,
    n_dropped) rows; surviving tokens keep their original order and are
    re-joined with ``split_sep``."""
    # the DF pass and the strip pass each run their own PRUNED scan: at
    # corpus scale two streaming reads beat pinning the whole (id, text)
    # projection in the object store (a materialize here is a spill storm
    # at 100× — the text column IS the dataset).  The doc count rides the
    # read's metadata fast path (no scan for parquet-backed inputs).
    narrow = ds.select_columns([id_col, text_col])
    n_docs = ds.count()
    min_df = max(1, math.ceil(min_df_frac * n_docs))
    stop = token_document_frequency(narrow, text_col=text_col,
                                    split_sep=split_sep) \
        .filter(expr=f"df >= {min_df}") \
        .select_columns(["token"]).take_all()
    # the stop list is the head of the Zipf curve — small by construction
    stop_ref = ray.put(pa.array(sorted(r["token"] for r in stop),
                                type=pa.string()))

    def strip(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        lst = pc.split_pattern(txt, split_sep)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        parent = np.asarray(pc.list_parent_indices(lst))
        keep = np.asarray(pc.invert(pc.is_in(
            flat, value_set=ray.get(stop_ref))))
        n = t.num_rows
        total = np.bincount(parent, minlength=n)
        kept_n = (np.bincount(parent[keep], minlength=n) if keep.any()
                  else np.zeros(n, dtype=np.int64))
        offsets = np.concatenate(([0], np.cumsum(kept_n)))
        kept_flat = pc.filter(flat, pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      kept_flat)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "clean_text": pc.binary_join(
                la, pa.scalar(split_sep, pa.string())),
            "n_kept": pa.array(kept_n, type=pa.int64()),
            "n_dropped": pa.array(total - kept_n, type=pa.int64()),
        })

    return narrow.map_batches(strip, batch_format="pyarrow",
                              zero_copy_batch=True)
