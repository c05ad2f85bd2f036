"""Fixed-stride text chunking for training-data preparation.

Splits each document's text into fixed-size character windows advanced by
a fixed stride (overlapping context windows when ``stride < size``) — the
standard chunking step ahead of embedding, retrieval indexing, or
fixed-window tokenization.  This is a training-data-pipeline extra, not a
reference operator (the reference validates tables; cf. the brief's
multimodal / text-analysis mandate).

Shape: a stateless one-to-many ``map_batches`` transform.  Each input row
expands to ``ceil(char_len / stride)`` chunk rows (zero rows for empty or
null text).  The expansion is vectorized per chunk ordinal, not per row:
for ordinal ``k`` the stage filters the batch to rows with
``char_len > k * stride`` (one boolean kernel) and slices all of them
with a single ``pyarrow.compute.utf8_slice_codeunits`` call — so a batch
of B rows costs ``max_chunks`` Arrow kernel invocations, never a Python
loop over rows.  ``utf8_slice_codeunits`` / ``utf8_length`` operate on
codepoints, matching SQL ``substr`` / ``length`` semantics exactly
(verified against DuckDB including multibyte text).

Scale notes: output row count ≈ input chars / stride; there is NO shuffle
— the stage is embarrassingly parallel and streams block-by-block, so it
composes with any downstream exchange (dedup, embedding, packing) without
a barrier.  Memory per batch is bounded by batch_chars × (size/stride)
amplification; for overlap ratios near 1 choose smaller input batches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def chunk_table(t: pa.Table, *, text_col: str, id_col: str,
                size: int, stride: int) -> pa.Table:
    """Expand one Arrow batch into chunk rows (pure function, testable)."""
    if stride <= 0 or size <= 0:
        # guard here, not only in the wrapper: stride=0 would loop forever
        raise ValueError("size and stride must be positive")
    ids = pc.cast(t[id_col], pa.int64())
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # Null text chunks to nothing, same as empty text.
    text = pc.fill_null(pc.cast(text, pa.string()), "")
    lengths = pc.utf8_length(text)

    out_ids, out_idx, out_chunks = [], [], []
    k = 0
    while True:
        mask = pc.greater(lengths, k * stride)
        if not pc.any(mask).as_py():
            break
        sub_ids = pc.filter(ids, mask)
        sub_text = pc.filter(text, mask)
        out_ids.append(sub_ids)
        out_idx.append(pa.array([k] * len(sub_ids), type=pa.int64()))
        out_chunks.append(pc.utf8_slice_codeunits(
            sub_text, start=k * stride, stop=k * stride + size))
        k += 1

    if not out_ids:
        chunks = pa.array([], type=pa.string())
        return pa.table({
            id_col: pa.array([], type=pa.int64()),
            "chunk_idx": pa.array([], type=pa.int64()),
            "chunk": chunks,
            "chunk_len": pa.array([], type=pa.int64()),
        })
    chunks = pa.concat_arrays([a.combine_chunks() if
                               isinstance(a, pa.ChunkedArray) else a
                               for a in out_chunks])
    return pa.table({
        id_col: pa.concat_arrays([a.combine_chunks() if
                                  isinstance(a, pa.ChunkedArray) else a
                                  for a in out_ids]),
        "chunk_idx": pa.concat_arrays(out_idx),
        "chunk": chunks,
        "chunk_len": pc.cast(pc.utf8_length(chunks), pa.int64()),
    })


def chunk_text(ds: "rd.Dataset", *, text_col: str = "text",
               id_col: str = "doc_id", size: int = 256,
               stride: int = 192) -> "rd.Dataset":
    """Fixed-stride character chunking of ``text_col``.

    Returns a Dataset of (id_col, chunk_idx, chunk, chunk_len) rows —
    one row per window of ``size`` characters starting every ``stride``
    characters; the final window of a document may be shorter.  Empty and
    null documents yield no rows.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def _fn(t: pa.Table) -> pa.Table:
        return chunk_table(t, text_col=text_col, id_col=id_col,
                           size=size, stride=stride)

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
