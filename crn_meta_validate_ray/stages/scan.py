"""Distributed ordered scan (global prefix sum).

The canonical two-phase parallel scan over a totally-ordered Dataset:

1. distributed ``ds.sort(sort_key)`` establishes a global order as a
   sequence of range-partitioned blocks;
2. one Ray task per block computes the block's local cumulative sum and
   its total — all blocks in parallel;
3. the driver prefix-folds ONLY the per-block totals (num_blocks scalars,
   trivially small at any data scale);
4. one Ray task per block adds its exclusive offset — again all parallel.

``to_arrow_refs`` after the sort is a materialization barrier, but the
sort itself is already an all-to-all exchange with a full barrier, so no
extra pipeline overlap is lost.  The driver never sees row data — only
``num_blocks`` floats cross to it.

This is the primitive behind training-data **sequence packing** (assign
documents to fixed token-budget shards by their running token offset) —
see pipelines/queries.pack_documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _values(value_col: str, t: pa.Table) -> np.ndarray:
    col = t[value_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col, dtype=np.float64)


def _block_total(value_col: str, t: pa.Table) -> float:
    if t.num_rows == 0:
        # sorting an empty dataset yields schema-less empty blocks
        return 0.0
    return float(np.sum(_values(value_col, t)))


def _with_offset(value_col: str, out_col: str, integer: bool, offset: float,
                 t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        typ = pa.int64() if integer else pa.float64()
        return t.append_column(out_col, pa.array([], type=typ))
    # a NON-empty block missing the column is schema drift across input
    # files — fail here, at the cause, not in a downstream consumer
    if value_col not in t.column_names:
        raise KeyError(f"ordered_prefix_sum: column {value_col!r} missing "
                       f"from a {t.num_rows}-row block "
                       f"(have {t.column_names})")
    run = np.cumsum(_values(value_col, t)) + offset
    arr = pa.array(np.rint(run).astype(np.int64)) if integer \
        else pa.array(run)
    return t.append_column(out_col, arr)


def ordered_prefix_sum(
    ds: "rd.Dataset",
    sort_key: str | list[str],
    value_col: str,
    out_col: str = "run_sum",
    *,
    integer: bool = False,
) -> "rd.Dataset":
    """Append ``out_col`` = inclusive prefix sum of ``value_col`` in the
    total order of ``sort_key``.  ``integer=True`` emits int64 (exact for
    integral inputs within 2^53 via the float64 accumulator).

    ``sort_key`` must induce a TOTAL order (unique keys, or a composite
    that breaks ties): rows with equal keys get an arbitrary relative
    order from the distributed sort, making their individual run_sum
    values nondeterministic (the sum after the tie group is still
    exact)."""
    import ray

    sorted_ds = ds.sort(sort_key)
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds

    sum_task = ray.remote(num_cpus=1)(_block_total)
    totals = ray.get([sum_task.remote(value_col, r) for r in refs])
    offsets = np.concatenate(([0.0], np.cumsum(totals)[:-1]))

    add_task = ray.remote(num_cpus=1)(_with_offset)
    out_refs = [add_task.remote(value_col, out_col, integer, off, r)
                for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)
