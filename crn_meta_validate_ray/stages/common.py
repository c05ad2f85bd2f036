"""Shared shuffle helper: coarse hash-bucket grouping.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per group — at
millions of tiny groups (one per conversation / band bucket / key) the
per-group Python-call + block-slice overhead dominates wall-clock by orders
of magnitude.  ``grouped_map`` keeps the same co-location guarantee with a
bounded number of groups:

1. append ``__hb = hash(key columns) % num_buckets`` vectorized;
2. ``groupby('__hb').map_groups(bucket_fn)`` — every row of a key lands in
   exactly one bucket, so ``bucket_fn`` sees all rows for each of its keys
   and does a *pandas* groupby internally (C-speed, one Python call per
   bucket instead of per key).

``num_buckets`` bounds both the per-call overhead (calls = buckets) and the
per-task memory (rows/buckets × row width); size it ≥ cluster cores and so
a bucket of the narrow key columns fits in a worker's heap.  Skewed keys:
bucket on the *salted* key, never the raw hot key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

DEFAULT_NUM_BUCKETS = None  # resolved from cluster size at call time


def resolve_num_buckets(num_buckets: int | None) -> int:
    """Default bucket count: ~2× the cluster CPUs, clamped to [8, 128] —
    enough parallelism for the reduce wave without drowning small clusters
    in task overhead.  At true multi-node scale callers should pass an
    explicit count sized so a bucket of the narrow key columns fits a
    worker's heap (e.g. total_bytes / 256 MiB)."""
    if num_buckets is not None:
        return num_buckets
    import os
    env = os.environ.get("RAY_GRAFT_NUM_BUCKETS")
    if env:
        # explicit override — e.g. the scaling bench pins the SAME bucket
        # count at both CPU levels so both measure one physical plan
        return max(1, int(env))
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(128, 2 * cpus))


def as_i64(t: pa.Table, col: str) -> pa.Array:
    """Column → combined int64 Arrow array (shared cast idiom)."""
    out = pc.cast(t[col], pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def pd_to_arrow(df: "pd.DataFrame", schema: pa.Schema | None = None,
                preserve_index: bool = False) -> pa.Table:
    """``pa.Table.from_pandas`` WITHOUT the ``b'pandas'`` schema metadata.
    pyarrow schemas carrying that metadata are unhashable (``hash(schema)``
    raises ``unhashable type: 'dict'``), which defeats Ray Data's
    ``unify_schemas`` set-based early-exit and logs a warning per block
    pair ("Failed to hash the schemas") — use this for every pandas →
    Arrow block the engine hands back to Ray Data."""
    t = pa.Table.from_pandas(df, schema=schema,
                             preserve_index=preserve_index)
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — full-avalanche mixing of an int64 vector."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h += np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _hash_column(col) -> np.ndarray:
    """Vectorized uint64 hash of one Arrow column (no per-row Python).

    Strings/binary are dictionary-encoded first so only the (small) set of
    distinct values is object-hashed — conv_ids repeat ~turns-per-conv
    times, so this hashes thousands of strings instead of millions.
    Numerics hash via splitmix64 on their bit pattern."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    typ = col.type
    null_h = np.uint64(0x7F4A7C15F39CC060)
    if pa.types.is_dictionary(typ):
        dict_h = pd.util.hash_array(
            np.asarray(col.dictionary, dtype=object)).astype(np.uint64)
        idx = col.indices
        codes = np.asarray(pc.fill_null(idx, -1) if idx.null_count
                           else idx).astype(np.int64)
        if codes.size and codes.min() < 0:
            out = np.where(codes < 0, null_h,
                           dict_h[np.maximum(codes, 0)]
                           if len(dict_h) else null_h)
        else:
            out = dict_h[codes] if len(dict_h) else \
                np.empty(0, dtype=np.uint64)
        return out
    if pa.types.is_string(typ) or pa.types.is_large_string(typ) \
            or pa.types.is_binary(typ) or pa.types.is_large_binary(typ) \
            or pa.types.is_fixed_size_binary(typ):
        return _hash_column(pc.dictionary_encode(col))
    if pa.types.is_floating(typ):
        v = np.asarray(pc.fill_null(col, 0.0), dtype=np.float64)
        bits = v.view(np.uint64)
    else:
        try:
            v = np.asarray(pc.fill_null(pc.cast(col, pa.int64()), 0))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # non-integral exotic type: hash its string form
            return _hash_column(pc.cast(col, pa.string()))
        bits = v.view(np.uint64)
    out = _mix64(bits)
    if col.null_count:
        out = np.where(np.asarray(pc.is_null(col)), null_h, out)
    return out


def hash_bucket_column(t: pa.Table, keys: list[str],
                       num_buckets: int) -> pa.Array:
    """Vectorized hash of the key columns → int32 bucket id."""
    h = _hash_column(t[keys[0]])
    for k in keys[1:]:
        with np.errstate(over="ignore"):
            h = _mix64(h * np.uint64(0x100000001B3) ^ _hash_column(t[k]))
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def _split_block(keys: list[str], num_buckets: int, *tbls,
                 ship_columns: list[str] | None = None,
                 encode_columns: list[str] | None = None) -> list[pa.Table]:
    """Map side of the exchange: partition a chunk of blocks into per-bucket
    sub-tables with a single argsort + slice (no per-bucket filter scans).
    Several input blocks are coalesced per task so the exchange creates
    O(split_tasks × buckets) objects, not O(blocks × buckets) — per-object
    store overhead, not bytes, dominates at small block sizes.

    ``ship_columns`` restricts the columns that travel through the exchange
    (a hash key derivable from a shipped column — e.g. a salt bucket — is
    hashed here but recomputed reduce-side instead of shipped).

    ``encode_columns`` dictionary-encodes those columns per bucket PART,
    after slicing — repeated keys (one group id per row) ship as int32
    codes plus a compact per-part dictionary.  Encoding must happen
    post-slice: encoding before ``take`` would pin every part to the full
    chunk dictionary and ship it ``num_buckets`` times over."""
    good = [t for t in tbls
            if t.num_rows and all(k in t.column_names for k in keys)]
    if not good:
        return [None] * num_buckets
    tbl = good[0] if len(good) == 1 else pa.concat_tables(good)
    hb = np.asarray(hash_bucket_column(tbl, keys, num_buckets))
    if ship_columns is not None:
        tbl = tbl.select(ship_columns)
    order = np.argsort(hb, kind="stable")
    sorted_hb = hb[order]
    taken = tbl.take(pa.array(order))
    bounds = np.searchsorted(sorted_hb, np.arange(num_buckets + 1))
    parts = [taken.slice(bounds[b], bounds[b + 1] - bounds[b])
             for b in range(num_buckets)]
    for col in encode_columns or []:
        ci = parts[0].column_names.index(col) if parts else -1
        enc = []
        for p in parts:
            arr = p[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not pa.types.is_dictionary(arr.type):
                arr = pc.dictionary_encode(arr)
            enc.append(p.set_column(ci, col, arr))
        parts = enc
    return parts


def flatten_parts(parts) -> list:
    """Normalize reduce-task inputs: with ``num_returns=1`` Ray delivers
    the split task's whole return LIST as one object instead of unpacking
    it, so single-bucket exchanges see ``[table]`` where multi-bucket ones
    see ``table``."""
    out = []
    for p in parts:
        if isinstance(p, list):
            out.extend(p)
        else:
            out.append(p)
    return out


def split_exchange(split_task, refs, keys: list[str], num_buckets: int,
                   **split_kwargs) -> list:
    """Map side of the exchange, shared by grouped_map and hash_join:
    coalesce block refs into ~num_buckets chunks and launch one split task
    per chunk.  Returns per-chunk lists of num_buckets part refs."""
    if not refs:
        return []
    n_split = max(1, min(len(refs), num_buckets))
    chunk = -(-len(refs) // n_split)
    chunks = [refs[i:i + chunk] for i in range(0, len(refs), chunk)]
    per_chunk = [split_task.remote(keys, num_buckets, *c, **split_kwargs)
                 for c in chunks]
    if num_buckets == 1:
        per_chunk = [[r] for r in per_chunk]
    return per_chunk


def _reduce_bucket(bucket_fn, batch_format: str, empty_block: pa.Table,
                   *parts) -> pa.Table:
    parts = [p for p in flatten_parts(parts)
             if p is not None and p.num_rows]
    t = pa.concat_tables(parts) if parts else empty_block
    if batch_format == "pandas":
        out = bucket_fn(t.to_pandas())
        if isinstance(out, pa.Table):  # fns may return Arrow directly
            return out
        return pd_to_arrow(out)
    return bucket_fn(t)


def empty_exemplar(block_refs, columns: list[str],
                   scan_limit: int = 64) -> pa.Table:
    """Zero-row exemplar carrying ``columns``' types, from the first block
    that has them.  ``map_batches`` SKIPS empty input blocks and emits a
    zero-schema empty block instead, and ``to_arrow_refs`` block order is
    nondeterministic — so the first ref may be a stale-schema empty table
    and must not be trusted blindly.  Falls back to a zero-column table
    (callers' bucket fns guard ``df.empty`` so a schema-less empty input is
    handled) when no scanned block carries the columns."""
    import ray

    for r in block_refs[:scan_limit]:
        t = ray.get(r)
        if all(c in t.column_names for c in columns):
            return t.slice(0, 0).select(columns)
    return pa.table({})


def grouped_map(
    ds: "rd.Dataset",
    keys: list[str],
    bucket_fn,
    *,
    num_buckets: int | None = DEFAULT_NUM_BUCKETS,
    batch_format: str = "pandas",
    engine: str = "core",
    ship_columns: list[str] | None = None,
    encode_columns: list[str] | None = None,
) -> "rd.Dataset":
    """Apply ``bucket_fn`` to each hash bucket of ``keys``.  ``bucket_fn``
    receives one DataFrame (or Arrow table) holding every row of its keys
    and must group by ``keys`` itself.

    ``engine='core'`` (default) runs the exchange as raw Ray tasks:
    map-side partition (argsort + slice per block) → per-bucket gather →
    one ``bucket_fn`` task per bucket, with all intermediates in the object
    store.  This is one of the few places the Dataset API genuinely can't
    express the semantics efficiently: ``groupby().map_groups`` pays a full
    sort-based shuffle (measured 30-60 s on 12M narrow rows locally) where
    this exchange needs only ~2 s.  ``engine='dataset'`` keeps the
    pure-Dataset path for comparison/debugging."""
    import ray

    num_buckets = resolve_num_buckets(num_buckets)
    if engine == "dataset":
        def add_bucket(t: pa.Table) -> pa.Table:
            return t.append_column("__hb", hash_bucket_column(t, keys,
                                                              num_buckets))

        bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                                  zero_copy_batch=True)
        if batch_format == "pandas":
            def run(g: pd.DataFrame):
                return bucket_fn(g.drop(columns="__hb"))
        else:
            def run(g):
                return bucket_fn(g.drop_columns(["__hb"]))
        return bucketed.groupby("__hb").map_groups(run,
                                                   batch_format=batch_format)

    split_task = ray.remote(num_returns=num_buckets)(_split_block)
    reduce_task = ray.remote(_reduce_bucket)

    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(pa.table({}))
    # an empty input block gives every reduce task the input schema, so a
    # bucket with no rows still yields a schema-correct empty output
    # (skip stale-schema empty blocks when picking the exemplar)
    empty_in = None
    for r in block_refs[:16]:
        t = ray.get(r)
        if all(k in t.column_names for k in keys):
            empty_in = t.slice(0, 0)
            break
    if empty_in is None:
        empty_in = ray.get(block_refs[0]).slice(0, 0)
    if ship_columns is not None \
            and all(c in empty_in.column_names for c in ship_columns):
        empty_in = empty_in.select(ship_columns)
    empty_ref = ray.put(empty_in)
    # coalesce blocks so the object count is O(split_tasks × buckets)
    per_chunk = split_exchange(split_task, block_refs, keys, num_buckets,
                               ship_columns=ship_columns,
                               encode_columns=encode_columns)
    out_refs = [
        reduce_task.remote(bucket_fn, batch_format, empty_ref,
                           *[pc_[b] for pc_ in per_chunk])
        for b in range(num_buckets)
    ]
    return rd.from_arrow_refs(out_refs)


def drop_duplicate_rows(ds: "rd.Dataset", keys: list[str],
                        num_buckets: int | None = DEFAULT_NUM_BUCKETS
                        ) -> "rd.Dataset":
    """Distributed drop-duplicates on ``keys`` (first occurrence per bucket
    order) — vectorized inside buckets."""

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=keys, keep="first")

    return grouped_map(ds, keys, bucket, num_buckets=num_buckets)
