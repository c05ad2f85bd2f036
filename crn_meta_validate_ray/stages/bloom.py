"""Distributed Bloom filter for incremental dedup against a corpus snapshot.

The scale primitive for "drop documents already present in 100 TB of
history": the historical side is reduced ONCE to a fixed-size bitmap
(bits, not rows — gigabytes of text become megabytes of filter), the
bitmap is broadcast via ``ray.put``, and the new batch streams through a
map-only membership probe.  Rows the filter rejects are DEFINITELY new
(no false negatives); rows it accepts are only *candidates* (bounded
false-positive rate), so an exact verify — an anti-join on the key
itself, over the candidate subset only — restores exact semantics.  The
join's left side is tiny (true dups + FP rate × batch), which is the
whole point: the expensive exact comparison runs on ~0.1% of the data.

Construction: double hashing (Kirsch–Mitzenmacher) — two vectorized
64-bit hash passes per batch (``pd.util.hash_array`` with distinct hash
keys), bit index ``(h1 + i*h2) mod n_bits`` for i < k.  Per-block
partial bitmaps are OR-folded in a two-level reduction (block → batch of
partials → driver), so the driver only ever touches a handful of
bitmap-sized buffers, never row data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_KEY1 = "0123456789abcdef"
_KEY2 = "fedcba9876543210"


def _hash_pair(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized uint64 hashes of an object array."""
    if texts.size == 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z
    h1 = pd.util.hash_array(texts, hash_key=_KEY1).astype(np.uint64)
    h2 = pd.util.hash_array(texts, hash_key=_KEY2).astype(np.uint64)
    # h2 must be odd so the double-hash probes span all of n_bits
    return h1, h2 | np.uint64(1)


def _bit_indices(h1: np.ndarray, h2: np.ndarray, n_bits: int,
                 k: int) -> np.ndarray:
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)) \
        .reshape(-1).astype(np.int64)


def _texts(t: pa.Table, col: str) -> np.ndarray:
    s = pc.fill_null(pc.cast(t[col], pa.string()), "")
    return np.asarray(s.to_pandas(), dtype=object)


def build_bloom(ds: "rd.Dataset", *, col: str, n_bits: int,
                k: int = 8) -> np.ndarray:
    """OR-fold per-block partial bitmaps into one (n_bits/8,) uint8 array.

    Driver cost is O(partials × n_bits/8) after a batch-level pre-OR —
    at real scale raise the pre-OR ``batch_size`` (or add levels) so the
    driver folds a handful of bitmaps regardless of block count."""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        idx = _bit_indices(*_hash_pair(_texts(t, col)), n_bits, k)
        np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def pre_or(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_bits // 8, dtype=np.uint8)
        for buf in t["bm"]:
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint8)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .map_batches(pre_or, batch_format="pyarrow", batch_size=64)
    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in parts.take_all():
        acc |= np.frombuffer(row["bm"], dtype=np.uint8)
    return acc


def bloom_split(ds: "rd.Dataset", bitmap_ref, *, col: str, n_bits: int,
                k: int = 8) -> "rd.Dataset":
    """Tag each row: ``maybe_dup`` true iff all k filter bits are set.

    False rows are definitely absent from the snapshot; true rows need
    the exact verify.  Map-only; the bitmap is one zero-copy object-store
    read per task (pass ``bitmap_ref = ray.put(bitmap)``)."""

    def probe(t: pa.Table) -> pa.Table:
        bm = ray.get(bitmap_ref)
        idx = _bit_indices(*_hash_pair(_texts(t, col)), n_bits, k)
        hit = (bm[idx >> 3] >> (idx & 7)) & 1
        maybe = hit.reshape(-1, k).all(axis=1) if len(idx) \
            else np.zeros(0, dtype=bool)
        return t.append_column("maybe_dup", pa.array(maybe))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def incremental_dedup(new_ds: "rd.Dataset", snapshot_ds: "rd.Dataset", *,
                      key_col: str = "text", n_bits: int | None = None,
                      k: int = 8,
                      num_buckets: int | None = None) -> "rd.Dataset":
    """Rows of ``new_ds`` whose ``key_col`` does NOT occur in
    ``snapshot_ds`` — exact semantics, Bloom-accelerated.

    Definite-new rows stream straight through; only Bloom candidates pay
    the exact anti-join against the snapshot."""
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    # the snapshot lineage feeds count + bitmap build + the anti-join;
    # the tagged lineage feeds two filter consumers — materialize both
    # so each scan runs once (cf. the rank_normalize/table_diff pattern)
    snapshot_ds = snapshot_ds.materialize()
    if n_bits is None:
        n = snapshot_ds.count()
        n_bits = max(1 << 10, 1 << int(np.ceil(np.log2(max(16 * n, 1)))))
    bitmap_ref = ray.put(build_bloom(snapshot_ds, col=key_col,
                                     n_bits=n_bits, k=k))
    tagged = bloom_split(new_ds, bitmap_ref, col=key_col,
                         n_bits=n_bits, k=k).materialize()
    definite = tagged.filter(expr="maybe_dup == False") \
        .drop_columns(["maybe_dup"])
    candidates = tagged.filter(expr="maybe_dup == True") \
        .drop_columns(["maybe_dup"])
    kw = {"num_buckets": num_buckets} if num_buckets else {}
    survivors = hash_join(candidates, snapshot_ds.select_columns([key_col]),
                          left_on=key_col, how="anti", **kw)
    return definite.union(survivors)
