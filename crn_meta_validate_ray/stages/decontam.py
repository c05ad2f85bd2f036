"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (n-gram overlap decontamination as
popularized by the GPT-3 / PaLM data recipes): any training document that
contains an n-gram also present in a held-out benchmark is flagged so it
can be dropped or audited.  Shape:

1. the benchmark side's DISTINCT hashed n-grams are built distributed
   (per-block unique inside ``map_batches``), and only the small distinct
   partials cross to the driver for the final merge — mirroring the
   broadcast ref-check build (stages/refcheck.py).  Benchmarks are small
   by construction (MBs, not TBs), so the merged gram set is a bounded
   broadcast object: ``ray.put`` once, read zero-copy by every task.
2. the training side streams: one ``batch_word_gram_hashes`` call per
   batch (vectorized — no per-doc Python), one ``searchsorted`` membership
   probe against the broadcast sorted gram array, per-doc hit counts via
   ``bincount``.  Map-only — nothing shuffles.

Gram identity is by the 64-bit token-fold hash of
:func:`~crn_meta_validate_ray.functions.text.batch_word_gram_hashes`;
collisions (≈ n²/2⁶⁵) can only over-flag, never miss.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from crn_meta_validate_ray.functions.text import batch_word_gram_hashes


def _gram_set_ref(eval_ds: "rd.Dataset", text_col: str, ngram: int):
    """Distinct hashed n-grams of the benchmark set → sorted int64 array in
    the object store.  Per-block unique runs on workers; only distinct
    partials reach the driver (cf. refcheck broadcast key build)."""

    def block_unique(t: pa.Table) -> pa.Table:
        g, _ = batch_word_gram_hashes(t[text_col].to_pylist(), ngram)
        return pa.table({"__g": pa.array(np.unique(g).astype(np.int64))})

    parts = [
        np.asarray(b["__g"])
        for b in eval_ds.select_columns([text_col])
        .map_batches(block_unique, batch_format="pyarrow",
                     zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    parts = [p for p in parts if p.size]
    merged = (np.unique(np.concatenate(parts)) if parts
              else np.empty(0, dtype=np.int64))
    return ray.put(merged), len(merged)


def decontaminate(
    ds: "rd.Dataset",
    eval_ds: "rd.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> "rd.Dataset":
    """Rows of ``ds`` sharing ≥1 word ``ngram``-gram with ``eval_ds``.

    Returns (id_col, n_shared_grams): the number of the document's DISTINCT
    grams that appear in the benchmark gram set.  Documents with no tokens
    have no grams and are never flagged.  Callers exclude benchmark rows
    from ``ds`` themselves (identity predicates differ per corpus)."""
    gref, _ = _gram_set_ref(eval_ds, text_col, ngram)

    def flag(t: pa.Table, *, gref=gref) -> pa.Table:
        grams = ray.get(gref)  # zero-copy after first task on each worker
        g, cnt = batch_word_gram_hashes(t[text_col].to_pylist(), ngram)
        gi = g.astype(np.int64)
        if len(grams):
            pos = np.searchsorted(grams, gi)
            pos_c = np.minimum(pos, len(grams) - 1)
            hit = (pos < len(grams)) & (grams[pos_c] == gi)
        else:
            hit = np.zeros(len(gi), dtype=bool)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), cnt)
        n_shared = np.bincount(doc_idx[hit], minlength=t.num_rows) \
            .astype(np.int64)
        keep = n_shared > 0
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()).filter(pa.array(keep)),
            "n_shared_grams": pa.array(n_shared[keep]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True)
