"""Cross-document substring (repeated k-token window) duplication.

Suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better", arXiv:2107.06499) removes spans that
recur across documents.  This stage computes the same signal Ray-Data-
first with a bounded, shuffle-friendly construction: STRIDE-1 k-token
window hashes — a window whose hash occurs in >= 2 DISTINCT documents is
a duplicated span, and each document's coverage by duplicated spans
(union of the marked ``[pos, pos+k)`` intervals) is the dedup signal a
downstream filter/trim step consumes.  Within-document repeats are
deliberately NOT counted (cross-document duplication is the training-
data signal); a window repeated inside one doc marks every occurrence
only once it also appears in another doc.

Identity convention matches ``ngram_jaccard_exact_pairs``
(stages/dedup.py): window hash = polynomial fold of
``pd.util.hash_array`` token hashes, while the SQL oracle compares the
window STRINGS — identical up to negligible (and corpus-deterministic)
64-bit collisions.

Exchange plan (text never shuffles):

1. postings: per batch, per-doc DISTINCT window hashes pre-aggregated to
   ``(gram, n_docs_partial)`` rows — the only thing the discovery
   exchange moves; a tiny keyed reduce keeps grams with total >= 2.
2. marking, two physical paths with identical results:
   - ``broadcast`` (<= ``max_broadcast_grams`` duplicated hashes): the
     sorted dup-hash array ships once via ``ray.put``; one more pass over
     the input marks windows by ``searchsorted`` and folds coverage
     per-document inside the batch — no further exchange at all.
   - ``keyed`` (the 100-TB path — the dup set can exceed any single
     worker): window rows ``(gram, doc_id, pos)`` semi-join the dup
     grams on a hash exchange (stages/shufflejoin.py), coverage reduces
     per ``doc_id`` bucket, and a left join attaches the per-doc base
     stats.  Cost is O(windows) narrow rows — the honest analogue of
     the suffix-array scan.
   ``mode='auto'`` (default) counts the dup grams (a tiny materialized
   reduce output) and picks the path, mirroring the
   ``stages/similarity.py`` router.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crn_meta_validate_ray.stages.common import grouped_map

DEFAULT_WINDOW_TOKENS = 8
# sorted int64 hashes: 4M ≈ 32 MB broadcast — comfortably one ray.put
DEFAULT_MAX_BROADCAST_GRAMS = 4_000_000


def _doc_window_hashes(texts: list, k: int):
    """Stride-1 k-token window hashes for a batch of documents.

    Returns ``(win_hash uint64, win_doc int64, win_pos int64, n_tokens
    int64-per-doc)`` with windows emitted doc-major in token order
    (``win_pos`` strictly increasing within a doc).  Docs with fewer
    than ``k`` tokens emit no windows.  Tokenization (Arrow whitespace
    split, empty tokens dropped) and the token-hash polynomial fold
    match functions/text.batch_word_gram_hashes so the oracle pairing
    (SQL ``regexp_extract_all('\\S+')`` + window-string equality) is the
    proven one."""
    nd = len(texts)
    lst = pc.utf8_split_whitespace(
        pa.array([t or "" for t in texts], type=pa.string()))
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    par = np.asarray(pc.list_parent_indices(lst))
    keep = np.asarray(pc.not_equal(flat, ""))
    tok = np.asarray(flat.to_pandas(), dtype=object)[keep]
    par = par[keep]
    cnt = np.bincount(par, minlength=nd).astype(np.int64)
    th = (pd.util.hash_array(tok).astype(np.uint64) if tok.size
          else np.empty(0, dtype=np.uint64))
    T = len(th)
    mult = np.uint64(1099511628211)
    thp = np.concatenate([th, np.zeros(k - 1, dtype=np.uint64)])
    with np.errstate(over="ignore"):
        acc = np.zeros(T, dtype=np.uint64)
        for j in range(k):
            acc = acc * mult + thp[j:j + T]
    par_p = np.concatenate([par, np.full(k - 1, -1, dtype=par.dtype)]) \
        if T else par
    valid = (par_p[:T] == par_p[k - 1:k - 1 + T]) if T \
        else np.zeros(0, dtype=bool)
    starts = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    pos = (np.arange(T, dtype=np.int64) - starts[par])[valid]
    return acc[valid], par[valid].astype(np.int64), pos, cnt


class _PostingStage:
    """Phase-1 combiner: per-batch partial distinct-doc counts per window
    hash — ``(gram int64, n int64)``; every doc lives inside one row, so
    per-doc-distinct within the batch is globally distinct."""

    def __init__(self, text_col: str, id_col: str, k: int):
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        g, gp, _pos, _cnt = _doc_window_hashes(
            batch[self.text_col].to_pylist(), self.k)
        if len(g):
            order = np.lexsort((g, gp))
            g, gp = g[order], gp[order]
            first = np.concatenate(
                ([True], (gp[1:] != gp[:-1]) | (g[1:] != g[:-1])))
            u, n = np.unique(g[first], return_counts=True)
        else:
            u = np.empty(0, dtype=np.uint64)
            n = np.empty(0, dtype=np.int64)
        return pa.table({"gram": pa.array(u.view(np.int64)),
                         "n": pa.array(n.astype(np.int64))})


def _dup_grams_reduce(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return pd.DataFrame({"gram": pd.Series(dtype=np.int64)})
    s = df.groupby("gram", sort=False)["n"].sum()
    return pd.DataFrame({"gram": s.index[s.to_numpy() >= 2]
                         .to_numpy(dtype=np.int64)})


def _coverage_arrays(mp: np.ndarray, mpos: np.ndarray, k: int, nd: int):
    """Union length of ``[pos, pos+k)`` intervals + marked-window counts
    per doc, from (doc, pos) arrays sorted by (doc, pos): consecutive
    same-doc windows contribute ``min(next_pos - pos, k)``, each doc's
    last window contributes ``k`` — the run-merge in one vector pass."""
    if not len(mp):
        z = np.zeros(nd, dtype=np.int64)
        return z, z.copy()
    same = np.empty(len(mp), dtype=bool)
    same[:-1] = mp[1:] == mp[:-1]
    same[-1] = False
    nxt = np.empty_like(mpos)
    nxt[:-1] = mpos[1:]
    nxt[-1] = 0
    contrib = np.where(same, np.minimum(nxt - mpos, k), k)
    dup_tokens = np.bincount(mp, weights=contrib,
                             minlength=nd).astype(np.int64)
    n_dup = np.bincount(mp, minlength=nd).astype(np.int64)
    return n_dup, dup_tokens


def _stats_table(ids: pa.Array, cnt: np.ndarray, n_dup: np.ndarray,
                 dup_tokens: np.ndarray, k: int,
                 id_col: str = "doc_id") -> pa.Table:
    """``ids`` is an Arrow array (any id dtype — int, string, ...); the
    output id column keeps the input name and type."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ratio = np.round(
        dup_tokens / np.where(cnt > 0, cnt, 1).astype(np.float64), 6)
    return pa.table({
        id_col: ids,
        "n_tokens": pa.array(cnt, type=pa.int64()),
        "n_windows": pa.array(np.maximum(cnt - k + 1, 0), type=pa.int64()),
        "n_dup_windows": pa.array(n_dup, type=pa.int64()),
        "dup_tokens": pa.array(dup_tokens, type=pa.int64()),
        # empty docs have no defined ratio (SQL NULL via nullif)
        "dup_ratio": pa.array(ratio, type=pa.float64(), mask=(cnt == 0)),
    })


def _broadcast_coverage_fn(text_col: str, id_col: str, k: int, dup_ref):
    """Phase-2 broadcast path as stateless tasks (the stages/refcheck.py
    pattern): ``ray.get`` of the node-local dup-hash array is ~free after
    the first task on each worker, and a task pool never starves its
    upstream read the way a CPU-saturating actor pool can."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray
        dup = ray.get(dup_ref) \
            if isinstance(dup_ref, ray.ObjectRef) else dup_ref  # sorted
        ids = batch[id_col]
        g, gp, pos, cnt = _doc_window_hashes(
            batch[text_col].to_pylist(), k)
        gi = g.view(np.int64)
        if len(dup) and len(gi):
            idx = np.searchsorted(dup, gi)
            hit = (idx < len(dup)) & (dup[np.minimum(idx, len(dup) - 1)]
                                      == gi)
        else:
            hit = np.zeros(len(gi), dtype=bool)
        n_dup, dup_tokens = _coverage_arrays(gp[hit], pos[hit], k,
                                             len(ids))
        return _stats_table(ids, cnt, n_dup, dup_tokens, k, id_col)

    return fn


class _WindowRowStage:
    """Keyed-path window emitter: one ``(gram, doc_id, pos)`` row per
    window — O(tokens) narrow rows, the honest suffix-scan cost."""

    def __init__(self, text_col: str, id_col: str, k: int):
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        g, gp, pos, _cnt = _doc_window_hashes(
            batch[self.text_col].to_pylist(), self.k)
        # arrow take keeps the id type (int, string, ...) stable across
        # batches — an empty batch still emits a typed id column
        ids = batch[self.id_col].take(pa.array(gp, type=pa.int64()))
        return pa.table({"gram": pa.array(g.view(np.int64)),
                         self.id_col: ids,
                         "pos": pa.array(pos)})


class _BaseStatsStage:
    def __init__(self, text_col: str, id_col: str, k: int):
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        _g, _gp, _pos, cnt = _doc_window_hashes(
            batch[self.text_col].to_pylist(), self.k)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids,
            "n_tokens": pa.array(cnt, type=pa.int64()),
            "n_windows": pa.array(np.maximum(cnt - self.k + 1, 0),
                                  type=pa.int64())})


def _coverage_reduce(k: int, id_col: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            # keep the id dtype from the (typed) empty exemplar frame
            return pd.DataFrame({
                id_col: df[id_col].iloc[:0],
                "n_dup_windows": pd.Series(dtype=np.int64),
                "dup_tokens": pd.Series(dtype=np.int64)})
        df = df.sort_values([id_col, "pos"], kind="stable")
        uniq, codes = np.unique(df[id_col].to_numpy(),
                                return_inverse=True)
        n_dup, dup_tokens = _coverage_arrays(
            codes, df["pos"].to_numpy(dtype=np.int64), k, len(uniq))
        return pd.DataFrame({id_col: uniq, "n_dup_windows": n_dup,
                             "dup_tokens": dup_tokens})

    return fn


def duplicated_window_stats(
    ds: "rd.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_WINDOW_TOKENS,
    mode: str = "auto",
    max_broadcast_grams: int = DEFAULT_MAX_BROADCAST_GRAMS,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-document duplicated-substring coverage: one row per input doc
    ``(doc_id, n_tokens, n_windows, n_dup_windows, dup_tokens,
    dup_ratio)`` where a window is duplicated iff its k-token span occurs
    in >= 2 distinct documents.  ``dup_tokens`` is the union length of
    the marked ``[pos, pos+k)`` spans; ``dup_ratio = dup_tokens /
    n_tokens`` (null for empty docs).  ``mode``: 'auto' | 'broadcast' |
    'keyed' (see module docstring)."""
    if mode not in ("auto", "broadcast", "keyed"):
        raise ValueError(f"unknown mode {mode!r}")
    narrow = ds.select_columns([id_col, text_col])
    postings = narrow.map_batches(
        _PostingStage(text_col, id_col, k),
        batch_format="pyarrow", zero_copy_batch=True)
    dup = grouped_map(postings, ["gram"], _dup_grams_reduce,
                      num_buckets=num_buckets).materialize()
    if mode == "auto":
        mode = "broadcast" if dup.count() <= max_broadcast_grams \
            else "keyed"
    if mode == "broadcast":
        import ray
        grams = np.sort(dup.to_pandas()["gram"]
                        .to_numpy(dtype=np.int64)) if dup.count() \
            else np.empty(0, dtype=np.int64)
        dup_ref = ray.put(grams)
        return narrow.map_batches(
            _broadcast_coverage_fn(text_col, id_col, k, dup_ref),
            batch_format="pyarrow", zero_copy_batch=True)
    from crn_meta_validate_ray.stages.shufflejoin import hash_join
    windows = narrow.map_batches(
        _WindowRowStage(text_col, id_col, k),
        batch_format="pyarrow", zero_copy_batch=True)
    marked = hash_join(windows, dup, left_on="gram", how="semi",
                       num_buckets=num_buckets) \
        .select_columns([id_col, "pos"])
    coverage = grouped_map(marked, [id_col], _coverage_reduce(k, id_col),
                           num_buckets=num_buckets)
    base = narrow.map_batches(
        _BaseStatsStage(text_col, id_col, k),
        batch_format="pyarrow", zero_copy_batch=True)

    def finalize(df: pd.DataFrame) -> pa.Table:
        cnt = df["n_tokens"].to_numpy(dtype=np.int64)
        n_dup = df["n_dup_windows"].fillna(0).to_numpy(dtype=np.int64)
        dup_tokens = df["dup_tokens"].fillna(0).to_numpy(dtype=np.int64)
        return _stats_table(pa.Array.from_pandas(df[id_col]), cnt,
                            n_dup, dup_tokens, k, id_col)

    return hash_join(base, coverage, left_on=id_col, how="left",
                     num_buckets=num_buckets, post=finalize)
