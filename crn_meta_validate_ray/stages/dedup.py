"""Deduplication operators over a document table:

- **exact**           — content-hash partition + min-id keeper per group;
- **MinHash + LSH**   — shingle → signature → banded buckets → candidate
  pairs verified by signature-estimated Jaccard;
- **n-gram Jaccard**  — LSH candidates verified by *exact* Jaccard over
  hashed word-n-gram sets carried through the shuffle;
- **SimHash**         — 64-bit sign-aggregated fingerprint, banded on 16-bit
  prefixes, verified by Hamming distance.

Scale shape: every variant shuffles only narrow derived columns (hashes /
signatures / id), never the document text; buckets are capped
(``max_bucket``) so a degenerate band (e.g. empty documents) cannot create a
quadratic pair explosion — capped buckets are dropped and counted, not
silently truncated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min

from crn_meta_validate_ray.functions.hashing import (
    MinHasher,
    hamming64,
    simhash64,
)
from crn_meta_validate_ray.stages.common import drop_duplicate_rows, grouped_map
from crn_meta_validate_ray.functions.text import (
    char_shingles,
    fingerprint_md5,
    word_ngrams,
)

DEFAULT_MAX_BUCKET = 256


def exact_dedup_groups(ds: "rd.Dataset", text_col: str = "text",
                       id_col: str = "doc_id") -> "rd.Dataset":
    """One row per distinct content: (fp, keep_id = min id, n_docs).
    Only (fp, id) move through the shuffle."""
    narrow = ds.select_columns([id_col, text_col])
    withfp = narrow.map_batches(
        lambda t: fingerprint_md5(t, text_col).drop_columns([text_col]),
        batch_format="pyarrow", zero_copy_batch=True)
    return withfp.groupby("fp").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_docs"))


def exact_dedup_keep_first(ds: "rd.Dataset", text_col: str = "text",
                           id_col: str = "doc_id") -> "rd.Dataset":
    """Full deduplicated rows (keeper = min id per content hash).  This
    variant shuffles whole rows — prefer exact_dedup_groups + a semi-join
    when rows are wide."""
    withfp = ds.map_batches(lambda t: fingerprint_md5(t, text_col),
                            batch_format="pyarrow", zero_copy_batch=True)

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(id_col, kind="stable")
                .drop_duplicates(subset=["fp"], keep="first"))

    return grouped_map(withfp, ["fp"], keep_first).drop_columns(["fp"])


class _SignatureStage:
    """Per-batch: shingle each doc, build MinHash signature + band hashes;
    emits one row per (band) per doc with the signature (and optionally the
    exact n-gram hash set) as list columns."""

    def __init__(self, text_col: str, id_col: str, num_hashes: int,
                 bands: int, shingle_k: int, use_word_ngrams: bool,
                 carry_ngrams: bool):
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.shingle_k = shingle_k
        self.use_word_ngrams = use_word_ngrams
        self.carry_ngrams = carry_ngrams
        self.hasher = MinHasher(num_hashes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.list_(pa.int64())),
                "grams": pa.array([], type=pa.list_(pa.int64())),
            })
        if not self.use_word_ngrams and not self.carry_ngrams:
            # fast path: batched byte-shingle signatures, no per-doc loop
            sigs_m = self.hasher.batch_signatures_chars(texts, self.shingle_k)
            grams_per_doc = [[]] * n
        else:
            sigs_m = np.empty((n, self.hasher.num_hashes), dtype=np.uint64)
            grams_per_doc = []
            for i, t in enumerate(texts):
                t = t or ""
                sh = (word_ngrams(t, self.shingle_k) if self.use_word_ngrams
                      else char_shingles(t, self.shingle_k))
                sigs_m[i] = self.hasher.signature(sh)
                grams_per_doc.append(
                    sh.astype(np.int64).tolist() if self.carry_ngrams else [])
        # band hashes for all docs at once: polynomial fold per band
        rows_per_band = self.hasher.num_hashes // self.bands
        sig_resh = sigs_m[:, : self.bands * rows_per_band] \
            .reshape(n, self.bands, rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.bands), dtype=np.uint64)
            mult = np.uint64(1099511628211)
            for j in range(rows_per_band):
                bh = bh * mult + sig_resh[:, :, j]
        bh = bh.astype(np.int64)

        sig_lists = sigs_m.astype(np.int64).tolist()
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        band_hash = bh.reshape(-1)
        out_id = np.repeat(np.asarray(ids), self.bands)
        sigs = [sig_lists[i] for i in range(n) for _ in range(self.bands)]
        grams = [grams_per_doc[i] for i in range(n)
                 for _ in range(self.bands)]
        return pa.table({
            "band_id": pa.array(band_id, type=pa.int32()),
            "band_hash": pa.array(band_hash, type=pa.int64()),
            "doc_id": pa.array(out_id),
            "sig": pa.array(sigs, type=pa.list_(pa.int64())),
            "grams": pa.array(grams, type=pa.list_(pa.int64())),
        })


def _pair_stage(threshold: float, exact_jaccard: bool, max_bucket: int):
    """Bucket function for grouped_map: candidate groups are the
    (band_id, band_hash) buckets *within* the physical hash bucket;
    singleton groups (the vast majority) are filtered vectorized before any
    pair loop runs."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"id_a": [], "id_b": [], "jaccard": []}
        if len(df):
            multi = df.groupby(["band_id", "band_hash"], sort=False)
            for _, g in multi:
                if not (2 <= len(g) <= max_bucket):
                    continue
                g = g.sort_values("doc_id", kind="stable")
                ids = g["doc_id"].tolist()
                sigs = [np.asarray(s, dtype=np.int64) for s in g["sig"]]
                grams = [np.asarray(x, dtype=np.int64) for x in g["grams"]]
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if exact_jaccard and len(grams[i]) and len(grams[j]):
                            inter = np.intersect1d(grams[i], grams[j],
                                                   assume_unique=True).size
                            union = grams[i].size + grams[j].size - inter
                            sim = inter / union if union else 0.0
                        else:
                            sim = float((sigs[i] == sigs[j]).mean())
                        if sim >= threshold:
                            cols["id_a"].append(ids[i])
                            cols["id_b"].append(ids[j])
                            cols["jaccard"].append(sim)
        out = pd.DataFrame(cols)
        if not len(out):
            out = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                "id_b": pd.Series(dtype=np.int64),
                                "jaccard": pd.Series(dtype=np.float64)})
        return out

    return pairs


def minhash_lsh_pairs(
    ds: "rd.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    use_word_ngrams: bool = False,
    exact_jaccard: bool = False,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> "rd.Dataset":
    """Near-duplicate pairs (id_a < id_b, similarity ≥ threshold).

    ``exact_jaccard=True`` verifies candidates with exact Jaccard over the
    hashed shingle/n-gram sets (carried through the shuffle); otherwise the
    signature-agreement estimate is used (the standard choice at scale)."""
    narrow = ds.select_columns([id_col, text_col])
    sig_stage = _SignatureStage(text_col, id_col, num_hashes, bands,
                                shingle_k, use_word_ngrams,
                                carry_ngrams=exact_jaccard)
    bandrows = narrow.map_batches(sig_stage, batch_format="pyarrow",
                                  batch_size=2048)
    cand = grouped_map(bandrows, ["band_id", "band_hash"],
                       _pair_stage(threshold, exact_jaccard, max_bucket))
    # a pair can surface from several bands — keep one row per pair
    return drop_duplicate_rows(cand, ["id_a", "id_b"])


def ngram_jaccard_pairs(ds: "rd.Dataset", *, threshold: float = 0.7,
                        ngram: int = 3, **kw) -> "rd.Dataset":
    """Word n-gram Jaccard near-dup: LSH candidate generation + exact
    verification over the hashed n-gram sets."""
    return minhash_lsh_pairs(ds, threshold=threshold, shingle_k=ngram,
                             use_word_ngrams=True, exact_jaccard=True, **kw)


class _SimHashStage:
    """Batch-vectorized SimHash band emitter: Arrow whitespace-split over
    the whole batch, ONE ``pd.util.hash_array`` call over the flattened
    token array, per-bit-plane segment counts via cumsum differences, and
    band rows emitted with ``np.repeat``/``np.tile`` — no per-document
    Python loop (mirrors ``MinHasher.batch_signatures_chars``)."""

    def __init__(self, text_col: str, id_col: str, prefix_bits: int = 16):
        self.text_col = text_col
        self.id_col = id_col
        self.prefix_bits = prefix_bits
        self.n_bands = 64 // prefix_bits

    def batch_simhash(self, text: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """(n,) uint64 simhash per document; identical bit semantics to
        ``functions.hashing.simhash64`` over ``text.split()`` tokens
        (bit i set iff strictly more tokens have bit i than not)."""
        n = len(text)
        lst = pc.utf8_split_whitespace(pc.fill_null(text, ""))
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        parent = np.asarray(pc.list_parent_indices(lst))
        keep = np.asarray(pc.not_equal(flat, ""))  # split() drops empties
        tok = np.asarray(flat.to_pandas(), dtype=object)[keep]
        par = parent[keep]  # nondecreasing (list order preserved)
        ntok = np.bincount(par, minlength=n).astype(np.int64)
        th = (pd.util.hash_array(tok).astype(np.uint64) if tok.size
              else np.empty(0, dtype=np.uint64))
        offsets = np.concatenate(([0], np.cumsum(ntok)))
        sh = np.zeros(n, dtype=np.uint64)
        for i in range(64):
            bit = ((th >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
            c = np.concatenate(([0], np.cumsum(bit)))
            ones = c[offsets[1:]] - c[offsets[:-1]]
            sh |= (2 * ones > ntok).astype(np.uint64) << np.uint64(i)
        return sh

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sh = self.batch_simhash(batch[self.text_col])
        ids = np.asarray(batch[self.id_col].to_pandas())
        shifts = (np.arange(self.n_bands, dtype=np.uint64)
                  * np.uint64(self.prefix_bits))
        mask = np.uint64((1 << self.prefix_bits) - 1)
        band_vals = ((sh[:, None] >> shifts[None, :]) & mask).astype(np.int64)
        return pa.table({
            "band_id": pa.array(np.tile(
                np.arange(self.n_bands, dtype=np.int32), n)),
            "band_val": pa.array(band_vals.reshape(-1), type=pa.int64()),
            "doc_id": pa.array(np.repeat(ids, self.n_bands)),
            "sh": pa.array(np.repeat(sh.astype(np.int64), self.n_bands),
                           type=pa.int64()),
        })


def simhash_pairs(ds: "rd.Dataset", *, text_col: str = "text",
                  id_col: str = "doc_id", max_distance: int = 3,
                  max_bucket: int = DEFAULT_MAX_BUCKET) -> "rd.Dataset":
    """Near-duplicate pairs by SimHash: candidates share one 16-bit band
    (any distance-≤3 pair must agree on ≥1 of the 4 bands by pigeonhole);
    verified by exact Hamming distance."""
    narrow = ds.select_columns([id_col, text_col])
    rows = narrow.map_batches(_SimHashStage(text_col, id_col),
                              batch_format="pyarrow", batch_size=2048)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"id_a": [], "id_b": [], "hamming": []}
        for _, g in df.groupby(["band_id", "band_val"], sort=False):
            if not (2 <= len(g) <= max_bucket):
                continue
            g = g.sort_values("doc_id", kind="stable")
            ids = g["doc_id"].tolist()
            sh = g["sh"].to_numpy().astype(np.int64).astype(np.uint64)
            for i in range(len(ids)):
                d = hamming64(np.repeat(sh[i], len(ids) - i - 1),
                              sh[i + 1:])
                for off, dist in enumerate(d):
                    if dist <= max_distance:
                        cols["id_a"].append(ids[i])
                        cols["id_b"].append(ids[i + 1 + off])
                        cols["hamming"].append(int(dist))
        out = pd.DataFrame(cols)
        if not len(out):
            out = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                "id_b": pd.Series(dtype=np.int64),
                                "hamming": pd.Series(dtype=np.int64)})
        return out

    cand = grouped_map(rows, ["band_id", "band_val"], pairs)
    return drop_duplicate_rows(cand, ["id_a", "id_b"])
