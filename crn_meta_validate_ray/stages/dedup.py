"""Deduplication operators over a document table:

- **exact**           — content-hash partition + min-id keeper per group;
- **MinHash + LSH**   — shingle → signature → banded buckets → candidate
  pairs verified by signature-estimated Jaccard;
- **n-gram Jaccard**  — LSH candidates verified by *exact* Jaccard over
  hashed word-n-gram sets carried through the shuffle;
- **SimHash**         — 64-bit sign-aggregated fingerprint, banded on 16-bit
  prefixes, verified by Hamming distance.

Scale shape: every variant shuffles only narrow derived columns (hashes /
signatures / id), never the document text.  The banded candidate exchange
moves only (band_id, band_hash, doc_id) — signatures travel ONCE per doc
through a separate keyed attach exchange, never replicated per band.
Buckets are capped (``max_bucket``) so a degenerate band (e.g. empty
documents) cannot create a quadratic pair explosion; capped buckets are
skipped and *counted* — pass ``with_stats=True`` to also receive the
skip census (buckets skipped, candidate docs dropped).
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
from crn_meta_validate_ray.stages.common import (drop_duplicate_rows,
                                                  grouped_map, pd_to_arrow)
from crn_meta_validate_ray.functions.text import (
    batch_word_gram_hashes,
    char_shingles,
    fingerprint_md5,
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
    """Per-batch: shingle each doc, build MinHash signature + band hashes.
    Emits ``bands`` NARROW candidate rows (band_id, band_hash, doc_id) per
    doc plus ONE signature row (band_id = -1) carrying the sig (and
    optionally the exact n-gram hash set) as list columns — so the banded
    exchange never replicates the signature per band (bands× byte saving
    through the shuffle)."""

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
        H = self.hasher.num_hashes
        if n == 0:
            return pa.table({
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.list_(pa.int64())),
                "grams": pa.array([], type=pa.list_(pa.int64())),
            })
        gram_vals = gram_counts = None
        if not self.use_word_ngrams and not self.carry_ngrams:
            # fast path: batched byte-shingle signatures, no per-doc loop
            sigs_m = self.hasher.batch_signatures_chars(texts, self.shingle_k)
        elif self.use_word_ngrams:
            # batch-vectorized word n-grams (token hashes combined by a
            # windowed polynomial fold — no per-doc Python loop)
            gram_vals, gram_counts = batch_word_gram_hashes(texts,
                                                            self.shingle_k)
            sigs_m = self.hasher.signatures_from_grams(gram_vals,
                                                       gram_counts)
            if not self.carry_ngrams:
                gram_vals = gram_counts = None
        else:  # char shingles + exact-verify carry (non-default)
            sigs_m = np.empty((n, H), dtype=np.uint64)
            grams_list = []
            for i, t in enumerate(texts):
                sh = char_shingles(t or "", self.shingle_k)
                sigs_m[i] = self.hasher.signature(sh)
                grams_list.append(sh)
            gram_vals = (np.concatenate(grams_list) if grams_list
                         else np.empty(0, dtype=np.uint64))
            gram_counts = np.array([len(s) for s in grams_list],
                                   dtype=np.int64)
        # band hashes for all docs at once: polynomial fold per band
        rows_per_band = H // self.bands
        sig_resh = sigs_m[:, : self.bands * rows_per_band] \
            .reshape(n, self.bands, rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.bands), dtype=np.uint64)
            mult = np.uint64(1099511628211)
            for j in range(rows_per_band):
                bh = bh * mult + sig_resh[:, :, j]

        ids_np = np.asarray(ids, dtype=np.int64)
        nb = n * self.bands
        band_id = np.concatenate([
            np.tile(np.arange(self.bands, dtype=np.int32), n),
            np.full(n, -1, dtype=np.int32)])
        band_hash = np.concatenate([
            bh.astype(np.int64).reshape(-1), np.zeros(n, dtype=np.int64)])
        doc_id = np.concatenate([np.repeat(ids_np, self.bands), ids_np])
        # candidate rows carry empty lists; signature rows the real payload
        empty_lists = pa.ListArray.from_arrays(
            np.zeros(nb + 1, dtype=np.int32), pa.array([], type=pa.int64()))
        sig_lists = pa.ListArray.from_arrays(
            np.arange(0, (n + 1) * H, H, dtype=np.int32),
            pa.array(sigs_m.reshape(-1).astype(np.int64)))
        sig_col = pa.concat_arrays([empty_lists, sig_lists])
        if gram_vals is None:
            doc_grams = pa.ListArray.from_arrays(
                np.zeros(n + 1, dtype=np.int32),
                pa.array([], type=pa.int64()))
        else:
            doc_grams = pa.ListArray.from_arrays(
                np.concatenate(([0], np.cumsum(gram_counts)))
                .astype(np.int32),
                pa.array(gram_vals.astype(np.int64)))
        grams_col = pa.concat_arrays([empty_lists, doc_grams])
        return pa.table({
            "band_id": pa.array(band_id),
            "band_hash": pa.array(band_hash),
            "doc_id": pa.array(doc_id),
            "sig": sig_col,
            "grams": grams_col,
        })


# sentinel rows in the candidate stream: a capped bucket emits one marker
# (id_a = -1 - band_id, id_b = band_hash, n_dropped = bucket size) instead
# of its quadratic pair set — unique per (band_id, band_hash), so the pair
# dedupe cannot collapse two different skipped buckets.
def _candidate_stage(max_bucket: int):
    """Bucket function: emit candidate (id_a < id_b) pairs per
    (band_id, band_hash) group within the physical hash bucket; singleton
    groups (the vast majority) never reach the pair loop; capped groups
    emit one marker row."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        if len(df):
            counts = df.groupby(["band_id", "band_hash"], sort=False)[
                "doc_id"].transform("size")
            multi = df[counts >= 2]
            for (b, h), g in multi.groupby(["band_id", "band_hash"],
                                           sort=False):
                m = len(g)
                if m > max_bucket:
                    out_a.append(-1 - int(b))
                    out_b.append(int(h))
                    out_d.append(m)
                    continue
                ids = np.sort(g["doc_id"].to_numpy())
                ia, ib = np.triu_indices(m, 1)
                out_a.extend(ids[ia].tolist())
                out_b.extend(ids[ib].tolist())
                out_d.extend([0] * len(ia))
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=np.int64),
            "id_b": pd.Series(out_b, dtype=np.int64),
            "n_dropped": pd.Series(out_d, dtype=np.int64)})

    return pairs


SMALL_PAIR_GUARD = 32_768


def _verify_pairs_driver(pairs: "rd.Dataset", sigrows: "rd.Dataset",
                         threshold: float, exact_jaccard: bool
                         ) -> "rd.Dataset":
    """Bounded-small verify: collect the candidate pairs (≤
    ``SMALL_PAIR_GUARD``), broadcast the referenced doc ids, pull ONLY
    those docs' signatures map-side, and verify vectorized locally."""
    import ray

    pr = pairs.select_columns(["id_a", "id_b"]).to_pandas() \
        .drop_duplicates(subset=["id_a", "id_b"], keep="first")
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    if not len(pr):
        return rd.from_arrow(empty)
    needed_ref = ray.put(pa.array(
        np.unique(np.concatenate([pr["id_a"].to_numpy(),
                                  pr["id_b"].to_numpy()]))))

    def pull(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["doc_id"], value_set=ray.get(needed_ref))
        return t.filter(keep)

    id_chunks, sig_chunks, gram_map = [], [], {}
    for b in sigrows.map_batches(pull, batch_format="pyarrow",
                                 zero_copy_batch=True) \
            .iter_batches(batch_size=1 << 14, batch_format="pyarrow"):
        ids_np = np.asarray(b["doc_id"].to_pandas(), dtype=np.int64)
        sc = b["sig"].combine_chunks() if isinstance(b["sig"],
                                                     pa.ChunkedArray) \
            else b["sig"]
        flat = np.asarray(sc.flatten(), dtype=np.int64)
        id_chunks.append(ids_np)
        sig_chunks.append(flat.reshape(len(ids_np), -1) if len(ids_np)
                          else flat.reshape(0, 0))
        if exact_jaccard:
            for i, g in zip(ids_np.tolist(), b["grams"].to_pylist()):
                gram_map[i] = np.asarray(g, dtype=np.int64)
    all_ids = np.concatenate(id_chunks) if id_chunks \
        else np.empty(0, dtype=np.int64)
    M = np.vstack(sig_chunks) if sig_chunks else np.zeros((0, 1), np.int64)
    order = np.argsort(all_ids, kind="stable")
    all_ids, M = all_ids[order], M[order]
    # one searchsorted instead of 2×|pairs| dict lookups + tiny vstacks
    A = M[np.searchsorted(all_ids, pr["id_a"].to_numpy(dtype=np.int64))]
    B = M[np.searchsorted(all_ids, pr["id_b"].to_numpy(dtype=np.int64))]
    sims = (A == B).mean(axis=1)
    if exact_jaccard:
        for k, (a, b_) in enumerate(zip(pr["id_a"], pr["id_b"])):
            ga, gb = gram_map.get(a), gram_map.get(b_)
            if ga is not None and gb is not None and ga.size and gb.size:
                inter = np.intersect1d(ga, gb, assume_unique=True).size
                union = ga.size + gb.size - inter
                sims[k] = inter / union if union else 0.0
    hit = sims >= threshold
    out = pr[hit].reset_index(drop=True)
    out["jaccard"] = sims[hit]
    return rd.from_arrow(pd_to_arrow(out, schema=empty.schema))


def _attach_verify(pairs: "rd.Dataset", sigrows: "rd.Dataset",
                   threshold: float, exact_jaccard: bool,
                   sim_col: str = "jaccard") -> "rd.Dataset":
    """Verify candidate pairs against per-doc signatures with two keyed
    exchanges: attach sig_a by id_a, then compute the similarity where
    sig_b lives (keyed by id_b) — each signature crosses the wire at most
    once per exchange, pairs carry sig_a through the second one."""

    def tag_pairs(key: str, carry: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {"key": t[key], "id_a": t["id_a"], "id_b": t["id_b"],
                    "is_sig": pa.array(np.zeros(t.num_rows, dtype=bool))}
            for c in ("sig", "grams"):
                cols[c] = (t[c] if c in carry else pa.ListArray.from_arrays(
                    np.zeros(t.num_rows + 1, dtype=np.int32),
                    pa.array([], type=pa.int64())))
            return pa.table(cols)
        return fn

    def tag_sigs(t: pa.Table) -> pa.Table:
        neg = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        return pa.table({"key": t["doc_id"], "id_a": neg, "id_b": neg,
                         "is_sig": pa.array(np.ones(t.num_rows, dtype=bool)),
                         "sig": t["sig"], "grams": t["grams"]})

    attach_schema = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("sig_a", pa.list_(pa.int64())), ("grams_a", pa.list_(pa.int64()))])

    def attach_a(df: pd.DataFrame) -> pa.Table:
        sig = df[df["is_sig"]]
        pr = df[~df["is_sig"]][["key", "id_a", "id_b"]]
        # a pair can surface from several bands; all copies share id_a and
        # therefore this bucket — dedupe here instead of a dedicated
        # exchange (saves one full shuffle wave)
        pr = pr.drop_duplicates(subset=["id_a", "id_b"], keep="first")
        m = pr.merge(
            sig[["key", "sig", "grams"]].rename(
                columns={"sig": "sig_a", "grams": "grams_a"}), on="key")
        # explicit schema: an empty/all-empty-list frame must not degrade
        # to null-typed columns (union downstream needs list<int64>)
        return pd_to_arrow(m[["id_a", "id_b", "sig_a", "grams_a"]],
                           schema=attach_schema)

    def verify_b(df: pd.DataFrame) -> pd.DataFrame:
        sig = df[df["is_sig"]]
        pr = df[~df["is_sig"]][["key", "id_a", "id_b", "sig_a", "grams_a"]]
        m = pr.merge(
            sig[["key", "sig", "grams"]].rename(
                columns={"sig": "sig_b", "grams": "grams_b"}), on="key")
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 sim_col: pd.Series(dtype=np.float64)})
        if exact_jaccard:
            sims = np.empty(len(m), dtype=np.float64)
            for i, (ga, gb) in enumerate(zip(m["grams_a"], m["grams_b"])):
                ga = np.asarray(ga, dtype=np.int64)
                gb = np.asarray(gb, dtype=np.int64)
                if ga.size and gb.size:
                    inter = np.intersect1d(ga, gb, assume_unique=True).size
                    union = ga.size + gb.size - inter
                    sims[i] = inter / union if union else 0.0
                else:
                    A = np.asarray(m["sig_a"].iloc[i], dtype=np.int64)
                    B = np.asarray(m["sig_b"].iloc[i], dtype=np.int64)
                    sims[i] = float((A == B).mean())
        else:
            A = np.vstack([np.asarray(s, dtype=np.int64)
                           for s in m["sig_a"]])
            B = np.vstack([np.asarray(s, dtype=np.int64)
                           for s in m["sig_b"]])
            sims = (A == B).mean(axis=1)
        m[sim_col] = sims
        m = m[m[sim_col] >= threshold]
        return m[["id_a", "id_b", sim_col]].reset_index(drop=True)

    carry_a = ["sig", "grams"] if exact_jaccard else ["sig"]
    u1 = pairs.map_batches(tag_pairs("id_a", []), batch_format="pyarrow") \
        .union(sigrows.map_batches(tag_sigs, batch_format="pyarrow"))
    with_a = grouped_map(u1, ["key"], attach_a)

    def tag_pairs2(t: pa.Table) -> pa.Table:
        zero = pa.ListArray.from_arrays(
            np.zeros(t.num_rows + 1, dtype=np.int32),
            pa.array([], type=pa.int64()))
        return pa.table({
            "key": t["id_b"], "id_a": t["id_a"], "id_b": t["id_b"],
            "is_sig": pa.array(np.zeros(t.num_rows, dtype=bool)),
            "sig_a": t["sig_a"],
            "grams_a": t["grams_a"] if exact_jaccard else zero,
            "sig": zero, "grams": zero,
        })

    def tag_sigs2(t: pa.Table) -> pa.Table:
        neg = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        zero = pa.ListArray.from_arrays(
            np.zeros(t.num_rows + 1, dtype=np.int32),
            pa.array([], type=pa.int64()))
        return pa.table({"key": t["doc_id"], "id_a": neg, "id_b": neg,
                         "is_sig": pa.array(np.ones(t.num_rows, dtype=bool)),
                         "sig_a": zero, "grams_a": zero,
                         "sig": t["sig"], "grams": t["grams"]})

    u2 = with_a.map_batches(tag_pairs2, batch_format="pyarrow") \
        .union(sigrows.map_batches(tag_sigs2, batch_format="pyarrow"))
    return grouped_map(u2, ["key"], verify_b)


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
    with_stats: bool = False,
):
    """Near-duplicate pairs (id_a < id_b, similarity ≥ threshold).

    ``exact_jaccard=True`` verifies candidates with exact Jaccard over the
    hashed shingle/n-gram sets; otherwise the signature-agreement estimate
    is used (the standard choice at scale).

    Exchange plan (all narrow, text never shuffles): banded candidate rows
    (band_id, band_hash, doc_id) → pair dedupe → signature attach keyed by
    id_a → verify keyed by id_b.  Signatures cross each attach exchange
    once per doc instead of once per band (bands× byte saving).

    ``with_stats=True`` additionally returns a dict with the capped-bucket
    census: ``n_buckets_skipped`` and ``n_docs_dropped`` (docs that lost
    candidate generation in an over-``max_bucket`` band bucket)."""
    narrow = ds.select_columns([id_col, text_col])
    sig_stage = _SignatureStage(text_col, id_col, num_hashes, bands,
                                shingle_k, use_word_ngrams,
                                carry_ngrams=exact_jaccard)
    # derived rows feed two exchanges (candidates + sig attach); material-
    # ized once so the signature compute doesn't run twice
    rows = narrow.map_batches(sig_stage, batch_format="pyarrow",
                              batch_size=2048).materialize()
    bandrows = rows.filter(expr="band_id >= 0") \
        .select_columns(["band_id", "band_hash", "doc_id"])
    sigrows = rows.filter(expr="band_id < 0") \
        .select_columns(["doc_id", "sig", "grams"])
    cand = grouped_map(bandrows, ["band_id", "band_hash"],
                       _candidate_stage(max_bucket))
    pairs = cand.filter(expr="id_a >= 0")
    n_pairs = pairs.count()
    if n_pairs <= SMALL_PAIR_GUARD:
        # bounded driver shortcut: ≤ guard pairs ⇒ ≤ 2×guard signatures
        # (~32 MB at 64×int64) — verify locally, skip two exchange waves.
        # Above the guard the distributed attach path runs (scale path).
        verified = _verify_pairs_driver(pairs, sigrows, threshold,
                                        exact_jaccard)
    else:
        # per-pair dedupe happens inside the attach exchange (keyed by
        # id_a, so every copy of a pair co-locates); markers are unique
        # per bucket
        verified = _attach_verify(pairs, sigrows, threshold, exact_jaccard)
    if not with_stats:
        return verified
    markers = cand.filter(expr="id_a < 0").select_columns(["n_dropped"]) \
        .take_all()
    stats = {"n_buckets_skipped": len(markers),
             "n_docs_dropped": int(sum(r["n_dropped"] for r in markers))}
    return verified, stats


def ngram_jaccard_pairs(ds: "rd.Dataset", *, threshold: float = 0.7,
                        ngram: int = 3, **kw) -> "rd.Dataset":
    """Word n-gram Jaccard near-dup: LSH candidate generation + exact
    verification over the hashed n-gram sets."""
    return minhash_lsh_pairs(ds, threshold=threshold, shingle_k=ngram,
                             use_word_ngrams=True, exact_jaccard=True, **kw)


class _GramPostingStage:
    """Per-batch inverted-index emitter for the EXACT n-gram Jaccard path:
    one posting row (gram, doc_id) per distinct word-n-gram per doc, plus
    one size row per doc (gram = -1, n_grams = |gram set|).  No gram
    *sets* ever travel — exact Jaccard needs only pair multiplicities and
    the two set sizes (see :func:`ngram_jaccard_exact_pairs`)."""

    def __init__(self, text_col: str, id_col: str, ngram: int):
        self.text_col = text_col
        self.id_col = id_col
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        n = len(texts)
        g, cnt = batch_word_gram_hashes(texts, self.ngram)
        tot = len(g)
        # gram hashes are folded into int63 so -1 stays a safe marker
        gram = np.concatenate([(g >> np.uint64(1)).astype(np.int64),
                               np.full(n, -1, dtype=np.int64)])
        doc_id = np.concatenate([np.repeat(ids, cnt), ids])
        n_grams = np.concatenate([np.zeros(tot, dtype=np.int64), cnt])
        return pa.table({
            "gram": pa.array(gram),
            "doc_id": pa.array(doc_id),
            "n_grams": pa.array(n_grams),
        })


def _pair_count_stage(max_posting: int):
    """Bucket fn over postings grouped by gram: emit per-bucket PARTIAL
    intersection counts per candidate pair — each gram shared by a pair
    contributes 1, so the global sum of these partials is exactly
    ``|grams(a) ∩ grams(b)|``.  Posting lists longer than ``max_posting``
    emit one marker row (id_a = -1, id_b = gram, inter = list length)
    instead of a quadratic pair set."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "inter": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        sizes = df.groupby("gram", sort=False)["doc_id"].transform("size")
        out_a, out_b = [], []
        m_a, m_b, m_n = [], [], []
        over = df[sizes > max_posting]
        if len(over):
            for gval, grp in over.groupby("gram", sort=False):
                m_a.append(-1)
                m_b.append(int(gval))
                m_n.append(len(grp))
        for _, grp in df[(sizes >= 2) & (sizes <= max_posting)] \
                .groupby("gram", sort=False):
            ids = np.sort(grp["doc_id"].to_numpy())
            ia, ib = np.triu_indices(len(ids), 1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a and not m_a:
            return empty
        if out_a:
            pairs = pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b)})
            partial = pairs.groupby(["id_a", "id_b"], sort=False) \
                .size().reset_index(name="inter")
            partial["inter"] = partial["inter"].astype(np.int64)
        else:
            partial = empty
        if m_a:
            partial = pd.concat([partial, pd.DataFrame({
                "id_a": pd.Series(m_a, dtype=np.int64),
                "id_b": pd.Series(m_b, dtype=np.int64),
                "inter": pd.Series(m_n, dtype=np.int64)})],
                ignore_index=True)
        return partial

    return fn


def ngram_jaccard_exact_pairs(
    ds: "rd.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 3,
    max_posting: int = 4096,
    num_buckets: int | None = None,
    with_stats: bool = False,
):
    """EXACT word-n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥
    threshold) — no LSH recall loss, and no per-pair set intersection:

    1. inverted index: posting rows (gram, doc_id) — candidates are every
       pair sharing ≥1 gram, which covers every pair with Jaccard > 0;
    2. the number of times a pair co-occurs across gram buckets IS
       ``|A ∩ B|``, so one pair-keyed count exchange yields exact
       intersections from narrow (id_a, id_b, partial) rows;
    3. two keyed attach exchanges add |A| and |B| (one int per doc) and
       ``jaccard = inter / (|A| + |B| − inter)`` filters the pairs.

    Exact up to 64-bit gram collisions and postings hotter than
    ``max_posting`` (capped lists are dropped-and-counted; with
    ``threshold`` ≥ ~0.3 a qualifying pair shares many grams, so one hot
    gram cannot hide it).  Everything that shuffles is 2-3 int64 columns.

    SQL-oracle parity: DuckDB replicates this exactly (distinct n-gram
    lists + list_intersect/list_distinct arithmetic) — see
    ``__ray_entry__.oracle_sql['jaccard_pairs_documents']``."""
    narrow = ds.select_columns([id_col, text_col])
    rows = narrow.map_batches(_GramPostingStage(text_col, id_col, ngram),
                              batch_format="pyarrow",
                              batch_size=2048).materialize()
    postings = rows.filter(expr="gram >= 0") \
        .select_columns(["gram", "doc_id"])
    sizes = rows.filter(expr="gram < 0") \
        .select_columns(["doc_id", "n_grams"])
    partials = grouped_map(postings, ["gram"], _pair_count_stage(max_posting),
                           num_buckets=num_buckets)

    def sum_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], sort=False)["inter"].sum() \
            .reset_index()
        g["inter"] = g["inter"].astype(np.int64)
        return g

    inter = grouped_map(partials.filter(expr="id_a >= 0"), ["id_a", "id_b"],
                        sum_counts, num_buckets=num_buckets)

    # attach |A| then |B| with two keyed exchanges; rows stay 3-4 ints wide
    def tag_pairs(t: pa.Table, key: str, carry: list[str]) -> pa.Table:
        cols = {"key": t[key], "is_size": pa.array(
            np.zeros(t.num_rows, dtype=bool)),
            "id_a": t["id_a"], "id_b": t["id_b"], "inter": t["inter"]}
        for c in carry:
            cols[c] = t[c]
        cols["sz"] = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table(cols)

    def tag_sizes(t: pa.Table, carry: list[str]) -> pa.Table:
        neg = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        cols = {"key": t["doc_id"], "is_size": pa.array(
            np.ones(t.num_rows, dtype=bool)),
            "id_a": neg, "id_b": neg, "inter": neg}
        for c in carry:
            cols[c] = neg
        cols["sz"] = t["n_grams"]
        return pa.table(cols)

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        sz = df[df["is_size"]][["key", "sz"]].rename(columns={"sz": "na"})
        pr = df[~df["is_size"]][["key", "id_a", "id_b", "inter"]]
        return pr.merge(sz, on="key")[["id_a", "id_b", "inter", "na"]]

    def attach_b(df: pd.DataFrame) -> pd.DataFrame:
        sz = df[df["is_size"]][["key", "sz"]].rename(columns={"sz": "nb"})
        pr = df[~df["is_size"]][["key", "id_a", "id_b", "inter", "na"]]
        m = pr.merge(sz, on="key")
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "jaccard": pd.Series(dtype=np.float64)})
        union = m["na"] + m["nb"] - m["inter"]
        m["jaccard"] = m["inter"].to_numpy(dtype=np.float64) \
            / union.to_numpy(dtype=np.float64)
        m = m[m["jaccard"] >= threshold]
        return m[["id_a", "id_b", "jaccard"]].reset_index(drop=True)

    u1 = inter.map_batches(lambda t: tag_pairs(t, "id_a", []),
                           batch_format="pyarrow") \
        .union(sizes.map_batches(lambda t: tag_sizes(t, []),
                                 batch_format="pyarrow"))
    with_a = grouped_map(u1, ["key"], attach_a, num_buckets=num_buckets)

    u2 = with_a.map_batches(
        lambda t: tag_pairs(t, "id_b", ["na"]), batch_format="pyarrow") \
        .union(sizes.map_batches(lambda t: tag_sizes(t, ["na"]),
                                 batch_format="pyarrow"))
    verified = grouped_map(u2, ["key"], attach_b, num_buckets=num_buckets)
    if not with_stats:
        return verified
    markers = partials.filter(expr="id_a < 0") \
        .select_columns(["inter"]).take_all()
    stats = {"n_buckets_skipped": len(markers),
             "n_docs_dropped": int(sum(r["inter"] for r in markers))}
    return verified, stats


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
                  max_bucket: int = DEFAULT_MAX_BUCKET,
                  with_stats: bool = False):
    """Near-duplicate pairs by SimHash: candidates share one 16-bit band
    (any distance-≤3 pair must agree on ≥1 of the 4 bands by pigeonhole);
    verified by exact Hamming distance.  The 8-byte fingerprint travels
    with each band row, so no separate attach exchange is needed.

    ``with_stats=True`` additionally returns the capped-bucket census
    (see ``minhash_lsh_pairs``)."""
    narrow = ds.select_columns([id_col, text_col])
    rows = narrow.map_batches(_SimHashStage(text_col, id_col),
                              batch_format="pyarrow", batch_size=2048)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"id_a": [], "id_b": [], "hamming": [], "n_dropped": []}
        if len(df):
            counts = df.groupby(["band_id", "band_val"], sort=False)[
                "doc_id"].transform("size")
            for (b, v), g in df[counts >= 2].groupby(
                    ["band_id", "band_val"], sort=False):
                if len(g) > max_bucket:
                    cols["id_a"].append(-1 - int(b))
                    cols["id_b"].append(int(v))
                    cols["hamming"].append(-1)
                    cols["n_dropped"].append(len(g))
                    continue
                g = g.sort_values("doc_id", kind="stable")
                ids = g["doc_id"].to_numpy()
                sh = g["sh"].to_numpy().astype(np.int64).astype(np.uint64)
                ia, ib = np.triu_indices(len(ids), 1)
                d = hamming64(sh[ia], sh[ib])
                hit = d <= max_distance
                cols["id_a"].extend(ids[ia[hit]].tolist())
                cols["id_b"].extend(ids[ib[hit]].tolist())
                cols["hamming"].extend(d[hit].astype(int).tolist())
                cols["n_dropped"].extend([0] * int(hit.sum()))
        return pd.DataFrame({
            "id_a": pd.Series(cols["id_a"], dtype=np.int64),
            "id_b": pd.Series(cols["id_b"], dtype=np.int64),
            "hamming": pd.Series(cols["hamming"], dtype=np.int64),
            "n_dropped": pd.Series(cols["n_dropped"], dtype=np.int64)})

    cand = grouped_map(rows, ["band_id", "band_val"], pairs)
    if cand.count() <= SMALL_PAIR_GUARD:
        # bounded driver dedupe: skip the second exchange wave when the
        # candidate stream is small (the common case — pairs, not docs)
        df = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"],
                                              keep="first")
        cand = rd.from_arrow(pd_to_arrow(df))
    else:
        cand = drop_duplicate_rows(cand, ["id_a", "id_b"])
    out = cand.filter(expr="id_a >= 0") \
        .select_columns(["id_a", "id_b", "hamming"])
    if not with_stats:
        return out
    markers = cand.filter(expr="id_a < 0").select_columns(["n_dropped"]) \
        .take_all()
    stats = {"n_buckets_skipped": len(markers),
             "n_docs_dropped": int(sum(r["n_dropped"] for r in markers))}
    return out, stats
