"""Text-analysis kernels for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting,
shingling.  All operate on whole Arrow/pandas batches; the per-batch cost is
vectorized regex / numpy work (compiled once at import or stage init).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# whitespace tokens and a BPE-ish segmentation (letters | digits | other)
TOKEN_RE = r"\S+"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
PUNCT_RE = r"[!-/:-@\[-`{-~]"

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "that", "it", "for")
_STOP_RE = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"

# tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic (public-knowledge function words)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "to", "that", "with"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "que"),
    "es": ("el", "los", "las", "es", "una", "que", "para"),
}
_CJK_RE = r"[一-鿿]"


def token_count(text: pa.ChunkedArray | pa.Array, pattern: str = TOKEN_RE
                ) -> pa.Array:
    return pc.count_substring_regex(pc.fill_null(text, ""), pattern)


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars/n_tokens/punct_ratio/stopword_ratio/mean_token_len and
    a composite quality score in [0,1]."""
    text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_punct = pc.count_substring_regex(text, PUNCT_RE)
    n_stop = pc.count_substring_regex(text, _STOP_RE)

    nc = np.asarray(pc.cast(n_chars, pa.float64()).combine_chunks()
                    if isinstance(n_chars, pa.ChunkedArray) else
                    pc.cast(n_chars, pa.float64()))
    nt = np.asarray(pc.cast(n_tokens, pa.float64()).combine_chunks()
                    if isinstance(n_tokens, pa.ChunkedArray) else
                    pc.cast(n_tokens, pa.float64()))
    npt = np.asarray(pc.cast(n_punct, pa.float64()).combine_chunks()
                     if isinstance(n_punct, pa.ChunkedArray) else
                     pc.cast(n_punct, pa.float64()))
    ns = np.asarray(pc.cast(n_stop, pa.float64()).combine_chunks()
                    if isinstance(n_stop, pa.ChunkedArray) else
                    pc.cast(n_stop, pa.float64()))

    punct_ratio = np.divide(npt, np.maximum(nc, 1))
    stop_ratio = np.divide(ns, np.maximum(nt, 1))
    mean_tok = np.divide(nc, np.maximum(nt, 1))
    # heuristic composite: long enough, some stopwords, sane punctuation,
    # word lengths in a natural band
    score = (
        np.clip(nt / 50.0, 0, 1) * 0.3
        + np.clip(stop_ratio / 0.4, 0, 1) * 0.3
        + (1 - np.clip(punct_ratio / 0.2, 0, 1)) * 0.2
        + np.exp(-0.5 * ((mean_tok - 5.0) / 3.0) ** 2) * 0.2
    )
    out = batch
    for name, arr in (("n_chars", nc.astype(np.int64)),
                      ("n_tokens", nt.astype(np.int64)),
                      ("punct_ratio", punct_ratio),
                      ("stopword_ratio", stop_ratio),
                      ("quality_score", score)):
        out = out.append_column(name, pa.array(arr))
    return out


def langid_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append `lang_pred`: argmax of per-language marker-word hit rates,
    with a CJK-character override → 'zh'; 'und' when nothing matches."""
    text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    n = batch.num_rows
    scores = np.zeros((len(LANG_MARKERS), n), dtype=np.float64)
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs):
        pat = r"(?i)\b(?:" + "|".join(LANG_MARKERS[lang]) + r")\b"
        hits = pc.count_substring_regex(text, pat)
        arr = hits.combine_chunks() if isinstance(hits, pa.ChunkedArray) else hits
        scores[i] = np.asarray(pc.cast(arr, pa.float64()))
    cjk = pc.count_substring_regex(text, _CJK_RE)
    cjk_np = np.asarray(pc.cast(
        cjk.combine_chunks() if isinstance(cjk, pa.ChunkedArray) else cjk,
        pa.float64()))
    best = np.argmax(scores, axis=0)
    best_score = scores[best, np.arange(n)]
    pred = np.array(langs, dtype=object)[best]
    pred[best_score == 0] = "und"
    pred[cjk_np > 0] = "zh"
    return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def fingerprint_md5(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fp") -> pa.Table:
    """Content fingerprint as hex MD5 — chosen for SQL-oracle parity
    (DuckDB md5()).  Per-cell hashlib call; use fingerprint64 for the
    numpy-vectorized scale path."""
    texts = batch[text_col].to_pylist()
    fps = [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest()
           for t in texts]
    return batch.append_column(out_col, pa.array(fps, type=pa.string()))


def fingerprint64(batch: pa.Table, text_col: str = "text",
                  out_col: str = "fp64") -> pa.Table:
    """Vectorized 64-bit content fingerprint (pandas hash_array — siphash
    variant); the scale-path dedup key."""
    texts = np.asarray(batch[text_col].to_pandas().fillna(""), dtype=object)
    h = pd.util.hash_array(texts).astype(np.uint64)
    return batch.append_column(out_col, pa.array(h.astype(np.int64)))


def line_repetition_stats(batch: pa.Table, text_col: str = "text"
                          ) -> pa.Table:
    """Gopher-style repetition signal: per-document duplicate-line
    fraction.  Fully vectorized — one Arrow split into a list array, one
    pandas hash over the flattened lines, one lexsort to count distinct
    (doc, line) pairs; no Python loop over documents or lines.

    Line identity is by 64-bit hash (pd.util.hash_array): a collision
    would under-count distincts, negligible at any realistic corpus size
    but noted for exactness-sensitive comparisons.

    Returns columns: n_lines, n_distinct_lines (int64).  An empty text
    counts as one (empty) line — matching SQL ``string_split``."""
    text = pc.fill_null(batch[text_col], "")
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offs = np.asarray(lines.offsets)
    n_lines = np.diff(offs).astype(np.int64)
    flat = np.asarray(lines.flatten().to_pandas(), dtype=object)
    if len(flat):
        h = pd.util.hash_array(flat)
        doc_idx = np.repeat(np.arange(len(n_lines), dtype=np.int64), n_lines)
        order = np.lexsort((h, doc_idx))
        hs, di = h[order], doc_idx[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (di[1:] != di[:-1])
        n_distinct = np.bincount(di[first], minlength=len(n_lines)) \
            .astype(np.int64)
    else:
        n_distinct = np.zeros(len(n_lines), dtype=np.int64)
    out = batch.drop_columns([text_col])
    out = out.append_column("n_lines", pa.array(n_lines))
    return out.append_column("n_distinct_lines", pa.array(n_distinct))


def json_scalar_int(col: pa.Array | pa.ChunkedArray, field: str) -> pa.Array:
    """Extract an integer field from a FLAT JSON-object string column with
    one vectorized Arrow regex (null where the field is absent).  This is
    the fast path for telemetry-style props columns; nested objects or
    escaped strings need a real parser inside an actor stage instead."""
    import re as _re
    pat = '"' + _re.escape(field) + r'"\s*:\s*(?P<v>-?[0-9]+)'
    ext = pc.extract_regex(pc.fill_null(pc.cast(col, pa.string()), ""), pat)
    if isinstance(ext, pa.ChunkedArray):
        ext = ext.combine_chunks()
    return pc.cast(pc.struct_field(ext, "v"), pa.int64())


def deterministic_sample_mask(col: pa.Array | pa.ChunkedArray, *,
                              rate_pct: int, salt: str = "") -> np.ndarray:
    """Stable content-hash Bernoulli sample: keep rows where the first 32
    bits of md5(salt + value) mod 100 < rate_pct.  Deterministic across
    runs/cluster sizes and SQL-replicable (DuckDB:
    ``CAST(concat('0x', substr(md5(v), 1, 8)) AS BIGINT) % 100``).
    Per-cell hashlib — pair with ``fingerprint64`` + modulo for the
    numpy-vectorized scale path when SQL parity is not needed."""
    return deterministic_hash_pct(col, salt=salt) < rate_pct


def deterministic_hash_pct(col: pa.Array | pa.ChunkedArray, *,
                           salt: str = "") -> np.ndarray:
    """md5(salt + value) → first 32 bits mod 100, per row — the shared
    primitive behind deterministic (and per-row-rate mixture) sampling.
    SQL-replicable with the same expression as
    ``deterministic_sample_mask``."""
    vals = col.to_pylist()
    out = np.empty(len(vals), dtype=np.int64)
    for i, v in enumerate(vals):
        h = hashlib.md5((salt + ("" if v is None else str(v)))
                        .encode("utf-8")).hexdigest()
        out[i] = int(h[:8], 16) % 100
    return out


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-char shingle set of one document (sorted uint64)."""
    if len(text) < k:
        shingles = [text] if text else []
    else:
        shingles = [text[i:i + k] for i in range(len(text) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(shingles, dtype=object)).astype(np.uint64)
    return np.unique(h)


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Hashed word n-gram set of one document (sorted uint64)."""
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)
    return np.unique(h)


def batch_word_gram_hashes(texts: list, n: int = 3
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Batch-vectorized hashed word n-gram SETS: one Arrow whitespace
    split + ONE token hash call for the whole batch, window combine by a
    polynomial fold over shifted slices, per-doc unique via lexsort.

    Returns ``(gram_hashes, counts)`` — gram hashes packed doc-major
    (sorted unique within each doc), ``counts[i]`` grams for doc i.  Gram
    hashes combine *token hashes* rather than hashing the joined gram
    string, so values differ from :func:`word_ngrams` — set cardinalities
    (and hence exact Jaccard) are preserved up to negligible 64-bit
    collisions.  A doc with 0 < tokens < n yields one whole-doc gram,
    mirroring :func:`word_ngrams`."""
    nd = len(texts)
    if nd == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
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
    thp = np.concatenate([th, np.zeros(n - 1, dtype=np.uint64)])
    with np.errstate(over="ignore"):
        acc = np.zeros(T, dtype=np.uint64)
        for k in range(n):
            acc = acc * mult + thp[k:k + T]
    par_p = np.concatenate([par, np.full(n - 1, -1, dtype=par.dtype)]) \
        if T else par
    valid = (par_p[:T] == par_p[n - 1:n - 1 + T]) if T \
        else np.zeros(0, dtype=bool)
    g, gp = acc[valid], par[valid]
    short = np.nonzero((cnt > 0) & (cnt < n))[0]
    if short.size:  # rare: whole-doc gram for docs shorter than n tokens
        starts = np.concatenate(([0], np.cumsum(cnt)))
        extra = np.empty(short.size, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j, d in enumerate(short):
                a = np.uint64(0)
                for v in th[starts[d]:starts[d + 1]]:
                    a = a * mult + v
                extra[j] = a
        g = np.concatenate([g, extra])
        gp = np.concatenate([gp, short])
    order = np.lexsort((g, gp))
    g, gp = g[order], gp[order]
    if len(g):
        first = np.concatenate(
            ([True], (gp[1:] != gp[:-1]) | (g[1:] != g[:-1])))
        g, gp = g[first], gp[first]
    return g, np.bincount(gp, minlength=nd).astype(np.int64)


def char_entropy(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-document Shannon entropy (bits) of the codepoint distribution —
    the gibberish / binary-noise quality signal.  Fully vectorized: one
    join + utf-32 decode yields a flat uint32 codepoint array aligned
    with ``utf8_length`` offsets (utf-32 is one unit per codepoint, the
    same unit SQL's char split uses); a single lexsort over
    (doc, codepoint) gives run lengths, and one scatter-add folds
    -(c/n)·log2(c/n) per document.  Empty/null docs score 0.0."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.fill_null(pc.cast(col, pa.string()), "")
    n_docs = len(s)
    lens = np.asarray(pc.utf8_length(s), dtype=np.int64)
    buf = "".join(s.to_pylist())
    cp = np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32)
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    if not len(cp):
        return np.zeros(n_docs, dtype=np.float64)
    order = np.lexsort((cp, doc))
    d_s, c_s = doc[order], cp[order]
    # run starts where (doc, codepoint) changes
    new = np.concatenate(([True], (d_s[1:] != d_s[:-1])
                          | (c_s[1:] != c_s[:-1])))
    starts = np.flatnonzero(new)
    counts = np.diff(np.concatenate((starts, [len(c_s)])))
    run_doc = d_s[starts]
    p = counts / lens[run_doc]
    ent = np.zeros(n_docs, dtype=np.float64)
    np.add.at(ent, run_doc, -p * np.log2(p))
    return ent
