"""MinHash / SimHash primitives (numpy, mergeable with groupby stages).

Standard published constructions:

- MinHash (Broder 1997): signature[i] = min over shingle hashes h of
  (a_i * h + b_i) mod p, with fixed seeded (a_i, b_i); Jaccard similarity is
  estimated by signature agreement rate.
- LSH banding: split the H-long signature into b bands of r rows; documents
  sharing any (band_id, band_hash) are candidate pairs — probability of
  candidacy ≈ 1-(1-s^r)^b for Jaccard s.
- SimHash (Charikar 2002): sign-aggregated 64-bit token-hash fingerprint;
  near-duplicates have small Hamming distance.
"""

from __future__ import annotations

import numpy as np

_MERSENNE_P = np.uint64((1 << 61) - 1)


class MinHasher:
    def __init__(self, num_hashes: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_hashes = num_hashes
        self.a = rng.integers(1, _MERSENNE_P, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE_P, size=num_hashes, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(H,) uint64 signature of one document's shingle-hash set."""
        if shingle_hashes.size == 0:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max,
                           dtype=np.uint64)
        # (H, S) affine transform mod p, min over shingles
        x = (self.a[:, None] * shingle_hashes[None, :] + self.b[:, None]) \
            % _MERSENNE_P
        return x.min(axis=1)

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())

    def signatures_from_grams(self, gram_hashes: np.ndarray,
                              counts: np.ndarray) -> np.ndarray:
        """(n_docs, H) signatures from packed per-doc gram-hash sets
        (doc-major, ``counts[i]`` hashes for doc i) — segmented min via
        ``np.minimum.reduceat`` over the non-empty segments; empty docs
        get the all-max empty signature."""
        nd = len(counts)
        sigs = np.full((nd, self.num_hashes), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        ne = np.nonzero(counts > 0)[0]
        if not ne.size:
            return sigs
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1][ne]
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                x = (self.a[i] * gram_hashes + self.b[i]) % _MERSENNE_P
                sigs[ne, i] = np.minimum.reduceat(x, starts)
        return sigs

    def batch_signatures_chars(self, texts: list, k: int = 5) -> np.ndarray:
        """(n_docs, H) signatures over byte-level k-gram shingles, fully
        vectorized: one rolling-window hash over the concatenated utf-8
        buffer, then per-hash-function affine transform + segmented min
        (``np.minimum.reduceat``).  No Python loop over documents."""
        from numpy.lib.stride_tricks import sliding_window_view

        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_hashes), dtype=np.uint64)
        bufs = [(t or "").encode("utf-8") for t in texts]
        bufs = [b if len(b) >= k else b.ljust(k, b"\0") for b in bufs]
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        n_windows = lens - k + 1
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = int(n_windows.sum())
        # rows of the sliding window view belonging to in-document windows
        seg_end = np.cumsum(n_windows)
        within = np.arange(total) - np.repeat(seg_end - n_windows, n_windows)
        rows = np.repeat(starts, n_windows) + within
        W = sliding_window_view(buf, k)[rows].astype(np.uint64)
        with np.errstate(over="ignore"):
            powers = np.array(
                [pow(1099511628211, j, 1 << 64) for j in range(k)],
                dtype=np.uint64)
            h = (W * powers[None, :]).sum(axis=1)
            # splitmix-style finalizer (matches state.sketches.hash64 shape)
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
        offsets = np.concatenate(([0], seg_end[:-1]))
        sigs = np.empty((n, self.num_hashes), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                x = (self.a[i] * h + self.b[i]) % _MERSENNE_P
                sigs[:, i] = np.minimum.reduceat(x, offsets)
        return sigs


def band_hashes(signature: np.ndarray, bands: int) -> np.ndarray:
    """(bands,) int64 hash per band of the signature."""
    rows = len(signature) // bands
    sig = signature[: bands * rows].reshape(bands, rows)
    # fold each band to one value (order-sensitive polynomial fold)
    out = np.zeros(bands, dtype=np.uint64)
    mult = np.uint64(1099511628211)
    for j in range(rows):
        out = out * mult + sig[:, j]
    return out.astype(np.int64)


def simhash64(token_hashes: np.ndarray,
              weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of one document's token-hash multiset."""
    if token_hashes.size == 0:
        return np.uint64(0)
    if weights is None:
        weights = np.ones(len(token_hashes))
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.float64)
    acc = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(acc > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
