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
