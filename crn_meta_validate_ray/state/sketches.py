"""Mergeable sketches: HyperLogLog, Count-Min, t-digest.

Pure-numpy implementations of the standard published algorithms:

- HyperLogLog (Flajolet et al. 2007) with the small-range linear-counting
  correction — used for distinct-count screening of conv_id /
  (conv_id, turn_idx) uniqueness at scale;
- Count-Min sketch (Cormode & Muthukrishnan 2005) — heavy-hitter frequency
  estimates for role/tool vocabularies;
- a simplified merging t-digest (Dunning & Ertl 2019): cluster centroids with
  size bounded by a scale function — quantile estimates for turn-count and
  ts-gap distribution-drift checks.

All three support ``update`` (vectorized over numpy arrays), ``merge`` and
byte serialization, so partial sketches can be emitted as rows from
``map_batches`` stages and folded with ``groupby``/driver reduces — the
scalable replacement for the reference's exact in-memory ``unique()`` /
counters (utils/validate_core.py:244, :232).
"""

from __future__ import annotations

import pickle

import numpy as np


def hash64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of a string/int array (FNV-1a over bytes for
    strings via numpy void view; splitmix64 finalizer)."""
    if values.dtype.kind in ("i", "u"):
        h = values.astype(np.uint64, copy=True)
    else:
        # string path: stable python-free hashing via pandas util
        import pandas as pd
        h = pd.util.hash_array(np.asarray(values, dtype=object),
                               hash_key="{:016d}".format(seed)).astype(np.uint64)
        return h
    with np.errstate(over="ignore"):  # modular 64-bit arithmetic intended
        h ^= np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


class HyperLogLog:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray):
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # remaining bits shifted to the top, with a guard bit so bits != 0
        # and the rank is bounded by 64-p+1
        bits = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # leading-zero count via log2: rank = 64 - floor(log2(bits)).
        # float64 rounding can mis-rank a ~1e-16 fraction of hashes by one —
        # immaterial to the estimator and fully deterministic.
        fl = np.floor(np.log2(bits.astype(np.float64)))
        rank = np.clip(64 - fl, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def update(self, values: np.ndarray, seed: int = 0):
        if len(values):
            self.update_hashes(hash64(values, seed))

    def merge(self, other: "HyperLogLog"):
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers.tobytes()))

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        p, raw = pickle.loads(data)
        out = cls(p)
        out.registers = np.frombuffer(raw, dtype=np.uint8).copy()
        return out


class CountMin:
    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def update(self, values: np.ndarray, counts: np.ndarray | None = None):
        if not len(values):
            return
        if counts is None:
            counts = np.ones(len(values), dtype=np.int64)
        for d in range(self.depth):
            idx = (hash64(values, seed=d + 1) % np.uint64(self.width)).astype(np.int64)
            self.table[d] += np.bincount(idx, weights=counts,
                                         minlength=self.width).astype(np.int64)

    def query(self, value) -> int:
        v = np.asarray([value])
        ests = [
            self.table[d][int(hash64(v, seed=d + 1)[0] % np.uint64(self.width))]
            for d in range(self.depth)
        ]
        return int(min(ests))

    def merge(self, other: "CountMin"):
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.width, self.depth, self.table.tobytes()))

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        w, d, raw = pickle.loads(data)
        out = cls(w, d)
        out.table = np.frombuffer(raw, dtype=np.int64).reshape(d, w).copy()
        return out


class TDigest:
    """Merging t-digest with k1-style size bound: keeps at most
    ``max_centroids`` weighted centroids; quantile queries interpolate."""

    def __init__(self, max_centroids: int = 100):
        self.max_centroids = max_centroids
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def update(self, values: np.ndarray, weights: np.ndarray | None = None):
        values = np.asarray(values, dtype=np.float64)
        values = values[np.isfinite(values)]
        if not len(values):
            return
        w = np.ones(len(values)) if weights is None else np.asarray(weights, float)
        if len(self.means):
            self.means = np.concatenate([self.means, values])
            self.weights = np.concatenate([self.weights, w])
        else:
            self.means, self.weights = values, w
        if len(self.means) > 8 * self.max_centroids:
            self._compress()

    def merge(self, other: "TDigest"):
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        if len(self.means) > 8 * self.max_centroids:
            self._compress()
        return self

    def _compress(self):
        if len(self.means) <= self.max_centroids:
            return
        n = len(self.means)
        C = self.max_centroids
        # scale function: uniform weight buckets with tighter tails —
        # bucket(q) = floor((arcsin(2q-1)/pi + 1/2) * C).  Rather than an
        # arcsin per ELEMENT, invert the (monotonic) scale at the C-1
        # bucket boundaries; cumulative weight is sorted, so buckets are
        # contiguous runs — O(C) transcendentals + segment sums, and the
        # (common) unit-weight case needs no argsort/take at all
        j = np.arange(1, C)
        q_bound = (np.sin(np.pi * (j / C - 0.5)) + 1) / 2
        if self.weights.size and self.weights[0] == 1.0 \
                and np.all(self.weights == 1.0):
            m = np.sort(self.means)
            # row i has cumulative weight i + 0.5
            split = np.clip(np.ceil(q_bound * n - 0.5).astype(np.int64),
                            0, n)
            seg = np.concatenate([[0], split, [n]])
            cs = np.concatenate([[0.0], np.cumsum(m)])
            sums = cs[seg[1:]] - cs[seg[:-1]]
            ws = np.diff(seg).astype(np.float64)
        else:
            order = np.argsort(self.means, kind="stable")
            m, w = self.means[order], self.weights[order]
            cum = np.cumsum(w)
            total = cum[-1]
            split = np.searchsorted(cum - w / 2, q_bound * total,
                                    side="left")
            seg = np.concatenate([[0], split, [n]])
            cs = np.concatenate([[0.0], np.cumsum(m * w)])
            cw = np.concatenate([[0.0], cum])
            sums = cs[seg[1:]] - cs[seg[:-1]]
            ws = cw[seg[1:]] - cw[seg[:-1]]
        keep = ws > 0
        self.means = sums[keep] / ws[keep]
        self.weights = ws[keep]

    def quantile(self, q: float) -> float:
        self._compress()
        if not len(self.means):
            return float("nan")
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        cum = np.cumsum(w) - w / 2
        target = q * w.sum()
        return float(np.interp(target, cum, m))

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps((self.max_centroids, self.means.tobytes(),
                             self.weights.tobytes()))

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        mc, mraw, wraw = pickle.loads(data)
        out = cls(mc)
        out.means = np.frombuffer(mraw, dtype=np.float64).copy()
        out.weights = np.frombuffer(wraw, dtype=np.float64).copy()
        return out
