"""Distributed dense linear algebra over embedding columns.

Covariance / scatter-matrix estimation is the entry point to the
whitening–PCA–projection family of embedding preprocessing steps.  The
implementation is the classic augmented-moment trick: per batch, append
a constant-1 coordinate to each vector and fold the batch into a single
(d+1)×(d+1) Gram partial ``m_augᵀ·m_aug`` (one BLAS matmul), whose
entries are simultaneously the row count (0,0), the per-dimension sums
(0,j) and all cross sums (i,j).  Only (i, j, s) rows — (d+1)² scalars
per batch, independent of row count — cross the ``groupby`` exchange.
The merged moment table is tiny (d² scalars), so the covariance finish
(s_ij/n − μ_i·μ_j) folds on the driver; at d where d² stops being tiny
the finish becomes one more map over the merged rows joined to the
first-moment row — the exchange shape is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from crn_meta_validate_ray.stages.similarity import _matrix


def moment_partials(ds: "rd.Dataset", *, vec_col: str = "embedding"
                    ) -> "rd.Dataset":
    """(i, j, s) rows of the augmented Gram matrix, summed over batches.

    1-based vector positions; i=0 / j=0 hold the constant coordinate, so
    s(0,0)=n, s(0,j)=Σx_j, s(i,j)=Σx_i·x_j."""

    def partial(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col).astype(np.float64)
        if m.size == 0:
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64())})
        aug = np.hstack([np.ones((m.shape[0], 1)), m])
        g = aug.T @ aug
        d1 = g.shape[0]
        return pa.table({
            "i": pa.array(np.repeat(np.arange(d1, dtype=np.int64), d1)),
            "j": pa.array(np.tile(np.arange(d1, dtype=np.int64), d1)),
            "s": pa.array(g.ravel())})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["i", "j"]).aggregate(Sum("s", alias_name="s"))


def _fold_moments(rows) -> tuple[float, np.ndarray, np.ndarray]:
    """Fold merged (i, j, s) moment rows into (n, mean, covariance)."""
    d1 = max(r["i"] for r in rows) + 1
    g = np.zeros((d1, d1), dtype=np.float64)
    for r in rows:
        g[r["i"], r["j"]] = r["s"]
    n = g[0, 0]
    mu = g[0, 1:] / n
    cov = g[1:, 1:] / n - np.outer(mu, mu)
    return n, mu, cov


def covariance(ds: "rd.Dataset", *, vec_col: str = "embedding",
               ndigits: int | None = 5) -> pa.Table:
    """Population covariance matrix as (i, j, cov) rows, 1-based dims.

    The moment reduction is fully distributed; only the merged (d+1)²
    scalars reach the driver."""
    rows = moment_partials(ds, vec_col=vec_col).take_all()
    if not rows:
        return pa.table({"i": pa.array([], type=pa.int64()),
                         "j": pa.array([], type=pa.int64()),
                         "cov": pa.array([], type=pa.float64())})
    _n, _mu, cov = _fold_moments(rows)
    if ndigits is not None:
        cov = np.round(cov, ndigits)
    d = cov.shape[0]
    return pa.table({
        "i": pa.array(np.repeat(np.arange(1, d + 1, dtype=np.int64), d)),
        "j": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), d)),
        "cov": pa.array(cov.ravel())})


def pca_project(ds: "rd.Dataset", *, n_components: int,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> tuple["rd.Dataset", dict]:
    """PCA dimensionality reduction of an embedding column.

    The expensive part — the covariance estimate — is the distributed
    moment reduction above; the eigendecomposition is a driver-side
    ``numpy.linalg.eigh`` of the tiny d×d matrix, and the projection is
    a map-only broadcast matmul (components shipped once via ``ray.put``,
    read zero-copy per task).  Component sign is fixed deterministically
    (largest-|loading| coordinate made positive) so results don't depend
    on LAPACK build details.

    Returns (projected rows: id_col + ``pc`` list<double>, info dict
    with eigenvalues and explained-variance ratio).
    """
    import ray

    rows = moment_partials(ds, vec_col=vec_col).take_all()
    if not rows:
        empty = rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "pc": pa.array([], pa.list_(pa.float64()))}))
        return empty, {"eigenvalues": [], "explained_ratio": []}
    _n, mu, cov = _fold_moments(rows)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order]                  # (d, k)
    # deterministic sign: make the largest-|loading| coordinate positive
    pivot = np.argmax(np.abs(comps), axis=0)
    signs = np.sign(comps[pivot, np.arange(comps.shape[1])])
    signs[signs == 0] = 1.0
    comps = comps * signs
    evals = w[order]
    total = float(np.trace(cov))
    info = {"eigenvalues": evals.tolist(),
            "explained_ratio": (evals / total).tolist() if total else []}
    state = ray.put((mu, comps))

    def project(t: pa.Table) -> pa.Table:
        mu_, comps_ = ray.get(state)
        m = _matrix(t, vec_col).astype(np.float64)
        proj = (m - mu_) @ comps_ if m.size else \
            np.zeros((0, comps_.shape[1]))
        k = comps_.shape[1]
        return pa.table({
            id_col: pa.array(np.asarray(t[id_col].to_pandas(),
                                        dtype=np.int64)),
            "pc": pa.FixedSizeListArray.from_arrays(
                pa.array(proj.ravel(), type=pa.float64()), k).cast(
                    pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True), info
