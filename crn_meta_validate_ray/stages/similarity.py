"""Similarity search over an embedding column (``list<float>``):

- **brute-force cosine top-k** — the correctness baseline: the (small)
  query matrix is normalized once, ``ray.put`` into the object store, and
  every batch does one numpy matmul against it; per-batch local top-k
  partials are merged by a tiny per-query reduce;
- **hyperplane-LSH bucketed ANN** — the scale path: random-hyperplane sign
  buckets co-locate similar vectors, top-k runs within buckets (recall
  traded for a shuffle of (bucket, id, vec) instead of an all-pairs scan);
- **embedding cosine near-duplicate pairs** — all pairs with cosine ≥
  threshold; ``mode='auto'`` routes between the exact broadcast pattern
  (small side: row-count AND matrix-byte budgets both satisfied) and the
  bucketed-LSH scale path through one API.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from crn_meta_validate_ray.stages.common import pd_to_arrow

import ray
import ray.data as rd


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class _ScoreBatch:
    """Actor-pool stage: fetch the broadcast query matrix once per actor."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        self.q = ray.get(queries_ref) if not isinstance(queries_ref,
                                                        np.ndarray) \
            else queries_ref  # (Q, D) normalized
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch, self.vec_col))
        if m.size == 0:
            return pa.table({"query_idx": pa.array([], type=pa.int32()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        scores = m @ self.q.T  # (n, Q)
        ids = np.asarray(batch[self.id_col].to_pandas())
        k = min(self.k, scores.shape[0])
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, Q)
        qi, vi, sc = [], [], []
        for q in range(scores.shape[1]):
            rows = top[:, q]
            qi.extend([q] * len(rows))
            vi.extend(ids[rows].tolist())
            sc.extend(scores[rows, q].astype(np.float64).tolist())
        return pa.table({"query_idx": pa.array(qi, type=pa.int32()),
                         "vec_id": pa.array(vi, type=pa.int64()),
                         "score": pa.array(sc, type=pa.float64())})


def _merge_topk_partials(partials: "rd.Dataset", k: int) -> "rd.Dataset":
    """Per-query merge of a bounded partial top-k stream (≤ k × Q rows per
    block) on the driver — a distributed groupby here would cost a whole
    shuffle for a result that fits in one hand.  Ranks 0..k-1, ties broken
    by vec_id for determinism."""
    frames = [b.to_pandas() for b in partials.iter_batches(
        batch_size=1 << 16, batch_format="pyarrow")]
    allp = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"query_idx": [], "vec_id": [], "score": []})
    allp = allp.sort_values(["query_idx", "score", "vec_id"],
                            ascending=[True, False, True], kind="stable")
    topk = allp.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_idx", sort=False).cumcount() \
        .astype(np.int32)
    import ray.data as _rd
    return _rd.from_arrow(pd_to_arrow(
        topk[["query_idx", "rank", "vec_id", "score"]]))


def knn_brute_force(ds: "rd.Dataset", queries: np.ndarray, k: int = 10,
                    *, id_col: str = "vec_id", vec_col: str = "embedding",
                    concurrency=None) -> "rd.Dataset":
    """Exact cosine top-k: per-batch partial top-k then per-query merge.
    Output: (query_idx, rank, vec_id, score), rank 0..k-1, ties broken by
    vec_id for determinism.

    Stateless tasks by default — the broadcast query matrix is a plasma
    object, and ``ray.get`` inside a task is a zero-copy shared-memory
    read after the first touch per node, so an actor pool would only add
    spin-up latency.  Pass a ``concurrency`` tuple for an actor pool."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(qn)
    if concurrency is not None:
        partials = ds.map_batches(
            _ScoreBatch, fn_constructor_args=(qref, id_col, vec_col, k),
            batch_format="pyarrow", concurrency=concurrency,
            zero_copy_batch=True)
    else:
        def score(batch: pa.Table) -> pa.Table:
            return _ScoreBatch(qref, id_col, vec_col, k)(batch)

        partials = ds.map_batches(score, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return _merge_topk_partials(partials, k)


class _BucketStage:
    """Hyperplane-LSH bucketing: sign bits of ``planes @ vec``."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch, "embedding")
        signs = (m @ self.planes.T) > 0  # (n, P)
        bucket = np.zeros(len(m), dtype=np.int64)
        for p in range(signs.shape[1]):
            bucket = (bucket << 1) | signs[:, p]
        return batch.append_column("bucket", pa.array(bucket))


def lsh_ann(ds: "rd.Dataset", queries: np.ndarray, k: int = 10,
            *, id_col: str = "vec_id", vec_col: str = "embedding",
            n_planes: int = 8, seed: int = 11,
            multiprobe: int = 1) -> "rd.Dataset":
    """Approximate top-k: queries are routed to their hyperplane bucket and
    compared only against vectors in the same bucket(s).

    ``multiprobe`` ∈ {0, 1, 2} is the recall lever: each query
    additionally probes every bucket within that Hamming distance of its
    own sign pattern (1 → the ``n_planes`` one-bit-flip neighbours — the
    vectors a single near-boundary hyperplane put on the other side).
    Probing costs no extra shuffle: only the query→bucket routing table
    grows; the dataset side is still bucketed once.  ``multiprobe=0`` is
    the classic single-probe; per-query results merge across probed
    buckets before the final top-k cut."""
    if multiprobe not in (0, 1, 2):
        raise ValueError("multiprobe supports 0, 1 or 2 bit flips")
    queries = np.asarray(queries, dtype=np.float32)
    dim = queries.shape[1]
    stage = _BucketStage(dim, n_planes, seed)
    qsigns = (queries @ stage.planes.T) > 0
    qbucket = np.zeros(len(queries), dtype=np.int64)
    for p in range(qsigns.shape[1]):
        qbucket = (qbucket << 1) | qsigns[:, p]
    qn = _normalize(queries)
    by_bucket: dict[int, list[int]] = {}
    for qi, b in enumerate(qbucket):
        probes = {int(b)}
        if multiprobe >= 1:
            probes |= {int(b) ^ (1 << j) for j in range(n_planes)}
        if multiprobe >= 2:
            for j in range(n_planes):
                for l in range(j + 1, n_planes):
                    probes.add(int(b) ^ (1 << j) ^ (1 << l))
        for pb in probes:
            by_bucket.setdefault(pb, []).append(qi)

    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        stage, batch_format="pyarrow")

    def within(df: pd.DataFrame) -> pd.DataFrame:
        out = {"query_idx": [], "vec_id": [], "score": []}
        for b, g in df.groupby("bucket", sort=False):
            qis = by_bucket.get(int(b), [])
            if not qis:
                continue
            m = _normalize(np.vstack(g[vec_col].to_numpy())
                           .astype(np.float32))
            ids = g[id_col].to_numpy()
            for qi in qis:
                scores = m @ qn[qi]
                order = np.lexsort((ids, -scores))[:k]
                out["query_idx"].extend([qi] * len(order))
                out["vec_id"].extend(ids[order].tolist())
                out["score"].extend(scores[order].astype(np.float64).tolist())
        res = pd.DataFrame(out)
        if not len(res):
            res = pd.DataFrame({"query_idx": pd.Series(dtype=np.int64),
                                "vec_id": pd.Series(dtype=np.int64),
                                "score": pd.Series(dtype=np.float64)})
        return res

    from crn_meta_validate_ray.stages.common import grouped_map

    # a vector lives in exactly one bucket, so (query, vec) partials are
    # unique across probed buckets — merge + final rank cut per query
    partials = grouped_map(bucketed, ["bucket"], within)
    return _merge_topk_partials(partials, k)


class _NearDupBatch:
    def __init__(self, ref, ids_ref, threshold: float, vec_col: str,
                 id_col: str):
        self.ref = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        if isinstance(self.ref, tuple):  # (matrix, ids) built by a Ray task
            self.ref, self.ref_ids = self.ref
        else:
            self.ref_ids = ray.get(ids_ref) \
                if not isinstance(ids_ref, np.ndarray) else ids_ref
        self.threshold = threshold
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch, self.vec_col))
        ids = np.asarray(batch[self.id_col].to_pandas())
        out = {"id_a": [], "id_b": [], "cosine": []}
        if m.size:
            scores = m @ self.ref.T  # (n, N)
            hits = np.argwhere(scores >= self.threshold)
            for i, j in hits:
                a, b = int(ids[i]), int(self.ref_ids[j])
                if a < b:  # dedupe (a,b)/(b,a) and self-pairs
                    out["id_a"].append(a)
                    out["id_b"].append(b)
                    out["cosine"].append(float(scores[i, j]))
        return pa.table({"id_a": pa.array(out["id_a"], type=pa.int64()),
                         "id_b": pa.array(out["id_b"], type=pa.int64()),
                         "cosine": pa.array(out["cosine"], type=pa.float64())})


def _build_ref_matrix(vec_col: str, id_col: str, *tbls):
    """Ray task: concatenate blocks into one normalized reference matrix —
    the matrix lives in the object store, never on the driver."""
    mats = [_matrix(t, vec_col) for t in tbls if t.num_rows]
    ids = [np.asarray(t[id_col].to_pandas()) for t in tbls if t.num_rows]
    full = _normalize(np.vstack(mats)) if mats else np.zeros((0, 0),
                                                             np.float32)
    all_ids = np.concatenate(ids) if ids else np.array([], dtype=np.int64)
    return full, all_ids


NEAR_DUP_SMALL_N = 200_000  # broadcast guard: O(N²) verify compute bound
# broadcast guard #2: the normalized reference matrix (N×D float32) lives
# in the object store and is mapped zero-copy by every worker — cap its
# size so it cannot crowd out the streaming blocks' share of plasma
NEAR_DUP_BYTE_BUDGET = 2 << 30


def _near_dup_broadcast(narrow: "rd.Dataset", threshold: float,
                        id_col: str, vec_col: str) -> "rd.Dataset":
    """Exact all-pairs via a broadcast reference matrix (small-N fast
    path): one Ray task folds the materialized blocks into a (N, D)
    normalized matrix; every batch matmuls against it.  O(N²) compute —
    only valid behind the ``NEAR_DUP_SMALL_N`` guard."""
    mat = narrow.materialize()
    refs = mat.to_arrow_refs()
    build = ray.remote(_build_ref_matrix)
    ref = build.remote(vec_col, id_col, *refs)

    # stateless tasks: ray.get of the reference matrix is zero-copy plasma
    def score(batch: pa.Table) -> pa.Table:
        return _NearDupBatch(ref, None, threshold, vec_col, id_col)(batch)

    return mat.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)


class _MultiTableBucketStage:
    """Emit one row per (table_id, bucket) per vector: ``n_tables``
    independent hyperplane sign buckets co-locate near-parallel vectors in
    ≥1 table with high probability (miss ≈ (1-(1-θ/π)^P)^T for angle θ)."""

    def __init__(self, dim: int, id_col: str, vec_col: str,
                 n_planes: int, n_tables: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal(
            (n_tables, n_planes, dim)).astype(np.float32)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch, self.vec_col)
        n_tables, n_planes, _ = self.planes.shape
        n = len(m)
        if n == 0:
            return pa.table({
                "table_id": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.int64()),
                self.id_col: pa.array([], type=pa.int64()),
                self.vec_col: batch[self.vec_col]})
        ids = np.asarray(batch[self.id_col].to_pandas())
        t_ids, buckets, out_idx = [], [], []
        for t in range(n_tables):
            signs = (m @ self.planes[t].T) > 0
            b = np.zeros(n, dtype=np.int64)
            for p in range(n_planes):
                b = (b << 1) | signs[:, p]
            t_ids.append(np.full(n, t, dtype=np.int32))
            buckets.append(b)
            out_idx.append(np.arange(n))
        idx = np.concatenate(out_idx)
        vecs = batch[self.vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        return pa.table({
            "table_id": pa.array(np.concatenate(t_ids)),
            "bucket": pa.array(np.concatenate(buckets)),
            self.id_col: pa.array(ids[idx]),
            self.vec_col: vecs.take(pa.array(idx)),
        })


def _near_dup_lsh(narrow: "rd.Dataset", threshold: float, id_col: str,
                  vec_col: str, *, n_planes: int, n_tables: int,
                  seed: int, max_bucket: int) -> "rd.Dataset":
    """Scale path: multi-table hyperplane-LSH candidate buckets + exact
    in-bucket cosine verify.  Shuffles (table_id, bucket, id, vec) — the
    vector crosses the wire ``n_tables`` times but the dataset is never
    materialized whole anywhere; recall < 1 by construction (raise
    ``n_tables`` / lower ``n_planes`` to push it up; defaults give
    ~99.9% recall at cosine ≥ 0.99)."""
    first = narrow.take(1)
    if not first:
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64())}))
    dim = len(first[0][vec_col])
    stage = _MultiTableBucketStage(dim, id_col, vec_col, n_planes,
                                   n_tables, seed)
    rows = narrow.map_batches(stage, batch_format="pyarrow",
                              zero_copy_batch=True)

    def within(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for _, g in df.groupby(["table_id", "bucket"], sort=False):
            m = len(g)
            if not (2 <= m <= max_bucket):
                continue
            order = np.argsort(g[id_col].to_numpy(), kind="stable")
            ids = g[id_col].to_numpy()[order]
            mat = _normalize(np.vstack(g[vec_col].to_numpy()[order])
                             .astype(np.float32))
            scores = mat @ mat.T
            ia, ib = np.nonzero(np.triu(scores >= threshold, k=1))
            # same id may appear once per table; self-pairs guard
            keep = ids[ia] < ids[ib]
            out_a.extend(ids[ia[keep]].tolist())
            out_b.extend(ids[ib[keep]].tolist())
            out_c.extend(scores[ia[keep], ib[keep]]
                         .astype(np.float64).tolist())
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=np.int64),
            "id_b": pd.Series(out_b, dtype=np.int64),
            "cosine": pd.Series(out_c, dtype=np.float64)})

    from crn_meta_validate_ray.stages.common import drop_duplicate_rows, \
        grouped_map

    cand = grouped_map(rows, ["table_id", "bucket"], within)
    if cand.count() <= 32_768:
        # bounded driver dedupe (pairs, not vectors) — skips one exchange
        df = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"],
                                              keep="first")
        return rd.from_arrow(pd_to_arrow(df))
    return drop_duplicate_rows(cand, ["id_a", "id_b"])


def embedding_near_dup_pairs(ds: "rd.Dataset", *, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             mode: str = "auto",
                             small_n_guard: int = NEAR_DUP_SMALL_N,
                             byte_budget: int = NEAR_DUP_BYTE_BUDGET,
                             n_planes: int = 8, n_tables: int = 6,
                             seed: int = 11,
                             max_bucket: int = 4096) -> "rd.Dataset":
    """All pairs (id_a < id_b) with cosine ≥ threshold.

    ``mode='auto'`` picks the EXACT broadcast path only while BOTH guards
    hold — ``count() <= small_n_guard`` (O(N²) verify compute) AND the
    estimated reference-matrix footprint ``count() × dim × 4 B <=
    byte_budget`` (the matrix is assembled by a Ray task in the object
    store — never on the driver — and must not crowd out the streaming
    blocks' plasma share); otherwise it routes to the bucketed LSH path
    (``_near_dup_lsh``): multi-table hyperplane buckets + exact in-bucket
    cosine verify, no whole-dataset materialization, recall documented on
    the stage.  Force a path with ``mode='broadcast'`` / ``mode='lsh'``."""
    narrow = ds.select_columns([id_col, vec_col])
    if mode == "auto":
        n = narrow.count()
        if n <= small_n_guard:
            # dim from the schema when the type carries it (fixed-size
            # list: exact even for corpora whose FIRST row is atypical);
            # only a plain list type pays the take(1) probe
            dim = 0
            try:
                typ = narrow.schema().base_schema.field(vec_col).type
            except Exception:
                typ = None
            if typ is not None and pa.types.is_fixed_size_list(typ):
                dim = typ.list_size
            else:
                first = narrow.take(1)
                dim = len(first[0][vec_col]) if first else 0
            mode = "broadcast" if n * dim * 4 <= byte_budget else "lsh"
        else:
            mode = "lsh"
    if mode == "broadcast":
        return _near_dup_broadcast(narrow, threshold, id_col, vec_col)
    return _near_dup_lsh(narrow, threshold, id_col, vec_col,
                         n_planes=n_planes, n_tables=n_tables, seed=seed,
                         max_bucket=max_bucket)


def _kmeans(sample: np.ndarray, k: int, iters: int = 12,
            seed: int = 5) -> np.ndarray:
    """Plain Lloyd's k-means on a (normalized) sample — the IVF coarse
    quantizer. Deterministic (seeded init)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cent[c] = m / n
    return cent


class _IvfAssign:
    """Stateless stage: assign each vector to its nearest centroid (the
    inverted list id); centroids broadcast once via ray.put."""

    def __init__(self, cent_ref, vec_col: str):
        self.cent = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) \
            else cent_ref
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch, self.vec_col))
        lst = (np.argmax(m @ self.cent.T, axis=1).astype(np.int64)
               if m.size else np.empty(0, dtype=np.int64))
        return batch.append_column("ivf_list", pa.array(lst))


def ivf_ann(ds: "rd.Dataset", queries: np.ndarray, k: int = 10,
            *, id_col: str = "vec_id", vec_col: str = "embedding",
            n_lists: int = 16, n_probe: int = 4, sample_n: int = 4096,
            seed: int = 5) -> "rd.Dataset":
    """IVF approximate top-k (the second scale path next to ``lsh_ann``):

    1. train a coarse quantizer (k-means on a driver-side sample);
    2. assign every vector to its nearest centroid (inverted list) in a
       stateless broadcast stage;
    3. each query probes its ``n_probe`` closest lists; top-k runs only
       inside probed lists (grouped_map over list ids), partials merged
       per query on the driver.

    Recall grows with n_probe (n_probe == n_lists → exact)."""
    queries = _normalize(np.asarray(queries, dtype=np.float32))
    narrow = ds.select_columns([id_col, vec_col])
    sample_rows = narrow.limit(sample_n).take_all()
    sample = _normalize(np.array([r[vec_col] for r in sample_rows],
                                 dtype=np.float32))
    cent = _kmeans(sample, n_lists, seed=seed)
    cent_ref = ray.put(cent)

    probes = np.argsort(-(queries @ cent.T), axis=1)[:, :n_probe]
    probe_of_list: dict[int, list[int]] = {}
    for qi, lists in enumerate(probes):
        for li in lists:
            probe_of_list.setdefault(int(li), []).append(qi)

    def assign(batch: pa.Table) -> pa.Table:
        # stateless task; centroid fetch is a zero-copy plasma read
        return _IvfAssign(cent_ref, vec_col)(batch)

    assigned = narrow.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def within(df: pd.DataFrame) -> pd.DataFrame:
        out = {"query_idx": [], "vec_id": [], "score": []}
        for li, g in df.groupby("ivf_list", sort=False):
            qis = probe_of_list.get(int(li), [])
            if not qis:
                continue
            m = _normalize(np.vstack(g[vec_col].to_numpy())
                           .astype(np.float32))
            ids = g[id_col].to_numpy()
            for qi in qis:
                scores = m @ queries[qi]
                top = np.lexsort((ids, -scores))[:k]
                out["query_idx"].extend([qi] * len(top))
                out["vec_id"].extend(ids[top].tolist())
                out["score"].extend(scores[top].astype(np.float64).tolist())
        res = pd.DataFrame(out)
        if not len(res):
            res = pd.DataFrame({"query_idx": pd.Series(dtype=np.int64),
                                "vec_id": pd.Series(dtype=np.int64),
                                "score": pd.Series(dtype=np.float64)})
        return res

    from crn_meta_validate_ray.stages.common import grouped_map

    partials = grouped_map(assigned, ["ivf_list"], within)
    return _merge_topk_partials(partials, k)
