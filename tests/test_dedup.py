"""Deduplication operators: exact, MinHash-LSH, n-gram Jaccard, SimHash."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.stages.dedup import (
    exact_dedup_groups,
    exact_dedup_keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind distant purple mountains and rivers flow gently")


@pytest.fixture(scope="module")
def docs(ray_session):
    texts = {
        0: BASE,
        1: BASE,                                 # exact dup of 0
        2: BASE.replace("purple", "orange"),     # near dup of 0
        3: BASE,                                 # exact dup of 0
        4: "completely different content about ray data pipelines and "
           "arrow compute kernels for validation engines at scale",
        5: "another unrelated document mentioning hyperloglog sketches "
           "count min and tdigest quantiles for drift detection",
        6: BASE.replace("dog", "cat").replace("sun", "moon"),  # near dup
    }
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    return rd.from_arrow(t)


def test_exact_dedup_groups(docs):
    rows = exact_dedup_groups(docs).take_all()
    by_keep = {r["keep_id"]: r["n_docs"] for r in rows}
    assert by_keep[0] == 3        # docs 0,1,3 identical
    assert by_keep[2] == 1 and by_keep[4] == 1
    assert len(rows) == 5         # 5 distinct contents


def test_exact_dedup_keep_first(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup_keep_first(docs).take_all())
    assert kept == [0, 2, 4, 5, 6]


def test_minhash_lsh_finds_near_dups_not_distinct(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs, threshold=0.5).take_all()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # exact dups
    assert (0, 2) in pairs                            # near dup
    assert all({a, b} != {4, 5} for a, b in pairs)    # distinct stay apart
    assert not any(4 in p or 5 in p for p in pairs)


def test_ngram_jaccard_exact_values(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3).take_all()}
    assert pairs[(0, 1)] == 1.0
    # doc2 differs from doc0 by one word → 3 of the 3-gram positions change
    toks = len(BASE.split())
    n_grams = toks - 2
    changed = 3
    expect = (n_grams - changed) / (n_grams + changed)
    assert abs(pairs[(0, 2)] - expect) < 1e-9


def test_simhash_near_dups(ray_session):
    # simhash needs longer docs for one edit to stay within the 4-band
    # pigeonhole guarantee (distance <= 3): use a 5x-repeated base text
    long_base = (BASE + " ") * 5
    texts = {
        0: long_base.strip(),
        1: long_base.strip(),                              # exact dup
        2: long_base.replace("purple", "orange", 1).strip(),  # near dup
        3: "completely different content about ray data pipelines and "
           "arrow compute kernels for validation engines at scale " * 5,
    }
    ds = rd.from_arrow(pa.table({"doc_id": list(texts),
                                 "text": list(texts.values())}))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(ds, max_distance=3).take_all()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3
    assert not any(3 in p for p in pairs)


def test_embedding_near_dup_and_knn(ray_session):
    from crn_meta_validate_ray.stages.similarity import (
        embedding_near_dup_pairs,
        knn_brute_force,
    )
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    base[7] = base[3] + rng.standard_normal(16).astype(np.float32) * 0.01
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(20, dtype=np.int64)),
        "embedding": pa.array(base.tolist(), type=pa.list_(pa.float32())),
    }))
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(ds, threshold=0.99).take_all()}
    assert (3, 7) in pairs

    # brute-force top-k matches numpy ground truth
    queries = base[[3, 11]]
    got = knn_brute_force(ds, queries, k=5).take_all()
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    scores = norm @ qn.T
    for q in range(2):
        order = np.lexsort((np.arange(20), -scores[:, q]))[:5]
        want = [int(i) for i in order]
        have = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_idx"] == q), key=lambda r: r["rank"])]
        assert have == want


def test_ivf_ann_recall(ray_session):
    """IVF ANN: with n_probe == n_lists results equal brute force exactly;
    with fewer probes recall stays high on clustered data."""
    from crn_meta_validate_ray.stages.similarity import ivf_ann, knn_brute_force

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 16)).astype(np.float32) * 3
    base = np.vstack([c + rng.standard_normal((50, 16)).astype(np.float32)
                      for c in centers])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(base), dtype=np.int64)),
        "embedding": pa.array(base.tolist(), type=pa.list_(pa.float32())),
    }))
    queries = base[[5, 60, 120]]
    exact = {(r["query_idx"], r["rank"]): r["vec_id"]
             for r in knn_brute_force(ds, queries, k=5).take_all()}
    full_probe = {(r["query_idx"], r["rank"]): r["vec_id"]
                  for r in ivf_ann(ds, queries, k=5, n_lists=8,
                                   n_probe=8).take_all()}
    assert full_probe == exact           # all lists probed == exact
    part = ivf_ann(ds, queries, k=5, n_lists=8, n_probe=3).take_all()
    got = {(r["query_idx"], r["rank"]): r["vec_id"] for r in part}
    overlap = sum(1 for key in exact if got.get(key) == exact[key])
    assert overlap >= int(0.8 * len(exact))   # high recall on clustered data


def test_simhash_stage_vectorized_parity():
    """The batch-vectorized _SimHashStage must reproduce the per-document
    reference construction (hash_array over str.split() tokens →
    simhash64) bit-for-bit, including empty/whitespace/null docs."""
    import pandas as pd

    from crn_meta_validate_ray.functions.hashing import simhash64
    from crn_meta_validate_ray.stages.dedup import _SimHashStage

    texts = ["the quick brown fox", "", None, "   ", "one",
             "a  b\t c\nd", "répété répété tokens", "x " * 50]
    ids = list(range(len(texts)))
    stage = _SimHashStage("text", "doc_id")
    out = stage(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                          "text": pa.array(texts, type=pa.string())}))
    got = {}
    for i in range(out.num_rows):
        got.setdefault(out["doc_id"][i].as_py(), []).append(
            (out["band_id"][i].as_py(), out["band_val"][i].as_py(),
             out["sh"][i].as_py()))
    for did, t in zip(ids, texts):
        toks = (t or "").split()
        th = (pd.util.hash_array(np.asarray(toks, dtype=object))
              .astype(np.uint64) if toks else np.empty(0, dtype=np.uint64))
        sh = simhash64(th)
        want = [(b, int((sh >> np.uint64(b * 16)) & np.uint64(0xFFFF)),
                 int(np.uint64(sh).astype(np.int64)))
                for b in range(4)]
        assert sorted(got[did]) == sorted(want), (did, t)


def test_capped_bucket_census(ray_session):
    """Buckets over max_bucket are skipped but COUNTED: with_stats returns
    the skip census, and the pair stream excludes the capped bucket."""
    texts = ["" for _ in range(8)] + [BASE, BASE + " tail"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())}))
    # 8 identical empty docs always collide in every band; cap below 8
    pairs, stats = minhash_lsh_pairs(ds, threshold=0.5, max_bucket=4,
                                     with_stats=True)
    got = {(r["id_a"], r["id_b"]) for r in pairs.take_all()}
    assert stats["n_buckets_skipped"] >= 1
    assert stats["n_docs_dropped"] >= 8
    assert all(a >= 0 for a, _ in got)
    assert (8, 9) in got                      # the real near-dup survives
    assert not any(a < 8 and b < 8 for a, b in got)  # capped bucket dropped

    spairs, sstats = simhash_pairs(ds, max_distance=3, max_bucket=4,
                                   with_stats=True)
    sgot = {(r["id_a"], r["id_b"]) for r in spairs.take_all()}
    assert sstats["n_buckets_skipped"] >= 1
    assert sstats["n_docs_dropped"] >= 8
    assert all(a >= 0 for a, _ in sgot)


def test_embedding_near_dup_bucketed(ray_session):
    """LSH near-dup path: no whole-dataset materialization, finds the
    planted near-identical pairs, agrees with the exact broadcast path."""
    from crn_meta_validate_ray.stages.similarity import (
        embedding_near_dup_pairs)
    rng = np.random.default_rng(3)
    base = rng.standard_normal((120, 32)).astype(np.float32)
    base[60] = base[10] + 1e-4 * rng.standard_normal(32).astype(np.float32)
    base[61] = base[20] * 2.0          # parallel => cosine 1
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(base), dtype=np.int64)),
        "embedding": pa.array(base.tolist(), type=pa.list_(pa.float32())),
    }))
    exact = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup_pairs(
                 ds, threshold=0.99, mode="broadcast").take_all()}
    lsh = {(r["id_a"], r["id_b"])
           for r in embedding_near_dup_pairs(
               ds, threshold=0.99, mode="lsh", n_tables=8).take_all()}
    assert {(10, 60), (20, 61)} <= exact
    assert lsh == exact                 # full recall on this tiny instance
    auto = {(r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                ds, threshold=0.99).take_all()}
    assert auto == exact


def test_minhash_driver_and_distributed_verify_agree(ray_session,
                                                     monkeypatch):
    """The bounded driver verify shortcut and the distributed attach path
    must produce identical pairs."""
    import crn_meta_validate_ray.stages.dedup as dd

    texts = [BASE, BASE + " tail", BASE.replace("fox", "cat"),
             "completely different text about rivers"] * 3
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string())}))
    small = {(r["id_a"], r["id_b"], round(r["jaccard"], 6))
             for r in minhash_lsh_pairs(ds, threshold=0.5).take_all()}
    monkeypatch.setattr(dd, "SMALL_PAIR_GUARD", -1)  # force attach path
    dist = {(r["id_a"], r["id_b"], round(r["jaccard"], 6))
            for r in minhash_lsh_pairs(ds, threshold=0.5).take_all()}
    assert small and small == dist


def test_ngram_jaccard_exact_pairs(ray_session):
    """Exact inverted-index Jaccard: every pair ≥ threshold found (no LSH
    recall loss), values equal brute-force set Jaccard."""
    from crn_meta_validate_ray.stages.dedup import ngram_jaccard_exact_pairs

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "a completely different sentence with other words here",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "short one",
        "",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_exact_pairs(ds, threshold=0.3,
                                              ngram=3).take_all()}

    def grams(t):
        toks = t.split()
        if not toks:
            return set()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            ga, gb = grams(docs[a]), grams(docs[b])
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.3:
                want[(a, b)] = j
    assert set(got) == set(want)
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-9
    assert got[(0, 3)] == 1.0


def test_ngram_jaccard_dropped_bucket_census(ray_session):
    """A hotter-than-max_posting gram is dropped AND counted."""
    from crn_meta_validate_ray.stages.dedup import ngram_jaccard_exact_pairs

    # every doc shares the single gram "x y z" → one posting bucket of 10
    docs = [f"x y z tail{i} a{i} b{i}" for i in range(10)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs)}))
    out, stats = ngram_jaccard_exact_pairs(ds, threshold=0.1, ngram=3,
                                           max_posting=4, with_stats=True)
    assert stats["n_buckets_skipped"] >= 1
    assert stats["n_docs_dropped"] >= 10


def test_lsh_ann_multiprobe_recall(ray_session):
    """Multi-probe LSH: probing 1-bit-flip buckets strictly widens the
    candidate set, so recall vs brute force is monotone in multiprobe and
    ranks stay per-query (no duplicate rank rows across probed buckets)."""
    import numpy as np

    from crn_meta_validate_ray.stages.similarity import (knn_brute_force,
                                                         lsh_ann)
    rng = np.random.default_rng(17)
    n, d = 400, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), d),
    })
    ds = rd.from_arrow(t)
    queries = vecs[:4]
    exact = {}
    for r in knn_brute_force(ds, queries, k=5).take_all():
        exact.setdefault(r["query_idx"], set()).add(r["vec_id"])

    def recall(mp):
        got = {}
        rows = lsh_ann(ds, queries, k=5, n_planes=6, multiprobe=mp).take_all()
        for r in rows:
            got.setdefault(r["query_idx"], set()).add(r["vec_id"])
        # per-query ranks are dense 0..k'-1 (merged across probed buckets)
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_idx"], []).append(r["rank"])
        for q, ranks in by_q.items():
            assert sorted(ranks) == list(range(len(ranks)))
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2
    assert r2 >= 0.8  # 2-bit probes over 6 planes cover most splits
