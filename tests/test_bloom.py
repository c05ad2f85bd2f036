"""Bloom-accelerated incremental dedup: no false negatives, exactness
under forced false positives, split correctness."""

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from crn_meta_validate_ray.stages.bloom import (bloom_split, build_bloom,
                                                incremental_dedup)


def _ds(texts, ids=None):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": ids if ids is not None else range(len(texts)),
        "text": texts})).repartition(3)


def test_no_false_negatives(ray_session):
    members = [f"member-{i}" for i in range(200)]
    snap = _ds(members)
    bm_ref = ray.put(build_bloom(snap, col="text", n_bits=1 << 12, k=6))
    tagged = bloom_split(_ds(members), bm_ref, col="text",
                         n_bits=1 << 12, k=6).to_pandas()
    assert tagged["maybe_dup"].all()  # a Bloom filter never misses members


def test_nonmembers_mostly_rejected(ray_session):
    snap = _ds([f"member-{i}" for i in range(100)])
    bm_ref = ray.put(build_bloom(snap, col="text", n_bits=1 << 13, k=6))
    probe = bloom_split(_ds([f"other-{i}" for i in range(500)]), bm_ref,
                        col="text", n_bits=1 << 13, k=6).to_pandas()
    # sized at ~80 bits/entry the FP rate is tiny; allow a little slack
    assert probe["maybe_dup"].sum() <= 5


def test_exact_under_forced_false_positives(ray_session):
    # 24-bit filter + 400 members -> saturated bitmap, FPs guaranteed;
    # the anti-join verify must still return exactly the new rows
    members = [f"m{i}" for i in range(400)]
    new = [f"m{i}" for i in range(0, 400, 2)] + \
          [f"fresh{i}" for i in range(300)]
    out = incremental_dedup(_ds(new, ids=range(len(new))),
                            _ds(members), key_col="text",
                            n_bits=1 << 5, k=2).to_pandas()
    assert sorted(out["text"]) == sorted(f"fresh{i}" for i in range(300))


def test_empty_new_batch(ray_session):
    out = incremental_dedup(_ds([]), _ds(["a", "b"]), key_col="text",
                            n_bits=1 << 10)
    assert out.count() == 0


def test_bitmap_math_no_false_negative_pure():
    # pure-kernel property: inserting any value set then probing the
    # same values always hits all k bits (no Ray involved)
    import numpy as np

    from crn_meta_validate_ray.stages.bloom import (_bit_indices,
                                                    _hash_pair)

    rng = np.random.default_rng(5)
    for trial in range(20):
        vals = np.array([f"v{trial}-{i}" for i in
                         range(rng.integers(1, 200))], dtype=object)
        n_bits, k = 1 << int(rng.integers(6, 14)), int(rng.integers(1, 9))
        h1, h2 = _hash_pair(vals)
        assert (h2 % 2 == 1).all()  # odd h2 -> full-period double hashing
        idx = _bit_indices(h1, h2, n_bits, k)
        assert idx.min() >= 0 and idx.max() < n_bits
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7))
        hit = (bm[idx >> 3] >> (idx & 7)) & 1
        assert hit.all()
        # determinism: same values -> same indices
        i2 = _bit_indices(*_hash_pair(vals), n_bits, k)
        assert (idx == i2).all()
