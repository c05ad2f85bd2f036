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
