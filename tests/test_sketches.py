"""Sketch accuracy, mergeability and serialization round-trips."""

import numpy as np

from crn_meta_validate_ray.state.sketches import (
    CountMin,
    HyperLogLog,
    TDigest,
    hash64,
)


def test_hash64_deterministic_and_spread():
    a = np.array(["a", "b", "a"], dtype=object)
    h = hash64(a)
    assert h[0] == h[2] and h[0] != h[1]
    assert (hash64(a) == h).all()


def test_hll_estimate_within_2pct_and_merge_equals_union():
    h1, h2, h12 = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a = np.array([f"k{i}" for i in range(40000)], dtype=object)
    b = np.array([f"k{i}" for i in range(20000, 70000)], dtype=object)
    h1.update(a)
    h2.update(b)
    h12.update(np.concatenate([a, b]))
    h1.merge(HyperLogLog.from_bytes(h2.to_bytes()))
    assert abs(h1.estimate() - 70000) / 70000 < 0.02
    assert h1.estimate() == h12.estimate()  # merge == union exactly


def test_countmin_overestimates_never_under():
    cm = CountMin(width=512, depth=4)
    vals = np.array(["x"] * 300 + ["y"] * 7 + [f"z{i}" for i in range(100)],
                    dtype=object)
    cm.update(vals)
    assert cm.query("x") >= 300
    assert cm.query("y") >= 7
    other = CountMin(width=512, depth=4)
    other.update(np.array(["x"] * 50, dtype=object))
    cm.merge(CountMin.from_bytes(other.to_bytes()))
    assert cm.query("x") >= 350


def test_tdigest_quantiles_after_distributed_merge():
    rng = np.random.default_rng(7)
    data = rng.exponential(10.0, 100000)
    td = TDigest()
    for chunk in np.array_split(data, 37):
        part = TDigest()
        part.update(chunk)
        td.merge(TDigest.from_bytes(part.to_bytes()))
    for q in (0.1, 0.5, 0.9, 0.99):
        true = np.quantile(data, q)
        assert abs(td.quantile(q) - true) / true < 0.05
    assert abs(td.count - len(data)) < 1e-6


def test_tdigest_ignores_nonfinite():
    td = TDigest()
    td.update(np.array([1.0, np.nan, np.inf, 3.0]))
    assert td.count == 2


def test_sketchstage_cm_cache_bounded_and_exact():
    """A high-cardinality column on a single-value Enum rule must not grow
    the per-actor Count-Min index cache without bound (advice r03) — and
    overflow values must still count correctly via batch-local indices."""
    import pyarrow as pa

    from crn_meta_validate_ray.stages.sketch import SketchStage
    from crn_meta_validate_ray.state.sketches import CountMin

    stage = SketchStage("t", cm_columns=["c"])
    stage._CM_CACHE_MAX = 64
    vals = [f"v{i:05d}" for i in range(300)] + ["hot"] * 40
    merged = CountMin()
    for lo in range(0, len(vals), 100):
        out = stage(pa.table({"c": pa.array(vals[lo:lo + 100])}))
        for row in out.to_pylist():
            merged.merge(CountMin.from_bytes(
                __import__("base64").b64decode(row["value"])))
    assert len(stage._cm_idx_cache) <= 64
    assert merged.query("hot") >= 40
    assert merged.query("v00007") >= 1
