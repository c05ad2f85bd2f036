"""Distributed connected components (min-label propagation) vs a
union-find brute force."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.graph import connected_components


def _brute(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(pairs):
    t = pa.table({"id_a": pa.array([a for a, _ in pairs], type=pa.int64()),
                  "id_b": pa.array([b for _, b in pairs], type=pa.int64())})
    got = connected_components(rd.from_arrow(t)).take_all()
    return {r["doc_id"]: r["cluster_id"] for r in got}


def test_components_cliques_and_chain(ray_session):
    pairs = [(1, 2), (2, 3),           # chain -> component {1,2,3}
             (10, 11), (11, 10),       # duplicate edge both ways
             (20, 21), (22, 21),       # component {20,21,22}
             (30, 40)]
    assert _run(pairs) == _brute(pairs)


def test_components_long_chain_converges(ray_session):
    # a 12-vertex path needs multiple propagation rounds
    pairs = [(i, i + 1) for i in range(100, 112)]
    got = _run(pairs)
    assert set(got.values()) == {100}
    assert len(got) == 13


def test_components_randomized(ray_session):
    rng = np.random.default_rng(23)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 60, (120, 2))
             if a != b]
    assert _run(pairs) == _brute(pairs)


def test_components_empty_pairs(ray_session):
    t = pa.table({"id_a": pa.array([], type=pa.int64()),
                  "id_b": pa.array([], type=pa.int64())})
    assert connected_components(rd.from_arrow(t)).take_all() == []


def test_components_nonconvergence_raises(ray_session):
    import pytest
    pairs = [(i, i + 1) for i in range(5)]
    t = pa.table({"id_a": pa.array([a for a, _ in pairs], type=pa.int64()),
                  "id_b": pa.array([b for _, b in pairs], type=pa.int64())})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_arrow(t), max_rounds=1).take_all()
