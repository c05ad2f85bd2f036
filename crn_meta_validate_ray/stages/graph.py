"""Distributed connected components over a pair-edge stream — the final
step of near-duplicate dedup at scale: pairs → clusters → one keeper per
cluster.

Algorithm: min-label propagation.  Every vertex starts labeled with its
own id; each round co-locates (vertex, label) rows with the edge rows by
vertex through one hash-bucket exchange and lowers each vertex's label to
the minimum over itself and its neighbors' labels; rounds repeat until no
label changes.  Convergence is O(graph diameter) rounds — near-dup
graphs are unions of small cliques (diameter ≤ ~2), so 2-3 rounds in
practice; hitting ``max_rounds`` without a fixpoint raises (silently
returning non-minimal labels would under-deduplicate downstream).

Everything that shuffles is 2-3 int64 columns; each round costs exactly
two keyed exchanges (attach neighbor labels, fold minima) — the change
count rides the fold output as a per-row flag, no extra exchange.  The
driver holds only that count (one int).  At 10^12 edges each round is
the same shape as a combiner-backed aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.common import as_i64, grouped_map

_EMPTY = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])


def connected_components(pairs: "rd.Dataset", *, id_a: str = "id_a",
                         id_b: str = "id_b", max_rounds: int = 50,
                         num_buckets: int | None = None) -> "rd.Dataset":
    """Label each vertex of the undirected pair graph with the minimum
    vertex id reachable from it: output (doc_id, cluster_id), one row per
    vertex that appears in at least one pair.  ``cluster_id == min(id)``
    within each component, so ``doc_id == cluster_id`` marks the keeper.

    Raises ``RuntimeError`` if labels have not reached a fixpoint after
    ``max_rounds`` propagation rounds (component diameter > max_rounds)."""

    def to_edges(t: pa.Table) -> pa.Table:
        a, b = as_i64(t, id_a), as_i64(t, id_b)
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(_EMPTY.empty_table())

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["u"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"u": u, "label": u})

    labels = grouped_map(edges.select_columns(["u"]), ["u"], init_labels,
                         num_buckets=num_buckets)

    converged = False
    for _ in range(max_rounds):
        # exchange 1 keyed by the NEIGHBOR side: attach v's current label
        # to each (u, v) edge; the vertex's own (old) label rides along
        # tagged is_own so exchange 2 can detect changes in-band
        def tag_edges(t: pa.Table) -> pa.Table:
            return pa.table({"key": t["v"], "u": t["u"],
                             "label": pa.array(np.full(t.num_rows, -1,
                                                       dtype=np.int64))})

        def tag_labels(t: pa.Table) -> pa.Table:
            neg = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
            return pa.table({"key": t["u"], "u": neg, "label": t["label"]})

        u1 = edges.map_batches(tag_edges, batch_format="pyarrow").union(
            labels.map_batches(tag_labels, batch_format="pyarrow"))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            lab = df[df["u"] < 0][["key", "label"]]
            ed = df[df["u"] >= 0][["key", "u"]]
            m = ed.merge(lab, on="key")[["u", "label"]]
            m["is_own"] = False
            # the vertex's own row: keeps it alive and carries the old
            # label for the in-band change count
            own = lab.rename(columns={"key": "u"})[["u", "label"]].copy()
            own["is_own"] = True
            return pd.concat([m, own], ignore_index=True)

        cand = grouped_map(u1, ["key"], attach, num_buckets=num_buckets)

        def fold_min(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("u", sort=False)
            out = g["label"].min().reset_index()
            out["label"] = out["label"].astype(np.int64)
            old = df[df["is_own"]].set_index("u")["label"]
            out["changed"] = (out["label"]
                              != old.reindex(out["u"]).to_numpy()).astype(
                np.int64)
            return out

        new_labels = grouped_map(cand, ["u"], fold_min,
                                 num_buckets=num_buckets).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.select_columns(["u", "label"])
        if not changed:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds); raise max_rounds")

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["u"], "cluster_id": t["label"]}),
        batch_format="pyarrow")
