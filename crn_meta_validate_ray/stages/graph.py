"""Distributed connected components over a pair-edge stream — the final
step of near-duplicate dedup at scale: pairs → clusters → one keeper per
cluster.

Algorithm: min-label propagation.  Every vertex starts labeled with its
own id; each round co-locates (vertex, label) rows with the edge rows by
vertex through one hash-bucket exchange and lowers each vertex's label to
the minimum over itself and its neighbors' labels; rounds repeat until no
label changes.  Convergence is O(graph diameter) rounds — near-dup
graphs are unions of small cliques (diameter ≤ ~2), so 2-3 rounds in
practice; ``max_rounds`` bounds pathological chains.

Everything that shuffles is 2-3 int64 columns; the driver holds only the
per-round changed-label count (one int).  The label table is carried as a
Dataset between rounds — at 10^12 edges each round is one narrow
exchange, the same shape as a combiner-backed aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.common import grouped_map


def connected_components(pairs: "rd.Dataset", *, id_a: str = "id_a",
                         id_b: str = "id_b", max_rounds: int = 50,
                         num_buckets: int | None = None) -> "rd.Dataset":
    """Label each vertex of the undirected pair graph with the minimum
    vertex id reachable from it: output (doc_id, cluster_id), one row per
    vertex that appears in at least one pair.  ``cluster_id == min(id)``
    within each component, so ``doc_id == cluster_id`` marks the keeper."""
    edges = pairs.map_batches(
        lambda t: pa.table({"u": pa.concat_arrays([
            pa.compute.cast(t[id_a], pa.int64()).combine_chunks()
            if isinstance(t[id_a], pa.ChunkedArray)
            else pa.compute.cast(t[id_a], pa.int64()),
            pa.compute.cast(t[id_b], pa.int64()).combine_chunks()
            if isinstance(t[id_b], pa.ChunkedArray)
            else pa.compute.cast(t[id_b], pa.int64())]),
            "v": pa.concat_arrays([
                pa.compute.cast(t[id_b], pa.int64()).combine_chunks()
                if isinstance(t[id_b], pa.ChunkedArray)
                else pa.compute.cast(t[id_b], pa.int64()),
                pa.compute.cast(t[id_a], pa.int64()).combine_chunks()
                if isinstance(t[id_a], pa.ChunkedArray)
                else pa.compute.cast(t[id_a], pa.int64())])}),
        batch_format="pyarrow").materialize()

    # initial labels: label[x] = x for every vertex (distinct endpoint)
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["u"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"u": u, "label": u})

    labels = grouped_map(edges.select_columns(["u"]), ["u"], init_labels,
                         num_buckets=num_buckets)

    for _ in range(max_rounds):
        # propagate: for each vertex, min(own label, neighbors' labels).
        # Exchange 1 keyed by the NEIGHBOR side: attach v's current label
        # to each (u, v) edge; exchange 2 keyed by u: fold the minimum.
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
            m = ed.merge(lab, on="key")
            # candidate label for u from each neighbor v, plus v's own row
            # (keeps every vertex alive even if a round has no edges)
            own = lab.rename(columns={"key": "u"})[["u", "label"]]
            return pd.concat([m[["u", "label"]], own], ignore_index=True)

        cand = grouped_map(u1, ["key"], attach, num_buckets=num_buckets)

        def fold_min(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("u", sort=False)["label"].min().reset_index()
            g["label"] = g["label"].astype(np.int64)
            return g

        new_labels = grouped_map(cand, ["u"], fold_min,
                                 num_buckets=num_buckets).materialize()

        # fixpoint check: join old/new label tables (narrow, bounded)
        def tag_old(t: pa.Table) -> pa.Table:
            return pa.table({"u": t["u"], "label": t["label"],
                             "is_new": pa.array(np.zeros(t.num_rows,
                                                         dtype=bool))})

        def tag_new(t: pa.Table) -> pa.Table:
            return pa.table({"u": t["u"], "label": t["label"],
                             "is_new": pa.array(np.ones(t.num_rows,
                                                        dtype=bool))})

        def count_changed(df: pd.DataFrame) -> pd.DataFrame:
            p = df.pivot_table(index="u", columns="is_new", values="label",
                               aggfunc="min")
            if True not in p.columns or False not in p.columns:
                n = len(p)
            else:
                n = int((p[True] != p[False]).sum())
            return pd.DataFrame({"n_changed": [n]})

        both = labels.map_batches(tag_old, batch_format="pyarrow").union(
            new_labels.map_batches(tag_new, batch_format="pyarrow"))
        changed = sum(r["n_changed"] for r in grouped_map(
            both, ["u"], count_changed, num_buckets=num_buckets).take_all())
        labels = new_labels
        if changed == 0:
            break

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["u"], "cluster_id": t["label"]}),
        batch_format="pyarrow")
