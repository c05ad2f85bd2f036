"""Per-partition checkpoint manifests (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

A manifest records everything needed to (a) skip the partition on resume and
(b) reconstruct the partition's contribution to the global verdict without
re-reading its data:

- lineage: input files (+sizes), constraint-set hash, engine version;
- metrics: per-column aggregates (n_rows / n_null / n_invalid / bounded
  distinct-invalid sample), violation counts per constraint;
- sketch state: base64 partial sketches (HLL / count-min / t-digest);
- commit marker: manifests are published through the output store's
  CommitProtocol (state/commit.py: atomic rename on POSIX, atomic
  single-object PUT on object stores) — a killed run leaves either a
  complete manifest or none.

The reference's closest analogue is Streamlit session-state caching with
file-signature invalidation (app.py:556-572); here lineage is explicit and
durable.
"""

from __future__ import annotations

import os
import time

from crn_meta_validate_ray.pipelines.validate_pipeline import ColStat


def colstats_to_json(colstats: dict) -> dict:
    return {
        col: {
            "constraint_id": cs.constraint_id,
            "severity": cs.severity,
            "n_rows": cs.n_rows,
            "n_null": cs.n_null,
            "n_invalid": cs.n_invalid,
            "distinct_invalid": cs.distinct_invalid,
            "exact": cs.exact,
        }
        for col, cs in colstats.items()
    }


def colstats_from_json(raw: dict) -> dict:
    out = {}
    for col, d in raw.items():
        cs = ColStat(column=col, constraint_id=d["constraint_id"],
                     severity=d["severity"])
        cs.n_rows = d["n_rows"]
        cs.n_null = d["n_null"]
        cs.n_invalid = d["n_invalid"]
        cs.distinct_invalid = dict(d["distinct_invalid"])
        cs.exact = d["exact"]
        out[col] = cs
    return out


def sketches_to_json(sketches: dict) -> dict:
    import base64
    return {k: base64.b64encode(v.to_bytes()).decode("ascii")
            for k, v in sketches.items()}


def sketches_from_json(raw: dict) -> dict:
    import base64

    from crn_meta_validate_ray.state.sketches import (CountMin, HyperLogLog,
                                                      TDigest)
    out = {}
    for k, payload in raw.items():
        data = base64.b64decode(payload)
        if k.startswith("hll:"):
            out[k] = HyperLogLog.from_bytes(data)
        elif k.startswith("cm:"):
            out[k] = CountMin.from_bytes(data)
        else:
            out[k] = TDigest.from_bytes(data)
    return out


# Engine layout version stamped into every manifest and required by
# is_valid: what a partition persists and what the phases expect from each
# other is part of the lineage.  v2: partitions persist kind=gpart
# run-length partials and the group phase consumes them (plus the fused
# broadcast referential counts); a run partially committed under an older
# layout (or no stamp at all) is treated as stale and recomputed rather
# than merged under mismatched placement assumptions.
LAYOUT_VERSION = 2


class ManifestStore:
    def __init__(self, root: str, protocol=None):
        from crn_meta_validate_ray.state.commit import resolve_protocol
        self.root = root
        self.protocol = resolve_protocol(protocol)
        os.makedirs(root, exist_ok=True)

    def path(self, partition_id: str) -> str:
        return os.path.join(self.root, f"{partition_id}.json")

    def load(self, partition_id: str) -> dict | None:
        # a torn/unreadable manifest is treated as absent → recompute
        return self.protocol.get_json(self.path(partition_id))

    def is_valid(self, partition_id: str, input_files: list[str],
                 constraint_hash: str) -> bool:
        """Resume-skip predicate: a committed manifest with matching lineage."""
        m = self.load(partition_id)
        if m is None:
            return False
        return (m.get("constraint_hash") == constraint_hash
                and m.get("input_files") == sorted(input_files)
                and m.get("layout_version") == LAYOUT_VERSION
                and m.get("committed", False))

    def commit(self, partition_id: str, payload: dict):
        payload = dict(payload)
        payload["partition_id"] = partition_id
        payload["layout_version"] = LAYOUT_VERSION
        payload["committed"] = True
        payload["committed_at"] = time.time()
        self.protocol.put_json(payload, self.path(partition_id))

    def all_manifests(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.endswith(".json"):
                m = self.load(name[:-5])
                if m is not None:
                    out.append(m)
        return out
