"""Output-commit protocol: the one seam between the engine and its output
store.

Every durable artifact the resumable pipeline produces — per-partition
findings directories, the group-phase findings directory, manifest JSONs,
report.txt / summary.json — is published through a :class:`CommitProtocol`
so a killed run leaves either a fully committed artifact or one that is
invisible to readers.  Two implementations cover the two storage contracts
the engine targets (VERDICT r4 item 2):

**PosixCommit** (default — local disk or any shared POSIX mount)
    Requires atomic ``rename(2)`` within the output filesystem.  Directory
    commit = write into a ``<final>.tmp`` sibling, ``os.replace`` into
    place; discovery = directory existence + listing.  This is the exact
    protocol rounds 1-4 shipped, byte-for-byte.

**MarkerCommit** (object stores — S3/GCS semantics)
    Object stores have NO atomic directory rename; pretending otherwise is
    the classic corruption source.  This protocol uses only the three
    primitives every object store guarantees: atomic single-object PUT,
    GET, and LIST-by-prefix.  Writers write data files under a fresh
    ``_attempt-<token>/`` prefix inside the final path; commit = one PUT
    of a ``_COMMITTED.json`` marker at the final path naming the attempt
    and its file list; readers treat a path as committed iff the marker
    parses, and read ONLY the files it names.  A torn/garbage marker reads
    as "not committed" → the phase recomputes (same semantics as a torn
    manifest).  Abandoned attempts are inert garbage — never readable,
    reclaimable by a prefix GC at any time.  On the local filesystem the
    atomic PUT is modeled as write-to-unique-temp + ``os.replace`` (what
    an object-store client does natively), so the protocol is honest about
    torn writes while remaining runnable in tests; a real deployment backs
    these six methods with the store's client.

Readers MUST discover data through :meth:`committed_files` /
:meth:`data_dir` rather than listing the final path: under MarkerCommit
the final path may contain uncommitted attempts.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

MARKER = "_COMMITTED.json"


class PosixCommit:
    """Rename-based commit for POSIX filesystems (the default)."""

    def stage_dir(self, final: str) -> str:
        """Return a fresh staging directory for ``final``'s next attempt
        (a retried partition must not append to — and double-count — a
        previous attempt's files)."""
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def publish_dir(self, staged: str, final: str) -> None:
        shutil.rmtree(final, ignore_errors=True)
        os.replace(staged, final)

    def is_committed_dir(self, final: str) -> bool:
        return os.path.isdir(final)

    def data_dir(self, final: str, subdir: str = "") -> str | None:
        """Readable directory holding the committed data files (for
        ``read_parquet`` over a whole hive partition), or None if absent /
        uncommitted."""
        p = os.path.join(final, subdir) if subdir else final
        return p if os.path.isdir(p) else None

    def committed_files(self, final: str, subdir: str = "",
                        suffix: str = ".parquet") -> list[str]:
        d = self.data_dir(final, subdir)
        if d is None:
            return []
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(suffix))

    def put_json(self, payload, final: str) -> None:
        self.put_text(json.dumps(payload), final)

    def gc(self, final: str) -> list[str]:
        """Reclaim abandoned staging state for ``final`` (a directory
        artifact).  Safe whenever no writer is actively staging ``final``
        — the committed artifact itself is never touched.  Returns the
        paths removed."""
        removed = []
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
            removed.append(tmp)
        return removed

    def put_text(self, text: str, final: str) -> None:
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, final)

    def get_json(self, path: str):
        """Parsed JSON, or None when absent/torn (→ caller recomputes)."""
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None


class MarkerCommit(PosixCommit):
    """Manifest-pointer commit using only PUT/GET/LIST — no renames of
    directories, ever.  See module docstring for the contract."""

    def stage_dir(self, final: str) -> str:
        staged = os.path.join(final, f"_attempt-{uuid.uuid4().hex[:12]}")
        os.makedirs(staged, exist_ok=True)
        return staged

    def publish_dir(self, staged: str, final: str) -> None:
        if os.path.dirname(staged) != os.path.normpath(final):
            raise ValueError(f"staged dir {staged!r} is not an attempt "
                             f"inside {final!r}")
        files = sorted(
            os.path.relpath(os.path.join(root, f), staged)
            for root, _dirs, fs in os.walk(staged) for f in fs)
        self.put_json({"attempt": os.path.basename(staged), "files": files},
                      os.path.join(final, MARKER))

    def _marker(self, final: str):
        m = self.get_json(os.path.join(final, MARKER))
        return m if isinstance(m, dict) and "attempt" in m else None

    def is_committed_dir(self, final: str) -> bool:
        return self._marker(final) is not None

    def data_dir(self, final: str, subdir: str = "") -> str | None:
        m = self._marker(final)
        if m is None:
            return None
        p = os.path.join(final, m["attempt"], subdir) if subdir \
            else os.path.join(final, m["attempt"])
        return p if os.path.isdir(p) else None

    def committed_files(self, final: str, subdir: str = "",
                        suffix: str = ".parquet") -> list[str]:
        m = self._marker(final)
        if m is None:
            return []
        prefix = subdir.rstrip("/") + "/" if subdir else ""
        return sorted(
            os.path.join(final, m["attempt"], f) for f in m["files"]
            if f.endswith(suffix) and f.startswith(prefix)
            and "/" not in f[len(prefix):])

    def put_text(self, text: str, final: str) -> None:
        # atomic single-object PUT: unique temp name + replace is the
        # local-FS model of it (no reader can ever observe a torn object)
        tmp = f"{final}.put-{uuid.uuid4().hex[:12]}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, final)

    def gc(self, final: str) -> list[str]:
        """Reclaim abandoned ``_attempt-*`` prefixes under ``final``: every
        attempt NOT named by the current marker is inert garbage (a torn
        writer, or the pre-recompute attempt a torn manifest abandoned) —
        readers resolve data only through the marker, so removing them can
        never affect a committed artifact.  With no marker at all, the
        path was never committed and ALL attempts are reclaimable.  Safe
        whenever no writer is actively staging ``final`` (the same
        single-writer-per-artifact rule every commit protocol already
        assumes).  Returns the paths removed."""
        if not os.path.isdir(final):
            return []
        m = self._marker(final)
        keep = m["attempt"] if m else None
        removed = []
        for name in sorted(os.listdir(final)):
            p = os.path.join(final, name)
            if name.startswith("_attempt-") and name != keep \
                    and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        return removed


_DEFAULT = PosixCommit()


def resolve_protocol(protocol) -> PosixCommit:
    return protocol if protocol is not None else _DEFAULT
