"""Versioned snapshot store: time travel + rollback for DML chains.

The DML verbs (``merge_into`` / ``delete_where`` / ``upsert_stream``)
are copy-on-write: each rewrite lands in a NEW directory. This module
gives those directories a commit log, which is all a lakehouse table
really is: a sequence of immutable snapshot dirs plus an atomically
swapped manifest naming the committed ones. Readers resolve the
manifest, never directory listings, so:

- a crash mid-write leaves an orphan staging dir that no reader ever
  sees (the version is not in the manifest);
- rollback is a manifest truncation — no data movement;
- time travel is reading an older manifest entry.

The manifest swap uses ``os.replace`` (atomic on POSIX); concurrent
WRITERS are out of scope (single-writer per table, the usual lakehouse
baseline without a lock service). Old version dirs are retained for
time travel until ``vacuum`` — identical retention story to Delta/
Iceberg, scaled down to a directory of parquet blocks.
"""

from __future__ import annotations

import json
import os
import shutil


class SnapshotStore:
    """Commit log over versioned snapshot dirs ``<root>/v<6-digit>``."""

    MANIFEST = "_manifest.json"

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ manifest
    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def versions(self) -> list[int]:
        """Committed versions, ascending. Empty store → []."""
        try:
            with open(self._manifest_path()) as fh:
                return sorted(json.load(fh)["versions"])
        except (OSError, ValueError, KeyError):
            return []

    def _write_manifest(self, versions: list[int]) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"versions": sorted(versions)}, fh)
        os.replace(tmp, self._manifest_path())

    # ------------------------------------------------------------ versions
    def path_for(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def latest_path(self) -> str | None:
        v = self.latest()
        return self.path_for(v) if v is not None else None

    def stage_next(self) -> tuple[int, str]:
        """(version, dir) for the next snapshot. The dir is NOT yet
        committed — invisible to readers until ``commit``. Numbering
        continues past rolled-back versions so a rollback never risks
        a new write landing in a dir time travel can still resolve."""
        existing = [
            int(d[1:])
            for d in os.listdir(self.root)
            if d.startswith("v") and d[1:].isdigit()
        ]
        v = (max(existing) + 1) if existing else 1
        return v, self.path_for(v)

    def commit(self, version: int) -> None:
        if not os.path.isdir(self.path_for(version)):
            raise ValueError(f"commit: snapshot dir for v{version} missing")
        vs = self.versions()
        if version in vs:
            raise ValueError(f"commit: v{version} already committed")
        self._write_manifest(vs + [version])

    def rollback(self, version: int) -> None:
        """Truncate the log to ``version`` (manifest-only; data dirs
        are retained so the rolled-back versions stay time-travelable
        until ``vacuum``)."""
        vs = self.versions()
        if version not in vs:
            raise ValueError(f"rollback: v{version} is not committed")
        self._write_manifest([v for v in vs if v <= version])

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Delete snapshot dirs no longer reachable: uncommitted
        orphans and committed versions older than the last
        ``keep_last`` (``0`` empties the store). Returns the versions
        removed. The manifest is rewritten to exactly the surviving
        set in every case — a manifest entry must never outlive its
        directory, or readers resolve dangling paths."""
        vs = self.versions()
        keep = set(vs[-keep_last:]) if keep_last > 0 else set()
        removed = []
        for d in sorted(os.listdir(self.root)):
            if not (d.startswith("v") and d[1:].isdigit()):
                continue
            v = int(d[1:])
            if v not in keep:
                shutil.rmtree(os.path.join(self.root, d))
                removed.append(v)
        self._write_manifest(sorted(keep))
        return removed
