"""CommitLog: a file-level append history for the statement store.

The reference backs its diff cursor with Delta's transaction log
(``{TS}:{delta_version}`` cursors, reference repository/diff.py:62-83)
— an incremental consumer asks "what changed since version N" and the
log answers with FILES, so the consumer reads only new data instead of
timestamp-filtering the whole table. This module gives plain
partitioned parquet the same contract, honestly scoped:

  * every ``append`` records the exact files it added (version,
    timestamp, partition list) in one JSON commit record;
  * every ``merge``/``compact`` records a ``rewrite`` commit naming
    the partitions it replaced — file references into those partitions
    from OLDER commits are invalidated (the physical swap deletes
    them; plain parquet has no multi-version file pool, and the log
    says so rather than pretending);
  * ``files_since(v)`` returns the appended files after ``v`` plus the
    set of partitions rewritten after ``v``: a consumer reads the new
    files directly and falls back to a scoped scan only for rewritten
    partitions.

Commit records go through the sources.fs shim (KB-sized, once per
write job, URI-rooted stores included). Writes happen inside the
store's per-path write lock, so versions are strictly ordered per
driver — the same scope as the append path itself (cross-driver
ordering is a table format's job; documented in README).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

__all__ = ["CommitLog"]


class CommitLog:
    def __init__(self, fs, root: str):
        self._fs = fs
        self.root = root

    def _path(self, version: int) -> str:
        return self._fs.join(self.root, f"{version:012d}.json")

    def current_version(self) -> int:
        """Latest committed version; 0 = empty log."""
        names = [n for n in self._fs.listdir(self.root) if n.endswith(".json")]
        return max((int(n[:-5]) for n in names), default=0)

    def commit(
        self,
        kind: str,
        partitions: list[tuple[str, ...]],
        files_added: list[str] | None = None,
    ) -> int:
        """Record one write job. ``files_added`` are data-dir-relative.
        Caller must hold the store's write lock."""
        version = self.current_version() + 1
        record = {
            "version": version,
            "kind": kind,
            "ts": datetime.now(timezone.utc).isoformat(),
            "partitions": [list(p) for p in partitions],
            "files_added": sorted(files_added or []),
        }
        self._fs.write_text_atomic(self._path(version), json.dumps(record))
        return version

    def read(self, since: int = 0) -> list[dict]:
        """Commit records with version > ``since``, ascending."""
        out = []
        for name in self._fs.listdir(self.root):
            if not name.endswith(".json"):
                continue
            v = int(name[:-5])
            if v > since:
                out.append(json.loads(self._fs.read_text(self._fs.join(self.root, name))))
        return sorted(out, key=lambda r: r["version"])

    def files_since(self, since: int) -> tuple[list[str], set[tuple[str, ...]]]:
        """(appended files still valid, partitions rewritten) after
        ``since``. Appended files under a later-rewritten partition are
        dropped from the list — their content now lives in the
        rewrite's output, which the caller scans instead."""
        commits = self.read(since)
        rewritten: set[tuple[str, ...]] = set()
        for c in commits:
            if c["kind"] == "rewrite":
                rewritten.update(tuple(p) for p in c["partitions"])
        files: list[str] = []
        for c in commits:
            if c["kind"] != "append":
                continue
            for f in c["files_added"]:
                parts = tuple(
                    seg.split("=", 1)[1] for seg in f.split("/")[:-1] if "=" in seg
                )
                if parts not in rewritten:
                    files.append(f)
        return files, rewritten
