"""VersionStore: checksum-deduped timestamped snapshots of small
artifacts (config / index / statistics), reference
/root/reference/ftm_lakehouse/storage/versions.py:19-94.

Driver-side control data, like TagStore: artifacts are KB-sized JSON
documents written once per operation — a Spark table would be overkill.
A snapshot is stored only when its checksum differs from the latest
(idempotent re-publish), under ``<root>/<key>/<ts>-<checksum>.json``
with a ``latest`` pointer.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timezone

from ftm_lakehouse_spark.sources.fs import get_fs

__all__ = ["VersionStore"]


class VersionStore:
    def __init__(self, root: str, spark=None):
        self.root = root
        self._fs = get_fs(root, spark)

    def _dir(self, key: str) -> str:
        return self._fs.join(self.root, key)

    def put(self, key: str, artifact: dict) -> str | None:
        """Store a snapshot unless identical to the latest. Returns the
        version id written, or None if deduped."""
        payload = json.dumps(artifact, sort_keys=True, default=str)
        checksum = hashlib.sha256(payload.encode()).hexdigest()[:16]
        latest = self.latest(key)
        if latest is not None and latest["checksum"] == checksum:
            return None
        ts = datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S%f")
        version = f"{ts}-{checksum}"
        d = self._dir(key)
        self._fs.write_text_atomic(self._fs.join(d, f"{version}.json"), payload)
        self._fs.write_text_atomic(self._fs.join(d, "latest"), version)
        return version

    def latest(self, key: str) -> dict | None:
        try:
            version = self._fs.read_text(self._fs.join(self._dir(key), "latest")).strip()
            artifact = json.loads(
                self._fs.read_text(self._fs.join(self._dir(key), f"{version}.json"))
            )
        except FileNotFoundError:
            return None
        return {
            "version": version,
            "checksum": version.rsplit("-", 1)[-1],
            "artifact": artifact,
        }

    def history(self, key: str) -> list[str]:
        files = self._fs.listdir(self._dir(key))
        return sorted(f[:-5] for f in files if f.endswith(".json"))
