"""Content-addressed blob archive + file → entity conversion.

Reference S13 (/root/reference/ftm_lakehouse/repository/archive.py:
55-270; path conventions core/conventions/path.py:144-212): blobs live
at ``ab/cd/ef/<sha256>/blob`` with a metadata JSON sidecar; archived
files become FtM ``Document``-family entities (mimetype → schema,
reference helpers/file.py:64-98) whose statements land in the statement
table like any other ingest.

The blob layout itself is an object-store concern, not a Spark one (the
reference agrees) — the Spark-relevant part is the crawl manifest →
entity explosion, which here is a DataFrame pipeline so a 100-million-
file crawl is just another distributed ingest.
"""

from __future__ import annotations

import hashlib
import json
import mimetypes
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["BlobArchive", "MIME_SCHEMAS", "crawl_to_entities"]

#: mimetype prefix/exact → FtM schema (reference mime_to_schema table)
MIME_SCHEMAS = [
    ("application/pdf", "Pages"),
    ("message/rfc822", "Email"),
    ("application/vnd.ms-outlook", "Email"),
    ("text/html", "HyperText"),
    ("text/csv", "Table"),
    ("application/vnd.ms-excel", "Table"),
    ("application/vnd.openxmlformats-officedocument.spreadsheetml", "Table"),
    ("text/", "PlainText"),
    ("image/", "Image"),
    ("audio/", "Audio"),
    ("video/", "Video"),
    ("application/zip", "Package"),
    ("application/x-tar", "Package"),
]


def mime_to_schema(mime: str | None) -> str:
    if mime:
        for prefix, schema in MIME_SCHEMAS:
            if mime.startswith(prefix):
                return schema
    return "Document"


def checksum_key(checksum: str) -> str:
    """``ab/cd/ef/<checksum>`` fan-out path (reference util.py:134-152)."""
    return "/".join([checksum[0:2], checksum[2:4], checksum[4:6], checksum])


@dataclass
class ArchivedFile:
    checksum: str
    name: str
    size: int
    mimetype: str | None
    path: str


class BlobArchive:
    """Local/object-store content-addressed archive."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _blob_dir(self, checksum: str) -> str:
        return os.path.join(self.root, checksum_key(checksum))

    def put(self, src_path: str, name: str | None = None) -> ArchivedFile:
        h = hashlib.sha256()
        with open(src_path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        checksum = h.hexdigest()
        d = self._blob_dir(checksum)
        blob = os.path.join(d, "blob")
        if not os.path.exists(blob):
            os.makedirs(d, exist_ok=True)
            shutil.copyfile(src_path, blob + ".tmp")
            os.replace(blob + ".tmp", blob)
        name = name or os.path.basename(src_path)
        mime, _ = mimetypes.guess_type(name)
        meta = ArchivedFile(
            checksum=checksum,
            name=name,
            size=os.path.getsize(src_path),
            mimetype=mime,
            path=blob,
        )
        with open(os.path.join(d, "meta.json"), "w") as fh:
            json.dump(meta.__dict__, fh)
        return meta

    def get_path(self, checksum: str) -> str | None:
        blob = os.path.join(self._blob_dir(checksum), "blob")
        return blob if os.path.exists(blob) else None

    def get_meta(self, checksum: str) -> dict | None:
        """Metadata object for a content hash (reference CLI
        ``archive head``, cli/archive.py:36-42)."""
        p = os.path.join(self._blob_dir(checksum), "meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def list(self) -> list[dict]:
        """All archived file metadata (reference ``archive ls``)."""
        out = []
        for root, _dirs, files in os.walk(self.root):
            if "meta.json" in files:
                with open(os.path.join(root, "meta.json")) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda m: m["name"])

    def download_all(self, target: str) -> int:
        """Copy every blob out under its original name (reference
        ``archive download``, cli/archive.py:64-68)."""
        n = 0
        for meta in self.list():
            dst = os.path.join(target, meta["name"])
            os.makedirs(os.path.dirname(dst) or target, exist_ok=True)
            shutil.copyfile(
                os.path.join(self._blob_dir(meta["checksum"]), "blob"), dst
            )
            n += 1
        return n

    def crawl(self, src_dir: str) -> list[ArchivedFile]:
        """Archive every file under ``src_dir`` (relative names kept)."""
        out = []
        for root, _dirs, files in os.walk(src_dir):
            for f in sorted(files):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, src_dir)
                out.append(self.put(p, name=rel))
        return out


def crawl_to_entities(spark: SparkSession, files: list[ArchivedFile]) -> DataFrame:
    """Archived file manifest → FtM Document-family entity rows
    (ENTITY_SCHEMA shape), including Folder entities for parent
    directories with ``parent`` references (reference
    model/file.py:140-148). Feed to ``Dataset.write_entities``."""
    from ftm_lakehouse_spark.operators.explode import ENTITY_SCHEMA

    ents: dict[str, dict] = {}
    for f in files:
        parts = f.name.split("/")
        # folder chain entities
        for i in range(len(parts) - 1):
            fid = "folder-" + hashlib.sha1("/".join(parts[: i + 1]).encode()).hexdigest()[:16]
            props = {"fileName": [parts[i]]}
            if i > 0:
                parent = "folder-" + hashlib.sha1("/".join(parts[:i]).encode()).hexdigest()[:16]
                props["parent"] = [parent]
            ents[fid] = {"id": fid, "schema": "Folder", "properties": props}
        fid = "file-" + f.checksum[:16]
        props = {
            "fileName": [parts[-1]],
            "contentHash": [f.checksum],
            "fileSize": [str(f.size)],
        }
        if f.mimetype:
            props["mimeType"] = [f.mimetype]
        if len(parts) > 1:
            props["parent"] = [
                "folder-" + hashlib.sha1("/".join(parts[:-1]).encode()).hexdigest()[:16]
            ]
        ents[fid] = {
            "id": fid,
            "schema": mime_to_schema(f.mimetype),
            "properties": props,
        }
    rows = [
        {
            "id": e["id"],
            "schema": e["schema"],
            "properties": e["properties"],
            "caption": None,
            "referents": [],
            "datasets": [],
            "first_seen": None,
            "last_seen": None,
            "last_change": None,
            "origin": [],
        }
        for e in ents.values()
    ]
    return spark.createDataFrame(rows, ENTITY_SCHEMA)
