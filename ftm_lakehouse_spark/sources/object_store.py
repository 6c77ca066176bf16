"""S3 object-store control plane (boto3) + pyarrow read plane.

``S3FS`` implements the same small FS API as :class:`fs.LocalFS` /
:class:`fs.HadoopFS` over any S3-compatible endpoint, so the MVCC
commit log, tag store, and the Spark-free serving tier
(:class:`serving.PointReader`) run end-to-end against object storage
— the deployment shape the serving tier's footer-metadata cache was
designed for (every footer read there is a ranged GET).

Scheme split, mirroring how a real cluster is wired:

* ``s3://``  → this module: the CONTROL plane (KB-sized log/tag/config
  objects, boto3, no JVM) and the serving read plane (pyarrow's native
  ``S3FileSystem`` via :meth:`S3FS.pyarrow_fs`).
* ``s3a://`` → :class:`fs.HadoopFS`: the Spark DATA plane (executors
  read/write parquet through the cluster's s3a jars).

Atomicity: ``write_text_exclusive`` uses S3 conditional writes
(``If-None-Match: *`` — GA on S3 since Nov 2024, enforced by MinIO/R2/
GCS-interop and by moto in tests), which makes the commit log's
put-if-absent TRUE atomic on the object store itself — the same
primitive Delta gained with S3 conditional writes, with no DynamoDB
lock table. Endpoints that reject the header surface a loud error
rather than degrading to last-writer-wins (pass a
:class:`commits.LockClient` for those).

Credentials/endpoint resolve from the standard AWS env/config chain;
``AWS_ENDPOINT_URL_S3`` / ``AWS_ENDPOINT_URL`` select a custom
endpoint (moto/MinIO) for both boto3 and pyarrow.

Directory semantics: S3 has none. ``isdir`` means "any object under
this prefix", ``mkdirs`` is a no-op, ``rename`` is copy+delete (never
on a hot path here — the commit log only renames its checkpoint tmp,
KB-sized). Listings use paginated ``list_objects_v2``.
"""

from __future__ import annotations

import os
import posixpath

__all__ = ["S3FS", "parse_s3_uri"]


def parse_s3_uri(uri: str) -> tuple[str, str]:
    """``s3://bucket/key...`` → (bucket, key)."""
    rest = uri.split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    return bucket, key


def _endpoint() -> str | None:
    return os.environ.get("AWS_ENDPOINT_URL_S3") or os.environ.get(
        "AWS_ENDPOINT_URL"
    )


class S3FS:
    """boto3-backed implementation of the engine FS API for ``s3://``
    roots. One client per instance; blocking HTTP calls only (the
    control plane touches KB-sized objects once per job)."""

    #: true atomic put-if-absent via S3 conditional writes
    atomic_put_if_absent = True

    def __init__(self, client=None):
        if client is None:
            import boto3
            import botocore.config

            # flexible checksums only when the operation requires them:
            # the default when_supported mode ships PUT bodies
            # aws-chunked with trailing checksums, which many
            # S3-compatible endpoints (MinIO<2024, R2, proxies) reject
            # or mis-store — the standard interop setting
            client = boto3.client(
                "s3",
                endpoint_url=_endpoint(),
                config=botocore.config.Config(
                    request_checksum_calculation="when_required",
                    response_checksum_validation="when_required",
                ),
            )
        self._s3 = client

    # ------------------------------------------------------------ paths
    def join(self, base: str, *parts: str) -> str:
        return posixpath.join(base, *parts)

    # ------------------------------------------------------------ reads
    def exists(self, p: str) -> bool:
        import botocore.exceptions

        bucket, key = parse_s3_uri(p)
        try:
            self._s3.head_object(Bucket=bucket, Key=key)
            return True
        except botocore.exceptions.ClientError as e:
            if e.response["Error"]["Code"] in ("404", "NoSuchKey", "NotFound"):
                return self.isdir(p)
            raise

    def isdir(self, p: str) -> bool:
        bucket, key = parse_s3_uri(p)
        prefix = key.rstrip("/") + "/" if key else ""
        resp = self._s3.list_objects_v2(Bucket=bucket, Prefix=prefix, MaxKeys=1)
        return resp.get("KeyCount", 0) > 0

    def read_bytes(self, p: str) -> bytes:
        import botocore.exceptions

        bucket, key = parse_s3_uri(p)
        try:
            return self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()
        except botocore.exceptions.ClientError as e:
            if e.response["Error"]["Code"] in ("404", "NoSuchKey", "NotFound"):
                raise FileNotFoundError(p) from e
            raise

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode("utf-8")

    def read_chunks(self, p: str, chunk_size: int = 1 << 20):
        import botocore.exceptions

        bucket, key = parse_s3_uri(p)
        try:
            body = self._s3.get_object(Bucket=bucket, Key=key)["Body"]
        except botocore.exceptions.ClientError as e:
            if e.response["Error"]["Code"] in ("404", "NoSuchKey", "NotFound"):
                raise FileNotFoundError(p) from e
            raise
        for chunk in iter(lambda: body.read(chunk_size), b""):
            yield chunk

    def filesize(self, p: str) -> int:
        bucket, key = parse_s3_uri(p)
        return self._s3.head_object(Bucket=bucket, Key=key)["ContentLength"]

    def mtime(self, p: str) -> float:
        bucket, key = parse_s3_uri(p)
        return self._s3.head_object(Bucket=bucket, Key=key)[
            "LastModified"
        ].timestamp()

    def listdir(self, p: str) -> list[str]:
        """Immediate children (object names and common 'directory'
        prefixes) — the LocalFS.listdir contract."""
        bucket, key = parse_s3_uri(p)
        prefix = key.rstrip("/") + "/" if key else ""
        names: set[str] = set()
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=bucket, Prefix=prefix, Delimiter="/"
        ):
            for cp in page.get("CommonPrefixes", ()):
                names.add(cp["Prefix"][len(prefix):].rstrip("/"))
            for obj in page.get("Contents", ()):
                name = obj["Key"][len(prefix):]
                if name:
                    names.add(name)
        return sorted(names)

    def _walk(self, p: str) -> list[str]:
        bucket, key = parse_s3_uri(p)
        prefix = key.rstrip("/") + "/" if key else ""
        out = []
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            out.extend(o["Key"][len(prefix):] for o in page.get("Contents", ()))
        return out

    def parquet_files(self, root: str) -> set[str]:
        return {r for r in self._walk(root) if r.endswith(".parquet")}

    def parquet_dirs(self, root: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for rel in self.parquet_files(root):
            d = posixpath.dirname(rel) or "."
            out[d] = out.get(d, 0) + 1
        return out

    # ----------------------------------------------------------- writes
    def mkdirs(self, p: str) -> None:
        pass  # prefixes need no creation

    def delete(self, p: str) -> None:
        bucket, key = parse_s3_uri(p)
        subs = self._walk(p)
        if subs:
            prefix = key.rstrip("/") + "/" if key else ""
            for i in range(0, len(subs), 1000):
                self._s3.delete_objects(
                    Bucket=bucket,
                    Delete={
                        "Objects": [
                            {"Key": prefix + s} for s in subs[i : i + 1000]
                        ]
                    },
                )
        self._s3.delete_object(Bucket=bucket, Key=key)

    def rename(self, src: str, dst: str) -> None:
        """Copy+delete — S3 has no rename. Only the commit log's
        KB-sized checkpoint tmp swap lands here; data files NEVER move
        (the MVCC log flips visibility instead)."""
        sb, sk = parse_s3_uri(src)
        db, dk = parse_s3_uri(dst)
        self._s3.copy_object(
            Bucket=db, Key=dk, CopySource={"Bucket": sb, "Key": sk}
        )
        self._s3.delete_object(Bucket=sb, Key=sk)

    def write_bytes_atomic(self, p: str, data: bytes) -> None:
        # a single PUT is atomic on S3 (readers never see partials)
        bucket, key = parse_s3_uri(p)
        self._s3.put_object(Bucket=bucket, Key=key, Body=data)

    def write_text_atomic(self, p: str, data: str) -> None:
        self.write_bytes_atomic(p, data.encode("utf-8"))

    def write_text_exclusive(self, p: str, data: str) -> bool:
        """Atomic put-if-absent via S3 conditional write. Exactly one
        of N concurrent writers lands; losers get 412."""
        import botocore.exceptions

        bucket, key = parse_s3_uri(p)
        try:
            self._s3.put_object(
                Bucket=bucket, Key=key, Body=data.encode("utf-8"),
                IfNoneMatch="*",
            )
            return True
        except botocore.exceptions.ClientError as e:
            if e.response["Error"]["Code"] in (
                "PreconditionFailed", "412", "ConditionalRequestConflict"
            ):
                return False
            raise

    # ----------------------------------------------- serving read plane
    def pyarrow_fs(self):
        """(pyarrow FileSystem, path-normalizer) for the serving tier:
        ``PointReader`` reads parquet footers/row-groups through
        pyarrow's native S3 client (ranged GETs), while the control
        plane stays on boto3."""
        import pyarrow.fs as pafs

        # endpoint_override carries its own scheme (http for moto/
        # MinIO, https for real S3 when unset)
        kw = {"endpoint_override": _endpoint()} if _endpoint() else {}
        if os.environ.get("AWS_ACCESS_KEY_ID"):
            kw["access_key"] = os.environ["AWS_ACCESS_KEY_ID"]
            kw["secret_key"] = os.environ.get("AWS_SECRET_ACCESS_KEY", "")
        kw["region"] = os.environ.get("AWS_DEFAULT_REGION", "us-east-1")
        fs = pafs.S3FileSystem(**kw)

        def normalize(path: str) -> str:
            bucket, key = parse_s3_uri(path)
            return f"{bucket}/{key}"

        return fs, normalize
