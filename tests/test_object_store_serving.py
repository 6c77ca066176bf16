"""Serving tier over an S3-compatible object store (VERDICT r9 item 4).

The footer-metadata cache and the whole PointReader design were
justified by "a footer read is a ranged GET on object stores" but only
measured on local disk. These tests stand up a real S3 wire-protocol
endpoint (moto server) behind a GET-counting HTTP proxy and run the
control plane (CommitLog / TagStore / adopt() over :class:`S3FS`) and
the read plane (PointReader via pyarrow's native S3 client) end-to-end
against it:

* hash parity vs the local Spark path on every entity;
* GET counts asserted with the footer cache ON vs OFF — the cache's
  reason to exist, now measured where it matters;
* conditional-write atomicity of the commit log's put-if-absent on
  the object store itself (If-None-Match, the Delta-on-S3 primitive).
"""

import json
import threading
import urllib.request

import pytest

pytest.importorskip("moto")
pytest.importorskip("boto3")

from ftm_lakehouse_spark.lakehouse import Lakehouse


def _canon(ent):
    return json.dumps(ent, default=str, sort_keys=True)


class _CountingProxy:
    """Minimal stdlib HTTP proxy in front of moto: forwards every
    request, recording (method, path, has_range) so tests can count
    object GETs issued by the pyarrow/boto3 clients."""

    def __init__(self, upstream: str):
        import http.server

        proxy = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _forward(self):
                with proxy.lock:
                    proxy.log.append(
                        (self.command, self.path, "Range" in self.headers)
                    )
                n = int(self.headers.get("Content-Length", 0) or 0)
                body = self.rfile.read(n) if n else b""
                headers = {
                    k: v
                    for k, v in self.headers.items()
                    if k.lower()
                    not in ("host", "connection", "content-length",
                            "accept-encoding", "transfer-encoding", "expect")
                }
                # http.client, NOT urllib: urllib would default
                # Content-Type to x-www-form-urlencoded, making the
                # upstream werkzeug parse PUT bodies as form data
                # (stored object becomes empty)
                if body and "Content-Type" not in headers:
                    headers["Content-Type"] = "application/octet-stream"
                import http.client as hc

                up_host = upstream.split("://", 1)[1]
                conn = hc.HTTPConnection(up_host)
                conn.request(self.command, self.path, body=body or None,
                             headers=headers)
                resp = conn.getresponse()
                status, rheaders = resp.status, dict(resp.getheaders())
                rbody = b"" if self.command == "HEAD" else resp.read()
                conn.close()
                self.send_response(status)
                is_head = self.command == "HEAD"
                for k, v in rheaders.items():
                    if k.lower() in ("connection", "transfer-encoding",
                                     "content-length"):
                        continue
                    self.send_header(k, v)
                if is_head:
                    # preserve the object size a HEAD reports; a HEAD
                    # response carries NO body (writing one desyncs
                    # keep-alive clients)
                    cl = rheaders.get("Content-Length")
                    if cl is not None:
                        self.send_header("Content-Length", cl)
                else:
                    self.send_header("Content-Length", str(len(rbody)))
                # one request per connection: urllib gives no reliable
                # hop-by-hop passthrough, so never let a client pipeline
                self.send_header("Connection", "close")
                self.close_connection = True
                self.end_headers()
                if not is_head:
                    self.wfile.write(rbody)

            do_GET = do_PUT = do_POST = do_HEAD = do_DELETE = _forward

        self.lock = threading.Lock()
        self.log: list[tuple[str, str, bool]] = []
        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def parquet_gets(self) -> int:
        with self.lock:
            return sum(
                1 for m, p, _ in self.log if m == "GET" and ".parquet" in p
            )

    def reset(self):
        with self.lock:
            self.log.clear()


@pytest.fixture(scope="module")
def s3env(tmp_path_factory):
    """moto server + counting proxy + env wiring for S3FS/pyarrow."""
    import os

    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0, verbose=False)
    srv.start()
    moto_url = f"http://127.0.0.1:{srv._server.socket.getsockname()[1]}"
    proxy = _CountingProxy(moto_url)
    old = {
        k: os.environ.get(k)
        for k in ("AWS_ENDPOINT_URL_S3", "AWS_ACCESS_KEY_ID",
                  "AWS_SECRET_ACCESS_KEY", "AWS_DEFAULT_REGION")
    }
    os.environ["AWS_ENDPOINT_URL_S3"] = proxy.url
    os.environ["AWS_ACCESS_KEY_ID"] = "testing"
    os.environ["AWS_SECRET_ACCESS_KEY"] = "testing"
    os.environ["AWS_DEFAULT_REGION"] = "us-east-1"
    from ftm_lakehouse_spark.sources.object_store import S3FS

    S3FS()._s3.create_bucket(Bucket="lake")
    yield proxy
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    proxy.server.shutdown()
    srv.stop()


@pytest.fixture(scope="module")
def local_ds(spark, tmp_path_factory):
    """Local reference store: merged, multi-origin, tombstones."""
    root = tmp_path_factory.mktemp("s3src")
    ds = Lakehouse(spark, str(root)).dataset("s3demo", shards=4)
    ds.write_entities(
        spark.createDataFrame(
            [
                {"id": "alice", "schema": "Person",
                 "properties": {"name": ["Alice A"], "email": ["a@x.org"]}},
                {"id": "acme", "schema": "Company",
                 "properties": {"name": ["ACME"], "country": ["de"]}},
                {"id": "gone", "schema": "Person",
                 "properties": {"name": ["G"]}},
            ]
        ),
        origin="bulk",
    )
    ds.write_entities(
        spark.createDataFrame(
            [{"id": "alice", "schema": "Person",
              "properties": {"phone": ["+1"]}}]
        ),
        origin="crawl",
    )
    ds.delete_entity("gone")
    ds.merge(force=True)
    return ds


def _upload_dir(local_root: str, bucket: str, prefix: str, include_meta: bool):
    import os

    from ftm_lakehouse_spark.sources.object_store import S3FS

    s3 = S3FS()._s3  # AWS_ENDPOINT_URL_S3 routes via the proxy
    for r, _dirs, files in os.walk(local_root):
        for f in files:
            full = os.path.join(r, f)
            rel = os.path.relpath(full, local_root).replace(os.sep, "/")
            if not include_meta and rel.startswith("_meta/"):
                continue
            with open(full, "rb") as fh:
                s3.put_object(Bucket=bucket, Key=f"{prefix}/{rel}", Body=fh.read())


ALL_IDS = ["alice", "acme", "gone", "missing"]


def test_point_reader_over_s3_with_get_counts(s3env, local_ds, spark):
    from ftm_lakehouse_spark.serving import PointReader
    from ftm_lakehouse_spark.sources.statement_store import StatementStore

    store_dir = str(local_ds.store.path)
    _upload_dir(store_dir, "lake", "tables/s3demo", include_meta=True)

    s3store = StatementStore(
        spark, "s3://lake/tables/s3demo", local_ds.config
    )
    assert not s3store._adopting  # _meta/commits uploaded → owned
    assert (
        s3store.commits.current_version()
        == local_ds.store.commits.current_version()
    )
    reader = PointReader(s3store)

    # ---- parity: every entity identical to the local Spark path
    for eid in ALL_IDS:
        got = reader.get(eid)
        assert _canon(got) == _canon(local_ds.get(eid, engine="spark")), eid
    batch = reader.get_many(ALL_IDS)
    for eid in ALL_IDS:
        assert _canon(batch[eid]) == _canon(reader.get(eid)), eid

    # ---- GET counts: footer cache on vs off (the object-store case
    # the cache was built for — a footer read is a ranged GET here)
    s3env.reset()
    reader2 = PointReader(s3store)
    reader2.get("alice")
    cold = s3env.parquet_gets()
    assert cold > 0  # footers + row groups actually travel over HTTP

    s3env.reset()
    reader2.get("alice")
    warm = s3env.parquet_gets()
    assert warm < cold, (warm, cold)  # cached footers: no re-read

    s3env.reset()
    with reader2._lock:
        reader2._md_cache.clear()  # cache OFF → footer GETs return
    reader2.get("alice")
    nocache = s3env.parquet_gets()
    assert nocache == cold, (nocache, cold)


def test_adopt_and_commit_log_over_s3(s3env, local_ds, spark):
    """Control-plane writes on the object store: adopt() folds a
    pre-log S3 directory into a version-1 bootstrap commit written via
    conditional PUT; the PointReader then serves directly."""
    from ftm_lakehouse_spark.serving import PointReader
    from ftm_lakehouse_spark.sources.statement_store import StatementStore

    # a FOREIGN pre-log store's directory listing IS its content:
    # vacuum the source first so the copied directory holds only live
    # files (the merged store still carries superseded pre-merge files
    # for time travel, which adopt would — correctly — surface)
    local_ds.store.vacuum(retention_hours=0.0)
    _upload_dir(
        str(local_ds.store.path), "lake", "tables/foreign", include_meta=False
    )
    store = StatementStore(spark, "s3://lake/tables/foreign", local_ds.config)
    assert store._adopting
    reader = PointReader(store)
    with pytest.raises(NotImplementedError):
        reader.get("alice")
    res = store.adopt()
    assert res == {"adopted": True, "version": 1}
    assert store.commits.current_version() == 1
    for eid in ALL_IDS:
        assert _canon(reader.get(eid)) == _canon(
            local_ds.get(eid, engine="spark")
        ), eid
    # idempotent on the object store too
    assert store.adopt() == {"adopted": False, "version": 1}


def test_s3_put_if_absent_is_atomic(s3env):
    """The commit log's optimistic-commit primitive on S3: exactly one
    of N racing writers lands (If-None-Match conditional write)."""
    from ftm_lakehouse_spark.sources.object_store import S3FS

    fs = S3FS()
    key = "s3://lake/race/commit-1.json"
    results = []
    lock = threading.Lock()

    def racer(i):
        ok = fs.write_text_exclusive(key, json.dumps({"writer": i}))
        with lock:
            results.append(ok)

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert sum(results) == 1, results
    winner = json.loads(fs.read_text(key))
    assert winner["writer"] in range(8)
    fs.delete(key)
