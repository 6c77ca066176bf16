"""Blob archive: content addressing, crawl → Document/Folder entities,
parent-chain integration."""

from ftm_lakehouse_spark.sources.archive import (
    BlobArchive,
    checksum_key,
    crawl_to_entities,
    mime_to_schema,
)


def test_mime_mapping():
    assert mime_to_schema("application/pdf") == "Pages"
    assert mime_to_schema("text/plain") == "PlainText"
    assert mime_to_schema("image/png") == "Image"
    assert mime_to_schema(None) == "Document"


def test_checksum_key():
    k = checksum_key("abcdef0123")
    assert k == "ab/cd/ef/abcdef0123"


def test_put_get_dedup(tmp_path):
    src = tmp_path / "f.txt"
    src.write_text("hello world")
    arch = BlobArchive(str(tmp_path / "arch"))
    a = arch.put(str(src))
    b = arch.put(str(src))  # same content → same blob
    assert a.checksum == b.checksum
    assert arch.get_path(a.checksum) is not None
    assert arch.get_path("0" * 64) is None


def test_crawl_to_entities_with_folders(spark, tmp_path, lake_root):
    (tmp_path / "src" / "sub").mkdir(parents=True)
    (tmp_path / "src" / "top.txt").write_text("top file")
    (tmp_path / "src" / "sub" / "doc.pdf").write_bytes(b"%PDF-fake")
    arch = BlobArchive(str(tmp_path / "arch"))
    files = arch.crawl(str(tmp_path / "src"))
    assert len(files) == 2

    ents = crawl_to_entities(spark, files)
    rows = {r["id"]: r for r in ents.collect()}
    schemas = sorted(r["schema"] for r in rows.values())
    assert schemas == ["Folder", "Pages", "PlainText"]
    pdf = next(r for r in rows.values() if r["schema"] == "Pages")
    assert pdf["properties"]["parent"]  # nested file points at folder

    # end to end: archive crawl → statement table → queryable entities
    from ftm_lakehouse_spark.lakehouse import Lakehouse
    from ftm_lakehouse_spark.plans.query import Query

    lake = Lakehouse(spark, lake_root)
    ds = lake.dataset("docs")
    ds.write_entities(ents, origin="crawl")
    got = ds.entities(Query().where(schema="Pages")).collect()
    assert len(got) == 1
    assert got[0]["properties"]["contentHash"][0] == pdf["properties"]["contentHash"][0]
