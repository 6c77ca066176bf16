"""Command-line surface (reference P6: cli/* — Typer there, argparse
here to stay dependency-free).

    python -m ftm_lakehouse_spark --root /data/lake list
    python -m ftm_lakehouse_spark --root /data/lake import-json DS entities.ftm.json --origin bulk
    python -m ftm_lakehouse_spark --root /data/lake import-csv DS statements.csv
    python -m ftm_lakehouse_spark --root /data/lake optimize DS
    python -m ftm_lakehouse_spark --root /data/lake stats DS
    python -m ftm_lakehouse_spark --root /data/lake export-csv DS out/
    python -m ftm_lakehouse_spark --root /data/lake export-json DS out/
    python -m ftm_lakehouse_spark --root /data/lake sql "SELECT ... FROM statements"
    python -m ftm_lakehouse_spark --root /data/lake get DS entity-id
    python -m ftm_lakehouse_spark --root /data/lake iterate DS --as-of 7
    python -m ftm_lakehouse_spark --root /data/lake history DS
    python -m ftm_lakehouse_spark --root /data/lake vacuum DS --retention-hours 0
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ftm-lakehouse-spark")
    p.add_argument("--root", required=True, help="lakehouse root directory")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")

    for name in ("import-json", "import-csv"):
        s = sub.add_parser(name)
        s.add_argument("dataset")
        s.add_argument("path")
        s.add_argument("--origin", default="default")

    s = sub.add_parser("make")
    s.add_argument("dataset")
    s.add_argument("--out", default=None)
    s.add_argument("--force", action="store_true")

    for name in ("optimize", "stats"):
        s = sub.add_parser(name)
        s.add_argument("dataset")
        if name == "optimize":
            s.add_argument("--grace-days", type=int, default=30)
            s.add_argument("--force", action="store_true")

    for name in ("export-csv", "export-json"):
        s = sub.add_parser(name)
        s.add_argument("dataset")
        s.add_argument("out_dir")
        s.add_argument("--compression", default=None)

    s = sub.add_parser("sql")
    s.add_argument("query")
    s.add_argument("--dataset", default=None, help="register this dataset's views")

    s = sub.add_parser("get")
    s.add_argument("dataset")
    s.add_argument("entity_id")

    s = sub.add_parser("iterate")
    s.add_argument("dataset")
    s.add_argument("--schema", default=None)
    s.add_argument("--as-of", type=int, default=None,
                   help="time travel: read the table at this commit version")

    s = sub.add_parser("diff")
    s.add_argument("dataset")
    s.add_argument("--since", default=None,
                   help="ISO timestamp; default: the stored diff cursor")
    s.add_argument("--out", default=None,
                   help="write envelopes to this directory instead of stdout")

    s = sub.add_parser("history", help="transaction log: one line per commit")
    s.add_argument("dataset")
    s.add_argument("--since", type=int, default=0, help="start version (exclusive)")

    s = sub.add_parser("vacuum", help="reap files older than the retention window")
    s.add_argument("dataset")
    s.add_argument("--retention-hours", type=float, default=168.0)

    s = sub.add_parser(
        "adopt",
        help="fold a pre-log foreign store's files into an initial commit "
        "so the MVCC log owns the table (one-time; enables direct serving)",
    )
    s.add_argument("dataset")
    s.add_argument(
        "--force",
        action="store_true",
        help="operator override for a store stuck owned-at-version-0 with "
        "data (e.g. a crashed mid-adopt): fold the directory listing "
        "anyway — only for stores KNOWN to be foreign read-only imports",
    )

    s = sub.add_parser(
        "restore",
        help="roll the live table back (or forward) to a commit's snapshot "
        "(portable ZFS-rollback analog; reach bounded by vacuum retention)",
    )
    s.add_argument("dataset")
    s.add_argument("version", type=int)

    s = sub.add_parser("crawl", help="archive a directory tree and ingest Document/Folder entities")
    s.add_argument("dataset")
    s.add_argument("src_dir")
    s.add_argument("--origin", default="crawl")
    s.add_argument("--no-entities", action="store_true",
                   help="archive blobs only, skip entity ingestion")

    s = sub.add_parser("head", help="print archive metadata for a content hash")
    s.add_argument("dataset")
    s.add_argument("content_hash")

    s = sub.add_parser("download", help="copy all archive blobs to a local directory")
    s.add_argument("dataset")
    s.add_argument("target")

    s = sub.add_parser("stream", help="stream a pre-exported artifact byte-to-byte to stdout")
    s.add_argument("dataset")
    s.add_argument("--what", choices=("entities", "statements", "documents"),
                   default="entities")

    s = sub.add_parser(
        "publish-delta",
        help="write a standard Delta _delta_log for the current snapshot",
    )
    s.add_argument("dataset")

    s = sub.add_parser("unlock", help="forcibly release the commit-log lock file")
    s.add_argument("dataset")

    s = sub.add_parser("configure", help="create or update a dataset config sidecar")
    s.add_argument("dataset")
    s.add_argument("--title", default=None)
    s.add_argument("--shards", type=int, default=None)
    s.add_argument("--compression", default=None)
    s.add_argument("--public-url-prefix", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from ftm_lakehouse_spark.lakehouse import Lakehouse
    from ftm_lakehouse_spark.session import get_spark

    spark = get_spark("ftm-lakehouse-cli")
    lake = Lakehouse(spark, args.root)

    if args.cmd == "list":
        for name in lake.list_datasets():
            print(name)
    elif args.cmd == "import-json":
        lake.dataset(args.dataset).write_entities_json(args.path, origin=args.origin)
    elif args.cmd == "import-csv":
        from ftm_lakehouse_spark.sources.statements_csv import read_statements_csv

        ds = lake.dataset(args.dataset)
        ds.write_statements(
            read_statements_csv(
                spark, args.path, args.dataset, args.origin, ds.config.shards
            )
        )
    elif args.cmd == "make":
        print(json.dumps(lake.dataset(args.dataset).make(args.out, force=args.force),
                         default=str))
    elif args.cmd == "optimize":
        changed = lake.dataset(args.dataset).merge(
            grace_days=args.grace_days, force=args.force
        )
        print("merged" if changed else "fresh — skipped")
    elif args.cmd == "publish-delta":
        print(lake.dataset(args.dataset).export_delta())
    elif args.cmd == "stats":
        print(json.dumps(lake.dataset(args.dataset).stats(), indent=2))
    elif args.cmd == "export-csv":
        lake.dataset(args.dataset).export_statements_csv(
            args.out_dir, compression=args.compression
        )
    elif args.cmd == "export-json":
        lake.dataset(args.dataset).export_entities_json(
            args.out_dir, compression=args.compression
        )
    elif args.cmd == "sql":
        # S14: raw SQL against registered views — spark.sql for free
        if args.dataset:
            ds = lake.dataset(args.dataset)
            ds.store.live().createOrReplaceTempView("statements")
            ds.store.raw().createOrReplaceTempView("statements_raw")
        for row in spark.sql(args.query).toJSON().toLocalIterator():
            print(row)
    elif args.cmd == "iterate":
        # stream assembled entities as JSON lines (reference `iterate`):
        # toLocalIterator keeps only one partition on the driver at a time
        from ftm_lakehouse_spark.plans.query import Query

        q = Query().where(schema=args.schema) if args.schema else None
        ents = lake.dataset(args.dataset).entities(q, as_of=args.as_of)
        for line in ents.toJSON().toLocalIterator():
            print(line)
    elif args.cmd == "history":
        ds = lake.dataset(args.dataset)
        for rec in ds.store.commits.read(since=args.since):
            print(json.dumps(
                {k: rec[k] for k in ("version", "kind", "ts", "partitions")}
                | {"n_added": len(rec["files_added"]),
                   "n_removed": len(rec.get("files_removed", []))}
            ))
    elif args.cmd == "vacuum":
        removed = lake.dataset(args.dataset).store.vacuum(
            retention_hours=args.retention_hours
        )
        print(json.dumps({"removed": len(removed)}))
    elif args.cmd == "restore":
        print(json.dumps(lake.dataset(args.dataset).restore(args.version)))
    elif args.cmd == "adopt":
        print(json.dumps(lake.dataset(args.dataset).store.adopt(force=args.force)))
    elif args.cmd == "crawl":
        n = lake.dataset(args.dataset).crawl(
            args.src_dir, origin=args.origin, make_entities=not args.no_entities
        )
        print(json.dumps({"archived": n, "entities": not args.no_entities}))
    elif args.cmd == "head":
        meta = lake.dataset(args.dataset).archive.get_meta(args.content_hash)
        if meta is None:
            print("not found", file=sys.stderr)
            return 1
        print(json.dumps(meta))
    elif args.cmd == "download":
        n = lake.dataset(args.dataset).archive.download_all(args.target)
        print(json.dumps({"downloaded": n}))
    elif args.cmd == "stream":
        # reference streams the published artifact byte-to-byte
        # (cli/entities.py:42-57) instead of a python re-serialization
        ds = lake.dataset(args.dataset)
        name = {
            "entities": "entities.ftm.json",
            "statements": "statements.csv",
            "documents": "documents.csv",
        }[args.what]
        art = ds._fs.join(ds.path, "exports", name)
        if not ds._fs.exists(art):
            print(f"artifact {name} not published — run `make` first", file=sys.stderr)
            return 1
        if "://" in art:
            # same stance as the zstd export post-pass: part streaming
            # is a local-path operation; remote roots get an explicit
            # error, not an os.listdir traceback on a URI string
            print(
                "stream reads artifact parts from a local path; for "
                f"remote roots copy {art} down first",
                file=sys.stderr,
            )
            return 1
        if ds._fs.isdir(art):
            # Spark writes an artifact as a directory of ordered part
            # files — stream them in name order (the write was sorted),
            # decompressing in bounded chunks like the reference's
            # decompress_stream (cli/entities.py:52-57)
            import os as _os

            out = sys.stdout.buffer  # bytes out: chunking must never
            # split a multi-byte character, so don't decode at all

            def _stream(path: str) -> None:
                if path.endswith(".zst"):
                    import pyarrow as _pa

                    with _pa.input_stream(path, compression="zstd") as fh:
                        for chunk in iter(lambda: fh.read(1 << 20), b""):
                            out.write(chunk)
                elif path.endswith(".gz"):
                    import gzip as _gzip

                    with _gzip.open(path, "rb") as fh:
                        for chunk in iter(lambda: fh.read(1 << 20), b""):
                            out.write(chunk)
                else:
                    with open(path, "rb") as fh:
                        for chunk in iter(lambda: fh.read(1 << 20), b""):
                            out.write(chunk)

            for part in sorted(_os.listdir(art)):
                if part.startswith("_") or part.endswith(".crc"):
                    continue
                _stream(_os.path.join(art, part))
        else:
            sys.stdout.write(ds._fs.read_text(art))
    elif args.cmd == "unlock":
        released = lake.dataset(args.dataset).unlock()
        print("lock released" if released else "no lock held")
    elif args.cmd == "configure":
        kw = {
            k: v
            for k, v in (
                ("title", args.title),
                ("shards", args.shards),
                ("compression", args.compression),
                ("public_url_prefix", args.public_url_prefix),
            )
            if v is not None
        }
        ds = lake.dataset(args.dataset, **kw)
        print(json.dumps(ds.config.__dict__, default=str))
    elif args.cmd == "diff":
        # I6: cursor stored as a deduped version artifact
        from datetime import datetime, timezone

        ds = lake.dataset(args.dataset)
        if args.since:
            since = datetime.fromisoformat(args.since)
        else:
            cur = ds.versions.latest("diff-cursor")
            since = (
                datetime.fromisoformat(cur["artifact"]["since"])
                if cur
                else datetime.fromtimestamp(0, tz=timezone.utc)
            )
        now = datetime.now(timezone.utc)
        if args.out:
            ds.export_diff(args.out, since)
        else:
            for line in ds.diff(since).toJSON().toLocalIterator():
                print(line)
        ds.versions.put("diff-cursor", {"since": now.isoformat()})
    elif args.cmd == "get":
        ent = lake.dataset(args.dataset).get(args.entity_id)
        print(json.dumps(ent, default=str) if ent else "null")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
