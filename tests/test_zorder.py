"""Z-order compaction + stats-based file pruning (Delta OPTIMIZE
ZORDER analog, functions/zorder.py + StatementStore.compact(zorder=) +
StatementStore.scan_range).

The pin that matters: after ``compact(zorder=("entity_id",
"first_seen"))`` a narrow ``first_seen`` range scan PLANS a strict
subset of the store's files (footer min/max pruning has something to
bite on), while the default entity-sorted layout — where every file
spans the full time range — plans essentially all of them. Both layouts
must return byte-identical results to an unpruned ``raw()`` filter:
pruning may only drop files the predicate could never match."""

from pyspark.sql import functions as F

from tests.helpers import make_df, stmt, ts


def _build_store(spark, root, *, n_entities=120, n_days=64):
    """One statement per (entity, day-slot): entity e{i} active on day
    i%n_days — entity order and time order are deliberately
    uncorrelated so an entity-sorted file always spans most of the
    time range."""
    from ftm_lakehouse_spark.lakehouse import Lakehouse

    ds = Lakehouse(spark, root).dataset("zo", shards=2)
    rows = []
    for i in range(n_entities):
        day = i % n_days
        when = f"2024-{1 + day // 28:02d}-{1 + day % 28:02d}T00:00:00"
        for p in range(4):
            rows.append(
                stmt(
                    id=f"s{i}-{p}",
                    entity_id=f"e{i:04d}",
                    prop=f"p{p}",
                    value=f"v{i}-{p}",
                    first_seen=when,
                    last_seen=when,
                    shard=str(i % 2),
                )
            )
    ds.store.append(make_df(spark, rows))
    return ds


def test_zorder_key_interleaves_rank_buckets(spark):
    from ftm_lakehouse_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(float(x), float(y)) for x in range(16) for y in range(16)],
        "x double, y double",
    )
    out = df.withColumn("z", zorder_key(df, ["x", "y"], bits_per_dim=4)).collect()
    zs = {(r["x"], r["y"]): r["z"] for r in out}
    # cells spread over nearly the whole key space (quantile cut-point
    # ties may collapse a few edge buckets — documented), and the key
    # fits bits_per_dim * ndims bits
    assert len(set(zs.values())) >= 0.75 * len(zs)
    assert all(0 <= z < 2**8 for z in zs.values())
    # per-dimension monotonicity: with one dimension fixed, the Morton
    # key is non-decreasing in the other (interleaving is order-
    # preserving per dim; quantile bucketing is non-strictly monotone).
    # The exact bucket a value lands in depends on where approxQuantile
    # places its cut points, so the pin is on ORDER, not identity.
    for fixed in range(16):
        row = [zs[(float(x), float(fixed))] for x in range(16)]
        col = [zs[(float(fixed), float(y))] for y in range(16)]
        assert row == sorted(row)
        assert col == sorted(col)


def test_compact_zorder_prunes_time_range_files(spark, tmp_path):
    ds = _build_store(spark, str(tmp_path / "lake"))
    store = ds.store

    # expected answer, computed BEFORE any rewrite
    lo, hi = ts("2024-01-08T00:00:00"), ts("2024-01-14T00:00:00")
    pred = F.col("first_seen").between(F.lit(lo), F.lit(hi))
    expected = sorted(r["id"] for r in store.raw().filter(pred).select("id").collect())
    assert expected  # the window is non-empty

    # default layout: entity-sorted files span the whole time range
    store.compact(max_files_per_partition=0)
    plain = store.scan_range("first_seen", lo, hi)
    assert sorted(r["id"] for r in plain.select("id").collect()) == expected

    # z-order rewrite: (entity, time) Morton clustering
    done = store.compact(zorder=("entity_id", "first_seen"))
    assert done  # every multi-file partition rewritten
    total = len(store.commits.snapshot())
    zscan = store.scan_range("first_seen", lo, hi)
    kept = len(zscan.inputFiles())
    assert sorted(r["id"] for r in zscan.select("id").collect()) == expected
    # the whole point: the narrow window PLANS a strict subset of files
    assert kept < total, f"zorder pruned nothing ({kept}/{total} files)"
    # a full-range scan still sees everything (pruning is predicate-
    # driven, not lossy)
    full = store.scan_range(
        "first_seen", ts("2023-01-01T00:00:00"), ts("2025-01-01T00:00:00")
    )
    assert full.count() == store.raw().count()


def test_scan_range_exact_on_unclustered_store(spark, tmp_path):
    ds = _build_store(spark, str(tmp_path / "lake"), n_entities=40, n_days=8)
    store = ds.store
    lo, hi = ts("2024-01-02T00:00:00"), ts("2024-01-05T00:00:00")
    pred = F.col("first_seen").between(F.lit(lo), F.lit(hi))
    want = sorted(r["id"] for r in store.raw().filter(pred).select("id").collect())
    got = sorted(
        r["id"] for r in store.scan_range("first_seen", lo, hi).select("id").collect()
    )
    assert got == want


def test_zorder_rewrite_preserves_content_and_log(spark, tmp_path):
    ds = _build_store(spark, str(tmp_path / "lake"), n_entities=60, n_days=16)
    store = ds.store
    before = sorted(
        r["id"] for r in store.raw().select("id").collect()
    )
    v0 = store.commits.current_version()
    store.compact(zorder=("entity_id", "first_seen"))
    assert store.commits.current_version() == v0 + 1
    after = sorted(r["id"] for r in store.raw().select("id").collect())
    assert after == before
    # time travel to the pre-rewrite version still works (files retired,
    # not deleted, until vacuum)
    assert store.raw(as_of=v0).count() == len(before)
