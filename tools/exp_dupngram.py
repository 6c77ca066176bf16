"""A/B: text_dup_ngram_coverage gram keys — md5 hex vs raw gram string
(round-9, VERDICT r8 item 6).

The sf100 wall (174 s) is dominated by md5 over ~5.3B gram strings.
The hash is semantically transparent — the query only needs gram
EQUALITY, and the oracle applies the same function — so the raw gram
string is an exact drop-in key (strictly MORE exact: no collision
residual), trading hash compute for longer sort/shuffle keys (~34
bytes avg vs fixed 32-hex). This tool times both variants on a real
sf dir and asserts identical result frames.

Usage: python tools/exp_dupngram.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def variant(spark, sf_dir: str, use_md5: bool):
    from ftm_lakehouse_spark.queries.inventory import _spread, load_table

    d = _spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')").alias("ts"),
    )
    gram = (
        "md5(array_join(slice(ts, i, 5), ' '))"
        if use_md5
        else "array_join(slice(ts, i, 5), ' ')"
    )
    rle = F.expr(
        """
        CASE WHEN size(sp) >= 1 THEN
          zip_with(
            sp, concat(slice(sp, 2, size(sp) - 1), array(size(sg) + 1)),
            (s, e) -> struct(element_at(sg, s) AS h,
                             CAST(e - s AS BIGINT) AS c))
        ELSE CAST(array() AS array<struct<h:string,c:bigint>>) END
        """
    )
    grp = (
        toks.withColumn(
            "sg",
            F.expr(
                "array_sort(CASE WHEN size(ts) >= 5 THEN"
                f" transform(sequence(1, size(ts) - 4), i -> {gram})"
                " ELSE CAST(array() AS array<string>) END)"
            ),
        )
        .withColumn(
            "sp",
            F.expr(
                "CASE WHEN size(sg) >= 1 THEN"
                " filter(sequence(1, size(sg)),"
                " i -> i = 1 OR element_at(sg, i) != element_at(sg, i - 1))"
                " ELSE CAST(array() AS array<int>) END"
            ),
        )
        .select("doc_id", F.explode(rle).alias("p"))
        .select("doc_id", F.col("p.h").alias("h"), F.col("p.c").alias("c"))
    )
    dup = (
        grp.groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    per = (
        grp.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("bigint")
            .alias("dup_grams"),
        )
    )
    return (
        toks.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("dup_grams").cast("double") / F.col("n_grams"))
            .alias("dup_frac"),
        )
    )


def main() -> None:
    from ftm_lakehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("exp-dupngram")

    # correctness: identical frames
    a = variant(spark, sf_dir, use_md5=True).orderBy("doc_id").toPandas()
    b = variant(spark, sf_dir, use_md5=False).orderBy("doc_id").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    print(f"frames identical ({len(a)} rows)")

    for label, use_md5 in (("md5", True), ("raw", False)):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            variant(spark, sf_dir, use_md5).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.perf_counter() - t0)
        walls.sort()
        print(f"{label}: median {walls[len(walls) // 2]:.2f}s  all={[round(w, 2) for w in walls]}")
    spark.stop()


if __name__ == "__main__":
    main()
