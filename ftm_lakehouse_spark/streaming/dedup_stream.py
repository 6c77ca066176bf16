"""Ingestion-time corpus dedup: the streaming face of the dedup suite.

A training corpus is not built in one batch — drops arrive for months.
The batch operators (operators/dedupe.py) answer "which of these N
docs duplicate each other"; this module answers the production
question: "which of TODAY'S docs duplicate anything we already
accepted", incrementally, with bounded per-batch work:

* **exact tier** — md5 content hash against the accepted-hash index
  (equi-join) + in-batch keep-lowest-id;
* **near-dup tier** — MinHash band keys against the accepted-band
  index (the LSH equi-join — a batch doc only ever meets index docs
  sharing a band bucket, never the whole corpus), verified by the
  MinHash similarity ESTIMATE (fraction of equal signature
  components, an unbiased Jaccard estimator — Broder 1997). The index
  stores 16 ints per doc, not shingle sets: state stays O(corpus
  rows), not O(corpus bytes).

Crash safety without a transaction manager: every epoch writes its
corpus slice and index slices to ``epoch=N`` subdirectories with
overwrite semantics, so an at-least-once ``foreachBatch`` replay
rewrites the same bytes instead of duplicating them — the
idempotent-epoch idiom (same contract the journal gets from the commit
log's txn fencing, here achieved purely by layout).

Greedy arrival-order semantics, documented loudly: a doc is dropped if
it matches anything ACCEPTED so far; a chain a~b~c where b was dropped
for matching a does NOT drop c unless c also matches a (accepted
members are the comparison set — same policy as the reference batch
keeper rule applied incrementally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_lakehouse_spark.functions.text import (
    lsh_band_keys,
    minhash_signature,
    word_shingles,
)

__all__ = ["StreamingCorpusDedup"]


def _sig_matches(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


class StreamingCorpusDedup:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        work_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 16,
        bands: int = 4,
        shingle_words: int = 3,
        threshold: float = 0.8,
    ):
        import os

        self.spark = spark
        self.source_dir = source_dir
        self.id_col, self.text_col = id_col, text_col
        self.num_hashes, self.bands = num_hashes, bands
        self.rows = num_hashes // bands
        self.shingle_words = shingle_words
        self.threshold = threshold
        self.corpus_dir = os.path.join(work_dir, "corpus")
        self.hash_dir = os.path.join(work_dir, "index_hash")
        self.sig_dir = os.path.join(work_dir, "index_sigs")
        self.band_dir = os.path.join(work_dir, "index_bands")
        self.checkpoint_dir = os.path.join(work_dir, "ckpt")

    # ------------------------------------------------------------ reads
    def _maybe(self, path: str, schema: str) -> DataFrame:
        import os

        if os.path.isdir(path) and any(
            f.startswith("epoch=") for f in os.listdir(path)
        ):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], schema + ", epoch int")

    def _index(self, path: str, schema: str, exclude_epoch: int) -> DataFrame:
        """A comparison index EXCLUDING the epoch being (re)written: a
        replayed epoch must not be shadowed by its own previous
        attempt's slices, or the replay would reject everything and
        overwrite the slice with an empty one."""
        return self._maybe(path, schema).filter(F.col("epoch") != exclude_epoch)

    def accepted(self) -> DataFrame:
        """The deduped corpus accumulated so far."""
        return self._maybe(
            self.corpus_dir, f"{self.id_col} long, {self.text_col} string"
        ).drop("epoch")

    # ------------------------------------------------------------- sink
    def _dedup_batch(self, batch: DataFrame, epoch: int) -> DataFrame:
        """One micro-batch against the indexes; returns accepted rows
        with their content hash, signature and band keys attached."""
        from pyspark.sql import Window as W

        id_c, text_c = self.id_col, self.text_col
        docs = (
            batch.select(id_c, text_c)
            .dropDuplicates([id_c])
            .withColumn("content_hash", F.md5(F.col(text_c)))
        )
        # exact tier: in-batch lowest id per hash, then index anti-join
        w = W.partitionBy("content_hash")
        docs = docs.withColumn("_keep", F.min(id_c).over(w)).filter(
            F.col(id_c) == F.col("_keep")
        ).drop("_keep")
        known_hash = self._index(self.hash_dir, "content_hash string", epoch)
        docs = docs.join(
            F.broadcast(known_hash.select("content_hash").distinct()),
            "content_hash",
            "left_anti",
        )
        # near-dup tier: signatures + band keys
        shingles = word_shingles(F.col(text_c), self.shingle_words)
        sigged = docs.withColumn(
            "sig", minhash_signature(shingles, self.num_hashes)
        ).localCheckpoint(eager=True)
        banded = sigged.select(
            id_c,
            "sig",
            F.explode(lsh_band_keys(F.col("sig"), self.bands, self.rows)).alias("bk"),
        ).select(id_c, "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

        known_bands = self._index(
            self.band_dir, "band int, key string, doc_id long", epoch
        ).withColumnRenamed("doc_id", "_idx_doc")
        known_sigs = self._index(
            self.sig_dir, "doc_id long, sig array<long>", epoch
        ).withColumnRenamed("doc_id", "_idx_doc").withColumnRenamed("sig", "_idx_sig")

        need = int(self.threshold * self.num_hashes)
        cand_vs_index = (
            banded.join(known_bands, ["band", "key"])
            .select(id_c, "sig", "_idx_doc")
            .distinct()
            .join(known_sigs, "_idx_doc")
            .filter(_sig_matches(F.col("sig"), F.col("_idx_sig")) >= need)
            .select(id_c)
            .distinct()
        )
        sigged = sigged.join(cand_vs_index, self.id_col, "left_anti")

        # in-batch near-dup: survivors vs survivors, keep the lowest id
        # of each matching pair (accepted-set semantics need the pair
        # loser gone BEFORE it can shadow later docs — within one batch
        # the lowest id of a clique survives, matching the batch rule)
        b2 = banded.join(sigged.select(id_c), id_c, "left_semi")
        l, r = b2.alias("l"), b2.alias("r")
        in_batch_losers = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.key") == F.col("r.key"))
                & (F.col(f"l.{id_c}") < F.col(f"r.{id_c}")),
            )
            .filter(_sig_matches(F.col("l.sig"), F.col("r.sig")) >= need)
            .select(F.col(f"r.{id_c}").alias(id_c))
            .distinct()
        )
        return sigged.join(in_batch_losers, id_c, "left_anti")

    def _sink(self, batch: DataFrame, epoch: int) -> None:
        import os

        # materialize BEFORE writing: the four slice writes below
        # overwrite the very index directories the dedup plan reads —
        # a lazy plan would re-scan its own epoch's half-written slice
        # on a replay (read-overwrite conflict)
        accepted = self._dedup_batch(batch, epoch).localCheckpoint(eager=True)
        id_c, text_c = self.id_col, self.text_col
        # epoch-scoped overwrites: an at-least-once replay rewrites the
        # same slice — idempotent by layout
        def slice_path(root):
            return os.path.join(root, f"epoch={epoch}")

        accepted.select(id_c, text_c).write.mode("overwrite").parquet(
            slice_path(self.corpus_dir)
        )
        accepted.select("content_hash").write.mode("overwrite").parquet(
            slice_path(self.hash_dir)
        )
        accepted.select(F.col(id_c).alias("doc_id"), "sig").write.mode(
            "overwrite"
        ).parquet(slice_path(self.sig_dir))
        accepted.select(
            id_c,
            F.explode(lsh_band_keys(F.col("sig"), self.bands, self.rows)).alias("bk"),
        ).select(
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
            F.col(id_c).alias("doc_id"),
        ).write.mode("overwrite").parquet(slice_path(self.band_dir))

    def start(self, trigger_once: bool = False):
        stream = (
            self.spark.readStream.schema(
                f"{self.id_col} long, {self.text_col} string"
            )
            # drops usually arrive as per-batch DIRECTORIES of part
            # files — pick up nested files too
            .option("recursiveFileLookup", "true")
            .parquet(self.source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self._sink)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
