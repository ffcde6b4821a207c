"""Streaming span-trimming dedup: the incremental counterpart of the
batch transform (queries.q_dedup_trim_spans, Lee et al.
arXiv:2107.06499 exact-substring dedup) over an arriving document
stream.

Per micro-batch of (doc_id, text):

1. chunk every doc into disjoint W-word windows (same kernel as the
   batch op),
2. drop each chunk occurrence whose content was ALREADY ADMITTED by a
   committed earlier batch, or is owned by a smaller doc_id within
   this batch (first-arrival ownership),
3. reassemble the survivors in order and write the per-doc trim record
   (counts + sha256 of the trimmed text) batch-scoped, then
4. admit this batch's chunk hashes into the seen-store.

The chunk-hash seen-store IS a FrontierStore (sharded Bloom positions
+ batch-scoped, shard-partitioned exact key log + O(1) high-water-mark
commits), so a batch of fresh content reads ZERO key bytes (Bloom has
no false negatives) and only the maybe-seen sliver pays the
shard-pruned exact join — per-batch cost tracks |batch| chunks, never
|state|. Replay is safe end to end: the trimmed output is a
batch-scoped overwrite and the store commit is the frontier's meta
pointer, so a torn attempt is re-run in place.

EQUALITY CONTRACT: when batches partition the corpus in ascending
doc_id order, the streamed trim records are IDENTICAL to the batch
transform's output — first-arrival ownership coincides with the batch
op's min-doc_id ownership. Gated by tests/test_streaming_spantrim.py
against q_dedup_trim_spans row for row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twinspect_spark.streaming.frontier import FrontierStore


class SpanTrimStore:
    """Incremental chunk-ownership trim over parquet state."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        chunk_words: int = 16,
        m_bits: int = 1 << 20,
        k: int = 4,
        n_shards: int = 16,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.w = chunk_words
        self.frontier = FrontierStore(
            spark,
            os.path.join(path, "chunks"),
            m_bits=m_bits,
            k=k,
            n_shards=n_shards,
            key_col="h",
            compact_every=compact_every,
        )

    # -- paths ---------------------------------------------------------------
    def _trimmed_dir(self, b: int) -> str:
        return os.path.join(self.path, f"trimmed/b={b}")

    # -- chunk kernel (must stay in lockstep with q_dedup_trim_spans;
    #    the equality test gates drift) ---------------------------------------
    def _chunks(self, batch_df: DataFrame) -> DataFrame:
        t = batch_df.select(
            "doc_id", F.split(F.lower("text"), " ").alias("w")
        )
        return t.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast((size(w) + {self.w - 1})"
                    f" div {self.w} as int) - 1),"
                    f" j -> concat_ws(' ', slice(w, j * {self.w} + 1,"
                    f" {self.w})))"
                )
            ).alias("idx", "chunk"),
        ).withColumn("h", F.sha2("chunk", 256))

    # -- ingest ----------------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Trim the batch against committed chunk state, write the trim
        records, admit the batch's chunks. Committed batches
        short-circuit (replay-safe)."""
        fr = self.frontier
        if fr._committed(fr._read_meta(), batch_id):
            return
        ch = self._chunks(batch_df).localCheckpoint()
        prior = (
            fr.classify(ch.select("h"))
            .where("truly_seen")
            .select("h", F.lit(True).alias("prior"))
        )
        own = ch.groupBy("h").agg(F.min("doc_id").alias("owner"))
        j = (
            ch.join(own, "h")
            .join(prior, "h", "left")
            .withColumn(
                "drp",
                F.col("prior").isNotNull()
                | (F.col("owner") < F.col("doc_id")),
            )
        )
        counts = j.groupBy("doc_id").agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("drp").cast("long")).alias("n_chunks_dropped"),
        )
        kept = (
            j.where(~F.col("drp"))
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("idx", "chunk"))
                        ),
                        lambda s: s["chunk"],
                    ),
                    " ",
                ).alias("trimmed")
            )
        )
        out = counts.join(kept, "doc_id", "left").select(
            "doc_id",
            "n_chunks",
            "n_chunks_dropped",
            F.length(F.coalesce("trimmed", F.lit("")))
            .cast("long")
            .alias("trimmed_chars"),
            F.sha2(F.coalesce("trimmed", F.lit("")), 256).alias(
                "sha_trimmed"
            ),
        )
        out.write.mode("overwrite").parquet(self._trimmed_dir(batch_id))
        # admission commits the batch (frontier meta pointer = our commit)
        fr.process_batch(ch.select("h"), batch_id)

    # -- readers ----------------------------------------------------------------
    def trimmed(self, batch_id: int) -> DataFrame:
        return self.spark.read.parquet(self._trimmed_dir(batch_id))

    def all_trimmed(self) -> DataFrame | None:
        ids = self.frontier.committed_ids()
        if not ids:
            return None
        return self.spark.read.parquet(
            *[self._trimmed_dir(b) for b in ids]
        )

    def sink(self):
        """foreachBatch hook: ``writeStream.foreachBatch(store.sink())``."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return _sink
