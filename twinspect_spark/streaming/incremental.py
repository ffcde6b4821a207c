"""Incremental (streaming) near-duplicate detection.

The reference is strictly batch — its only incrementality is artifact
caching keyed by dataset checksum (twinspect/algos/processing.py:31-34).
This module adds the capability gap: new files arrive continuously, and
each micro-batch is deduplicated against everything seen so far without
recomputing the world.

Per micro-batch of new files:
  1. ingest + signatures for the NEW rows only (pandas-UDF stage);
  2. candidate generation joins the new band/chunk tables against the
     accumulated state — cost is O(|new| × bucket occupancy), never
     O(|state|²); bucket frequency caps count the COMBINED bucket;
  3. estimate-filter + exact verification exactly as in batch;
  4. clusters fold in via contraction (operators/cc.merge_components):
     CC runs on a graph of O(|new edges|) contracted nodes, independent
     of corpus size.

State is plain parquet under ``store_root``:
  state/    file_id, sha256, size, content_norm, minhash, simhash (append)
  edges/    a, b, jaccard, method, batch_id (append)
  clusters/ file_id, cluster_id (replaced per batch)
plus ``_batch_<id>.done`` markers making foreachBatch idempotent under
Structured Streaming's replay semantics (a replayed batch id is a no-op).
At production scale state/ would be an Iceberg table bucketed by band
hash so step 2 joins without reshuffling the accumulated side; the logic
here is identical.

Contract: a file_id (xxhash64 of repo,path,commit) arrives at most once
across the stream; re-sends of the same batch are deduplicated by batch
marker, not by content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.ingest import FILES_SCHEMA, ingest_files
from twinspect_spark.operators.cc import merge_components
from twinspect_spark.operators.lsh import band_table
from twinspect_spark.operators.simhash_ball import chunk_table
from twinspect_spark.operators.verify import (
    estimate_filter_candidates,
    verify_pairs,
)
from twinspect_spark.signatures import compute_signatures

STATE_COLS = ["file_id", "sha256", "size", "content_norm", "minhash", "simhash"]


class DedupStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _has(self, name: str) -> bool:
        p = self._path(name)
        return os.path.exists(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )

    def state(self) -> DataFrame | None:
        return self.spark.read.parquet(self._path("state")) if self._has("state") else None

    def edges(self) -> DataFrame | None:
        return self.spark.read.parquet(self._path("edges")) if self._has("edges") else None

    def clusters(self) -> DataFrame | None:
        return (
            self.spark.read.parquet(self._path("clusters"))
            if self._has("clusters")
            else None
        )

    def batch_done(self, batch_id: int) -> bool:
        return os.path.exists(self._path(f"_batch_{batch_id}.done"))

    def mark_batch(self, batch_id: int) -> None:
        with open(self._path(f"_batch_{batch_id}.done"), "w") as f:
            f.write("done")


def _incremental_candidates(
    new_sigs: DataFrame, all_sigs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Candidate pairs touching ≥1 new file: new bands/chunks joined
    against the full band/chunk tables. Pair (x, y) normalized to
    a = min < b = max; within-new pairs arise from both directions and
    collapse in the group-by. Frequency caps use COMBINED bucket sizes so
    a bucket that went hot across batches stops generating pairs exactly
    as it would in batch."""
    bands_all = band_table(all_sigs, cfg)
    bands_new = band_table(new_sigs, cfg)
    sizes = bands_all.groupBy("band_idx", "band_hash").count()
    keep = sizes.where(
        (F.col("count") > 1) & (F.col("count") <= cfg.max_band_bucket)
    ).select("band_idx", "band_hash")
    bn = bands_new.join(keep, ["band_idx", "band_hash"], "left_semi")
    ba = bands_all.join(keep, ["band_idx", "band_hash"], "left_semi")
    lsh = (
        bn.select("band_idx", "band_hash", F.col("file_id").alias("x"))
        .join(
            ba.select("band_idx", "band_hash", F.col("file_id").alias("y")),
            ["band_idx", "band_hash"],
        )
        .where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            F.lit("lsh").alias("src"),
        )
    )
    ch_all = chunk_table(all_sigs, cfg)
    ch_new = chunk_table(new_sigs, cfg)
    sim = (
        ch_new.select(
            "chunk_idx", "chunk_val",
            F.col("file_id").alias("x"), F.col("simhash").alias("sim_x"),
        )
        .join(
            ch_all.select(
                "chunk_idx", "chunk_val",
                F.col("file_id").alias("y"), F.col("simhash").alias("sim_y"),
            ),
            ["chunk_idx", "chunk_val"],
        )
        .where(F.col("x") != F.col("y"))
        .where(
            F.bit_count(F.col("sim_x").bitwiseXOR(F.col("sim_y")))
            <= cfg.hamming_threshold
        )
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            F.lit("simhash").alias("src"),
        )
    )
    return lsh.unionByName(sim).groupBy("a", "b").agg(F.min("src").alias("src"))


def process_batch(
    spark: SparkSession,
    batch_files: DataFrame,
    store: DedupStore,
    cfg: DedupConfig,
    batch_id: int = 0,
) -> None:
    """One micro-batch: signatures → incremental candidates → verify →
    cluster merge → state commit. Idempotent per batch_id."""
    if store.batch_done(batch_id):
        return
    ingested_new = ingest_files(batch_files, cfg).localCheckpoint()
    if ingested_new.isEmpty():
        store.mark_batch(batch_id)
        return
    sigs_new = compute_signatures(ingested_new, cfg)
    new_state = (
        ingested_new.select("file_id", "sha256", "size", "content_norm")
        .join(sigs_new.select("file_id", "minhash", "simhash"), "file_id")
        .select(*STATE_COLS)
        .localCheckpoint()
    )

    old_state = store.state()
    all_state = (
        new_state if old_state is None else old_state.unionByName(new_state)
    )
    cand = _incremental_candidates(new_state, all_state, cfg)
    cand = estimate_filter_candidates(cand, all_state, cfg)
    pairs = verify_pairs(cand, all_state, cfg)
    edges_new = (
        pairs.where("verified")
        .select("a", "b", "jaccard", "method")
        .withColumn("batch_id", F.lit(batch_id))
        .localCheckpoint()
    )

    old_clusters = store.clusters()
    base = (
        old_clusters
        if old_clusters is not None
        else spark.createDataFrame([], "file_id long, cluster_id long")
    )
    merged = merge_components(
        base, edges_new.select("a", "b"),
        new_vertices=new_state.select("file_id"),
    ).localCheckpoint()  # materialize BEFORE overwriting the path it read

    new_state.write.mode("append").parquet(store._path("state"))
    edges_new.write.mode("append").parquet(store._path("edges"))
    merged.write.mode("overwrite").parquet(store._path("clusters"))
    store.mark_batch(batch_id)


def incremental_dedup_stream(
    spark: SparkSession,
    input_path: str,
    store_root: str,
    cfg: DedupConfig | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Structured Streaming entry: watch ``input_path`` for new parquet
    files of the files schema; fold each micro-batch into the store.
    Returns the StreamingQuery (caller awaits termination)."""
    cfg = cfg or DedupConfig()
    store = DedupStore(spark, store_root)
    stream = spark.readStream.schema(FILES_SCHEMA).parquet(input_path)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: process_batch(spark, df, store, cfg, bid)
    ).option(
        "checkpointLocation", checkpoint or os.path.join(store_root, "_ckpt")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
