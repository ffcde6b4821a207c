"""Incremental (streaming) near-duplicate detection.

The reference is strictly batch — its only incrementality is artifact
caching keyed by dataset checksum (twinspect/algos/processing.py:31-34).
This module adds the capability gap: new files arrive continuously, and
each micro-batch is deduplicated against everything seen so far without
recomputing — or even shuffling — the world.

State layout (plain parquet; the directory partitioning is the poor
man's Iceberg bucketing — the Iceberg migration only swaps the writer):

  state/batch_id=<id>/id_pt=<p>/      file rows (STATE_COLS), p =
                                      pmod(xxhash64(file_id), ID_PARTS)
  buckets/batch_id=<id>/bucket_pt=<p>/ the UNIFIED bucket table
                                      (operators/buckets.bucket_table:
                                      LSH bands + SimHash chunks in one
                                      keyspace), p = pmod(xxhash64(space,
                                      bucket_idx, bucket_key), BUCKET_PARTS)
  edges/batch_id=<id>/                verified pair edges
  clusters/                           current assignment (full overwrite)
  _batch_<id>.done                    commit markers

Why this scales where a naive design is O(|state|) per batch:

1. Bucket rows are computed ONCE per file at arrival and appended —
   never recomputed from accumulated signatures.
2. Candidate generation reads the stored bucket table pruned to the
   directory partitions the new batch touches (PartitionFilters on
   bucket_pt + batch_id) and BROADCAST-semi-joins the new batch's bucket
   keys against it: the accumulated side is scanned (pruned), never
   shuffled.
3. Bucket-size frequency caps are aggregated over the COMBINED occupancy
   of touched buckets only (matched stored rows + new rows), for BOTH
   spaces — LSH bands and SimHash chunks — exactly as the batch
   unified_candidates path caps both.
4. Signature/content lookups for verification fetch only the candidate
   endpoints: pruned scan on id_pt + broadcast semi-join on file_id.
5. Clusters fold in via contraction (operators/cc.merge_components):
   CC runs on a graph of O(|new edges|) contracted nodes.

Replay safety (Structured Streaming retry semantics): every per-batch
write goes to a batch-scoped directory with mode("overwrite"), so a
replayed batch REPLACES its own partial output instead of appending;
readers filter to committed batch_ids (markers), so a crashed batch's
partial files are invisible; the marker is the commit point. A replay
after the clusters/ overwrite but before the marker re-merges the same
edges into an assignment that already contains them — merge_components
is idempotent under edge replay, so the store converges.

Contract: a file_id (xxhash64 of repo,path,commit) arrives at most once
across the stream; re-sends of the same batch are deduplicated by batch
marker, not by content. Micro-batches are assumed broadcast-sized
(thousands of files); bulk backfills belong to the batch pipeline.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.ingest import FILES_SCHEMA, ingest_files
from twinspect_spark.operators.buckets import bucket_table
from twinspect_spark.operators.cc import merge_components
from twinspect_spark.operators.verify import (
    estimate_filter_candidates,
    verify_pairs,
)
from twinspect_spark.signatures import compute_signatures

STATE_COLS = ["file_id", "sha256", "size", "content_norm", "minhash", "mh32", "simhash"]
BUCKET_COLS = ["file_id", "simhash", "space", "bucket_idx", "bucket_key"]

# Directory-partition fan-out of the two stores. At 10^12-file scale
# these become Iceberg bucket transforms with far higher counts; here
# they bound how much of the store a small batch's pruned scan touches.
ID_PARTS = 64
BUCKET_PARTS = 64

_MARKER_RE = re.compile(r"_batch_(\d+)\.done$")


def _id_pt() -> F.Column:
    return F.pmod(F.xxhash64("file_id"), F.lit(ID_PARTS)).cast("int")


def _bucket_pt() -> F.Column:
    return F.pmod(
        F.xxhash64("space", "bucket_idx", "bucket_key"), F.lit(BUCKET_PARTS)
    ).cast("int")


class DedupStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _has(self, name: str) -> bool:
        p = self._path(name)
        if not os.path.exists(p):
            return False
        for _, _, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def committed_ids(self) -> list[int]:
        return sorted(
            int(m.group(1))
            for f in os.listdir(self.root)
            if (m := _MARKER_RE.match(f))
        )

    def _read_committed(self, name: str) -> DataFrame | None:
        """Read a batch-partitioned store, visible-committed rows only."""
        if not self._has(name):
            return None
        df = self.spark.read.parquet(self._path(name))
        return df.where(F.col("batch_id").isin(self.committed_ids()))

    def state(self) -> DataFrame | None:
        df = self._read_committed("state")
        return None if df is None else df.select(*STATE_COLS)

    def buckets(self) -> DataFrame | None:
        """Committed bucket rows WITH the bucket_pt partition column (the
        caller prunes on it before any join)."""
        df = self._read_committed("buckets")
        return None if df is None else df.select(*BUCKET_COLS, "bucket_pt")

    def state_rows_for(self, ids: DataFrame) -> DataFrame | None:
        """Committed state rows for the given ids(file_id) — pruned
        directory scan (id_pt IN touched) + broadcast semi-join, so the
        fetch cost tracks |ids|, not |state|."""
        df = self._read_committed("state")
        if df is None:
            return None
        pts = [
            r[0]
            for r in ids.select(_id_pt().alias("pt")).distinct().collect()
        ]
        return (
            df.where(F.col("id_pt").isin(pts))
            .join(F.broadcast(ids.select("file_id")), "file_id", "left_semi")
            .select(*STATE_COLS)
        )

    def edges(self) -> DataFrame | None:
        return self._read_committed("edges")

    def clusters(self) -> DataFrame | None:
        return (
            self.spark.read.parquet(self._path("clusters"))
            if self._has("clusters")
            else None
        )

    def write_batch(self, name: str, df: DataFrame, batch_id: int,
                    partition_col: str | None = None) -> None:
        """Batch-scoped overwrite: a replayed batch replaces its own
        directory instead of appending (idempotent under Structured
        Streaming's retry semantics)."""
        w = df.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(self._path(f"{name}/batch_id={batch_id}"))

    def batch_done(self, batch_id: int) -> bool:
        return os.path.exists(self._path(f"_batch_{batch_id}.done"))

    def mark_batch(self, batch_id: int) -> None:
        with open(self._path(f"_batch_{batch_id}.done"), "w") as f:
            f.write("done")


def _incremental_candidates(
    bk_new: DataFrame, store: DedupStore, cfg: DedupConfig
) -> DataFrame:
    """Candidate pairs touching ≥1 new file, against the stored unified
    bucket table. The stored side is scanned pruned (bucket_pt +
    committed batch_id PartitionFilters) and broadcast-semi-joined on the
    new batch's bucket keys — never shuffled, never recomputed. Frequency
    caps use the COMBINED occupancy of each touched bucket (stored
    matches + new members) in BOTH spaces; the SimHash Hamming post-
    filter applies to chunk-space pairs exactly as in batch
    (operators/buckets.unified_candidates)."""
    keys = ["space", "bucket_idx", "bucket_key"]
    stored = store.buckets()
    if stored is not None:
        pts = [
            r[0]
            for r in bk_new.select(_bucket_pt().alias("pt")).distinct().collect()
        ]
        matched = (
            stored.where(F.col("bucket_pt").isin(pts))
            .join(F.broadcast(bk_new.select(*keys).distinct()), keys, "left_semi")
            .select(*BUCKET_COLS)
        )
        combined = matched.unionByName(bk_new.select(*BUCKET_COLS))
    else:
        combined = bk_new.select(*BUCKET_COLS)

    sizes = combined.groupBy(*keys).count()
    keep = sizes.where(
        (F.col("count") > 1) & (F.col("count") <= cfg.max_band_bucket)
    ).select(*keys)
    left = bk_new.join(keep, keys, "left_semi").select(
        *keys, F.col("file_id").alias("x"), F.col("simhash").alias("sim_x")
    )
    right = combined.join(keep, keys, "left_semi").select(
        *keys, F.col("file_id").alias("y"), F.col("simhash").alias("sim_y")
    )
    hamming_ok = (F.col("space") == 0) | (
        F.bit_count(F.col("sim_x").bitwiseXOR(F.col("sim_y")))
        <= cfg.hamming_threshold
    )
    src_col = F.when(F.col("space") == 0, "lsh").otherwise("simhash")
    pairs = (
        left.join(right, keys)
        .where(F.col("x") != F.col("y"))
        .where(hamming_ok)
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            src_col.alias("src"),
        )
    )
    return pairs.groupBy("a", "b").agg(F.min("src").alias("src"))


def process_batch(
    spark: SparkSession,
    batch_files: DataFrame,
    store: DedupStore,
    cfg: DedupConfig,
    batch_id: int = 0,
) -> None:
    """One micro-batch: signatures → incremental candidates → verify →
    cluster merge → batch-scoped state commit. Idempotent per batch_id
    (marker short-circuit; all writes overwrite their own batch dir)."""
    if store.batch_done(batch_id):
        return
    ingested_new = ingest_files(batch_files, cfg).localCheckpoint()
    if ingested_new.isEmpty():
        store.mark_batch(batch_id)
        return
    sigs_new = compute_signatures(ingested_new, cfg)
    new_state = (
        ingested_new.select("file_id", "sha256", "size", "content_norm")
        .join(sigs_new.select("file_id", "minhash", "mh32", "simhash"), "file_id")
        .select(*STATE_COLS)
        .localCheckpoint()
    )

    bk_new = bucket_table(new_state, cfg).localCheckpoint()
    cand = _incremental_candidates(bk_new, store, cfg)

    # verification lookups: candidate endpoints only — old rows fetched
    # via pruned scan + broadcast semi-join, new rows from memory
    ids = (
        cand.select(F.col("a").alias("file_id"))
        .unionByName(cand.select(F.col("b").alias("file_id")))
        .distinct()
        .localCheckpoint()
    )
    fetched_old = store.state_rows_for(ids)
    lookup = (
        new_state
        if fetched_old is None
        else fetched_old.unionByName(new_state)
    )
    cand = estimate_filter_candidates(cand, lookup, cfg)
    pairs = verify_pairs(cand, lookup, cfg)
    edges_new = (
        pairs.where("verified")
        .select("a", "b", "jaccard", "method")
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

    store.write_batch(
        "state", new_state.withColumn("id_pt", _id_pt()), batch_id, "id_pt"
    )
    store.write_batch(
        "buckets",
        bk_new.withColumn("bucket_pt", _bucket_pt()),
        batch_id,
        "bucket_pt",
    )
    store.write_batch("edges", edges_new, batch_id)
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
