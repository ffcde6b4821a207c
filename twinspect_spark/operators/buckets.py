"""Unified candidate generation: LSH bands + SimHash chunks in ONE
bucket keyspace (SURVEY.md J4+J5 fused).

Running the two candidate paths as separate self-joins costs two full
shuffle chains (sizes → cap → self-join each). Both are the same
abstract operation — equi-self-join on a bucket key — so the band table
and the chunk table are unioned into one ``(space, bucket_idx,
bucket_key)`` relation first: one bucket-size aggregation, one frequency
cap, one self-join, one pair dedupe. Halves the exchange/AQE-stage chain
of the candidates stage, which is pure serial latency at small scale and
one fewer full shuffle of the hot table at large scale.

The SimHash Hamming post-filter (bit_count ≤ d) applies only to
chunk-space pairs; simhash codes ride along as join payload (16 bytes)
so no extra join is needed to fetch them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig


def bucket_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures → (file_id, simhash, space, bucket_idx, bucket_key);
    space 0 = MinHash LSH band, space 1 = SimHash pigeonhole chunk. All
    column expressions — posexplode over a single assembled array keeps
    it one projection, no union of two scans."""
    r = cfg.rows_per_band
    w = cfg.chunk_bits
    mask = (1 << w) - 1
    entries = F.array(
        *[
            F.struct(
                F.lit(0).alias("space"),
                F.lit(i).alias("bucket_idx"),
                F.xxhash64(F.slice("minhash", i * r + 1, r)).alias("bucket_key"),
            )
            for i in range(cfg.bands)
        ],
        *[
            F.struct(
                F.lit(1).alias("space"),
                F.lit(j).alias("bucket_idx"),
                F.shiftrightunsigned(F.col("simhash"), j * w)
                .bitwiseAND(F.lit(mask))
                .alias("bucket_key"),
            )
            for j in range(cfg.simhash_chunks)
        ],
    )
    return signatures.select(
        "file_id", "simhash", F.explode(entries).alias("e")
    ).select("file_id", "simhash", "e.space", "e.bucket_idx", "e.bucket_key")


def unified_candidates(
    signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """→ (a, b, src) distinct candidate pairs from both spaces, a < b.
    src = 'lsh' | 'simhash' (min over contributing spaces). One sizes
    aggregation, one cap, one self-join, Hamming post-filter on chunk
    pairs, one dedupe group-by.

    Giant-cluster guard: buckets larger than ``cfg.chain_bucket_size``
    switch from all-pairs to a SPANNING CHAIN — members sorted by
    (simhash, file_id), consecutive members paired. Web corpora produce
    huge near-identical cliques (boilerplate, templates); all-pairs on a
    1000-member bucket is 500k pairs where n-1 suffice, because the
    downstream connected components is transitive. Sorting by simhash
    puts same-cluster members (identical or near-identical codes)
    adjacent, so the chain stays within clusters and recall survives;
    cross-cluster chain links are rejected by exact verification, never
    merged. Buckets beyond ``cfg.max_band_bucket`` are still dropped
    outright (hot-bucket cap, reported via hot_band_report)."""
    b = bucket_table(signatures, cfg)
    keys = ["space", "bucket_idx", "bucket_key"]
    sizes = b.groupBy(*keys).count()
    keep = sizes.where(
        (F.col("count") > 1) & (F.col("count") <= cfg.max_band_bucket)
    ).select(*keys, "count")
    kept = b.join(keep, keys)
    hamming_ok = (F.col("space") == 0) | (
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        <= cfg.hamming_threshold
    )
    src_col = F.when(F.col("space") == 0, "lsh").otherwise("simhash")

    small = kept.where(F.col("count") <= cfg.chain_bucket_size)
    left = small.select(
        *keys, F.col("file_id").alias("a"), F.col("simhash").alias("sim_a")
    )
    right = small.select(
        *keys, F.col("file_id").alias("b"), F.col("simhash").alias("sim_b")
    )
    all_pairs = (
        left.join(right, keys)
        .where(F.col("a") < F.col("b"))
        .where(hamming_ok)
        .select("a", "b", src_col.alias("src"))
    )

    from pyspark.sql import Window as W

    big = kept.where(F.col("count") > cfg.chain_bucket_size)
    w = W.partitionBy(*keys).orderBy("simhash", "file_id")
    ranked = big.withColumn("rk", F.row_number().over(w))
    nxt = ranked.select(
        *keys,
        (F.col("rk") - 1).alias("rk"),
        F.col("file_id").alias("nxt_id"),
        F.col("simhash").alias("nxt_sim"),
    )
    chained = (
        ranked.join(nxt, [*keys, "rk"])
        .select(
            F.least("file_id", "nxt_id").alias("a"),
            F.greatest("file_id", "nxt_id").alias("b"),
            F.col("simhash").alias("sim_a"),
            F.col("nxt_sim").alias("sim_b"),
            "space",
        )
        .where(hamming_ok)
        .select("a", "b", src_col.alias("src"))
    )
    return (
        all_pairs.unionByName(chained)
        .groupBy("a", "b")
        .agg(F.min("src").alias("src"))
    )