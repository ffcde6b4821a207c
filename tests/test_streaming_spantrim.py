"""Streaming span-trim store: streamed output over id-ordered batches
must EQUAL the batch transform (q_dedup_trim_spans) row for row;
replays are idempotent; a real readStream drives the sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twinspect_spark.queries import q_dedup_trim_spans
from twinspect_spark.streaming.spantrim import SpanTrimStore

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            r["n_chunks"],
            r["n_chunks_dropped"],
            r["trimmed_chars"],
            r["sha_trimmed"],
        )
        for r in df.collect()
    )


@pytest.fixture()
def store(spark, tmp_path):
    # tiny filter so Bloom false positives occur and the exact-check
    # path is exercised, not just compiled
    return SpanTrimStore(
        spark, str(tmp_path / "spantrim"), m_bits=4096, k=3, n_shards=4,
        compact_every=2,
    )


def test_streamed_equals_batch_transform(spark, store):
    docs = _docs(spark)
    # three ascending-id batches partitioning the corpus: first-arrival
    # ownership must coincide with the batch op's min-doc_id ownership
    for b, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10_000)]):
        store.process_batch(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b
        )
    got = _rows(store.all_trimmed())
    want = _rows(q_dedup_trim_spans(spark, SF))
    assert got == want


def test_replay_idempotent_and_cross_batch_drop(spark, store):
    docs = _docs(spark)
    b0 = docs.where("doc_id < 100")
    store.process_batch(b0, 0)
    first = _rows(store.trimmed(0))
    # replay of a committed batch is a no-op
    store.process_batch(b0, 0)
    assert _rows(store.trimmed(0)) == first
    # a later batch REPEATING batch-0 content drops every chunk
    dup = b0.withColumn("doc_id", F.col("doc_id") + 100_000)
    store.process_batch(dup, 1)
    t1 = store.trimmed(1)
    assert t1.where("n_chunks_dropped != n_chunks").count() == 0
    empty_sha = (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    assert t1.where(f"sha_trimmed != '{empty_sha}'").count() == 0


def test_real_stream_drives_sink(spark, store, tmp_path):
    src = str(tmp_path / "src")
    _docs(spark).where("doc_id < 60").write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(store.sink())
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    total = store.all_trimmed()
    assert total is not None and total.count() == 60
