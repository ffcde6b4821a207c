"""Leakage-safe split + b-bit minwise invariants: cluster-granular
splitting can never place a verified near-dup pair across splits (the
doc-granular baseline can), and an equal 64-bit lane always implies an
equal low bit (so n_bit_matches >= n_lane_matches lane-for-lane)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twinspect_spark.queries import (
    q_bbit_minhash_estimate,
    q_cluster_safe_split,
    q_dup_clusters,
    q_ngram_jaccard_pairs,
    q_split_leakage_audit,
)

SF = "/root/testdata/sf0.001"


def test_cluster_split_zero_leakage(spark):
    asn = q_cluster_safe_split(spark, SF)
    edges = q_ngram_jaccard_pairs(spark, SF).select("a", "b")
    aa = asn.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    bb = asn.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    crossed = (
        edges.join(aa, "a").join(bb, "b").where(F.col("sa") != F.col("sb"))
    )
    assert crossed.count() == 0


def test_cluster_split_total_and_partition(spark):
    asn = q_cluster_safe_split(spark, SF).cache()
    n_docs = q_dup_clusters(spark, SF).count()
    assert asn.count() == n_docs
    # every split label is one of the three, and all members of a
    # cluster share a label (the defining property)
    bad = asn.where(~F.col("split").isin("train", "valid", "test"))
    assert bad.count() == 0
    per_cluster = asn.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_cluster.where(F.col("k") > 1).count() == 0
    asn.unpersist()


def test_leakage_audit_shape(spark):
    rows = {r["method"]: r for r in q_split_leakage_audit(spark, SF).collect()}
    assert set(rows) == {"doc_hash", "cluster_hash"}
    for r in rows.values():
        assert r["n_train"] + r["n_valid"] + r["n_test"] > 0
    # cluster-granular is zero-leak BY CONSTRUCTION; doc-granular can
    # only be worse or equal
    assert rows["cluster_hash"]["n_cross_pairs"] == 0
    assert rows["doc_hash"]["n_cross_pairs"] >= 0
    # both methods label the same document set
    assert (
        rows["doc_hash"]["n_train"]
        + rows["doc_hash"]["n_valid"]
        + rows["doc_hash"]["n_test"]
        == rows["cluster_hash"]["n_train"]
        + rows["cluster_hash"]["n_valid"]
        + rows["cluster_hash"]["n_test"]
    )


def test_bbit_estimator_invariants(spark):
    rows = q_bbit_minhash_estimate(spark, SF).collect()
    assert rows, "expected LSH candidate pairs at sf0.001"
    for r in rows:
        # an equal lane implies an equal low bit
        assert r["n_bit_matches"] >= r["n_lane_matches"]
        assert -1.0 <= r["est_1bit"] <= 1.0
        assert 0.0 <= r["est_full"] <= 1.0
        assert r["err_full"] >= 0.0 and r["err_1bit"] >= 0.0


def test_trim_spans_invariants(spark):
    from twinspect_spark.queries import q_dedup_trim_spans

    rows = q_dedup_trim_spans(spark, SF).collect()
    assert len(rows) > 0
    # the global-min doc can never drop a chunk (no smaller owner exists)
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["n_chunks_dropped"] == 0
    for r in rows:
        assert 0 <= r["n_chunks_dropped"] <= r["n_chunks"]
    # untrimmed docs reassemble EXACTLY to lower(text): same sha256
    docs = {
        r["doc_id"]: r["sha"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("doc_id", "sha2(lower(text), 256) AS sha")
        .collect()
    }
    untouched = [r for r in rows if r["n_chunks_dropped"] == 0]
    assert untouched
    for r in untouched:
        assert r["sha_trimmed"] == docs[r["doc_id"]]


def test_snapshot_diff_conservation(spark):
    from twinspect_spark.queries import q_snapshot_diff

    rows = q_snapshot_diff(spark, SF).collect()
    by = {}
    for r in rows:
        by[r["status"]] = by.get(r["status"], 0) + 1
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # |v1| = removed + modified + unchanged; |v2| = added + modified + unchanged
    assert by["removed"] + by["modified"] + by["unchanged"] == n_docs
    assert by["added"] >= 1 and by["modified"] >= 1
    # clones land above the id horizon; originals never do
    for r in rows:
        if r["status"] == "added":
            assert r["doc_id"] >= 1_000_000
