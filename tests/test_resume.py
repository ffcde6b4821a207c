"""Checkpoint-resume semantics (SURVEY.md §7 hard part 5): a resumed run
serves completed stages from parquet without recompute, recomputes only
invalidated stages, and produces byte-identical cluster assignments."""

from __future__ import annotations

import pytest

from twinspect_spark.config import DedupConfig
from twinspect_spark.corpus import generate_corpus
from twinspect_spark.plans.manifest import STAGES, run_dedup_resumable

CFG = DedupConfig(jaccard_threshold=0.6)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_clusters=15, transforms_per_original=2, seed=11)


def _clusters_map(res):
    return {
        r["file_id"]: r["cluster_id"] for r in res.clusters.collect()
    }


def test_cold_then_warm_then_partial_resume(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    files = spark.createDataFrame(corpus.files)

    res1, status1, man = run_dedup_resumable(spark, files, CFG, root)
    assert all(v == "computed" for v in status1.values())
    cold = _clusters_map(res1)
    assert cold, "pipeline produced no clusters"

    # warm: every stage served from checkpoint
    res2, status2, _ = run_dedup_resumable(spark, files, CFG, root)
    assert all(v == "cached" for v in status2.values())
    assert _clusters_map(res2) == cold

    # partial: invalidate pairs + clusters → only those recompute
    man.invalidate("pairs")
    man.invalidate("clusters")
    res3, status3, _ = run_dedup_resumable(spark, files, CFG, root)
    assert status3 == {
        "ingested": "cached",
        "signatures": "cached",
        "candidates": "cached",
        "pairs": "computed",
        "clusters": "computed",
    }
    assert _clusters_map(res3) == cold


def test_lineage_and_stage_metrics(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt2"))
    files = spark.createDataFrame(corpus.files)
    res, _, man = run_dedup_resumable(spark, files, CFG, root)

    stages = {r["stage"]: r for r in man.stage_metrics().collect()}
    assert set(stages) == set(STAGES)
    assert stages["ingested"]["rows"] == len(corpus.files)
    assert stages["clusters"]["rows"] == res.clusters.count()
    for r in stages.values():
        assert r["bytes"] > 0 and r["wall_s"] > 0 and r["n_part_files"] >= 1

    # per-partition lineage sums to the stage totals
    lin = (
        man.lineage()
        .groupBy("stage")
        .agg({"rows": "sum", "part_file": "count"})
        .collect()
    )
    for row in lin:
        assert row["sum(rows)"] == stages[row["stage"]]["rows"]
        assert row["count(part_file)"] == stages[row["stage"]]["n_part_files"]


def test_config_change_invalidates_key(spark, corpus, tmp_path_factory):
    """A different config fingerprint must not reuse checkpoints."""
    root = str(tmp_path_factory.mktemp("ckpt3"))
    files = spark.createDataFrame(corpus.files)
    _, s1, _ = run_dedup_resumable(spark, files, CFG, root)
    other = DedupConfig(jaccard_threshold=0.9)
    _, s2, _ = run_dedup_resumable(spark, files, other, root)
    assert all(v == "computed" for v in s2.values())


def test_signatures_checkpoint_is_bucketed(spark, corpus, tmp_path_factory):
    """VERDICT round-3 item 3: the resumed signature store comes up as a
    hash-bucketed table, so the candidate-phase joins on file_id plan a
    bucketed scan (no signature-side Exchange re-shuffling the store on
    every resume)."""
    root = str(tmp_path_factory.mktemp("ckpt4"))
    files = spark.createDataFrame(corpus.files)
    _, _, man = run_dedup_resumable(spark, files, CFG, root)

    # the checkpoint itself carries the bucket layout
    import json as _json
    import os as _os

    with open(man._done_path("signatures")) as f:
        meta = _json.load(f)
    assert meta["bucketed"] == {"key": "file_id", "n": 32}
    part_files = [
        p for p in _os.listdir(man.stage_path("signatures"))
        if p.startswith("part-")
    ]
    assert len(part_files) >= 1

    # a RESUMED session (fresh catalog, simulated by dropping the table)
    # re-registers the bucketed table; a join on file_id plans a
    # bucketed scan with no Exchange above the signature side
    spark.sql(f"DROP TABLE IF EXISTS {man._table_name('signatures')}")
    sigs = man.read("signatures")
    from pyspark.sql import functions as F

    ids = sigs.select(F.col("file_id").alias("a")).limit(10)
    joined = sigs.join(ids.hint("shuffle_hash"), sigs.file_id == ids.a)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    # byte-identical content vs a plain parquet read of the same files
    plain = spark.read.parquet(man.stage_path("signatures"))
    assert sigs.count() == plain.count()
