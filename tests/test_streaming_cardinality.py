"""Streaming cardinality store: batch-merged registers must equal the
one-shot sketch of the full corpus (union algebra end to end), replay
must be a no-op, and state must stay constant-sized."""

import json
import os

import pytest
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.operators.sketch import HLL_M, make_hll_udf
from twinspect_spark.streaming.cardinality import CardinalityStore

CFG = DedupConfig(num_perm=64)


def _docs(spark, n=120):
    rows = [
        (i, f"src{i % 3}", f"document body {i} " + "tok%d " % (i * 7) * 20)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _one_shot_registers(spark, df):
    udf = make_hll_udf(CFG)
    return (
        df.select(
            F.col("source").alias("group_key"),
            F.posexplode(udf(F.col("text"))).alias("register", "rho"),
        )
        .where(F.col("rho") > 0)
        .groupBy("group_key", "register")
        .agg(F.max("rho").alias("rho"))
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    df = _docs(spark)
    st = CardinalityStore(
        spark, str(tmp_path_factory.mktemp("cardstore")), CFG
    )
    sink = st.sink()
    for bid in range(4):
        sink(df.where((F.col("doc_id") % 4) == bid), bid)
    return st, df


def test_batch_merge_equals_one_shot(store, spark):
    st, df = store
    merged = {
        (r.group_key, r.register): r.rho
        for r in st.read_registers().collect()
    }
    direct = {
        (r.group_key, r.register): r.rho
        for r in _one_shot_registers(spark, df).collect()
    }
    assert merged == direct


def test_replay_is_noop(store):
    st, df = store
    before = sorted(map(tuple, st.read_registers().collect()))
    v0 = json.load(open(os.path.join(st.path, "_meta.json")))["version"]
    st.sink()(df.where((F.col("doc_id") % 4) == 2), 2)  # replay batch 2
    after = sorted(map(tuple, st.read_registers().collect()))
    assert after == before  # idempotent state, no commit protocol needed
    v1 = json.load(open(os.path.join(st.path, "_meta.json")))["version"]
    assert v1 == v0 + 1  # new snapshot version, same content


def test_state_is_constant_sized_and_gcd(store):
    st, df = store
    assert st.read_registers().count() <= 3 * HLL_M
    snaps = sorted(os.listdir(os.path.join(st.path, "snapshots")))
    assert len(snaps) <= 2  # older versions garbage-collected


def test_estimates_accurate(store, spark):
    st, df = store
    est = {r.group_key: r.est_distinct for r in st.estimates().collect()}
    # true distinct shingles per source (brute force on the tiny corpus)
    k = CFG.shingle_size
    truth = (
        df.select(
            "source",
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(1, greatest(length(lower(text)) - {k - 1}, 1)),"
                    f" i -> substring(lower(text), i, {k})))"
                )
            ).alias("sh"),
        )
        .distinct()
        .groupBy("source")
        .count()
        .collect()
    )
    for r in truth:
        assert abs(est[r.source] - r["count"]) / r["count"] < 0.3


def test_format_guard(spark, tmp_path):
    st = CardinalityStore(spark, str(tmp_path / "c"), CFG)
    with open(os.path.join(st.path, "_meta.json"), "w") as f:
        json.dump({"format": 99, "version": 0}, f)
    with pytest.raises(ValueError, match="format"):
        st.read_registers()
