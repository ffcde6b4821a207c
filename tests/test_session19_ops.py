from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from twinspect_spark.operators.drift import ks_two_sample
from twinspect_spark.operators.ppjoin import ppjoin_pairs, prefix_tokens
from twinspect_spark.plans.sharding import rendezvous_shard
from twinspect_spark.queries import (
    q_doc_shard_rendezvous,
    q_import_cooccurrence,
    q_orders_drift_ks,
    q_ppjoin_similar_pairs,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# prefix-filter similarity join
# ---------------------------------------------------------------------------


def _tok_df(spark, sets: dict[int, list[str]]):
    rows = [(i, t) for i, toks in sets.items() for t in set(toks)]
    return spark.createDataFrame(rows, "doc_id long, tok string")


def test_ppjoin_equals_bruteforce(spark):
    # hand corpus with known Jaccards across the 0.5 boundary
    sets = {
        1: list("abcdefgh"),          # |8|
        2: list("abcdefgx"),          # J(1,2) = 7/9 ~ 0.777
        3: list("abcd"),              # J(1,3) = 4/8 = 0.5
        4: list("wxyz"),              # J with others ~ 0
        5: list("abcdefgh"),          # J(1,5) = 1.0
    }
    tok = _tok_df(spark, sets)
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ppjoin_pairs(tok, "doc_id", 1, 2).collect()
    }
    # brute force
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = set(sets[a]), set(sets[b])
            j = len(sa & sb) / len(sa | sb)
            if round(j, 6) >= 0.5:
                want[(a, b)] = round(j, 6)
    assert got == want
    assert (1, 3) in got  # exact-boundary pair must survive


def test_prefix_length_boundary(spark):
    # n=4 at t=1/2: p = 4 - ceil(2) + 1 = 3 prefix tokens per set
    tok = _tok_df(spark, {1: list("abcd"), 2: list("efgh")})
    pref = prefix_tokens(tok, "doc_id", 1, 2)
    counts = {
        r["doc_id"]: r["n"]
        for r in pref.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 3, 2: 3}


def test_ppjoin_query_matches_naive_query(spark):
    from twinspect_spark.queries import q_ngram_jaccard_pairs

    pp = {
        (r["a"], r["b"]): r["jaccard"]
        for r in q_ppjoin_similar_pairs(spark, SF).collect()
    }
    naive = {
        (r["a"], r["b"]): r["jaccard"]
        for r in q_ngram_jaccard_pairs(spark, SF).collect()
    }
    assert pp == naive  # lossless candidates + identical verify


# ---------------------------------------------------------------------------
# two-sample KS drift
# ---------------------------------------------------------------------------


def test_ks_hand_value(spark):
    # A = {1,2,3,4}, B = {3,4,5,6}: D = max at v=2 -> |2/4 - 0/4| = 0.5
    rows = [(float(v), "a") for v in (1, 2, 3, 4)] + [
        (float(v), "b") for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "val double, cohort string")
    out = ks_two_sample(
        df,
        "val",
        F.col("cohort") == "a",
        F.floor(F.col("val")).cast("long"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_d_ppm"] == 500_000
    assert r["ks_at_value"] == 2.0


def test_ks_identical_cohorts_zero(spark):
    rows = [(float(v), c) for v in (1, 2, 3) for c in ("a", "b")]
    df = spark.createDataFrame(rows, "val double, cohort string")
    r = ks_two_sample(
        df, "val", F.col("cohort") == "a", F.lit(0)
    ).collect()[0]
    assert r["ks_d_ppm"] == 0


def test_ks_bucketing_invariance(spark):
    # bucket expr changes the PLAN, never the result
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    isa = F.col("o_orderpriority") == "1-URGENT"
    fine = ks_two_sample(
        orders, "o_totalprice", isa,
        F.expr("cast(floor(o_totalprice / 1000) as bigint)"),
    ).collect()[0]
    one = ks_two_sample(
        orders, "o_totalprice", isa, F.lit(0)
    ).collect()[0]
    assert fine.asDict() == one.asDict()


def test_ks_query_statistic_sane(spark):
    r = q_orders_drift_ks(spark, SF).collect()[0]
    # same generator for both cohorts: D must be far below rejection at
    # these n (critical D ~ 1.36*sqrt(2/n) ~ 0.05 at n~3000)
    crit = 1.36 * math.sqrt(1 / r["n_a"] + 1 / r["n_b"])
    assert 0 <= r["ks_d_ppm"] / 1e6 < max(2 * crit, 0.2)


# ---------------------------------------------------------------------------
# rendezvous sharding
# ---------------------------------------------------------------------------


def test_rendezvous_moves_only_to_new_shard(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = rendezvous_shard(docs, "k", 8).collect()
    moved = [r for r in out if r["shard_next"] != r["shard"]]
    # HRW: a row moves iff the NEW shard wins; never between old shards
    assert all(r["shard_next"] == 8 for r in moved)
    frac = len(moved) / len(out)
    assert 0.05 < frac < 0.18  # ~1/9 expected
    # balance: each of the 8 shards holds roughly 1/8
    from collections import Counter

    c = Counter(r["shard"] for r in out)
    assert set(c) == set(range(8))
    assert max(c.values()) < 2 * min(c.values())


def test_rendezvous_deterministic_under_partitioning(spark):
    a = rendezvous_shard(spark.range(0, 500).withColumnRenamed("id", "k"), "k", 4)
    b = rendezvous_shard(
        spark.range(0, 500).repartition(7).withColumnRenamed("id", "k"), "k", 4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rendezvous_shard_bounds(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        rendezvous_shard(df, "k", 16)
    rows = q_doc_shard_rendezvous(spark, SF).collect()
    assert {r["shard"] for r in rows} <= set(range(8))
    assert sum(r["n_docs"] for r in rows) == 500


# ---------------------------------------------------------------------------
# import co-occurrence
# ---------------------------------------------------------------------------


def test_cooccurrence_support_and_lift(spark):
    rows = q_import_cooccurrence(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["m1"] < r["m2"]
        assert r["support"] >= (1 * 500) // 100  # min_sup = 1% of 500 files
        assert r["support"] <= min(r["n_m1"], r["n_m2"])
        want = (r["support"] * 500 * 1_000_000) // (r["n_m1"] * r["n_m2"])
        assert r["lift_ppm"] == want


def test_cooccurrence_apriori_no_false_drop(spark):
    # naive recomputation over the same planted headers
    from twinspect_spark.codelake import dep_cooccurrence

    edges = spark.createDataFrame(
        [(d, f"lib{(d * 7 + i * 13) % 40}") for d in range(100)
         for i in range(d % 4 + 1)],
        "doc_id long, dep string",
    ).distinct()
    got = {
        (r["m1"], r["m2"]): r["support"]
        for r in dep_cooccurrence(edges, "doc_id", 1).collect()
    }
    import itertools
    from collections import Counter

    baskets = {}
    for d in range(100):
        baskets[d] = sorted({f"lib{(d * 7 + i * 13) % 40}" for i in range(d % 4 + 1)})
    sup = Counter()
    for b in baskets.values():
        for m1, m2 in itertools.combinations(b, 2):
            sup[(m1, m2)] += 1
    min_sup = (1 * 100) // 100
    want = {p: s for p, s in sup.items() if s >= min_sup}
    assert got == want
