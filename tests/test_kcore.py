from __future__ import annotations

from pyspark.sql import functions as F

from twinspect_spark.operators.kcore import kcore_peel
from twinspect_spark.queries import (
    q_graph_kcore,
    q_normalization_impact,
    q_repo_shared_dep_projection,
)

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_cascading_peel(spark):
    # path 1-2-3-4 hanging off triangle 5-6-7 (via 4-5):
    # k=2 peels the path in a CASCADE (1 then 2 then 3 then 4),
    # the triangle survives with degree 2 each
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
    out = {
        r["node"]: r["degree"]
        for r in kcore_peel(_edges(spark, pairs), 2, 5).collect()
    }
    assert out == {5: 2, 6: 2, 7: 2}


def test_kcore_fixed_rounds_overapproximate(spark):
    # same graph, only 2 rounds: the cascade is cut short — nodes 3,4
    # still alive (monotone over-approximation, never under)
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
    out = {
        r["node"]
        for r in kcore_peel(_edges(spark, pairs), 2, 2).collect()
    }
    assert {5, 6, 7} <= out
    assert 1 not in out and 2 not in out


def test_kcore_self_loop_ignored(spark):
    # a self-loop must not keep an otherwise-isolated node alive
    pairs = [(1, 1), (2, 3), (3, 4), (4, 2)]
    out = {
        r["node"] for r in kcore_peel(_edges(spark, pairs), 2, 3).collect()
    }
    assert out == {2, 3, 4}


def test_kcore_query_degrees_all_at_least_peeled(spark):
    rows = q_graph_kcore(spark, SF).collect()
    assert rows
    # this planted graph converges round 1 (leaves off hubs, no
    # cascade): every survivor must already hold degree >= k
    assert all(r["degree"] >= 2 for r in rows)


def test_normalization_impact_conservation(spark):
    rows = q_normalization_impact(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["chars_after"] <= r["chars_before"]
        assert 0 <= r["n_changed"] <= r["n_docs"]


def test_shared_dep_projection_bounds(spark):
    rows = q_repo_shared_dep_projection(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["r1"] < r["r2"]
        assert 1 <= r["shared_deps"] <= min(r["n_deps_1"], r["n_deps_2"])
        want = (r["shared_deps"] ** 2 * 1_000_000) // (
            r["n_deps_1"] * r["n_deps_2"]
        )
        assert r["cos2_ppm"] == want
        assert r["cos2_ppm"] <= 1_000_000
