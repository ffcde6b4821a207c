from __future__ import annotations

from twinspect_spark.operators.labelprop import label_propagation


def _lp(spark, edges, rounds=3):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=rounds).collect()
    }


def test_lp_two_cliques_with_bridge(spark):
    # two K4 cliques joined by one bridge edge: LPA must keep them as
    # two communities (connected components would merge them)
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    r = _lp(spark, k1 + k2 + [(3, 10)])
    left = {r[n] for n in range(4)}
    right = {r[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_lp_one_round_is_min_neighbor_majority(spark):
    # star: center 5 sees leaves {0,1,2} (tie) -> min label 0;
    # each leaf sees only the center -> label 5
    r = _lp(spark, [(5, 0), (5, 1), (5, 2)], rounds=1)
    assert r[5] == 0
    assert r[0] == r[1] == r[2] == 5


def test_lp_partitioning_invariance(spark):
    edges = [(i, (i * 11 + 3) % 29) for i in range(150)]
    edges += [(i, (i * 5 + 1) % 29) for i in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    df1 = spark.createDataFrame(edges, "a long, b long")
    df2 = df1.repartition(7)
    a = {tuple(r) for r in label_propagation(df1).collect()}
    b = {tuple(r) for r in label_propagation(df2).collect()}
    assert a == b
