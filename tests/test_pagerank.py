from __future__ import annotations

from twinspect_spark.operators.pagerank import pagerank

SCALE = 10**12


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_scaled"] for r in pagerank(df, **kw).collect()}


def test_pagerank_hand_computed_two_nodes(spark):
    # 0 -> 1, 1 dangling (self-loop closed). K=1:
    # r0 = scale/2 each; base = 15*(scale/2)//100
    # contrib into 1: from 0 (deg 1): scale/2; from 1's self-loop: scale/2
    # r1(0) = base; r1(1) = base + 85*scale//100
    r = _pr(spark, [(0, 1)], iterations=1)
    half = SCALE // 2
    base = (15 * half) // 100
    assert r[0] == base
    assert r[1] == base + (85 * (half + half)) // 100


def test_pagerank_mass_conserved_and_sink_dominates(spark):
    # star: everyone points at node 0, node 0 dangling
    edges = [(i, 0) for i in range(1, 20)]
    r = _pr(spark, edges, iterations=5)
    total = sum(r.values())
    # floor-division loss only: strictly <= scale, within |V|*K ulps
    assert SCALE - 20 * 6 * 100 <= total <= SCALE
    assert r[0] == max(r.values())
    leaves = {v for k, v in r.items() if k != 0}
    assert len(leaves) == 1  # symmetric nodes get identical ranks


def test_pagerank_partitioning_invariance(spark):
    edges = [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23]
    df1 = spark.createDataFrame(edges, "src long, dst long")
    df2 = df1.repartition(7)
    a = {r["node"]: r["rank_scaled"] for r in pagerank(df1, iterations=3).collect()}
    b = {r["node"]: r["rank_scaled"] for r in pagerank(df2, iterations=3).collect()}
    assert a == b
