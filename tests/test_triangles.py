from __future__ import annotations

from twinspect_spark.operators.triangles import triangle_census


def _census(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_ppm"])
        for r in triangle_census(df).collect()
    }


def test_triangle_hand_computed(spark):
    # K3 plus a pendant: {0,1,2} triangle, 3 hangs off 0
    r = _census(spark, [(0, 1), (1, 2), (0, 2), (0, 3)])
    assert r[0] == (3, 1, 2_000_000 * 1 // (3 * 2))
    assert r[1] == (2, 1, 1_000_000)
    assert r[2] == (2, 1, 1_000_000)
    assert r[3] == (1, 0, 0)


def test_triangle_k4_counts(spark):
    # K4: 4 triangles total, each node in 3 of them, coefficient 1.0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _census(spark, edges)
    for n in range(4):
        assert r[n] == (3, 3, 1_000_000)


def test_triangle_canonicalization(spark):
    # duplicates, reversed orientation, and self-loops must not count
    r = _census(spark, [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2)])
    assert r[0][1] == r[1][1] == r[2][1] == 1


def test_triangle_partitioning_invariance(spark):
    edges = [(i, (i * i + 1) % 37) for i in range(200)]
    edges += [(i, (i * 5 + 2) % 37) for i in range(200)]
    edges = [e for e in edges if e[0] != e[1]]
    df1 = spark.createDataFrame(edges, "a long, b long")
    df2 = df1.repartition(7)
    a = {tuple(r) for r in triangle_census(df1).collect()}
    b = {tuple(r) for r in triangle_census(df2).collect()}
    assert a == b


def test_triangle_hub_star_has_none(spark):
    # star graph: hub degree n, zero triangles anywhere
    r = _census(spark, [(0, i) for i in range(1, 30)])
    assert all(t == 0 for (_, t, _) in r.values())
    assert r[0][0] == 29
