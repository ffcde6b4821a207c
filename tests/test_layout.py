from __future__ import annotations

from pyspark.sql import functions as F

from twinspect_spark.plans.layout import zorder_file_plan, zvalue16_sql


def _morton_py(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 40000)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", F.expr(zvalue16_sql("a", "b"))
    )
    for r in df.collect():
        assert r["z"] == _morton_py(r["a"], r["b"]), (r["a"], r["b"])


def test_file_plan_balanced_and_matches_global_rank(spark):
    df = spark.range(1000).select(
        F.col("id").alias("rid"),
        (F.col("id") * 7 % 300).alias("a"),
        (F.col("id") * 13 % 31).alias("b"),
    )
    plan = zorder_file_plan(df, "a", "b", "rid", 16)
    sizes = [r["count"] for r in plan.groupBy("file_id").count().collect()]
    assert len(sizes) == 16
    assert max(sizes) - min(sizes) <= 1
    # prefix-sum rank must equal the naive global window assignment
    naive = df.withColumn("zval", F.expr(zvalue16_sql("a", "b"))).withColumn(
        "file_id",
        F.expr("cast((row_number() over (order by zval, rid) - 1) * 16 div 1000 as long)"),
    )
    a = {r["rid"]: r["file_id"] for r in plan.collect()}
    b = {r["rid"]: r["file_id"] for r in naive.collect()}
    assert a == b


def test_zorder_tightens_both_dims(spark):
    # grid data: a pure dim-a sort leaves dim-b full-width in every
    # file; the z-curve must bound both
    df = spark.range(4096).select(
        F.col("id").alias("rid"),
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
    )
    plan = zorder_file_plan(df, "a", "b", "rid", 64)
    spans = plan.groupBy("file_id").agg(
        (F.max("a") - F.min("a")).alias("sa"),
        (F.max("b") - F.min("b")).alias("sb"),
    )
    avg = spans.agg(F.avg("sa").alias("sa"), F.avg("sb").alias("sb")).collect()[0]
    # both dims bounded well under full width (63)
    assert avg["sa"] <= 16 and avg["sb"] <= 16
