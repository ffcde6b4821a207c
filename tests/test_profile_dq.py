from __future__ import annotations

from twinspect_spark.queries import q_data_quality_checks, q_orders_profile

SF = "/root/testdata/sf0.001"


def test_orders_profile_invariants(spark):
    rows = {r["col"]: r for r in q_orders_profile(spark, SF).collect()}
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    n = rows["o_orderkey"]["n_rows"]
    assert all(r["n_rows"] == n for r in rows.values())
    # orderkey is the primary key: distinct == rows, no nulls
    assert rows["o_orderkey"]["n_distinct"] == n
    assert rows["o_orderkey"]["n_nulls"] == 0
    # low-cardinality enum
    assert rows["o_orderpriority"]["n_distinct"] <= 5
    assert rows["o_orderstatus"]["n_distinct"] <= 3
    # min <= max lexically holds for the zero-padded-free numeric strings
    ok = rows["o_orderkey"]
    assert int(ok["min_val"]) <= int(ok["max_val"])


def test_data_quality_all_pass_on_testdata(spark):
    rows = {r["rule"]: r for r in q_data_quality_checks(spark, SF).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r["passed"] and r["n_violations"] == 0


def test_data_quality_detects_violations(spark, tmp_path):
    # break every orders-side rule: dup key, dangling custkey, price <= 0
    orders = spark.createDataFrame(
        [
            (1, 100, "O", 10.0, None, "1-URGENT"),
            (1, 100, "O", 10.0, None, "1-URGENT"),  # dup orderkey
            (2, 999, "F", -5.0, None, "2-HIGH"),  # bad fk, bad price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(100, "x")], "c_custkey long, c_name string"
    )
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 0, 99.0, 1.0, 0.0, 0.0, "N", "O", None)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    for name, df in [("orders", orders), ("customer", customer), ("lineitem", lineitem)]:
        df.write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))
    rows = {r["rule"]: r for r in q_data_quality_checks(spark, str(tmp_path)).collect()}
    assert rows["orderkey_unique"]["n_violations"] == 1
    assert rows["orders_custkey_fk"]["n_violations"] == 1
    assert rows["totalprice_positive"]["n_violations"] == 1
    assert rows["linenumber_positive"]["n_violations"] == 1
    assert rows["quantity_range"]["n_violations"] == 1  # quantity 99
    assert rows["lineitem_orderkey_fk"]["n_violations"] == 0
