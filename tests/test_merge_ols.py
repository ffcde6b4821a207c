from __future__ import annotations

from twinspect_spark.queries import q_lang_length_ols, q_merge_upsert_stats

SF = "/root/testdata/sf0.001"


def test_merge_actions_conserve_base(spark):
    out = {r["action"]: r for r in q_merge_upsert_stats(spark, SF).collect()}
    # every base row lands in exactly one of kept/updated/deleted
    import duckdb

    con = duckdb.connect()
    n_base, n_ins = con.execute(
        f"""
        SELECT count(*) FILTER (o_orderkey % 4 != 0),
               count(*) FILTER (o_orderkey % 4 = 0
                                AND o_orderkey % 5 != 0
                                AND o_orderkey % 3 != 0)
        FROM '{SF}/orders.parquet'
        """
    ).fetchone()
    assert (
        out["kept"]["n_rows"] + out["updated"]["n_rows"] + out["deleted"]["n_rows"]
        == n_base
    )
    assert out["inserted"]["n_rows"] == n_ins
    # inserts can never conflict by construction (base excludes %4==0)
    assert "insert_conflict" not in out
    assert set(out) == {"kept", "updated", "deleted", "inserted", "unmatched_noop"}


def test_ols_exact_linear_fit(spark, tmp_path):
    # y = length("a " * n stripped) = 2n - 1: slope 2, intercept -1, r2 1
    rows = [(i, ("a " * n).strip(), "en", "s", 0) for i, n in enumerate([1, 2, 3, 10])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = q_lang_length_ols(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n"] == 4
    assert row["slope"] == 2.0
    assert row["intercept"] == -1.0
    assert row["r2"] == 1.0
