"""In-suite plan-determinism guard: representative queries re-run with
different runtime physical knobs (shuffle partitions, Arrow batch size)
must produce identical canonicalized results. The full 108-query sweep
across SEPARATE sessions (different core counts) lives in
tools/check_determinism.py and is recorded in BASELINE.md; this keeps a
fast tripwire inside the suite for the riskiest shapes — windows,
pandas-UDF kernels, applyInPandas groups, top-k ties."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

NAMES = [
    "minhash_lsh_dedup",      # pandas-UDF signatures + band join
    "user_sessions",          # window over event time
    "function_dup_census",    # regex split + explode + hash rollup
    "largest_similar_group",  # applyInPandas per cluster
    "ann_pq_adc_topk",        # Arrow-batch kernel + partial top-k
    "bm25_search",            # rank window with score ties
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(r[c] for c in cols) for r in df.select(*cols).collect()],
        key=repr,
    )


@pytest.mark.parametrize("name", NAMES)
def test_plan_knobs_do_not_change_results(spark, name):
    from twinspect_spark.queries import QUERIES

    conf = spark.conf
    base_parts = conf.get("spark.sql.shuffle.partitions")
    base_batch = conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    try:
        conf.set("spark.sql.shuffle.partitions", "32")
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        a = _canon(QUERIES[name](spark, SF))
        conf.set("spark.sql.shuffle.partitions", "7")
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "123")
        b = _canon(QUERIES[name](spark, SF))
    finally:
        conf.set("spark.sql.shuffle.partitions", base_parts)
        conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", base_batch
        )
    assert a == b
