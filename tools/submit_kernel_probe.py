"""spark-submit driver script for the native-LCS shipping test.

Launched by tests/test_submit_kernel.py via
``spark-submit --py-files pkg.zip --files <prebuilt .so>``. A pandas UDF
running ON THE EXECUTOR-SIDE Python workers reports, per partition,
which kernel file ``lcs_native._build()`` resolved (shipped vs cache vs
None), whether the native path is available, and one known LCS value —
printed as a single PROBE: JSON line the test parses. This exercises the
cluster shipping seam the module docstring promises (load the
``--files``-shipped .so, do NOT recompile) and, with
TWINSPECT_LCS_NATIVE=0, the pure-Python fallback parity under
spark-submit.
"""

import json

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def main() -> None:
    spark = SparkSession.builder.getOrCreate()

    @pandas_udf("string")
    def probe(x: pd.Series) -> pd.Series:
        from twinspect_spark.functions import lcs_native as L

        rec = json.dumps(
            {
                "so": L._build(),
                "avail": L.native_available(),
                # LCS("abcdefgh","xxcdefyy") = "cdef" -> 4; the fallback
                # answer comes from the caller's Python automaton, so
                # None is the expected value when the kernel is disabled
                "val": L.lcs_len_native("abcdefgh", "xxcdefyy"),
            }
        )
        return pd.Series([rec] * len(x))

    rows = (
        spark.range(8)
        .repartition(4)
        .select(probe("id").alias("r"))
        .collect()
    )
    print("PROBE:" + json.dumps(sorted({r["r"] for r in rows})))
    spark.stop()


if __name__ == "__main__":
    main()
