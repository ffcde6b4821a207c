"""Ensemble signature combination (SURVEY.md J7).

The reference builds 128-bit ensemble codes by positionally zipping two
simprint CSVs, asserting the file sequences are identical, concatenating
hex codes and summing times (combine_simprints,
twinspect/algos/ensemble.py:36-124). Position-alignment is an ordering
dependency Spark must not have: here the alignment is an equi-join on
``file_id``, misalignment is an explicit symmetric-difference count (the
reference's assertion, ensemble.py:83-91), and the combined code is the
pair of 64-bit longs — never hex (SURVEY.md §1.2).

Distance over the combined code is the sum of per-component bit_counts
(SF1 for >64-bit codes), still whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class EnsembleMisalignment(ValueError):
    pass


def combine_signatures(
    a: DataFrame, b: DataFrame, check: bool = True
) -> DataFrame:
    """Two signature sets over the same corpus → ensemble signatures
    (file_id, sha256, size, simhashes: array<long>, minhash, micros).

    ``minhash`` concatenates both lane arrays (doubling num_perm);
    ``micros`` sums (reference sums component times, ensemble.py:104).
    With ``check`` (default), raises EnsembleMisalignment if either side
    has ids the other lacks.
    """
    if check:
        la = a.select(F.col("file_id").alias("ida"))
        lb = b.select(F.col("file_id").alias("idb"))
        # explicit aliases: a USING-style full outer would coalesce the
        # key column and the null probes could never fire
        missing = la.join(lb, la.ida == lb.idb, "full_outer").where(
            F.col("ida").isNull() | F.col("idb").isNull()
        )
        n_bad = missing.count()
        if n_bad:
            raise EnsembleMisalignment(
                f"{n_bad} file_ids present in only one component set"
            )
    bb = b.select(
        "file_id",
        F.col("minhash").alias("minhash_b"),
        *([F.col("mh16").alias("mh16_b")] if "mh16" in b.columns else []),
        F.col("simhash").alias("simhash_b"),
        F.col("micros").alias("micros_b"),
    )
    both_mh16 = "mh16" in a.columns and "mh16" in b.columns
    return a.join(bb, "file_id").select(
        "file_id",
        "sha256",
        "size",
        F.array("simhash", "simhash_b").alias("simhashes"),
        F.concat("minhash", "minhash_b").alias("minhash"),
        *([F.concat("mh16", "mh16_b").alias("mh16")] if both_mh16 else []),
        (F.col("micros") + F.col("micros_b")).alias("micros"),
    )


def ensemble_hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two array<long> codes: Σ bit_count(xor)
    over components (SF1's >64-bit mapping) — codegen'd, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
