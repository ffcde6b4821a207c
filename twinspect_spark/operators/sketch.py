"""Composable MinHash sketches: group-level (repo / source / shard)
similarity from per-document signatures, without re-reading content.

The trick is algebraic: the pre-densification OPH bin minima compose
under set union — binmin(A ∪ B) = elementwise-min(binmin(A), binmin(B))
(functions/hashing.py:minhash_binmin) — so a repo's sketch is a plain
``groupBy(repo, bin).min(lane)`` over per-document rows, a map-side-
combinable aggregation that never touches shingles again. This is the
fork / vendored-corpus / mirror detector a source-code lake needs:
estimated shingle-set Jaccard between every pair of repos at sketch
cost (p lanes per repo), not content cost.

Reference analog: per-dataset corpus stats + cross-cluster dedupe idea
(/root/reference/twinspect/datasets/newsedits.py:225-232) lifted from
file pairs to corpus pairs. The reference has no sketch algebra; this
is the Spark-native scale path for "which of my 10^8 repos are forks
of each other" where per-file joins would be quadratic in members.

Scale shape (10^12 files, 10^8 repos):
- per-doc binmin: the signature pandas UDF pass (already paid);
- rollup: one shuffle keyed (repo, bin) with partial aggregation —
  p rows per repo out, constant per repo;
- densify: applyInPandas over constant-size (p-row) groups;
- pair scoring: self-join on (bin, lane) — an inverted-index join whose
  volume is Σ|lane bucket|², never #repos² (repos sharing no lane never
  meet), followed by a count aggregation per repo pair.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twinspect_spark.config import DedupConfig
from twinspect_spark.functions import hashing as H

# uint64 -> int64 bijection that PRESERVES unsigned order (flip the sign
# bit), so Spark's native signed min() aggregates unsigned bin minima.
# EMPTY_BIN (uint64 max) encodes to int64 max — the identity of signed
# min — so empty bins need no NULL handling anywhere (and the Arrow→
# pandas path never sees nullable int64, which pandas would widen to
# float64 and silently round above 2^53).
_ORDER_FLIP = np.uint64(1 << 63)
_U64 = np.uint64


def make_binmin_udf(cfg: DedupConfig):
    """Series(text) → Series(array<long>): per-document OPH bin minima,
    order-flip-encoded signed (empty bin = int64 max). One numpy pass
    per row (shingle fold + splitmix + minimum.at), Arrow-batched."""
    k, p, seed = cfg.shingle_size, cfg.num_perm, cfg.seed

    def _batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            out: list[list[int] | None] = [None] * len(s)
            for i, text in enumerate(s):
                if text is None:
                    continue
                bm = H.minhash_binmin(H.shingle_hashes(text, k), p, seed)
                out[i] = (bm ^ _ORDER_FLIP).view(np.int64).tolist()
            yield pd.Series(out)

    return F.pandas_udf(_batch, T.ArrayType(T.LongType()))


def doc_binmin(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, bin, v): one row per document per bin (v = encoded empty
    for bins no shingle landed in — the grid stays complete so group
    rollups see every bin)."""
    bm = make_binmin_udf(cfg)
    return (
        docs.select(id_col, bm(F.col(text_col)).alias("bm"))
        .select(id_col, F.posexplode("bm").alias("bin", "v"))
    )


_LANES_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("lane", T.LongType()),
    ]
)


def group_sketch(binmin_rows: DataFrame, group_col: str, cfg: DedupConfig) -> DataFrame:
    """(group, bin, v) rows → densified group sketch (group_key, bin,
    lane). The min() is the union step; densification (constant-size
    p-row groups) runs per group in pandas, reusing the tested kernel."""
    p = cfg.num_perm
    rolled = (
        binmin_rows.groupBy(F.col(group_col).alias("group_key"), "bin")
        .agg(F.min("v").alias("v"))
    )

    def _densify(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.full(p, H.EMPTY_BIN, dtype=np.uint64)
        bins = pdf["bin"].to_numpy()
        enc = pdf["v"].to_numpy().astype(np.int64, copy=False)
        bm[bins] = enc.view(np.uint64) ^ _ORDER_FLIP
        lanes = H.to_signed64(H.densify_binmin(bm))
        return pd.DataFrame(
            {
                "group_key": np.repeat(pdf["group_key"].iloc[0], p),
                "bin": np.arange(p, dtype=np.int32),
                "lane": lanes,
            }
        )

    return rolled.groupBy("group_key").applyInPandas(_densify, _LANES_SCHEMA)


# ----------------------------------------------------- cardinality sketch
#
# HyperLogLog-style distinct counting (Flajolet et al., AofA'07) built on
# the engine's own deterministic hash spec, so the sketch — unlike
# Spark's approx_count_distinct or DuckDB's approx_count_distinct, which
# use engine-private hashes — replays bit-exactly in ANSI SQL and sits
# under the hard oracle. Registers compose under set union by
# elementwise max (exactly the binmin min-algebra above), so per-doc
# register arrays roll up to source/corpus cardinality with one
# map-side-combinable aggregation, and a streaming store can keep one
# 256-byte array per entity, updated monotonically.

HLL_M = 256  # registers (8 index bits; payload = 56 bits)
HLL_RHO_MAX = 57  # payload width + 1 (rho of an all-zero payload)
# harmonic terms as EXACT integers: 2^(CAP - min(rho, CAP)); max sum =
# 256 * 2^40 = 2^48 << 2^63, so the register sum is bit-identical in
# Spark BIGINT and DuckDB, and the float estimate divides two exact
# integers — no FP-accumulation-order divergence across engines.
HLL_CAP = 40
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_registers(mixed: np.ndarray) -> np.ndarray:
    """uint64 mixed hashes → int64[HLL_M] per-register max rho
    (0 = register never hit). register = h % M; rho = 1 + count of
    leading zeros of the 56-bit payload h // M. Bit length via a
    6-step vectorized binary search — integer-exact (float log2 rounds
    wrong at 2^53+ payloads)."""
    reg = (mixed % _U64(HLL_M)).astype(np.int64)
    cur = mixed >> _U64(8)
    bl = np.zeros(len(cur), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (_U64(1) << _U64(s))
        bl[big] += s
        cur[big] >>= _U64(s)
    bl += (cur > 0).astype(np.int64)
    rho = HLL_RHO_MAX - bl
    out = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(out, reg, rho)
    return out


def make_hll_udf(cfg: DedupConfig):
    """Series(text) → Series(array<int>): per-document HLL registers
    over the doc's shingle hashes, mixed with the MinHash master key
    (the SAME mx relation the SQL oracle replays)."""
    k, seed = cfg.shingle_size, cfg.seed

    def _batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        key = _U64(H._master_key(seed))
        for s in it:
            out: list[list[int] | None] = [None] * len(s)
            for i, text in enumerate(s):
                if text is None:
                    continue
                m = H.splitmix64(H.shingle_hashes(text, k) ^ key)
                out[i] = hll_registers(m).tolist()
            yield pd.Series(out)

    return F.pandas_udf(_batch, T.ArrayType(T.IntegerType()))


def hll_estimate(regs: DataFrame, group_col: str = "group_key") -> DataFrame:
    """(group, register, rho) max-rolled rows → (group, n_filled,
    est_distinct). Empty registers may appear as explicit rho=0 rows
    (the Spark full-array path) or be absent (the SQL path) — the sum
    only reads rho>0 rows and pads every empty register with its exact
    2^CAP term, so both shapes produce identical estimates. Raw HLL
    estimate from the exact-integer harmonic sum; linear-counting
    small-range correction below 2.5·M while empties remain."""
    m = F.lit(HLL_M)
    term = F.expr(
        f"CASE WHEN rho > 0 THEN shiftleft(1L, "
        f"cast({HLL_CAP} - least(rho, {HLL_CAP}) AS int)) ELSE 0L END"
    )
    per = regs.groupBy(group_col).agg(
        F.count(F.when(F.col("rho") > 0, 1)).cast("long").alias("n_filled"),
        F.sum(term).cast("long").alias("isum"),
    )
    # registers with no hash (absent rows or rho=0 rows): exact pad term
    pad = (m.cast("long") - F.col("n_filled")) * F.lit(1 << HLL_CAP).cast("long")
    per = per.withColumn("isum", F.col("isum") + pad)
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(1 << HLL_CAP)) / F.col("isum")
    v = m.cast("long") - F.col("n_filled")
    lin = m.cast("double") * F.log(m.cast("double") / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), lin).otherwise(raw)
    return per.select(
        group_col,
        "n_filled",
        F.round(est, 4).alias("est_distinct"),
    )


def sketch_pair_similarity(lanes: DataFrame, num_perm: int) -> DataFrame:
    """Densified sketches → (src_a, src_b, lanes_match, est_jaccard) for
    EVERY unordered group pair (zero-match pairs included: the report
    contract is the full matrix; restrict upstream if #groups is huge).
    The match join is inverted-index shaped — keyed (bin, lane)."""
    a = lanes.select(
        F.col("group_key").alias("src_a"), "bin", "lane"
    )
    b = lanes.select(
        F.col("group_key").alias("src_b"), "bin", "lane"
    )
    matches = (
        a.join(b, ["bin", "lane"])
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("lanes_match"))
    )
    groups = lanes.select(F.col("group_key")).distinct()
    allp = (
        groups.select(F.col("group_key").alias("src_a"))
        .join(
            groups.select(F.col("group_key").alias("src_b")),
            F.col("src_a") < F.col("src_b"),
        )
    )
    return (
        allp.join(matches, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("lanes_match", F.lit(0)).alias("lanes_match"),
            F.round(
                F.coalesce("lanes_match", F.lit(0)) / F.lit(num_perm), 6
            ).alias("est_jaccard"),
        )
    )
