"""Training-data export operators: deterministic stratified sampling,
token-budget curriculum export via a distributed prefix sum, and PII
scrub statistics.

These are the ops a 100 TB pretraining pipeline runs AFTER dedup
(pipeline.py) and quality gating (queries.q_quality_scores /
q_dedup_keep_best_quality): pick a per-language mixture, cut the corpus
to a token budget in a reproducible pseudo-random order, and strip
contact/identifier strings before export. Reference analog: the seeded
deterministic sampling idiom of twinspect
(/root/reference/twinspect/datasets/ultils.py:18-31, download.py:213-215
— sampling decisions must be a pure function of config + item identity,
never of iteration order), re-expressed over DataFrames.

Determinism contract: every ordering decision derives from
``sample_hash`` — a Knuth multiplicative hash of the row id — plus an id
tie-break, so results are invariant to partitioning, task scheduling,
and input file order. The multiplicative hash (not xxhash64) keeps the
exact same arithmetic expressible in ANSI SQL for the DuckDB oracle;
at real scale swap ``sample_hash`` for ``F.xxhash64`` (same plan shape,
no overflow for 63-bit ids — the multiplicative product would wrap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / phi), public domain.
SAMPLE_HASH_MULT = 2654435761
SAMPLE_HASH_MOD = 4294967296  # 2^32
# High bits of the 32-bit hash used as the prefix-sum bucket: bucket id
# is monotone in the hash, so per-bucket offsets + within-bucket cumsum
# reproduce the single global ordering exactly.
PREFIX_SUM_BUCKET_SHIFT = 26  # 2^(32-26) = 64 buckets


def sample_hash(id_col: Column) -> Column:
    """Deterministic 32-bit pseudo-random key for an integer id column.

    Pure integer column expression (whole-stage codegen, SQL-replayable):
    ``(id * 2654435761) mod 2^32``. Safe under ANSI overflow checking for
    ids < 2^31; see module docstring for the 63-bit-scale variant.
    """
    return F.pmod(id_col.cast("long") * F.lit(SAMPLE_HASH_MULT),
                  F.lit(SAMPLE_HASH_MOD))


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, quota: int
) -> DataFrame:
    """Deterministic per-stratum quota sample: the ``quota``
    hash-smallest rows of each stratum.

    One shuffle (the window exchange on ``strata_col``); the rank
    predicate is evaluated inside the window stage so only winners
    survive to downstream operators. Skewed strata are bounded by the
    running-rank cutoff — a stratum with 10^9 rows still emits exactly
    ``quota`` — but its single window partition must still SORT all its
    rows; at web scale pre-thin with an approximate per-stratum hash
    ceiling (filter ``sample_hash < k * 2^32 * quota / approx_count``)
    before the exact window.
    """
    w = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        df.withColumn("_h", sample_hash(F.col(id_col)))
        .withColumn("rank_in_stratum", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_stratum") <= quota)
        .drop("_h")
    )


def token_budget_export(
    df: DataFrame, id_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Cut a corpus to ``budget`` total tokens in deterministic
    pseudo-random order — the curriculum-export primitive ("give me the
    first N tokens of the shuffled corpus").

    The naive plan is ``sum(tokens) over (order by h)`` — a GLOBAL
    window, i.e. one task sorting the entire corpus: correct at sf0.01,
    dead at 100 TB. This implements the distributed prefix sum instead:

    1. bucket rows by the high bits of the hash (bucket id monotone in
       the global order, so buckets partition the order into runs);
    2. aggregate per-bucket token totals (64 rows — map-side combined);
    3. running-sum the 64 totals into per-bucket offsets (window over a
       64-row relation: trivially single-task);
    4. broadcast-join offsets back and cumsum WITHIN each bucket
       (partitioned window — parallel across buckets).

    cum_tokens is bit-identical to the global window; wall-clock scales
    with the bucket count. Early-exit: buckets whose offset already
    exceeds the budget are dropped BEFORE their within-bucket sort.
    """
    base = df.withColumn("_h", sample_hash(F.col(id_col))).withColumn(
        "_bkt", F.shiftright(F.col("_h"), PREFIX_SUM_BUCKET_SHIFT)
    )
    totals = base.groupBy("_bkt").agg(
        F.sum(tokens_col).cast("long").alias("_tot")
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    w = Window.partitionBy("_bkt").orderBy("_h", id_col)
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .where(F.col("_offset") < budget)  # prune whole buckets pre-sort
        .withColumn(
            "cum_tokens",
            (F.col("_offset") + F.sum(tokens_col).over(w)).cast("long"),
        )
        .where(F.col("cum_tokens") <= budget)
        .drop("_h", "_bkt", "_offset")
    )


def pack_sequences(
    df: DataFrame, id_col: str, tokens_col: str, seq_len: int
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    the deterministic hash order and the token stream is cut into
    fixed-length training sequences of ``seq_len`` tokens. Emits each
    document's pack coordinates:

    - ``pack_start``  — 0-based offset of the doc's first token in the
      concatenated stream;
    - ``first_seq`` / ``last_seq`` — the sequence indices the doc's
      tokens land in (``floor(start/L)`` .. ``floor((end-1)/L)``);
    - ``n_seqs``      — how many sequences the doc spans (>1 = the doc
      is split across a training-example boundary).

    The offsets come from the same distributed prefix sum as
    :func:`token_budget_export` (bucketed per-bucket totals + a 64-row
    offset window + within-bucket cumsum), NOT a global single-task
    window — packing a 100 TB corpus is exactly the workload where
    ``sum() over (order by h)`` dies. The within-bucket window is the
    only per-row sort and it parallelizes across the 64 buckets.
    """
    base = df.withColumn("_h", sample_hash(F.col(id_col))).withColumn(
        "_bkt", F.shiftright(F.col("_h"), PREFIX_SUM_BUCKET_SHIFT)
    )
    totals = base.groupBy("_bkt").agg(
        F.sum(tokens_col).cast("long").alias("_tot")
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    w = Window.partitionBy("_bkt").orderBy("_h", id_col)
    start = (
        F.col("_offset")
        + F.sum(tokens_col).over(w)
        - F.col(tokens_col)
    ).cast("long")
    end_tok = start + F.col(tokens_col).cast("long") - F.lit(1)
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .where(F.col(tokens_col) > 0)  # empty docs occupy no sequence
        .withColumn("pack_start", start)
        .withColumn(
            "first_seq",
            F.floor(F.col("pack_start") / F.lit(seq_len)).cast("long"),
        )
        .withColumn(
            "last_seq", F.floor(end_tok / F.lit(seq_len)).cast("long")
        )
        .withColumn(
            "n_seqs",
            (F.col("last_seq") - F.col("first_seq") + F.lit(1)).cast("long"),
        )
        .drop("_h", "_bkt", "_offset")
    )


def shard_assignment(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Deterministic export-shard assignment: ``shard = hash(id) mod
    n_shards``. The write-side idiom at scale is
    ``df.repartition(n_shards, "shard").write.partitionBy("shard")`` —
    one shuffle keyed on the same column the files are laid out by, so
    readers get shard-pruned scans. Assignment is a pure function of the
    id (stable across reruns/partitionings: appending a corpus delta
    never reassigns an existing doc's shard).
    """
    return df.withColumn(
        "shard", F.pmod(sample_hash(F.col(id_col)), F.lit(n_shards))
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark, executor-side codegen) and RE2 (DuckDB oracle): character
# classes, bounded/unbounded repetition, \\b word boundaries — no
# lookaround, no backrefs. Redaction order matters and is fixed: URLs
# first (they may embed emails/digits), then emails, IPs, long digit runs.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("idnum", r"[0-9]{8,}", "<ID>"),
)


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII match counts + sha256 fingerprint of the redacted
    text. Counting and redaction are pure column expressions (regexp_count
    / regexp_replace chain → whole-stage codegen, no Python on the data
    path); counts are taken on the PROGRESSIVELY REDACTED text so one
    span is never double-counted (an email inside a URL counts as URL).
    """
    from twinspect_spark.codelake import scrub_stats

    return scrub_stats(df, id_col, text_col, PII_PATTERNS)
