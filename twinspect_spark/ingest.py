"""Ingest stage: files table → normalized, content-addressed rows.

Reference analog: the dataset-install + integrity walk (S1/S2,
twinspect/datasets/ultils.py:34-40, integrity.py:179-213) plus content
normalization (P6, twinspect/datasets/newsedits.py:251-283). Everything
here is JVM-side column expressions (whole-stage codegen) except the
optional NFKC mode, which needs a vectorized pandas UDF (Spark SQL has no
NFKC builtin — SURVEY.md SF5).

Per-row invariant vs the reference (BASELINE.json input_hint):
``sha256 = sha2(content, 256)`` computed on the RAW content, before any
normalization — the analog of the reference's blake3 content address
(twinspect/tools.py:140-145).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twinspect_spark.config import DedupConfig

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), False),
    ]
)


@F.pandas_udf(T.StringType())
def _nfkc_normalize(s: pd.Series) -> pd.Series:
    """NFKC + control-char strip (reference newsedits.py:263-267 analog)."""

    def norm(x: str | None) -> str | None:
        if x is None:
            return None
        x = unicodedata.normalize("NFKC", x)
        x = "".join(c for c in x if unicodedata.category(c)[0] != "C" or c in "\n\t ")
        return " ".join(x.lower().split())

    return s.map(norm)


def normalize_expr(col: Column, mode: str = "simple") -> Column:
    """Normalized view of content used for shingling.

    "simple": lower + whitespace collapse + trim — pure JVM expressions,
    and expressible in ANSI SQL for the DuckDB oracle.
    "nfkc": adds Unicode NFKC + control-char strip (pandas UDF).
    "code": source-code canonicalization for the code payload — strips
    /* */ block comments and // or # line comments before the simple
    chain, so comment churn and reformatting (the reference's
    transformation registry analog, config.yml:124-194) hash to the
    same fingerprint. Regex-only (whole-stage codegen, and replayable
    in the DuckDB oracle); string literals containing comment markers
    are canonicalized too — documented fingerprint semantics, not a
    parser.
    """
    if mode == "simple":
        return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    if mode == "code":
        c = F.regexp_replace(col, r"(?s)/\*.*?\*/", " ")
        c = F.regexp_replace(c, r"(//|#)[^\n]*", " ")
        return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    if mode == "nfkc":
        return _nfkc_normalize(col)
    raise ValueError(f"unknown normalize mode: {mode}")


def ingest_files(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    """files(repo, path, commit, lang, content) → + file_id, sha256, size,
    content_norm.

    ``file_id = xxhash64(repo, path, commit)`` gives a stable 64-bit id
    independent of partition/row order (the reference instead relies on
    sorted directory traversal for stable ids, processing.py:67-72 — an
    ordering dependency Spark must not have).
    """
    out = (
        files.withColumn("file_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("sha256", F.sha2("content", 256))
        .withColumn("size", F.octet_length("content").cast("long"))
        .withColumn("content_norm", normalize_expr(F.col("content"), cfg.normalize))
    )
    if cfg.min_content_length > 0:
        # F1 (reference newsedits.py:208): scan-level predicate, pushed
        # to the parquet reader when content length is a stored column
        out = out.where(F.col("size") >= cfg.min_content_length)
    return out


def empty_content_errors(files: DataFrame) -> DataFrame:
    """Invariant check F7: empty files are an integrity error in the
    reference (integrity.py:74-78); we emit them to a metrics/errors
    relation instead of raising mid-job."""
    return files.where(
        F.col("content").isNull() | (F.octet_length("content") == 0)
    ).select("repo", "path", "commit", F.lit("empty_content").alias("error"))
