"""Reference-parity sources/sinks (SURVEY.md §2.1 S3/S5).

The reference's signature artifact is a ``;``-delimited CSV with columns
``id;code;file;size;time`` and hex-string codes, sorted by id
(twinspect/algos/processing.py:100-108; loaded with declared dtypes at
twinspect/metrics/eff.py:150-190). These adapters exist so a reference
user can point our engine at their existing simprint artifacts (or
export ours into their tooling); internally codes stay LongType and
never round-trip through hex (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMPRINT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("code", T.StringType(), False),
        T.StructField("file", T.StringType(), False),
        T.StructField("size", T.LongType(), True),
        T.StructField("time", T.LongType(), True),
    ]
)


def read_simprints(spark: SparkSession, path: str) -> DataFrame:
    """Simprint CSV → (id, simhash: long, file, size, time). 64-bit hex
    codes decode via conv(); longer (ensemble) codes stay as hex strings
    in ``code`` — callers slice what they need."""
    raw = spark.read.schema(SIMPRINT_SCHEMA).option("sep", ";").option(
        "header", "true"
    ).csv(path)
    # conv(hex, 16, 10) yields an unsigned decimal string; cast through
    # decimal so codes with the top bit set wrap to the signed long the
    # engine uses internally
    simhash = (
        F.conv(F.col("code"), 16, 10).cast("decimal(20,0)").cast("long")
    )
    return raw.select(
        "id",
        F.when(F.length("code") <= 16, simhash).alias("simhash"),
        "code",
        "file",
        "size",
        "time",
    )


def write_simprints(
    signatures: DataFrame, path: str, files: DataFrame | None = None
) -> None:
    """signatures(file_id, simhash, size, micros) → the reference's CSV
    layout, id-sorted (W2, processing.py:101). Pass the ingested files
    frame to label rows with repo/path; otherwise the id is the label."""
    if files is not None and "file" not in signatures.columns:
        signatures = signatures.join(
            files.select(
                "file_id", F.concat_ws("/", "repo", "path").alias("file")
            ),
            "file_id",
        )
    file_col = (
        F.col("file")
        if "file" in signatures.columns
        else F.col("file_id").cast("string")
    )
    out = signatures.select(
        F.col("file_id").alias("id"),
        F.lpad(F.hex(F.col("simhash")), 16, "0").alias("code"),
        file_col.alias("file"),
        F.col("size"),
        F.col("micros").alias("time"),
    )
    out.orderBy("id").coalesce(1).write.mode("overwrite").option(
        "sep", ";"
    ).option("header", "true").csv(path)


def augment_simprints(df: DataFrame, file_col: str = "file") -> DataFrame:
    """Augment a simprint frame with ``cluster`` / ``transform`` /
    ``is_original`` parsed from the file path (reference
    twinspect/metrics/eff.py:150-190, P1/P2/P3):

    * cluster   — first path segment, NULL for top-level files;
    * transform — last ``_``-segment with the extension stripped, NULL
      when the name has no ``_``;
    * is_original — True for the min-id member of each cluster. (The
      reference marks the first row of each cluster run in its id-sorted
      CSV — identical output on its datasets, where clusters are
      contiguous; the window form is order-independent, so it survives
      any partitioning.)
    """
    from pyspark.sql import Window as W

    f = F.col(file_col)
    cluster = F.when(f.contains("/"), F.split(f, "/")[0])
    transform = F.when(
        f.contains("_"), F.regexp_extract(f, r"_([^_.]*)[^_]*$", 1)
    )
    out = df.withColumn("cluster", cluster).withColumn("transform", transform)
    w = W.partitionBy("cluster").orderBy("id")
    return out.withColumn(
        "is_original",
        F.col("cluster").isNotNull() & (F.row_number().over(w) == 1),
    )


def files_from_directory(
    spark: SparkSession, root: str, repo: str = "local", commit: str = "0" * 40
) -> DataFrame:
    """Directory tree of source files → the files schema (S1/S2: the
    reference's deterministic file walk, ultils.py:34-40, re-expressed as
    a distributed binaryFile scan; ordering is never implicit — callers
    orderBy where determinism matters)."""
    raw = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    ).load(root)
    rel = F.regexp_replace(
        F.col("path"), F.lit("^file:" + root.rstrip("/") + "/"), F.lit("")
    )
    ext = F.element_at(F.split(rel, r"\."), -1)
    return raw.select(
        F.lit(repo).alias("repo"),
        rel.alias("path"),
        F.lit(commit).alias("commit"),
        F.lower(ext).alias("lang"),
        F.decode("content", "UTF-8").alias("content"),
    )
