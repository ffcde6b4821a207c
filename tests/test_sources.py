"""Sources/sinks: simprint CSV round-trip (reference artifact parity,
S3/S5), directory-tree file source (S1/S2), spark-submit entrypoint."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from twinspect_spark.config import DedupConfig
from twinspect_spark.corpus import generate_corpus
from twinspect_spark.ingest import ingest_files
from twinspect_spark.signatures import compute_signatures
from twinspect_spark.sources.simprint import (
    files_from_directory,
    read_simprints,
    write_simprints,
)

CFG = DedupConfig()


def test_simprint_roundtrip(spark, tmp_path):
    corpus = generate_corpus(n_clusters=5, transforms_per_original=1, seed=2)
    ing = ingest_files(spark.createDataFrame(corpus.files), CFG)
    sigs = compute_signatures(ing, CFG)
    out = str(tmp_path / "simprints")
    write_simprints(sigs, out, files=ing)
    back = read_simprints(spark, out)

    want = {r["file_id"]: r["simhash"] for r in sigs.collect()}
    got = {r["id"]: r["simhash"] for r in back.collect()}
    assert got == want  # hex round-trip incl. negative (top-bit) codes
    assert back.schema["id"].dataType.typeName() == "long"
    labels = {r["file"] for r in back.collect()}
    assert any(lbl.endswith(".py") for lbl in labels)


def test_files_from_directory(spark, tmp_path):
    root = tmp_path / "tree"
    (root / "pkg").mkdir(parents=True)
    (root / "pkg" / "a.py").write_text("def f():\n    return 1\n")
    (root / "b.txt").write_text("hello")
    files = files_from_directory(spark, str(root), repo="r1")
    rows = {r["path"]: r for r in files.collect()}
    assert set(rows) == {"pkg/a.py", "b.txt"}
    assert rows["pkg/a.py"]["lang"] == "py"
    assert rows["pkg/a.py"]["content"].startswith("def f()")
    assert rows["b.txt"]["repo"] == "r1"
    assert len(rows["pkg/a.py"]["commit"]) == 40


def test_spark_submit_entrypoint(tmp_path):
    """python -m twinspect_spark over a parquet files table — the
    packaged job a cluster would spark-submit."""
    import pandas as pd

    corpus = generate_corpus(n_clusters=4, transforms_per_original=1, seed=9)
    inp = str(tmp_path / "files.parquet")
    pd.DataFrame(corpus.files).to_parquet(inp)
    out = str(tmp_path / "clusters")
    proc = subprocess.run(
        [
            sys.executable, "-m", "twinspect_spark",
            "--input", inp, "--output", out,
            "--jaccard", "0.6", "--cores", "4",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_files"] == len(corpus.files)
    assert summary["n_dup_members"] > 0


def test_spark_submit_bucketed_table_output(tmp_path):
    """--output-buckets writes the clusters table hash-bucketed by
    file_id into the session catalog (read back via spark.table inside
    the same job — bucket metadata is catalog-scoped)."""
    import pandas as pd

    corpus = generate_corpus(n_clusters=2, transforms_per_original=1, seed=5)
    inp = str(tmp_path / "files.parquet")
    pd.DataFrame(corpus.files).to_parquet(inp)
    cmd = [
        sys.executable, "-m", "twinspect_spark",
        "--input", inp, "--output", "default.tw_submit_clusters_b",
        "--output-buckets", "4", "--jaccard", "0.6", "--cores", "2",
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo", timeout=300
    )
    if proc.returncode != 0:
        # this test boots a SECOND JVM; when the box is saturated (the
        # full oracle gate running concurrently) the child can die on
        # resource contention. One bounded retry distinguishes that
        # from a real regression (observed once in session 19: failed
        # under concurrent full-gate load, passed isolated in 48 s).
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd="/root/repo",
            timeout=300,
        )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_files"] == len(corpus.files)


def test_augment_simprints(spark):
    from twinspect_spark.sources.simprint import augment_simprints

    rows = [
        (1, "0000001/img_crop.jpg"),
        (2, "0000001/img2_blur.jpg"),
        (3, "toplevel.jpg"),
        (4, "0000002/noext_jpg"),
        (5, "0000002/plain.jpg"),
    ]
    df = spark.createDataFrame(rows, "id long, file string")
    got = {
        r["id"]: (r["cluster"], r["transform"], r["is_original"])
        for r in augment_simprints(df).collect()
    }
    # reference semantics (eff.py:150-190): cluster = first segment,
    # transform = last _-segment sans extension, original = first id
    assert got[1] == ("0000001", "crop", True)
    assert got[2] == ("0000001", "blur", False)
    assert got[3] == (None, None, False)
    assert got[4] == ("0000002", "jpg", True)
    assert got[5] == ("0000002", None, False)


def test_min_content_length_filter(spark):
    from twinspect_spark.config import DedupConfig
    from twinspect_spark.ingest import ingest_files

    rows = [("r", "a", "c", "py", "x" * 10), ("r", "b", "c", "py", "x" * 200)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    assert ingest_files(df, DedupConfig()).count() == 2
    kept = ingest_files(df, DedupConfig(min_content_length=100))
    assert [r["path"] for r in kept.collect()] == ["b"]


def test_catalog_table_roundtrip(spark, tmp_path):
    """The Iceberg seam: read_table/write_table resolve catalog
    references through spark.table()/writeTo() — exercised here against
    the built-in catalog with a parquet-backed managed table (the
    sandbox has no Iceberg runtime jar; the code path is identical)."""
    from twinspect_spark.sources.tables import (
        is_table_ref,
        read_table,
        write_table,
    )

    assert is_table_ref("lake.files")
    assert is_table_ref("iceberg.db.files")
    assert not is_table_ref("/data/files.parquet")
    assert not is_table_ref("out.parquet")
    assert not is_table_ref("clusters_out")

    df = spark.createDataFrame([(1, "a"), (2, "b")], "file_id long, x string")
    spark.sql("CREATE DATABASE IF NOT EXISTS ts_test")
    try:
        write_table(df, "ts_test.roundtrip")
        got = read_table(spark, "ts_test.roundtrip").orderBy("file_id")
        assert [r["x"] for r in got.collect()] == ["a", "b"]
        # createOrReplace is idempotent (the Iceberg snapshot-replace path)
        write_table(df.where("file_id = 1"), "ts_test.roundtrip")
        assert read_table(spark, "ts_test.roundtrip").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS ts_test.roundtrip")
        spark.sql("DROP DATABASE IF EXISTS ts_test")

    # path fallback
    p = str(tmp_path / "files_out")
    write_table(df, p)
    assert read_table(spark, p).count() == 2


def test_spark_submit_curation_gates(tmp_path):
    """--min-words / --max-dup-bigram drop files BEFORE dedup: planted
    short + internally-repetitive files never reach the clusters table
    and the summary accounts for them."""
    import pandas as pd

    corpus = generate_corpus(n_clusters=3, transforms_per_original=1, seed=11)
    base = corpus.files
    extra = pd.DataFrame(
        [
            ("r0", "short.txt", "c0", "python", "too short"),
            ("r0", "repeat.txt", "c0", "python",
             "spam ham " * 40 + "spam ham"),
        ],
        columns=base.columns,
    )
    files = pd.concat([base, extra], ignore_index=True)
    inp = str(tmp_path / "files.parquet")
    files.to_parquet(inp)
    out = str(tmp_path / "clusters")
    proc = subprocess.run(
        [
            sys.executable, "-m", "twinspect_spark",
            "--input", inp, "--output", out,
            "--jaccard", "0.6", "--cores", "4",
            "--min-words", "5", "--max-dup-bigram", "0.5",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_gated_out"] == 2
    assert summary["n_files"] == len(files) - 2
