"""SparkSession factory with the engine's standard tuning.

Local-mode testing stands in for a multi-executor cluster; every setting
here is cluster-safe (AQE, skew-join, Arrow batching) and the parallelism
knob is a parameter so bench.py can run the same job at local[8] vs
local[32] for the scaling-efficiency evidence (BASELINE.md targets).
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip this package for executor shipment (the `spark-submit
    --py-files` artifact, built on demand). Local-mode Python workers are
    separate processes and do NOT inherit the driver's sys.path — any
    pandas-UDF closure referencing twinspect_spark needs this on a real
    cluster and in local mode alike."""
    pkg_root = pathlib.Path(__file__).resolve().parent
    out = pathlib.Path(tempfile.gettempdir()) / "twinspect_spark_pkg.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_root.rglob("*.py")):
            # fixed timestamp → byte-identical zip for identical sources;
            # Spark hard-rejects re-adding a same-named file whose bytes
            # differ, and mtimes would differ on every checkout/build
            info = zipfile.ZipInfo(
                f"twinspect_spark/{py.relative_to(pkg_root)}",
                date_time=(1980, 1, 1, 0, 0, 0),
            )
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, py.read_bytes())
    return str(out)


def get_spark(
    app_name: str = "twinspect_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # Executor-faithful JVM sizing. A cluster executor runs N cores with
    # a few GB/core and GC threads matched to its slice of the machine;
    # local mode's old one-size 90g heap measurably poisoned throughput
    # (G1 card/remset span + first-touch page faults over a mostly-empty
    # 90 GB address range): the 1M-file bucket self-join at local[8]
    # spent 296 CPU-sec under the 90g heap vs 131 under a 24g heap with
    # GC threads pinned to the core count — a 2.3x tax that grew WITH
    # parallelism and corrupted scaling measurements (BASELINE.md r3).
    mem = os.environ.get("SPARK_DRIVER_MEM") or f"{min(max(8, 3 * cores), 64)}g"
    gc_threads = max(2, min(cores, 16))
    gc_opts = (
        f"-XX:ParallelGCThreads={gc_threads} "
        f"-XX:ConcGCThreads={max(1, gc_threads // 4)}"
    )
    from pyspark import SparkConf

    builder = SparkSession.builder.appName(app_name)
    # under spark-submit the master (and a real cluster) is already
    # chosen — only default to local[cores] when launched standalone
    if not SparkConf().contains("spark.master"):
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # managed-table warehouse out of cwd; real deployments override
        # (an Iceberg catalog carries its own warehouse location)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR",
                os.path.join(tempfile.gettempdir(), "twinspect_warehouse"),
            ),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", gc_opts)
        .config("spark.ui.enabled", "false")
        # real traceback when an Arrow/pandas worker dies mid-batch
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Static broadcasts (tiny dims) stay enabled above; the ADAPTIVE
        # runtime conversion is disabled because AQE re-plans the LSH
        # band/pair self-joins into broadcasts when post-shuffle stats
        # look small-ish, building multi-million-row hash relations per
        # task (measured 50 s vs 5 s on the candidate stage at 160k
        # files). On a real cluster the pair stream must shuffle, never
        # broadcast.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # skip the self-ship when spark-submit --py-files already delivered
    # the package (re-adding a different build of the same filename is a
    # hard error; same-build re-adds are merely warned and wasteful)
    shipped = spark.sparkContext.getConf().get("spark.submit.pyFiles", "") or ""
    if "twinspect_spark_pkg.zip" not in shipped:
        spark.sparkContext.addPyFile(package_zip())
    return spark
