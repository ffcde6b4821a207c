"""Streaming distinct-cardinality store: the deterministic HLL sketch
(operators/sketch.py) maintained incrementally over a document stream.

The register-max union algebra makes the state MONOTONE and IDEMPOTENT:
merging the same micro-batch twice changes nothing, so Structured
Streaming's at-least-once foreachBatch replay is exactly-once on state
with NO commit protocol at all — the one durability concern left is a
torn snapshot write, handled by versioned snapshot directories plus an
atomically-renamed ``_meta.json`` pointer (the store-v2 idiom,
streaming/incremental.py). State is ``HLL_M`` rows per group FOREVER
(256 registers x |groups|), independent of stream length — the
O(1)-state answer to "how many distinct shingles has each source ever
contributed", where exact distinct-tracking state grows with the
answer itself.

Per-batch cost tracks |batch| (one signature-UDF pass + a register
groupBy) plus the constant-size snapshot rewrite; nothing rescans
content. Reference analog: the per-dataset corpus stats the reference
computes batch-wise per run (/root/reference/twinspect/datasets/) —
here continuous, with a mergeable sketch instead of a recount.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.operators.sketch import hll_estimate, make_hll_udf

STORE_FORMAT = 1
_META = "_meta.json"


class CardinalityStore:
    """Versioned-snapshot register store + estimate reader."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cfg: DedupConfig,
        group_col: str = "source",
        text_col: str = "text",
    ):
        self.spark = spark
        self.path = path
        self.cfg = cfg
        self.group_col = group_col
        self.text_col = text_col
        os.makedirs(path, exist_ok=True)

    # -- snapshot pointer ----------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, _META)

    def _read_meta(self) -> dict:
        p = self._meta_path()
        if not os.path.exists(p):
            return {"format": STORE_FORMAT, "version": -1}
        with open(p) as f:
            m = json.load(f)
        if m.get("format") != STORE_FORMAT:
            raise ValueError(
                f"cardinality store at {self.path} has format "
                f"{m.get('format')}; this build reads format {STORE_FORMAT}"
            )
        return m

    def _write_meta(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".meta")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._meta_path())  # atomic on POSIX

    def _snap_dir(self, version: int) -> str:
        return os.path.join(self.path, f"snapshots/v={version}")

    # -- state ----------------------------------------------------------
    def read_registers(self) -> DataFrame | None:
        """Current merged registers (group_key, register, rho) — only
        filled registers are stored; estimates pad the empties."""
        v = self._read_meta()["version"]
        if v < 0:
            return None
        return self.spark.read.parquet(self._snap_dir(v))

    def _batch_registers(self, batch_df: DataFrame) -> DataFrame:
        udf = make_hll_udf(self.cfg)
        return (
            batch_df.select(
                F.col(self.group_col).cast("string").alias("group_key"),
                F.posexplode(udf(F.col(self.text_col))).alias(
                    "register", "rho"
                ),
            )
            .where(F.col("rho") > 0)
            .groupBy("group_key", "register")
            .agg(F.max("rho").alias("rho"))
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch: new = max(stored, batch) per register.
        Replays are no-ops on state (max is idempotent); each merge
        writes a fresh snapshot version and flips the meta pointer, so
        a torn write is never observable."""
        regs = self._batch_registers(batch_df)
        cur = self.read_registers()
        if cur is not None:
            regs = (
                cur.unionByName(regs)
                .groupBy("group_key", "register")
                .agg(F.max("rho").alias("rho"))
            )
        m = self._read_meta()
        nv = m["version"] + 1
        regs.coalesce(1).write.mode("overwrite").parquet(self._snap_dir(nv))
        self._write_meta({"format": STORE_FORMAT, "version": nv})
        self._gc(keep_from=nv - 1)

    def _gc(self, keep_from: int) -> None:
        snaps = os.path.join(self.path, "snapshots")
        if not os.path.isdir(snaps):
            return
        for d in os.listdir(snaps):
            if d.startswith("v=") and int(d[2:]) < keep_from:
                shutil.rmtree(os.path.join(snaps, d), ignore_errors=True)

    def sink(self):
        """foreachBatch hook: ``writeStream.foreachBatch(store.sink())``."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return _sink

    def estimates(self) -> DataFrame:
        """(group_key, n_filled, est_distinct) from the current state."""
        regs = self.read_registers()
        if regs is None:
            return self.spark.createDataFrame(
                [], "group_key string, n_filled long, est_distinct double"
            )
        return hll_estimate(regs, "group_key")
