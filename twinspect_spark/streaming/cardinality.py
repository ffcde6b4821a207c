"""Streaming distinct-cardinality store: the deterministic HLL sketch
(operators/sketch.py) maintained incrementally over a document stream.

The register-max union algebra makes the state MONOTONE and IDEMPOTENT:
merging the same micro-batch twice changes nothing, so Structured
Streaming's at-least-once foreachBatch replay is exactly-once on state
with NO commit protocol at all. That buys an append-only layout — the
same fix the incremental dedup store needed for its clusters table,
here for free from the algebra:

- each batch writes ONE delta directory holding only the batch's own
  registers (O(|batch groups| x HLL_M) rows, independent of state
  size) and is recorded in an atomically-renamed ``_meta.json``;
- readers union the base snapshot with the committed deltas and fold
  with ``max`` — a replayed batch just contributes a duplicate delta,
  which the fold absorbs;
- when the delta list exceeds ``compact_every``, the folded state is
  rewritten as a new base version and the deltas retire — an
  O(|state|) write paid once per K batches instead of every batch,
  and |state| itself is the constant-size register table
  (HLL_M x |groups|), never the stream.

A torn write is never observable: delta and base directories are
written BEFORE the meta pointer names them, and garbage collection
runs only after the pointer flip.

Per-batch cost tracks |batch| (one signature-UDF pass + a register
groupBy + the delta write); nothing rescans content or rewrites state.
Reference analog: the per-dataset corpus stats the reference computes
batch-wise per run (/root/reference/twinspect/datasets/) — here
continuous, with a mergeable sketch instead of a recount.
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

STORE_FORMAT = 2  # v2: base + append-only deltas (v1 rewrote state per batch)
_META = "_meta.json"


class CardinalityStore:
    """Append-only delta register store + estimate reader."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cfg: DedupConfig,
        group_col: str = "source",
        text_col: str = "text",
        compact_every: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.cfg = cfg
        self.group_col = group_col
        self.text_col = text_col
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    # -- meta pointer -----------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, _META)

    def _read_meta(self) -> dict:
        p = self._meta_path()
        if not os.path.exists(p):
            return {
                "format": STORE_FORMAT,
                "base_version": -1,
                "deltas": [],
                "next_seq": 0,
            }
        with open(p) as f:
            m = json.load(f)
        if m.get("format") != STORE_FORMAT:
            raise ValueError(
                f"cardinality store at {self.path} has format "
                f"{m.get('format')}; this build reads format {STORE_FORMAT}"
                " — rebuild the store"
            )
        return m

    def _write_meta(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".meta")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._meta_path())  # atomic on POSIX

    def _base_dir(self, version: int) -> str:
        return os.path.join(self.path, f"base/v={version}")

    def _delta_dir(self, seq: int) -> str:
        return os.path.join(self.path, f"deltas/d={seq}")

    # -- state --------------------------------------------------------------
    def _state_parts(self, m: dict) -> list[str]:
        parts = []
        if m["base_version"] >= 0:
            parts.append(self._base_dir(m["base_version"]))
        parts.extend(self._delta_dir(s) for s in m["deltas"])
        return parts

    def read_registers(self) -> DataFrame | None:
        """Current folded registers (group_key, register, rho) — only
        filled registers are stored; estimates pad the empties."""
        parts = self._state_parts(self._read_meta())
        if not parts:
            return None
        return (
            self.spark.read.parquet(*parts)
            .groupBy("group_key", "register")
            .agg(F.max("rho").alias("rho"))
        )

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
        """Merge one micro-batch: write its registers as a delta, flip
        the meta pointer, compact when the delta list is long. Replays
        add a duplicate delta the max-fold absorbs — state unchanged."""
        m = self._read_meta()
        seq = m["next_seq"]
        self._batch_registers(batch_df).write.mode("overwrite").parquet(
            self._delta_dir(seq)
        )
        m["deltas"].append(seq)
        m["next_seq"] = seq + 1
        self._write_meta(m)
        if len(m["deltas"]) > self.compact_every:
            self._compact(m)

    def _compact(self, m: dict) -> None:
        """Fold base + deltas into a new base version; retire deltas.
        O(|state|), paid once per compact_every batches."""
        folded = self.spark.read.parquet(*self._state_parts(m)).groupBy(
            "group_key", "register"
        ).agg(F.max("rho").alias("rho"))
        nv = m["base_version"] + 1
        folded.write.mode("overwrite").parquet(self._base_dir(nv))
        old_base, old_deltas = m["base_version"], list(m["deltas"])
        self._write_meta(
            {
                "format": STORE_FORMAT,
                "base_version": nv,
                "deltas": [],
                "next_seq": m["next_seq"],
            }
        )
        # gc strictly after the pointer flip
        if old_base >= 0:
            shutil.rmtree(self._base_dir(old_base), ignore_errors=True)
        for s in old_deltas:
            shutil.rmtree(self._delta_dir(s), ignore_errors=True)

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
