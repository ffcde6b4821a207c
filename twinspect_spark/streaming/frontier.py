"""Streaming crawl-frontier seen-store: the Bloom-filter URL/ETag
dedupe (SURVEY §2.1 D4, reference download.py:30-64 `content_ids`)
maintained incrementally over an arrival stream.

State has two halves, both append-only:

- **positions/** — the DISTINCT Bloom bit positions of every admitted
  key, sharded: rows are (shard, p) with shard = an independent hash
  window of the key. Set union is monotone and idempotent (the same
  algebra that makes the HLL register store replay-safe,
  streaming/cardinality.py), so a replayed batch's delta folds to a
  no-op. Per shard the position set is bounded by ``m_bits`` rows —
  the whole filter is at most ``n_shards x m_bits`` bits no matter how
  many trillion keys were admitted. Probing joins on (shard, p):
  Catalyst broadcasts the fold while it is small and shuffles
  co-partitioned on shard once it is not — the classic partitioned-
  Bloom layout for key spaces too big for one bitmap.
- **keys/b=<batch>/shard_pt=<s>/** — the exact admitted keys, written
  batch-scoped (replay overwrites its own directory) and directory-
  partitioned by shard. Only the *maybe-seen* sliver of a probe batch
  ever reads this half, and the scan prunes to the shards that sliver
  touches (PartitionFilters on shard_pt) — a batch of fresh keys reads
  ZERO key bytes because the Bloom filter has no false negatives.

Per-batch cost tracks |batch|: one decisions write, one admitted-keys
write, one positions delta (<= k x |new keys| rows). The O(|state|)
positions fold is paid once per ``compact_every`` batches; the keys
half is never rewritten at all. Commit bookkeeping is the O(1)
high-water-mark record (same protocol as streaming/incremental.py).

Classification verdicts mirror the batch query (queries.py
`bloom_seen_filter`): 'new' (filter miss — definitely unseen), 'dup'
(hit + exact confirm), 'false_positive' (hit, exact check clears it).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twinspect_spark.functions.bloom import bloom_positions

STORE_FORMAT = 1
_META = "_meta.json"


class FrontierStore:
    """Sharded Bloom seen-store + exact key log over parquet."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        m_bits: int = 1 << 20,
        k: int = 4,
        n_shards: int = 16,
        key_col: str = "etag",
        compact_every: int = 8,
    ):
        if k > 7:
            raise ValueError("k <= 7 (window 7 of sha256 is the shard hash)")
        self.spark = spark
        self.path = path
        self.m_bits = m_bits
        self.k = k
        self.n_shards = n_shards
        self.key_col = key_col
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)
        m = self._read_meta()
        for name, want in (
            ("m_bits", m_bits), ("k", k), ("n_shards", n_shards),
        ):
            if m.get(name, want) != want:
                raise ValueError(
                    f"frontier store at {path} was built with "
                    f"{name}={m[name]}; reopen with the same config "
                    "or rebuild (positions are not portable across it)"
                )

    # -- meta pointer (atomic rename; O(1) in stream length) --------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, _META)

    def _read_meta(self) -> dict:
        p = self._meta_path()
        if not os.path.exists(p):
            return {
                "format": STORE_FORMAT,
                "m_bits": self.m_bits,
                "k": self.k,
                "n_shards": self.n_shards,
                "pos_base_version": -1,
                "pos_deltas": [],     # committed batch ids with a delta dir
                "high_water": -1,     # all batch_ids <= this are committed
                "exceptions": [],     # committed ids > high_water
            }
        with open(p) as f:
            m = json.load(f)
        if m.get("format") != STORE_FORMAT:
            raise ValueError(
                f"frontier store format {m.get('format')} at {self.path};"
                f" this build reads format {STORE_FORMAT} — rebuild"
            )
        return m

    def _write_meta(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".meta")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._meta_path())

    @staticmethod
    def _committed(m: dict, batch_id: int) -> bool:
        return batch_id <= m["high_water"] or batch_id in m["exceptions"]

    @staticmethod
    def _fold_commit(m: dict, batch_id: int) -> None:
        ex = set(m["exceptions"]) | {batch_id}
        w = m["high_water"]
        while w + 1 in ex:
            w += 1
            ex.remove(w)
        m["high_water"], m["exceptions"] = w, sorted(ex)

    def committed_ids(self) -> list[int]:
        m = self._read_meta()
        return sorted(set(range(m["high_water"] + 1)) | set(m["exceptions"]))

    # -- paths -------------------------------------------------------------
    def _pos_base(self, v: int) -> str:
        return os.path.join(self.path, f"positions/base/v={v}")

    def _pos_delta(self, b: int) -> str:
        return os.path.join(self.path, f"positions/deltas/b={b}")

    def _keys_root(self) -> str:
        return os.path.join(self.path, "keys")

    def _keys_dir(self, b: int) -> str:
        return os.path.join(self._keys_root(), f"b={b}")

    def _decisions_dir(self, b: int) -> str:
        return os.path.join(self.path, f"decisions/b={b}")

    # -- column helpers ------------------------------------------------------
    def _shard(self, key) -> F.Column:
        # window 7 of sha256 — independent of probe windows 0..k-1
        return (
            F.conv(F.substring(F.sha2(key, 256), 57, 8), 16, 10)
            .cast("long") % self.n_shards
        ).cast("int")

    def _positions_of(self, df: DataFrame) -> DataFrame:
        """DISTINCT (shard, p) rows for the keys of ``df``."""
        key = F.col(self.key_col)
        return (
            df.select(
                self._shard(key).alias("shard"),
                F.explode(
                    F.array_distinct(bloom_positions(key, self.m_bits, self.k))
                ).alias("p"),
            )
            .distinct()
        )

    # -- state readers -------------------------------------------------------
    def seen_positions(self) -> DataFrame | None:
        """Current folded (shard, p) set of committed batches."""
        m = self._read_meta()
        parts = []
        if m["pos_base_version"] >= 0:
            parts.append(self._pos_base(m["pos_base_version"]))
        parts.extend(self._pos_delta(b) for b in m["pos_deltas"])
        if not parts:
            return None
        return self.spark.read.parquet(*parts).distinct()

    def admitted_keys(self, shards: list[int] | None = None) -> DataFrame | None:
        """Exact admitted keys of committed batches; pass ``shards`` to
        prune the scan to those shard_pt directory partitions."""
        ids = self.committed_ids()
        if not ids:
            return None
        df = self.spark.read.option("basePath", self._keys_root()).parquet(
            *[self._keys_dir(b) for b in ids]
        )
        if shards is not None:
            df = df.where(F.col("shard_pt").isin([int(s) for s in shards]))
        return df

    # -- classify -------------------------------------------------------------
    def classify(self, batch_df: DataFrame) -> DataFrame:
        """(key, bloom_hit, truly_seen, verdict) per DISTINCT key of
        the batch, against the committed state. Fresh keys (`new`)
        read zero key-log bytes — only the maybe-seen sliver pays the
        pruned exact semi-join."""
        key = F.col(self.key_col)
        keys = batch_df.select(self.key_col).distinct().select(
            key,
            self._shard(key).alias("shard"),
            F.array_distinct(
                bloom_positions(key, self.m_bits, self.k)
            ).alias("pos"),
        )
        state = self.seen_positions()
        if state is None:
            return keys.select(
                self.key_col,
                F.lit(False).alias("bloom_hit"),
                F.lit(False).alias("truly_seen"),
                F.lit("new").alias("verdict"),
            )
        hit_marked = state.withColumn("hit", F.lit(True))
        probe = (
            keys.select(self.key_col, "shard", F.explode("pos").alias("p"))
            .join(hit_marked, ["shard", "p"], "left")
            .groupBy(self.key_col, "shard")
            .agg(F.bool_and(F.col("hit").isNotNull()).alias("bloom_hit"))
        )
        maybe = probe.where("bloom_hit")
        shards = [
            r.shard for r in maybe.select("shard").distinct().collect()
        ]
        known = self.admitted_keys(shards=shards)
        if known is None:
            checked = maybe.withColumn("truly_seen", F.lit(False))
        else:
            checked = maybe.join(
                known.select(
                    F.col(self.key_col), F.lit(True).alias("known")
                ).distinct(),
                self.key_col,
                "left",
            ).select(
                self.key_col,
                "shard",
                "bloom_hit",
                F.col("known").isNotNull().alias("truly_seen"),
            )
        out = checked.select(
            self.key_col, "bloom_hit", "truly_seen"
        ).unionByName(
            probe.where(~F.col("bloom_hit")).select(
                self.key_col,
                "bloom_hit",
                F.lit(False).alias("truly_seen"),
            )
        )
        return out.select(
            self.key_col,
            "bloom_hit",
            "truly_seen",
            F.when(~F.col("bloom_hit"), "new")
            .when(F.col("truly_seen"), "dup")
            .otherwise("false_positive")
            .alias("verdict"),
        )

    # -- ingest ---------------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Classify the batch against pre-batch state, persist the
        decisions, admit unseen keys. Replay-safe: a committed batch
        short-circuits; a torn first attempt is overwritten dir-by-dir
        before the meta pointer commits it."""
        m = self._read_meta()
        if self._committed(m, batch_id):
            return
        decisions = self.classify(batch_df).localCheckpoint()
        decisions.write.mode("overwrite").parquet(
            self._decisions_dir(batch_id)
        )
        fresh = decisions.where("NOT truly_seen").select(self.key_col)
        key = F.col(self.key_col)
        fresh.select(
            key, self._shard(key).alias("shard_pt")
        ).write.mode("overwrite").partitionBy("shard_pt").parquet(
            self._keys_dir(batch_id)
        )
        self._positions_of(fresh).write.mode("overwrite").parquet(
            self._pos_delta(batch_id)
        )
        m["pos_deltas"].append(batch_id)
        self._fold_commit(m, batch_id)
        self._write_meta(m)
        if len(m["pos_deltas"]) > self.compact_every:
            self._compact(m)

    def _compact(self, m: dict) -> None:
        """Fold position deltas into a new base; retire them. Paid once
        per compact_every batches; the keys half never compacts (it is
        read shard-pruned, and only for maybe-seen keys)."""
        folded = self.seen_positions()
        nv = m["pos_base_version"] + 1
        folded.write.mode("overwrite").parquet(self._pos_base(nv))
        old_base, old_deltas = m["pos_base_version"], list(m["pos_deltas"])
        m["pos_base_version"], m["pos_deltas"] = nv, []
        self._write_meta(m)
        if old_base >= 0:
            shutil.rmtree(self._pos_base(old_base), ignore_errors=True)
        for b in old_deltas:
            shutil.rmtree(self._pos_delta(b), ignore_errors=True)

    def decisions(self, batch_id: int) -> DataFrame:
        return self.spark.read.parquet(self._decisions_dir(batch_id))

    def sink(self):
        """foreachBatch hook: ``writeStream.foreachBatch(store.sink())``."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return _sink
