"""Incremental embedding ingest + ANN search over a cell-partitioned
vector store — the streaming half of the IVF path (operators/ann.py).

A 100 TB embedding corpus is not re-indexed per batch: the coarse
quantizer is trained once and persisted (cached_ivf_centroids, the
reference's index-cache idiom, /root/reference/twinspect/metrics/
hamming.py:278-305), and each arriving micro-batch is ASSIGNED to its
cell and appended — per-batch cost tracks |batch|, never |store|.
Search fans a query out to its ``nprobe`` nearest cells and reads ONLY
those cells' directories (cell is a directory-partition column, so the
scan is partition-pruned — asserted in tests).

Store layout (same protocol family as incremental.py's store v2):

  cells/batch_id=<id>/cell=<c>/   vector rows of one committed batch
  _meta.json                      O(1) commit record: format version,
                                  high-water mark (all ids <= hwm
                                  committed) + small exception list,
                                  rewritten atomically (tmp+rename)

Batch writes are batch-scoped ``mode("overwrite")`` into their own
directory, committed to _meta strictly after the data write — a
Structured Streaming foreachBatch replay overwrites the same directory
and re-commits the same id: exactly-once effective state.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STORE_FORMAT = 1
_META = "_meta.json"


class VectorStore:
    """Cell-partitioned incremental vector store + IVF search."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: np.ndarray,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        codebooks: np.ndarray | None = None,
    ):
        """``codebooks`` (operators/pq.py train_pq_codebooks output)
        turns this into an IVF-ADC store: ingest additionally writes
        the PQ codes column, and search_adc scans CODES ONLY in the
        probed cells (the fat embedding column is column-pruned out of
        the scan) before an exact rerank. A store written with codes
        must be reopened with codebooks and vice versa (pq flag in the
        commit record guards the mismatch)."""
        self.spark = spark
        self.path = path
        self.centroids = np.ascontiguousarray(centroids, dtype=np.float64)
        self.id_col = id_col
        self.vec_col = vec_col
        self.codebooks = codebooks
        os.makedirs(path, exist_ok=True)

    # -- commit record ------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, _META)

    def _read_meta(self) -> dict:
        p = self._meta_path()
        if not os.path.exists(p):
            return {"format": STORE_FORMAT, "hwm": -1, "extra": []}
        with open(p) as f:
            m = json.load(f)
        if m.get("format") != STORE_FORMAT:
            raise ValueError(
                f"vector store at {self.path} has format {m.get('format')};"
                f" this build reads format {STORE_FORMAT} — rebuild"
            )
        if m.get("pq", False) != (self.codebooks is not None):
            raise ValueError(
                f"vector store at {self.path} was written with pq="
                f"{m.get('pq', False)}; reopen it with matching codebooks"
            )
        return m

    def _write_meta(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".meta.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._meta_path())  # atomic on POSIX

    def _commit(self, batch_id: int) -> None:
        m = self._read_meta()
        extra = set(m["extra"])
        if batch_id > m["hwm"]:
            extra.add(batch_id)
        # absorb any consecutive run into the high-water mark so the
        # record stays O(1) in batch count
        hwm = m["hwm"]
        while hwm + 1 in extra:
            hwm += 1
            extra.discard(hwm)
        self._write_meta(
            {
                "format": STORE_FORMAT,
                "hwm": hwm,
                "extra": sorted(extra),
                "pq": self.codebooks is not None,
            }
        )

    def committed_ids(self) -> list[int]:
        m = self._read_meta()
        return list(range(m["hwm"] + 1)) + list(m["extra"])

    # -- ingest -------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: assign each vector to its nearest cell and
        write the batch's rows under its own directory, partitioned by
        cell. Replay-safe: the batch-scoped overwrite + re-commit of the
        same id is a no-op on effective state."""
        from twinspect_spark.operators.ann import make_cell_assign_udf

        assign = make_cell_assign_udf(self.centroids, 1)
        cols = [
            F.col(self.id_col),
            F.col(self.vec_col),
            F.element_at(assign(F.col(self.vec_col)), 1).alias("cell"),
        ]
        if self.codebooks is not None:
            from twinspect_spark.operators.pq import pq_encode_udf

            enc = pq_encode_udf(self.codebooks)
            cols.append(enc(F.col(self.vec_col)).alias("codes"))
        rows = batch_df.select(*cols)
        dest = os.path.join(self.path, f"cells/batch_id={batch_id}")
        rows.write.mode("overwrite").partitionBy("cell").parquet(dest)
        self._commit(batch_id)  # marker strictly AFTER the data write

    def sink(self):
        """The function to hand to ``writeStream.foreachBatch``."""
        return lambda df, bid: self.process_batch(df, int(bid))

    def compact(self) -> int:
        """Merge all committed batch directories into a single base
        batch (id 0) — the LSM compaction that keeps the read fan-in
        bounded on a long-running stream (same idiom as
        incremental.py's snapshot resolve). Write-then-commit ordering:
        the merged directory is written under a fresh batch id ABOVE the
        current high-water mark first, then _meta is atomically rewritten
        to point only at it, then stale directories are removed — a crash
        at any point leaves a readable store. Returns rows compacted."""
        import shutil

        ids = self.committed_ids()
        if len(ids) <= 1:
            return 0
        merged = self.read()
        n = merged.count()
        # generations live at NEGATIVE ids: they can never collide with a
        # future Structured Streaming batch id (always >= 0), and each
        # compaction writes a FRESH directory (one below the oldest
        # generation) so a live base is never overwritten in place
        gen = min(-1, min(ids) - 1)
        gen_dir = os.path.join(self.path, f"cells/batch_id={gen}")
        merged.write.mode("overwrite").partitionBy("cell").parquet(gen_dir)
        # single atomic switch: the store points only at the merged
        # generation — no window where it reads empty or half-swapped
        self._write_meta(
            {
                "format": STORE_FORMAT,
                "hwm": -1,
                "extra": [gen],
                "pq": self.codebooks is not None,
            }
        )
        for b in ids:  # stale dirs are uncommitted leftovers from here on
            d = os.path.join(self.path, f"cells/batch_id={b}")
            if os.path.exists(d):
                shutil.rmtree(d)
        return n

    # -- read / search ------------------------------------------------
    def read(self) -> DataFrame:
        ids = self.committed_ids()
        if not ids:
            raise ValueError(f"vector store at {self.path} is empty")
        paths = [
            os.path.join(self.path, f"cells/batch_id={b}") for b in ids
        ]
        # basePath keeps `cell` as a partition column across batch dirs
        return self.spark.read.option(
            "basePath", os.path.join(self.path, "cells")
        ).parquet(*paths)

    def search(
        self, queries: DataFrame, k: int = 10, nprobe: int = 2
    ) -> DataFrame:
        """→ (q_id, neighbor_id, cosine): top-k per query, scanning only
        the probed cells' directories. The cell `isin` predicate lands in
        the scan's PartitionFilters — bytes read scale with the probed
        cells, not the store."""
        from pyspark.sql import Window as W

        from twinspect_spark.operators.ann import (
            _cosine_udf,
            make_cell_assign_udf,
        )

        assign = make_cell_assign_udf(self.centroids, nprobe)
        q = queries.select(
            F.col(self.id_col).alias("q_id"),
            F.col(self.vec_col).alias("q_vec"),
            F.explode(assign(F.col(self.vec_col))).alias("cell"),
        )
        probed = [r.cell for r in q.select("cell").distinct().collect()]
        data = self.read().where(F.col("cell").isin(probed))
        cos = _cosine_udf()
        pairs = (
            q.join(data, "cell")
            .where(F.col(self.id_col) != F.col("q_id"))
            .select(
                "q_id",
                F.col(self.id_col).alias("neighbor_id"),
                cos(F.col("q_vec"), F.col(self.vec_col)).alias("cosine"),
            )
            # no dedupe needed: each data vector lives in exactly ONE
            # cell (ingest assigns nprobe=1), so a (q_id, neighbor)
            # pair can only arise from that one cell
        )
        w = W.partitionBy("q_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
        )

    def search_adc(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 2,
        rerank: int = 50,
    ) -> DataFrame:
        """→ (q_id, neighbor_id, dist): IVF-ADC over the incremental
        store — the scan reads ONLY the probed cells' directories
        (partition-pruned) and ONLY the codes column (the fat embedding
        column is pruned from the ADC scan's ReadSchema), then the
        top-``rerank`` shortlist is exactly re-scored with integer L2
        against raw vectors read from the SAME probed cells. dist is
        the exact quantized squared L2 (operators/pq.py grid)."""
        from pyspark.sql import Window as W

        from twinspect_spark.operators.pq import (
            pq_adc_score,
            pq_exact_rerank,
            pq_query_luts,
        )

        if self.codebooks is None:
            raise ValueError("search_adc needs a store built with codebooks")
        qpdf = queries.select(
            F.col(self.id_col), F.col(self.vec_col)
        ).toPandas()
        luts, qids = pq_query_luts(
            qpdf, self.codebooks, id_col=self.id_col, vec_col=self.vec_col
        )
        # probe cells driver-side (the query panel is metric-sized, the
        # centroid matrix already lives on the driver)
        Q = np.vstack(qpdf[self.vec_col].to_numpy()).astype(np.float64)
        Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        S = Q @ self.centroids.T
        order = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
        probe = self.spark.createDataFrame(
            [
                (int(q), int(c))
                for q, row in zip(qids, order)
                for c in row
            ],
            "q_id long, cell int",
        )
        probed = sorted({int(c) for row in order for c in row})
        data = self.read().where(F.col("cell").isin(probed))
        cand = (
            F.broadcast(probe)
            .join(
                data.select(self.id_col, "cell", "codes"),
                "cell",
            )
            .where(F.col(self.id_col) != F.col("q_id"))
            .select("q_id", self.id_col, "codes")
        )
        scored = pq_adc_score(cand, luts, qids, id_col=self.id_col)
        w = W.partitionBy("q_id").orderBy(
            F.asc("dist"), F.asc("neighbor_id")
        )
        shortlist = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= rerank)
            .select("q_id", "neighbor_id")
        )
        emb = data.select(self.id_col, self.vec_col)
        return pq_exact_rerank(
            shortlist, emb, qpdf, k,
            id_col=self.id_col, vec_col=self.vec_col,
        )
