"""TwinSpect-style effectiveness / robustness / distribution / speed
metrics, re-expressed as declarative DataFrame aggregations.

Reference semantics being reproduced (file:line in /root/reference):
- effectiveness macro-average  twinspect/metrics/eff.py:219-290
- best threshold               twinspect/metrics/utils.py:121-126
- distance distribution        twinspect/metrics/distribution.py:55-105
- robustness per-transform     twinspect/metrics/robustness.py:43-60
- speed stats                  twinspect/metrics/speed.py:25-47
- dataset info                 twinspect/datasets/info.py:9-76

The reference computes these with pandas loops over per-query neighbor
lists; here every metric is one shuffle-bounded aggregation over the
symmetric pair tables, so the same code runs at 10^12-pair scale
(partial aggregation map-side, AQE-coalesced shuffles, no driver-side
iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, *extra_cols: str) -> DataFrame:
    """(a,b,...) undirected pair table → query-centric directed table
    (query, other, ...). Both directions, as in the reference where every
    file is a query over all others (eff.py:226-243)."""
    fwd = pairs.select(
        F.col("a").alias("query"), F.col("b").alias("other"), *extra_cols
    )
    rev = pairs.select(
        F.col("b").alias("query"), F.col("a").alias("other"), *extra_cols
    )
    return fwd.unionByName(rev)


def effectiveness(
    gt_pairs: DataFrame,
    found_pairs: DataFrame,
    thresholds: list[int | float],
    distance_col: str = "distance",
) -> DataFrame:
    """Macro-averaged precision / recall / F1 at each distance threshold.

    Inputs are undirected pair tables: ``gt_pairs(a, b)`` ground truth,
    ``found_pairs(a, b, <distance_col>)`` search results. Per reference
    eff.py:244-276: per query, tp/fp/fn from the result∩truth set ops at
    each threshold; precision is averaged over queries *with results*,
    recall over queries *with ground truth* (two distinct denominators);
    F1 from the macro means; sample stddev per eff.py:293-299.

    Plan shape: one full-outer join of the two symmetrized tables on
    (query, other), exploded over thresholds, then two hash aggregations
    — no per-query loop, no collect.
    """
    gt = symmetrize(gt_pairs).withColumn("is_gt", F.lit(1))
    found = symmetrize(found_pairs, distance_col).withColumnRenamed(
        distance_col, "_dist"
    )
    joined = found.join(gt, ["query", "other"], "full_outer").select(
        "query",
        F.coalesce("is_gt", F.lit(0)).alias("is_gt"),
        "_dist",
    )
    t_df = found.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    per_q = (
        joined.crossJoin(F.broadcast(t_df))
        .groupBy("query", "threshold")
        .agg(
            F.sum(
                F.when(
                    (F.col("_dist") <= F.col("threshold"))
                    & (F.col("is_gt") == 1),
                    1,
                ).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(
                    (F.col("_dist") <= F.col("threshold"))
                    & (F.col("is_gt") == 0),
                    1,
                ).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(
                    (F.col("is_gt") == 1)
                    & (
                        F.col("_dist").isNull()
                        | (F.col("_dist") > F.col("threshold"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )  # NULL when the query returned no results at this threshold
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )  # NULL when the query has no ground truth
    agg = (
        per_q.select("threshold", prec.alias("p"), rec.alias("r"))
        .groupBy("threshold")
        .agg(
            F.round(F.avg("p"), 6).alias("avg_precision"),
            # nanvl: stddev_samp of a single value is NaN in Spark (NULL in
            # ANSI engines); normalize both to 0.0
            F.round(
                F.coalesce(F.nanvl(F.stddev_samp("p"), F.lit(0.0)), F.lit(0.0)), 6
            ).alias("std_precision"),
            F.round(F.avg("r"), 6).alias("avg_recall"),
            F.round(
                F.coalesce(F.nanvl(F.stddev_samp("r"), F.lit(0.0)), F.lit(0.0)), 6
            ).alias("std_recall"),
            F.count("p").alias("n_queries_with_results"),
            F.count("r").alias("n_queries_with_gt"),
        )
    )
    f1 = (
        2
        * F.col("avg_precision")
        * F.col("avg_recall")
        / (F.col("avg_precision") + F.col("avg_recall"))
    )
    return agg.withColumn(
        "f1",
        F.round(
            F.when(
                F.col("avg_precision") + F.col("avg_recall") > 0, f1
            ).otherwise(0.0),
            6,
        ),
    ).orderBy("threshold")


def best_threshold(eff: DataFrame) -> DataFrame:
    """argmax F1 over the effectiveness sweep (utils.py:121-126) —
    ``max_by`` keeps it a single aggregation; id tie-break on the lower
    threshold so the result is deterministic."""
    return eff.agg(
        F.max_by(
            F.struct("threshold", "avg_precision", "avg_recall", "f1"),
            F.struct(F.col("f1"), -F.col("threshold")),
        ).alias("best")
    ).select("best.*")


def distance_distribution(
    pairs: DataFrame, clusters: DataFrame, distance_col: str = "distance"
) -> DataFrame:
    """Intra- vs inter-cluster distance histogram over an (a, b, distance)
    pair table (distribution.py:55-105). Upper-triangle pairs only (the
    input is undirected, a < b), one hash aggregation."""
    ca = clusters.select(
        F.col("file_id").alias("a"), F.col("cluster_id").alias("ca")
    )
    cb = clusters.select(
        F.col("file_id").alias("b"), F.col("cluster_id").alias("cb")
    )
    return (
        pairs.join(ca, "a")
        .join(cb, "b")
        .withColumn(
            "kind",
            F.when(F.col("ca") == F.col("cb"), "intra").otherwise("inter"),
        )
        .groupBy("kind", distance_col)
        .agg(F.count("*").alias("n_pairs"))
    )


def robustness(
    files: DataFrame, pairs: DataFrame, distance_col: str = "distance"
) -> DataFrame:
    """Per-transform distance stats between each cluster's original and
    its transformed members (robustness.py:43-60): min/max/avg/median.

    ``files`` needs (file_id, cluster_id, transform, is_original); pairs
    carry distances for (original, transformed) combinations — missing
    pairs (beyond search reach) are excluded, as in the reference which
    only measures pairs it computed codes for."""
    orig = files.where("is_original").select(
        F.col("file_id").alias("a"), F.col("cluster_id").alias("cl")
    )
    trans = files.where("NOT is_original AND transform IS NOT NULL").select(
        F.col("file_id").alias("b"),
        F.col("cluster_id").alias("cl"),
        "transform",
    )
    both = symmetrize(pairs, distance_col).select(
        F.col("query").alias("a"), F.col("other").alias("b"), distance_col
    )
    matched = orig.join(trans, "cl").join(both, ["a", "b"])
    return matched.groupBy("transform").agg(
        F.count("*").alias("n_pairs"),
        F.min(distance_col).alias("min_distance"),
        F.max(distance_col).alias("max_distance"),
        F.round(F.avg(distance_col), 6).alias("avg_distance"),
        F.round(F.median(distance_col), 6).alias("median_distance"),
    )


def speed_stats(signatures: DataFrame) -> DataFrame:
    """Per-file signature throughput stats in MB/s (speed.py:25-47);
    micros is the per-row share of UDF batch wall time. Decimal MB
    (1e6 bytes), matching the reference convention bytes/ms * 1000/1e6
    (speed.py benchmark() -> utils humanization), not MiB."""
    mbps = (F.col("size") / F.lit(1e6)) / (F.col("micros") / 1e6)
    return signatures.where(F.col("micros") > 0).agg(
        F.count("*").alias("n_files"),
        F.round(F.min(mbps), 3).alias("min_mbps"),
        F.round(F.max(mbps), 3).alias("max_mbps"),
        F.round(F.avg(mbps), 3).alias("avg_mbps"),
        F.round(F.median(mbps), 3).alias("median_mbps"),
    )


def cluster_purity(pred: DataFrame, gt: DataFrame) -> DataFrame:
    """Cluster purity of a predicted clustering against ground-truth
    labels — the second half of TwinSpect's effectiveness story
    (recall@threshold + cluster purity over ground-truth-labeled
    duplicate clusters; the reference scores assignments per cluster in
    /root/reference/twinspect/metrics/eff.py).

    ``pred``: (doc_id, pred_id); ``gt``: (doc_id, gt_id). Returns one
    summary row: purity = Σ_pred max_gt |pred∩gt| / N (do predicted
    clusters mix true groups), inverse purity = Σ_gt max_pred / N (do
    true groups fragment across predictions), and their harmonic mean.

    Scale shape: one inner join on doc_id + two chained hash
    aggregations; the contingency table is bounded by cluster counts,
    never by pair counts, and every aggregate is map-side combinable.
    The final cross join is two single-row relations.
    """
    cell = (
        pred.join(gt, "doc_id")
        .groupBy("pred_id", "gt_id")
        .agg(F.count("*").alias("n"))
    )
    per_pred = cell.groupBy("pred_id").agg(
        F.sum("n").alias("sz"), F.max("n").alias("maj")
    )
    per_gt = cell.groupBy("gt_id").agg(
        F.sum("n").alias("sz"), F.max("n").alias("maj")
    )
    p = per_pred.agg(
        F.count("*").alias("n_pred_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        (F.sum("maj") * F.lit(1.0) / F.sum("sz")).alias("_p"),
    )
    ip = per_gt.agg(
        F.count("*").alias("n_gt_clusters"),
        (F.sum("maj") * F.lit(1.0) / F.sum("sz")).alias("_ip"),
    )
    return p.crossJoin(ip).select(
        "n_docs",
        "n_pred_clusters",
        "n_gt_clusters",
        F.round("_p", 6).alias("purity"),
        F.round("_ip", 6).alias("inverse_purity"),
        F.round(
            F.lit(2.0) * F.col("_p") * F.col("_ip")
            / (F.col("_p") + F.col("_ip")),
            6,
        ).alias("f_purity"),
    )


def dataset_info(clusters: DataFrame) -> DataFrame:
    """Corpus shape stats (info.py:9-76) from a (file_id, cluster_id)
    assignment: totals, dup-cluster count and size stats, singleton
    ('distractor') count/ratio. Two chained aggregations."""
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.sum("sz").alias("n_files"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).alias("n_dup_clusters"),
        F.coalesce(
            F.min(F.when(F.col("sz") > 1, F.col("sz"))), F.lit(0)
        ).alias("min_cluster_size"),
        F.coalesce(
            F.max(F.when(F.col("sz") > 1, F.col("sz"))), F.lit(0)
        ).alias("max_cluster_size"),
        F.round(
            F.coalesce(F.avg(F.when(F.col("sz") > 1, F.col("sz"))), F.lit(0.0)),
            6,
        ).alias("avg_cluster_size"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0)).alias("n_singletons"),
    ).withColumn(
        "singleton_ratio",
        F.round(F.col("n_singletons") / F.col("n_files"), 6),
    )
