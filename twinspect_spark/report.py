"""Markdown run report — the reference's results renderer re-expressed
(twinspect/render/results.py:230-273 builds per-benchmark markdown
tables of effectiveness/robustness/speed; docs/results.md is its
output).

Reporting is the one legitimately driver-side stage: every input here is
a finished metric aggregate (a handful of rows), so ``collect`` is
correct, not a scale smell. The heavy lifting happened upstream in the
distributed aggregations (metrics.py); this module only formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def humanize(n: float | int) -> str:
    """Big-number display formatting (SF8 analog — the reference's
    render/plot.py:26-31 humanizes counts for chart labels): 1234567 →
    '1.23M'. Reporting-layer only; data-plane values stay numeric."""
    n = float(n)
    for div, suffix in [(1e12, "T"), (1e9, "B"), (1e6, "M"), (1e3, "k")]:
        if abs(n) >= div:
            return f"{n / div:.3g}{suffix}"
    return f"{n:g}"


def df_to_markdown(
    df: DataFrame, max_rows: int = 100, humanize_cols: set[str] | None = None
) -> str:
    """Render a small (metric-sized) DataFrame as a GitHub markdown
    table; truncates at ``max_rows`` with an explicit footer so silent
    truncation can't read as completeness. Columns named in
    ``humanize_cols`` render through humanize()."""
    cols = df.columns
    rows = df.limit(max_rows + 1).collect()
    trunc = len(rows) > max_rows
    rows = rows[:max_rows]

    def fmt(v, c: str = "") -> str:
        if v is None:
            return ""
        if humanize_cols and c in humanize_cols and isinstance(v, (int, float)):
            return humanize(v)
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    out = ["| " + " | ".join(cols) + " |",
           "|" + "|".join("---" for _ in cols) + "|"]
    out += ["| " + " | ".join(fmt(r[c], c) for c in cols) + " |" for r in rows]
    if trunc:
        out.append(f"\n_… truncated at {max_rows} rows_")
    return "\n".join(out)


def render_run_report(
    title: str,
    sections: dict[str, DataFrame],
    stage_seconds: dict[str, float] | None = None,
    config_fingerprint: str | None = None,
) -> str:
    """Assemble the run report: one `##` section per named metric table
    (insertion order preserved), plus optional stage timings and the
    config fingerprint that keys the checkpoint manifest."""
    parts = [f"# {title}", ""]
    if config_fingerprint:
        parts += [f"config fingerprint: `{config_fingerprint}`", ""]
    if stage_seconds:
        parts += ["## Stage timings", ""]
        parts += ["| stage | seconds |", "|---|---|"]
        parts += [f"| {k} | {v} |" for k, v in stage_seconds.items()]
        parts += [""]
    for name, df in sections.items():
        parts += [f"## {name}", "", df_to_markdown(df), ""]
    return "\n".join(parts)


def write_report(path: str, content: str) -> None:
    with open(path, "w") as f:
        f.write(content)


def write_run_artifacts(res, out_dir: str, cfg) -> list[str]:
    """Render the full run-report family for a finished DedupResult:
    ``report.md`` (metric tables + stage timings) plus the two reference
    plot analogs as SVG (distance distribution; cluster-size histogram
    as a single-series bar chart). Returns the written paths. The
    effectiveness sweep needs ground-truth labels production runs don't
    have, so it is rendered by the benchmark harness instead."""
    import os

    from pyspark.sql import functions as F

    from twinspect_spark.metrics import dataset_info, distance_distribution
    from twinspect_spark.plot import (
        grouped_bar_chart,
        plot_distance_distribution,
        write_svg,
    )

    os.makedirs(out_dir, exist_ok=True)
    verified = res.pairs.where("verified").select(
        "a", "b",
        F.round((1 - F.col("jaccard")) * 64).cast("int").alias("distance"),
    )
    clusters = res.clusters.select("file_id", "cluster_id")
    dist = distance_distribution(verified, clusters).localCheckpoint()
    info = dataset_info(clusters)
    size_hist = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )
    md = render_run_report(
        "Dedup run report",
        {
            "Dataset info": info,
            "Cluster-size histogram": size_hist,
            "Distance distribution": dist.orderBy("kind", "distance"),
        },
        stage_seconds=res.stage_seconds,
        config_fingerprint=cfg.fingerprint(),
    )
    paths = []
    p = os.path.join(out_dir, "report.md")
    write_report(p, md)
    paths.append(p)
    p = os.path.join(out_dir, "distance_distribution.svg")
    write_svg(p, plot_distance_distribution(dist))
    paths.append(p)
    rows = [
        {"cluster_size": r["cluster_size"], "kind": "clusters",
         "n": r["n_clusters"]}
        for r in size_hist.limit(500).collect()
    ]
    p = os.path.join(out_dir, "cluster_sizes.svg")
    write_svg(
        p,
        grouped_bar_chart(
            rows, "cluster_size", "kind", "n", "Cluster sizes",
            y_label="clusters",
        ),
    )
    paths.append(p)
    return paths
