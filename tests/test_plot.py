"""SVG plot rendering (reference render/plot.py analog)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from twinspect_spark.plot import (
    grouped_bar_chart,
    humanize,
    line_chart,
    plot_distance_distribution,
    plot_effectiveness,
)


def _parse(svg: str) -> ET.Element:
    return ET.fromstring(svg)  # raises on malformed XML


def test_humanize():
    assert humanize(950) == "950.0"
    assert humanize(1234567) == "1.2M"
    assert humanize(-2_500_000_000) == "-2.5B"


def test_line_chart_wellformed_and_labeled():
    rows = [
        {"threshold": t, "p": 1.0 - t / 40, "r": t / 32}
        for t in range(0, 17, 4)
    ]
    svg = line_chart(rows, "threshold", ["p", "r"], "sweep", y_label="score")
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    polys = root.findall(f"{ns}polyline")
    assert len(polys) == 2
    texts = [t.text for t in root.iter(f"{ns}text")]
    # legend + direct end-label per series → each name appears twice
    assert texts.count("p") == 2 and texts.count("r") == 2
    assert "sweep" in texts


def test_line_chart_series_cap():
    rows = [{"x": 0, "a": 1, "b": 1, "c": 1, "d": 1}]
    try:
        line_chart(rows, "x", ["a", "b", "c", "d"], "too many")
    except ValueError as e:
        assert "at most" in str(e)
    else:
        raise AssertionError("expected ValueError for >3 series")


def test_grouped_bar_chart_marks_and_tooltips():
    rows = [
        {"d": d, "kind": k, "n": 10 * (d + 1) * (1 if k == "intra" else 3)}
        for d in range(4)
        for k in ("intra", "inter")
    ]
    svg = grouped_bar_chart(rows, "d", "kind", "n", "dist")
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    bars = [
        r for r in root.iter(f"{ns}rect")
        if r.find(f"{ns}title") is not None
    ]
    assert len(bars) == 8  # one mark per (x, group), each with a tooltip


def test_write_run_artifacts(spark, tmp_path):
    from twinspect_spark import DedupConfig
    from twinspect_spark.corpus import generate_corpus
    from twinspect_spark.pipeline import run_dedup
    from twinspect_spark.report import write_run_artifacts

    corpus = generate_corpus(
        n_clusters=8, transforms_per_original=2, n_distractors=20, seed=7
    )
    cfg = DedupConfig(jaccard_threshold=0.7)
    res = run_dedup(spark.createDataFrame(corpus.files), cfg)
    paths = write_run_artifacts(res, str(tmp_path), cfg)
    assert len(paths) == 3
    md = open(paths[0]).read()
    assert "Cluster-size histogram" in md and "config fingerprint" in md
    for svg_path in paths[1:]:
        _parse(open(svg_path).read())


def test_plot_effectiveness_from_metrics(spark):
    from twinspect_spark.metrics import distance_distribution, effectiveness

    gt = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    found = spark.createDataFrame(
        [(1, 2, 1), (3, 5, 2)], "a long, b long, distance int"
    )
    eff = effectiveness(gt, found, [0, 1, 2, 3])
    svg = plot_effectiveness(eff)
    _parse(svg)
    assert "avg_precision" in svg and "f1" in svg

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)],
        "file_id long, cluster_id long",
    )
    dist = distance_distribution(found, clusters)
    svg2 = plot_distance_distribution(dist)
    _parse(svg2)
    assert "intra" in svg2 or "inter" in svg2


def test_ann_recall_curve_plot(spark):
    """The calibration chart renders from the real report table."""
    from twinspect_spark.plot import plot_ann_recall_curve
    from twinspect_spark.queries import QUERIES

    rep = QUERIES["ann_recall_report"](spark, "/root/testdata/sf0.001")
    svg = plot_ann_recall_curve(rep)
    root = _parse(svg)
    assert root.tag.endswith("svg")
    assert "macro_recall" in svg and "nprobe" in svg


def test_tier_distribution_chart(spark):
    from twinspect_spark.plot import plot_tier_distribution

    rows = [
        ("exact", 16), ("near", 457), ("chunk", 371),
        ("cdc", 1934), ("unique", 2184),
    ]
    df = spark.createDataFrame(rows, "tier string, n_docs long")
    svg = plot_tier_distribution(df)
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    rects = [r for r in root.iter(f"{ns}rect")]
    assert len(rects) >= 5  # one bar per tier (+ legend swatch)
    texts = [t.text for t in root.iter(f"{ns}text") if t.text]
    # rank prefixes pin ladder order on the x axis
    assert any(t.startswith("1. exact") for t in texts)
    assert any(t.startswith("6. cdc") for t in texts)


def test_pq_recall_curve_plot(spark):
    """The PQ calibration chart renders from the real report table."""
    from twinspect_spark.plot import plot_pq_recall_curve
    from twinspect_spark.queries import QUERIES

    rep = QUERIES["pq_recall_report"](spark, "/root/testdata/sf0.001")
    svg = plot_pq_recall_curve(rep)
    root = _parse(svg)
    assert root.tag.endswith("svg")
    assert "macro_recall" in svg and "rerank" in svg


def test_activity_heatmap_svg(spark, tmp_path):
    from twinspect_spark.plot import plot_activity_heatmap, write_svg
    from twinspect_spark.queries import q_events_hour_heatmap

    grid = q_events_hour_heatmap(spark, "/root/testdata/sf0.001")
    svg = plot_activity_heatmap(grid)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "hour of day" in svg and "ISO weekday" in svg
    # one rect per populated cell plus the surface rect
    n_cells = grid.count()
    assert svg.count("<rect") == n_cells + 1
    # values only printed when the grid is small; 7x24 is not
    assert svg.count("text-anchor=\"middle\"") >= 24  # x labels + title row
    out = str(tmp_path / "heat.svg")
    write_svg(out, svg)
    assert open(out).read() == svg


def test_heatmap_small_grid_prints_values():
    from twinspect_spark.plot import heatmap_chart

    rows = [
        {"x": a, "y": b, "v": a * 3 + b}
        for a in range(3)
        for b in range(3)
    ]
    svg = heatmap_chart(rows, "x", "y", "v", "T", "xl", "yl")
    # 9 cells + surface, and every value printed (grid <= 64 cells)
    assert svg.count("<rect") == 10
    assert svg.count("font-size=\"10\"") >= 9
