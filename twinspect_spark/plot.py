"""SVG charts for the run report — the reference's matplotlib plot
family re-expressed without a plotting dependency (matplotlib is not in
this runtime; the charts are deterministic standalone SVG strings).

Reference parity: ``plot_effectiveness`` mirrors
twinspect/render/plot.py:183-260 (precision/recall/F1 vs threshold
lines) and ``plot_distance_distribution`` mirrors
twinspect/render/plot.py:51-147 (intra- vs inter-cluster distance
histogram, separated series). ``humanize`` mirrors ``big_num``
(plot.py:27-32) and closes the SURVEY SF8 humanize gap.

Like report.py, plotting is legitimately driver-side: inputs are
finished metric aggregates (a handful of rows), so the bounded
``collect`` here is correct, not a scale smell.

Design notes (dataviz method): one y-axis per chart, categorical series
colors in fixed slot order (blue #2a78d6, orange #eb6834, aqua #1baf7a —
a validated CVD-safe triple on the light surface), 2px line marks, a
legend plus direct end-labels for every series (the aqua slot sits below
3:1 contrast, so identity never rides on color alone), recessive grid,
native ``<title>`` tooltips on bar marks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# categorical slots 1-3 (validated: worst pair CVD dE 9.2, normal 27.6)
_SERIES = ("#2a78d6", "#eb6834", "#1baf7a")
_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_INK2 = "#52514e"
_GRID = "#e5e4e0"

_W, _H = 640, 360
_ML, _MR, _MT, _MB = 56, 110, 40, 44  # right margin holds direct labels


def humanize(num: float) -> str:
    """1234567 → '1.2M' (reference big_num, plot.py:27-32)."""
    for unit in ("", "K", "M", "B", "T"):
        if abs(num) < 1000:
            return f"{num:.1f}{unit}"
        num /= 1000
    return f"{num:.1f}P"


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n round-valued axis ticks covering [lo, hi]."""
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / n
    mag = 10 ** int(f"{raw:e}".split("e")[1])
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    t = []
    v = (lo // step) * step
    while v <= hi + step * 1e-9:
        if v >= lo - step * 1e-9:
            t.append(round(v, 10))
        v += step
    return t or [lo, hi]


def _frame(title: str, x_label: str, y_label: str,
           xticks: list[tuple[float, str]], yticks: list[tuple[float, str]],
           body: list[str]) -> str:
    """Shared chart chrome: surface, title, recessive grid, one x and one
    y axis with tick labels, then the mark body."""
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {_W} {_H}" '
        f'font-family="sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="{_SURFACE}"/>',
        f'<text x="{_ML}" y="24" font-size="15" fill="{_INK}" '
        f'font-weight="600">{_esc(title)}</text>',
    ]
    for px, _ in xticks:
        parts.append(
            f'<line x1="{px:.1f}" y1="{_MT}" x2="{px:.1f}" '
            f'y2="{_MT + ph}" stroke="{_GRID}" stroke-width="1"/>'
        )
    for py, lab in yticks:
        parts.append(
            f'<line x1="{_ML}" y1="{py:.1f}" x2="{_ML + pw}" y2="{py:.1f}" '
            f'stroke="{_GRID}" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{_ML - 6}" y="{py + 4:.1f}" font-size="11" '
            f'fill="{_INK2}" text-anchor="end">{_esc(lab)}</text>'
        )
    for px, lab in xticks:
        parts.append(
            f'<text x="{px:.1f}" y="{_MT + ph + 16}" font-size="11" '
            f'fill="{_INK2}" text-anchor="middle">{_esc(lab)}</text>'
        )
    parts.append(
        f'<line x1="{_ML}" y1="{_MT + ph}" x2="{_ML + pw}" y2="{_MT + ph}" '
        f'stroke="{_INK2}" stroke-width="1"/>'
    )
    parts.append(
        f'<text x="{_ML + pw / 2:.1f}" y="{_H - 8}" font-size="12" '
        f'fill="{_INK2}" text-anchor="middle">{_esc(x_label)}</text>'
    )
    parts.append(
        f'<text x="14" y="{_MT + ph / 2:.1f}" font-size="12" fill="{_INK2}" '
        f'text-anchor="middle" '
        f'transform="rotate(-90 14 {_MT + ph / 2:.1f})">{_esc(y_label)}</text>'
    )
    parts += body
    parts.append("</svg>")
    return "\n".join(parts)


def line_chart(
    rows: list[dict],
    x: str,
    series: list[str],
    title: str,
    x_label: str | None = None,
    y_label: str = "",
) -> str:
    """Multi-series line chart over small in-memory rows (sorted by x).
    One y-axis; each series gets a fixed-order categorical color, a 2px
    polyline, and a direct label at its right end (legend + label, so
    identity is never color-alone)."""
    if len(series) > len(_SERIES):
        raise ValueError(
            f"at most {len(_SERIES)} series per chart (got {len(series)}); "
            "facet into multiple charts instead"
        )
    rows = sorted(rows, key=lambda r: r[x])
    xs = [float(r[x]) for r in rows]
    ys = [float(r[s]) for s in series for r in rows if r[s] is not None]
    if not xs or not ys:
        return _frame(title, x_label or x, y_label, [], [], [])
    xt = _ticks(min(xs), max(xs))
    yt = _ticks(min(0.0, min(ys)), max(ys))
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    x0, x1 = min(xs + xt), max(xs + xt)
    y0, y1 = min(yt), max(yt)

    def sx(v: float) -> float:
        return _ML + (v - x0) / (x1 - x0 or 1) * pw

    def sy(v: float) -> float:
        return _MT + ph - (v - y0) / (y1 - y0 or 1) * ph

    body = []
    ends: list[tuple[float, int, str]] = []  # (end_y, series_idx, name)
    for i, s in enumerate(series):
        color = _SERIES[i]
        pts = [
            (sx(float(r[x])), sy(float(r[s])))
            for r in rows
            if r[s] is not None
        ]
        if not pts:
            continue
        path = " ".join(f"{px:.1f},{py:.1f}" for px, py in pts)
        body.append(
            f'<polyline points="{path}" fill="none" stroke="{color}" '
            f'stroke-width="2" stroke-linejoin="round"/>'
        )
        ends.append((pts[-1][1], i, s))
        # legend row (top-right)
        ly = _MT + 14 * i
        body.append(
            f'<rect x="{_W - _MR + 8}" y="{ly - 8}" width="10" height="10" '
            f'rx="2" fill="{color}"/>'
        )
        body.append(
            f'<text x="{_W - _MR + 22}" y="{ly + 1}" font-size="11" '
            f'fill="{_INK2}">{_esc(s)}</text>'
        )
    # direct end-labels (relief rule for low-contrast slots), pushed
    # apart >=12px when series converge at the right edge
    ends.sort()
    placed = -1e9
    for ey, _i, s in ends:
        ly = max(ey + 4, placed + 12)
        placed = ly
        body.append(
            f'<text x="{_ML + pw + 6:.1f}" y="{ly:.1f}" font-size="11" '
            f'fill="{_INK}">{_esc(s)}</text>'
        )
    return _frame(
        title, x_label or x, y_label,
        [(sx(v), f"{v:g}") for v in xt],
        [(sy(v), f"{v:g}") for v in yt],
        body,
    )


def grouped_bar_chart(
    rows: list[dict],
    x: str,
    group: str,
    y: str,
    title: str,
    x_label: str | None = None,
    y_label: str = "",
) -> str:
    """Grouped bars: one cluster per x value, one 4px-rounded baseline-
    anchored bar per group member, 2px surface gap between adjacent
    bars, native <title> tooltip per mark."""
    groups = sorted({r[group] for r in rows})
    if len(groups) > len(_SERIES):
        raise ValueError(f"at most {len(_SERIES)} groups (got {len(groups)})")
    xvals = sorted({r[x] for r in rows})
    lookup = {(r[x], r[group]): float(r[y]) for r in rows}
    ymax = max(lookup.values(), default=1.0)
    yt = _ticks(0.0, ymax)
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    y1 = max(yt)

    def sy(v: float) -> float:
        return _MT + ph - v / (y1 or 1) * ph

    slot = pw / max(len(xvals), 1)
    bw = max(2.0, (slot - 4) / len(groups) - 2)  # 2px inter-bar gap
    body = []
    xticks = []
    # label at most ~12 x positions to avoid collisions
    stride = max(1, len(xvals) // 12)
    for xi, xv in enumerate(xvals):
        cx = _ML + slot * (xi + 0.5)
        if xi % stride == 0:
            xticks.append((cx, f"{xv:g}" if isinstance(xv, float) else str(xv)))
        for gi, g in enumerate(groups):
            v = lookup.get((xv, g))
            if v is None:
                continue
            bx = cx - (len(groups) * (bw + 2) - 2) / 2 + gi * (bw + 2)
            by = sy(v)
            h = _MT + ph - by
            body.append(
                f'<rect x="{bx:.1f}" y="{by:.1f}" width="{bw:.1f}" '
                f'height="{max(h, 0):.1f}" rx="2" fill="{_SERIES[gi]}">'
                f"<title>{_esc(g)} {x}={_esc(xv)}: {humanize(v)}</title>"
                f"</rect>"
            )
    for gi, g in enumerate(groups):
        ly = _MT + 14 * gi
        body.append(
            f'<rect x="{_W - _MR + 8}" y="{ly - 8}" width="10" height="10" '
            f'rx="2" fill="{_SERIES[gi]}"/>'
        )
        body.append(
            f'<text x="{_W - _MR + 22}" y="{ly + 1}" font-size="11" '
            f'fill="{_INK2}">{_esc(g)}</text>'
        )
    return _frame(
        title, x_label or x, y_label, xticks,
        [(sy(v), humanize(v)) for v in yt], body,
    )


def plot_effectiveness(eff: DataFrame, title: str = "Effectiveness") -> str:
    """effectiveness() sweep table → precision/recall/F1 vs threshold
    lines (reference plot_effectiveness, plot.py:183-260)."""
    rows = [r.asDict() for r in eff.limit(500).collect()]
    return line_chart(
        rows,
        x="threshold",
        series=["avg_precision", "avg_recall", "f1"],
        title=title,
        x_label="threshold",
        y_label="macro-averaged score",
    )


def plot_distance_distribution(
    dist: DataFrame,
    distance_col: str = "distance",
    title: str = "Distance distribution",
) -> str:
    """distance_distribution() table → intra vs inter grouped histogram
    (reference plot_distribution_separated, plot.py:51-147)."""
    rows = [r.asDict() for r in dist.limit(2000).collect()]
    return grouped_bar_chart(
        rows,
        x=distance_col,
        group="kind",
        y="n_pairs",
        title=title,
        x_label=distance_col,
        y_label="pairs",
    )


def plot_ann_recall_curve(
    report: DataFrame, title: str = "IVF recall vs nprobe"
) -> str:
    """ann_recall_report table → macro recall@k vs nprobe line — the
    index-calibration chart (companion to queries.q_ann_recall_report;
    no reference analog: the reference's searcher is exact, so its plot
    family never needed a recall curve)."""
    from pyspark.sql import functions as F

    macro = (
        report.groupBy("nprobe")
        .agg(F.round(F.avg("recall"), 6).alias("macro_recall"))
        .orderBy("nprobe")
    )
    rows = [r.asDict() for r in macro.limit(64).collect()]
    return line_chart(
        rows,
        x="nprobe",
        series=["macro_recall"],
        title=title,
        x_label="nprobe (cells probed)",
        y_label="macro recall@k",
    )


def plot_pq_recall_curve(
    report: DataFrame, title: str = "PQ recall vs rerank width"
) -> str:
    """pq_recall_report table → macro recall@k vs rerank width line —
    the calibration chart for the PQ ladder (0 = ADC-only): shows what
    the exact-rerank stage buys and where it saturates."""
    from pyspark.sql import functions as F

    macro = (
        report.groupBy("rerank")
        .agg(F.round(F.avg("recall"), 6).alias("macro_recall"))
        .orderBy("rerank")
    )
    rows = [r.asDict() for r in macro.limit(64).collect()]
    return line_chart(
        rows,
        x="rerank",
        series=["macro_recall"],
        title=title,
        x_label="rerank width (0 = ADC-only)",
        y_label="macro recall@k",
    )


# ladder order, strongest evidence first (queries.q_dedup_tier_assignment)
_TIER_ORDER = ("exact", "rename", "near", "containment", "chunk", "cdc",
               "unique")


def plot_tier_distribution(
    report: DataFrame, title: str = "Dedup tier ladder"
) -> str:
    """dedup_tier_report table → documents-per-tier bars in ladder
    order (strongest first) — the one-glance routing readout of the
    tiered scrub (no reference analog: the reference has a single
    match tier). Rank prefixes pin the x order (grouped_bar_chart
    sorts x values)."""
    rows = [r.asDict() for r in report.limit(16).collect()]
    rank = {t: i for i, t in enumerate(_TIER_ORDER)}
    data = [
        {
            "tier": f"{rank.get(r['tier'], len(_TIER_ORDER)) + 1}. "
                    f"{r['tier']}",
            "kind": "docs",
            "n": int(r["n_docs"]),
        }
        for r in rows
    ]
    return grouped_bar_chart(
        data,
        x="tier",
        group="kind",
        y="n",
        title=title,
        x_label="tier (strongest first)",
        y_label="documents",
    )


def heatmap_chart(
    rows: list[dict],
    x: str,
    y: str,
    v: str,
    title: str,
    x_label: str,
    y_label: str,
) -> str:
    """Grid heatmap: x/y categorical axes, single-hue sequential fill
    (light surface → slot-1 blue; a LUMINANCE ramp, so magnitude reads
    without color vision), per-cell native <title> tooltips and the
    value printed in each cell when the grid is small enough. Pure
    standalone SVG like every chart here."""
    xs = sorted({r[x] for r in rows})
    ys = sorted({r[y] for r in rows})
    vmax = max((r[v] for r in rows), default=1) or 1
    gw, gh = _W - _ML - _MR, _H - _MT - _MB
    cw, ch = gw / max(len(xs), 1), gh / max(len(ys), 1)
    cells = {(r[x], r[y]): r[v] for r in rows}
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="{_SURFACE}"/>',
        f'<text x="{_ML}" y="24" font-size="15" fill="{_INK}">'
        f"{_esc(title)}</text>",
    ]
    for yi, yv in enumerate(ys):
        for xi, xv in enumerate(xs):
            val = cells.get((xv, yv))
            if val is None:
                continue
            t = val / vmax
            # luminance ramp surface→blue: interpolate each channel
            c = tuple(
                round(a + (b - a) * t)
                for a, b in ((252, 42), (252, 120), (251, 214))
            )
            px = _ML + xi * cw
            py = _MT + yi * ch
            parts.append(
                f'<rect x="{px:.1f}" y="{py:.1f}" width="{cw:.1f}" '
                f'height="{ch:.1f}" fill="rgb{c}">'
                f"<title>{_esc(str(xv))} × {_esc(str(yv))}: "
                f"{humanize(val)}</title></rect>"
            )
            if len(xs) * len(ys) <= 64:
                ink = _INK if t < 0.55 else _SURFACE
                parts.append(
                    f'<text x="{px + cw / 2:.1f}" y="{py + ch / 2 + 4:.1f}"'
                    f' font-size="10" fill="{ink}" text-anchor="middle">'
                    f"{humanize(val)}</text>"
                )
    for xi, xv in enumerate(xs):
        parts.append(
            f'<text x="{_ML + xi * cw + cw / 2:.1f}" y="{_H - _MB + 16}"'
            f' font-size="10" fill="{_INK2}" text-anchor="middle">'
            f"{_esc(str(xv))}</text>"
        )
    for yi, yv in enumerate(ys):
        parts.append(
            f'<text x="{_ML - 8}" y="{_MT + yi * ch + ch / 2 + 4:.1f}"'
            f' font-size="10" fill="{_INK2}" text-anchor="end">'
            f"{_esc(str(yv))}</text>"
        )
    parts.append(
        f'<text x="{_ML + gw / 2:.1f}" y="{_H - 8}" font-size="11" '
        f'fill="{_INK2}" text-anchor="middle">{_esc(x_label)}</text>'
    )
    parts.append(
        f'<text x="14" y="{_MT + gh / 2:.1f}" font-size="11" '
        f'fill="{_INK2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {_MT + gh / 2:.1f})">'
        f"{_esc(y_label)}</text>"
    )
    parts.append("</svg>")
    return "".join(parts)


def plot_activity_heatmap(
    grid: DataFrame, title: str = "Activity heatmap"
) -> str:
    """events_hour_heatmap table → isodow × hour event-count heatmap —
    the ops-dashboard grid as a standalone SVG (no reference analog:
    the reference renders static matplotlib figures; this family is
    dependency-free)."""
    rows = [
        {"hour": int(r["hour"]), "dow": int(r["isodow"]),
         "n": int(r["n_events"])}
        for r in grid.limit(7 * 24).collect()
    ]
    return heatmap_chart(
        rows,
        x="hour",
        y="dow",
        v="n",
        title=title,
        x_label="hour of day",
        y_label="ISO weekday",
    )


def write_svg(path: str, svg: str) -> None:
    with open(path, "w") as f:
        f.write(svg)
