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


def df_to_markdown(df: DataFrame, max_rows: int = 100) -> str:
    """Render a small (metric-sized) DataFrame as a GitHub markdown
    table; truncates at ``max_rows`` with an explicit footer so silent
    truncation can't read as completeness."""
    cols = df.columns
    rows = df.limit(max_rows + 1).collect()
    trunc = len(rows) > max_rows
    rows = rows[:max_rows]

    def fmt(v) -> str:
        if v is None:
            return ""
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    out = ["| " + " | ".join(cols) + " |",
           "|" + "|".join("---" for _ in cols) + "|"]
    out += ["| " + " | ".join(fmt(r[c]) for c in cols) + " |" for r in rows]
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
