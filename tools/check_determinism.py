"""Partitioning-determinism sweep over the full driver battery.

The DuckDB oracle gate proves each query's VALUES once; this tool
proves they are a function of the DATA, not of the physical plan: every
registered query runs under two deliberately different configurations
(cores, shuffle partitions, Arrow batch size) and the canonicalized
result sets must match exactly. Catches partition-order landmines —
F.first()/collect_list without ordering, per-partition RNG, kernel
batch-shape sensitivity — that a single-run oracle comparison cannot.

Usage:
    python tools/check_determinism.py [SF_DIR] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                # round-trip-stable float key (queries emit round(.,6)
                # values; this guards against -0.0 / repr drift only)
                v = math.nan if v != v else round(v, 9)
            elif isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


def main() -> int:
    from twinspect_spark.queries import QUERIES
    from twinspect_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or sorted(QUERIES)

    configs = [
        {"cores": 8, "shuffle_partitions": 8, "arrow_batch": 10000},
        {"cores": 5, "shuffle_partitions": 7, "arrow_batch": 321},
    ]
    results: list[dict[str, list[tuple]]] = []
    for i, cfg in enumerate(configs):
        spark = get_spark(
            f"determinism_{i}",
            cores=cfg["cores"],
            shuffle_partitions=cfg["shuffle_partitions"],
        )
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(cfg["arrow_batch"]),
        )
        out = {}
        for name in names:
            try:
                out[name] = _canon(QUERIES[name](spark, sf_dir))
            except Exception as e:  # noqa: BLE001 - report, don't abort
                out[name] = [("__error__", f"{type(e).__name__}: {e}")]
        results.append(out)
        spark.stop()

    failures = 0
    for name in names:
        a, b = results[0][name], results[1][name]
        if a == b:
            print(f"OK    {name}: {len(a)} rows stable across plans")
        else:
            failures += 1
            print(f"FAIL  {name}: {len(a)} vs {len(b)} rows")
            onlya = [r for r in a if r not in b][:3]
            onlyb = [r for r in b if r not in a][:3]
            for r in onlya:
                print(f"      only@cfg0: {r}")
            for r in onlyb:
                print(f"      only@cfg1: {r}")
    print(f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
