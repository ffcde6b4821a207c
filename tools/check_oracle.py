"""Local emulation of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() in DuckDB
over the same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal

import duckdb


def _norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _canon_type(t: str) -> str:
    """Collapse Spark SQL / DuckDB-Arrow type names to one vocabulary so the
    local gate catches the driver's type-sensitive hash divergences (e.g.
    DuckDB sum() -> HUGEINT arriving as decimal128(38,0) vs Spark BIGINT)."""
    t = t.lower()
    for pat, out in [
        ("bigint", "i64"), ("int64", "i64"),
        ("smallint", "i16"), ("int16", "i16"),
        ("tinyint", "i8"), ("int8", "i8"),
        ("interval", "interval"),  # before bare "int": Arrow interval types
        ("int32", "i32"), ("integer", "i32"), ("int", "i32"),
        ("double", "f64"), ("float64", "f64"),
        ("float32", "f32"), ("float", "f32"),
        ("decimal", "decimal"), ("hugeint", "decimal"),
        ("large_string", "str"), ("string", "str"), ("varchar", "str"),
        ("bool", "bool"),
        ("timestamp", "ts"), ("date", "date"),
        ("large_list", "list"), ("list", "list"), ("array", "list"),
        ("large_binary", "bin"), ("binary", "bin"),
    ]:
        if t.startswith(pat):
            return out
    return t


def _type_mismatches(scols, sdtypes, arrow_schema) -> list[str]:
    spark_t = {c: _canon_type(t) for c, t in sdtypes}
    duck_t = {f.name: _canon_type(str(f.type)) for f in arrow_schema}
    return [
        f"{c}: spark={spark_t[c]} duckdb={duck_t[c]}"
        for c in scols
        if c in duck_t and spark_t[c] != duck_t[c]
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from twinspect_spark.session import get_spark

    spark = get_spark("check_oracle", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            atable = res.fetch_arrow_table()
            dcols = atable.column_names
            drows = [
                tuple(row[c] for c in dcols) for row in atable.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and _canon(srows, scols) == _canon(drows, dcols)
        ty_bad = _type_mismatches(scols, sdtypes, atable.schema) if ok_cols else []
        if ok_cols and ok_count and ok_vals and not ty_bad:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            failures += 1
            print(
                f"FAIL  {name}: cols={ok_cols} count={ok_count} "
                f"({len(srows)} vs {len(drows)}) vals={ok_vals} types={not ty_bad}"
            )
            for m in ty_bad:
                print(f"      type mismatch {m}")
            if ok_cols and ok_count and not ok_vals:
                a = _canon(srows, scols)
                b = _canon(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"      spark:  {x}\n      duckdb: {y}")
            elif not ok_cols:
                print(f"      spark cols:  {sorted(scols)}\n      duckdb cols: {sorted(dcols)}")
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
