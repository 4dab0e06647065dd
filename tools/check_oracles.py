"""Differential check of __spark_entry__.queries() vs oracle_sql() via
DuckDB, mimicking the driver's CORRECTNESS gate (row count + column names
+ order-insensitive values).  Run: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def main(sf_dir: str = "/root/testdata/sf0.01",
         only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from outliertree_spark.session import get_spark

    spark = get_spark(app="oracle-check", master="local[8]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    n_fail = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            res = con.sql(oracles[name])
            drows = res.fetchall()
            dcols = res.columns
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        cs = canon([tuple(r) for r in srows], scols)
        cd = canon(drows, dcols)
        ok_vals = cs == cd
        # Type-kind check: the driver's value hash is sensitive to pandas
        # dtype (int64 1 vs float64 1.0 hash differently even though they
        # compare equal in Python) — mirror that with a numeric-kind probe
        # on the first row of each canonical result.
        ok_kinds = True
        if ok_vals and cs:
            for a, b in zip(cs[0], cd[0]):
                ka = "f" if isinstance(a, float) else (
                    "i" if isinstance(a, int) and not isinstance(a, bool)
                    else "o")
                kb = "f" if isinstance(b, float) else (
                    "i" if isinstance(b, int) and not isinstance(b, bool)
                    else "o")
                if ka != kb:
                    ok_kinds = False
        if ok_cols and ok_count and ok_vals and not ok_kinds:
            n_fail += 1
            print(f"FAIL  {name}: value types differ (driver hash would "
                  f"mismatch): spark={cs[0]} duck={cd[0]}")
            continue
        if ok_cols and ok_count and ok_vals:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            n_fail += 1
            print(f"FAIL  {name}: cols={ok_cols} count={ok_count} "
                  f"({len(srows)} vs {len(drows)}) vals={ok_vals}")
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}")
                print(f"      duck  cols: {sorted(dcols)}")
            if ok_cols and not ok_vals:
                diff_a = [r for r in cs if r not in set(map(repr, cd)) and repr(r) not in set(map(repr, cd))]
                sa, sd_ = set(map(repr, cs)), set(map(repr, cd))
                only_a = [r for r in cs if repr(r) not in sd_][:3]
                only_d = [r for r in cd if repr(r) not in sa][:3]
                print(f"      spark-only: {only_a}")
                print(f"      duck-only:  {only_d}")
    spark.stop()
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return n_fail


if __name__ == "__main__":
    _args = sys.argv[1:]
    _sf = _args[0] if _args and "/" in _args[0] else "/root/testdata/sf0.01"
    _only = [a for a in _args if "/" not in a] or None
    sys.exit(main(_sf, _only))
