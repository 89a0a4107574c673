"""Local correctness gate — mimics the driver's DuckDB cross-check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares:
  * row count
  * sorted column-name list
  * order-insensitive value comparison (rows sorted; exact for
    ints/strings, tiny-epsilon report for floats so we can spot
    nondeterministic aggregation before the driver does)

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(rows, columns):
    """Sort columns by name, then rows; floats → repr (bit-exact compare)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(out, key=lambda r: tuple(repr(x) for x in r)), [columns[i] for i in order]


def values_equal(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # driver hashes exactly → demand bit equality
    return a == b


def compare(name, spark_df, con, sql, verbose=False):
    t0 = time.time()
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.execute(sql)
    du_cols = [d[0] for d in res.description]
    du_rows = res.fetchall()
    t_duck = time.time() - t0

    problems = []
    if len(sp_rows) != len(du_rows):
        problems.append(f"rowcount spark={len(sp_rows)} duckdb={len(du_rows)}")
    if sorted(sp_cols) != sorted(du_cols):
        problems.append(f"columns spark={sorted(sp_cols)} duckdb={sorted(du_cols)}")
    if not problems:
        sp_norm, cols = normalize(sp_rows, sp_cols)
        du_norm, _ = normalize(du_rows, du_cols)
        mismatch = 0
        for i, (sr, dr) in enumerate(zip(sp_norm, du_norm)):
            for j, (a, b) in enumerate(zip(sr, dr)):
                if not values_equal(a, b):
                    mismatch += 1
                    if mismatch <= 3:
                        problems.append(f"row {i} col {cols[j]}: spark={a!r} duckdb={b!r}")
        if mismatch > 3:
            problems.append(f"... {mismatch} mismatched cells total")
    status = "OK " if not problems else "FAIL"
    print(f"[{status}] {name:34s} rows={len(sp_rows):6d} spark={t_spark:6.2f}s duck={t_duck:6.2f}s")
    for p in problems:
        print(f"       {p}")
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dexscraper_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    ok = fail = skip = 0
    for name, build in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            df = build(spark, sf_dir)
            n = df.count()
            print(f"[rows] {name:34s} rows={n:6d} (no oracle — rows-only check)")
            skip += 1
            continue
        try:
            if compare(name, build(spark, sf_dir), con, oracles[name]):
                ok += 1
            else:
                fail += 1
        except Exception as e:
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
