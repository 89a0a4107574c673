"""Dump `.explain("formatted")` for every registered query to a directory.

Usage: python tools/dump_plans.py <out_dir> [--suffix _before] [query ...]

Writes <out_dir>/<query><suffix>.txt per query. Builders that execute during
build (streaming) still dump the plan of the frame they return; the builder
runtime itself is measured by bench.py, not here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    out_dir = args[0]
    only = set(args[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from dexscraper_spark import TABLES
    from dexscraper_spark.plans.registry import queries
    from dexscraper_spark.session import get_spark
    from dexscraper_spark.sources.tables import load_table

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).cache().count()

    for name, build in queries().items():
        if only and name not in only:
            continue
        try:
            df = build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:
            plan = f"ERROR building {name}: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
