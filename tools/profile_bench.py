"""Phase-split profiler for the bench floor: for each registered query,
measure t_build (Python-side plan construction, i.e. py4j chatter +
Catalyst analysis triggered lazily) vs t_exec (execution + Arrow fetch).

Usage: python tools/profile_bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from dexscraper_spark import TABLES
    from dexscraper_spark.plans.registry import queries
    from dexscraper_spark.session import get_spark
    from dexscraper_spark.sources.tables import load_table

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).cache().count()
    warm = spark.range(1).toDF("msg_id")
    warm.mapInPandas(lambda it: it, schema="msg_id long").count()

    rows = []
    for name, build in queries().items():
        if only and name not in only:
            continue
        best = None
        for _ in range(2):
            t0 = time.time()
            df = build(spark, sf_dir)
            t1 = time.time()
            # force analysis explicitly so we can split it out
            df.schema
            t2 = time.time()
            try:
                df.toPandas()
            except Exception:
                df.collect()
            t3 = time.time()
            cur = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
            if best is None or cur[3] < best[3]:
                best = cur
        rows.append((name, *best))

    rows.sort(key=lambda r: -r[4])
    print(f"{'query':35s} {'build':>7s} {'analyz':>7s} {'exec':>7s} {'total':>7s}")
    for name, b, a, e, tot in rows:
        print(f"{name:35s} {b:7.3f} {a:7.3f} {e:7.3f} {tot:7.3f}")
    print(f"{'TOTAL':35s} {sum(r[1] for r in rows):7.3f} "
          f"{sum(r[2] for r in rows):7.3f} {sum(r[3] for r in rows):7.3f} "
          f"{sum(r[4] for r in rows):7.3f}")


if __name__ == "__main__":
    main()
