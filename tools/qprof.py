"""Ad-hoc single-query profiler: time one registry entry (or an inline
variant registered below) warm, min-of-N, with per-run times printed.

Usage: python tools/qprof.py q05_region_revenue [more...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), QPROF_RUNS (default 5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mapwarper_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("qprof", sf_dir=sf_dir)
    spark.range(1000).selectExpr("sum(id) AS s").write.mode(
        "overwrite"
    ).format("noop").save()
    from pyspark.sql.functions import pandas_udf

    ident = pandas_udf(lambda s: s, "long")
    spark.range(100).select(ident("id").alias("x")).write.mode(
        "overwrite"
    ).format("noop").save()

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    n = int(os.environ.get("QPROF_RUNS", "5"))
    for name in sys.argv[1:]:
        fn = queries[name]
        runs = []
        for _ in range(n):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(runs)} runs={runs}")


if __name__ == "__main__":
    main()
