"""Benchmark harness: runs the registered query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full physical
plan executes; nothing is collected to the driver beyond what the query
itself collects). A shared SparkSession amortizes JVM startup — the same
posture as a long-running cluster, which is what the 100 TB target is.
"""

from __future__ import annotations

import json
import os
import sys
import time

from kyiv_traffic_bigdata_spark.queries import QUERIES
from kyiv_traffic_bigdata_spark.session import get_spark
from kyiv_traffic_bigdata_spark.tables import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def infer_sf(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("bench")
    # warm the JVM, codegen compiler, and every table's file listing +
    # footer metadata once so per-query numbers measure the queries, not
    # session bootstrap — the long-running-cluster posture the 100 TB
    # target implies. count() touches parquet footers/row-group stats
    # only, no data pages. load_table knows the events nanos quirk.
    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": infer_sf(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
