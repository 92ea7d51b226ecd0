"""Star-schema table loader for the driver's testdata.

The driver generates TPC-H-ish parquet (``region nation customer supplier
part orders lineitem events documents embeddings``, see TESTDATA.md). This
module is the single place that knows two quirks:

* ``events.ts`` is parquet INT64 TIMESTAMP(NANOS), which Spark refuses to
  read natively — we flip ``spark.sql.legacy.parquet.nanosAsLong`` and
  expose BOTH the raw nanos (``ts_ns``), exact micros (``ts_us``, integer
  division, never double math: int64 nanos exceed 2^53) and a proper
  ``TimestampType`` column (``ts``) for event-time windowing.
* all other timestamp columns are micro/milli precision and read natively.

Scale note: loaders only attach metadata / cheap projections — no caching,
no collect. Partition layout is whatever the parquet files carry; at 100 TB
the same code path reads a date-partitioned table directory unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing the events timestamp."""
    if name == "events":
        # INT64 TIMESTAMP(NANOS) → LongType nanos. Session-level legacy
        # conf; harmless for every other table in this repo.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            # integer division: exact for any int64; double division is NOT.
            .withColumn("ts_us", F.expr("ts_ns div 1000"))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
