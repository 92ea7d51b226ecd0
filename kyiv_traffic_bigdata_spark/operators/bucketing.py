"""Bucketed co-located joins — the shuffle-free path for repeated big
joins (SURVEY scale posture; no single reference operator, this is the
Spark-native answer to "join two 100 TB tables every day").

A fact table written with ``bucketBy(n, key)`` + ``sortBy(key)`` is
physically hash-partitioned AND sorted on disk. Two tables bucketed on
the join key with the SAME bucket count sort-merge-join with **zero
Exchange** — the layout is the shuffle, paid once at write time and
amortized over every subsequent join/aggregate on that key. (Local
per-side Sorts remain: Spark 4 trusts bucket sort metadata only behind
``spark.sql.legacy.bucketedTableScan.outputOrdering``; those are
spill-aware in-executor sorts, not network shuffles.)
That is the single biggest repeated-cost lever at the 100 TB target:
the shuffle of the fact table is the bottleneck, and bucketing deletes
it from the steady-state plan (pinned by tests/test_plans.py).

Bucketed writes require the table catalog (``saveAsTable``): the bucket
spec lives in table metadata, which plain ``parquet(path)`` writes have
no place to record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sorted_by: list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and by default sorted) on ``keys``.

    ``buckets`` should divide evenly into the cluster's parallelism and
    keep each bucket's share of the table inside one executor's memory —
    at 100 TB that means thousands of buckets, set once per table.

    The repartition onto the bucket spec before writing matters twice:
    it yields ONE file per bucket instead of (#tasks × #buckets) small
    files, and Spark only elides the join-side Sort when every bucket is
    a single file (multi-file buckets cannot be assumed globally sorted).
    """
    (
        df.repartition(buckets, *[df[k] for k in keys])
        .write.bucketBy(buckets, *keys)
        .sortBy(*(sorted_by or keys))
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With the
    layouts aligned, Catalyst plans a sort-merge join with no Exchange
    and no Sort on either side — verify with .explain(); the plan-shape
    test pins it."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
