"""Unit coverage for the event-query pieces the round-1 verdict flagged
as signal-free: P10 speed bucketing, U2 union shape, and the pinned
EVENT_TYPES pivot domain (the silent-drift guard ADVICE asked for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.functions.geo import speed_bucket
from kyiv_traffic_bigdata_spark.queries import EVENT_TYPES, q_event_union
from kyiv_traffic_bigdata_spark.tables import load_table


def test_speed_bucket_boundaries(spark):
    """P10 (visualize.py speed categories): half-open [lo, hi) buckets,
    boundary values land in the upper bucket."""
    df = spark.createDataFrame(
        [(0.0,), (9.999,), (10.0,), (19.999,), (20.0,), (29.999,), (30.0,),
         (39.999,), (40.0,), (1000.0,)],
        "v double",
    )
    got = [r.b for r in df.select(speed_bucket(F.col("v")).alias("b")).collect()]
    assert got == [
        "lt10", "lt10", "lt20", "lt20", "lt30", "lt30", "lt40",
        "lt40", "ge40", "ge40",
    ]


def test_event_union_shape_and_distinct(spark, sf_dir):
    """U2: the union must contain exactly the purchase ∪ error rows, each
    once (distinct), and nothing else."""
    out = q_event_union(spark, sf_dir)
    assert out.columns == ["event_id", "user_id", "event_type"]
    rows = out.collect()
    assert len(rows) == len({tuple(r) for r in rows})  # distinct
    assert {r.event_type for r in rows} <= {"purchase", "error"}
    ev = load_table(spark, sf_dir, "events")
    expect = ev.where(
        F.col("event_type").isin("purchase", "error")
    ).select("event_id").distinct().count()
    assert len(rows) == expect


def test_event_type_domain_matches_pinned_list(spark, sf_dir):
    """The pivot's pinned value list silently drops unlisted types (both
    in Spark and in the oracle SQL) — so domain drift must fail HERE,
    loudly, instead of vanishing from both sides of the correctness gate."""
    ev = load_table(spark, sf_dir, "events")
    stray = ev.where(~F.col("event_type").isin(*EVENT_TYPES)).count()
    assert stray == 0, (
        f"{stray} events have an event_type outside the pinned "
        f"EVENT_TYPES {EVENT_TYPES}; extend the list (and SQL_PIVOT) "
        "or the pivot silently drops them"
    )
