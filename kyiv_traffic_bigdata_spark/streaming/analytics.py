"""Streaming analytics + dimension refresh — SURVEY §2.8 ST2 and the
event-time window extension.

The reference has NO event-time windows (its 5-s flush is processing-time
batching); tumbling/sliding per-key stats over the position stream are the
idiomatic Spark generalization the SURVEY §2.8 note calls for — marked
extension, watermarked on **ingest time** (device timestamps are years
stale, ST4).

ST2 (30-s routes poll, reference ``kpt/poller/poller.py:136-189``) maps to
a rate-source-driven ``foreachBatch`` that invokes an injected fetcher and
appends timestamped snapshots; the batch read side
(``sources.kpt.read_routes``) already reduces snapshots last-write-wins,
so the refresher only ever appends — no read-modify-write races, and at
scale the dimension history doubles as a slowly-changing-dimension log.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEDUP_TTL_S, ROUTES_POLL_INTERVAL_S


def windowed_position_stats(
    positions: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark_s: int = DEDUP_TTL_S,
    ts_col: str = "ingest_ts",
    key_col: str = "route_id",
) -> DataFrame:
    """Tumbling (or sliding) per-key event-time stats over the stream.

    Watermark bounds state: windows older than the watermark finalize and
    evict. Count + approx-distinct only — both merge associatively, so the
    aggregation is map-side partial then one shuffle on (window, key).
    """
    grouped = positions.withWatermark(ts_col, f"{watermark_s} seconds").groupBy(
        F.window(F.col(ts_col), window, slide or window),
        F.col(key_col),
    )
    return grouped.agg(
        F.count(F.lit(1)).alias("n_positions"),
        F.approx_count_distinct("vehicle_id").alias("n_vehicles"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        key_col,
        "n_positions",
        "n_vehicles",
    )


def start_routes_refresher(
    spark: SparkSession,
    fetch_routes: Callable[[], list[dict]],
    out_path: str,
    checkpoint_path: str,
    interval_s: int = ROUTES_POLL_INTERVAL_S,
) -> StreamingQuery:
    """ST2: poll the (injected) route-catalog fetcher every ``interval_s``
    and append a timestamped snapshot partition.

    The rate source provides the trigger clock + exactly-once batch ids;
    the fetcher is driver-side (a 179-row REST call — there is nothing to
    distribute). Failures in one poll fail that micro-batch and retry on
    the next trigger, mirroring the reference's skip-and-continue loop.
    """
    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def poll(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        routes = fetch_routes()
        if not routes:
            return
        snapshot = spark.createDataFrame(
            [(int(batch_id), r["id"], r["type"], r["number"]) for r in routes],
            "poll_number long, id long, type int, number string",
        ).withColumn("poll_ts", F.current_timestamp())
        snapshot.write.mode("append").parquet(out_path)

    return (
        ticks.writeStream.foreachBatch(poll)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{interval_s} seconds")
        .start()
    )


def latest_routes_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Read-side reduce of the refresher's append log: current catalog =
    max_by over (poll_ts, poll_number) per route id (same last-write-wins
    contract as sources.kpt.read_routes)."""
    snaps = spark.read.parquet(path)
    return (
        snaps.groupBy("id")
        .agg(
            F.max_by(
                F.struct("type", "number"), F.struct("poll_ts", "poll_number")
            ).alias("s")
        )
        .select("id", "s.type", "s.number")
    )
