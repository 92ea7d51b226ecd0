"""Tests for streaming event-time windows and the ST2 dimension refresher."""

from __future__ import annotations

import pytest

import time

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.streaming.analytics import (
    latest_routes_snapshot,
    start_routes_refresher,
    windowed_position_stats,
)
from kyiv_traffic_bigdata_spark.streaming.ingest import (
    ingest_transform,
    replay_text_stream,
)


def test_windowed_stats_streaming_end_to_end(spark, tmp_path):
    """File-replay positions → 5-min tumbling per-route counts, run with
    availableNow into a memory sink."""
    src = tmp_path / "src"
    src.mkdir()
    lines = [
        f'42["locations",["{v},7,50.45,30.52,0,0,{1_770_000_000 + v}"]]'
        for v in range(1, 6)
    ] + ['42["locations",["9,8,50.46,30.53,0,0,1770000100"]]']
    (src / "a.txt").write_text("\n".join(lines) + "\n")

    raw = replay_text_stream(spark, str(src))
    positions = ingest_transform(raw, dedup_ttl_s=None)
    stats = windowed_position_stats(positions, window="5 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("winstats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # append mode only emits finalized windows; ingest_ts is wall-clock so
    # the single open window is still unfinalized — assert via a batch
    # re-aggregation of the same transform instead, then the schema shape.
    got = spark.sql("select * from winstats")
    assert got.columns == [
        "window_start", "window_end", "route_id", "n_positions", "n_vehicles",
    ]
    batch = spark.read.text(str(src))
    batch_stats = windowed_position_stats(
        ingest_transform(batch, dedup_ttl_s=None), window="5 minutes"
    )
    rows = {r.route_id: r for r in batch_stats.collect()}
    assert rows[7].n_positions == 5 and rows[7].n_vehicles == 5
    assert rows[8].n_positions == 1


def test_routes_refresher_appends_and_reduces(spark, tmp_path):
    calls = []

    def fake_fetch():
        calls.append(1)
        n = len(calls)
        # catalog evolves: route 2's number changes on later polls
        return [
            {"id": 1, "type": 1, "number": "1"},
            {"id": 2, "type": 3, "number": f"99-v{n}"},
        ]

    out, ckpt = str(tmp_path / "routes"), str(tmp_path / "ckpt")
    q = start_routes_refresher(spark, fake_fetch, out, ckpt, interval_s=1)
    try:
        # wait on durable output (stop() may abort an in-flight poll write)
        deadline = time.time() + 120
        committed = 0
        while time.time() < deadline and committed < 4:
            time.sleep(0.5)
            try:
                committed = spark.read.parquet(out).count()
            except Exception:
                committed = 0
    finally:
        q.stop()
    snaps = spark.read.parquet(out)
    assert snaps.count() >= 4  # at least two full polls landed

    latest = {r.id: r for r in latest_routes_snapshot(spark, out).collect()}
    assert set(latest) == {1, 2}
    last_poll = max(r.poll_number for r in snaps.select("poll_number").collect())
    committed_calls = snaps.select("poll_number").distinct().count()
    assert committed_calls >= 2
    # last write wins: the surviving number is the one from the max poll
    survivor_version = {
        r.poll_number: r.number
        for r in snaps.where(F.col("id") == 2).collect()
    }[last_poll]
    assert latest[2].number == survivor_version
    assert latest[1].number == "1"


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks within 60 s after an error
    by the same user, across two file-replayed streams — the streaming
    twin of the batch clicks_after_error interval join."""
    from kyiv_traffic_bigdata_spark.streaming.joins import stream_interval_join

    ldir, rdir = tmp_path / "err", tmp_path / "clk"
    ldir.mkdir(); rdir.mkdir()
    (ldir / "a.jsonl").write_text(
        '{"user_id": 1, "err_ts": "2026-01-01T00:00:00"}\n'
        '{"user_id": 2, "err_ts": "2026-01-01T00:05:00"}\n'
    )
    (rdir / "a.jsonl").write_text(
        '{"user_id": 1, "clk_ts": "2026-01-01T00:00:30"}\n'   # in window
        '{"user_id": 1, "clk_ts": "2026-01-01T00:02:00"}\n'   # too late
        '{"user_id": 2, "clk_ts": "2026-01-01T00:04:00"}\n'   # before error
        '{"user_id": 2, "clk_ts": "2026-01-01T00:05:10"}\n'   # in window
        '{"user_id": 3, "clk_ts": "2026-01-01T00:00:10"}\n'   # no error side
    )
    errs = (
        spark.readStream.schema("user_id long, err_ts timestamp")
        .json(str(ldir))
    )
    clicks = (
        spark.readStream.schema("user_id long, clk_ts timestamp")
        .json(str(rdir))
    )
    joined = stream_interval_join(
        errs, clicks, key="user_id", left_ts="err_ts", right_ts="clk_ts",
        max_delay_s=60,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, str(r.clk_ts)) for r in spark.sql("select * from ssjoin").collect()
    }
    assert got == {
        (1, "2026-01-01 00:00:30"),
        (2, "2026-01-01 00:05:10"),
    }


def test_stream_interval_join_rejects_same_ts_name(spark):
    from kyiv_traffic_bigdata_spark.streaming.joins import stream_interval_join

    df = spark.range(1).select("id", F.current_timestamp().alias("ts"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stream_interval_join(df, df, key="id", left_ts="ts", right_ts="ts", max_delay_s=1)


@pytest.mark.slow
def test_stream_stream_join_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Join state must survive a query restart via the checkpoint: a left
    row ingested in run 1 still matches a right row arriving in run 2,
    and run-1 matches are not re-emitted."""
    from kyiv_traffic_bigdata_spark.streaming.joins import stream_interval_join

    ldir, rdir = tmp_path / "err", tmp_path / "clk"
    ldir.mkdir(); rdir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    (ldir / "a.jsonl").write_text('{"user_id": 1, "err_ts": "2026-01-01T00:00:00"}\n')
    (rdir / "a.jsonl").write_text('{"user_id": 1, "clk_ts": "2026-01-01T00:00:10"}\n')

    out = str(tmp_path / "out")

    def run():
        # file sink, not memory: only fault-tolerant sinks may resume
        # from a checkpoint
        errs = spark.readStream.schema("user_id long, err_ts timestamp").json(str(ldir))
        clicks = spark.readStream.schema("user_id long, clk_ts timestamp").json(str(rdir))
        joined = stream_interval_join(
            errs, clicks, key="user_id", left_ts="err_ts", right_ts="clk_ts",
            max_delay_s=60,
        )
        q = (
            joined.writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.user_id, str(r.clk_ts)) for r in spark.read.parquet(out).collect()
        )

    assert run() == [(1, "2026-01-01 00:00:10")]

    # run 2: a NEW right-side event matching the run-1 left row; the
    # restarted query must join it against run-1's checkpointed state
    # and must NOT re-emit the run-1 pair
    (rdir / "b.jsonl").write_text('{"user_id": 1, "clk_ts": "2026-01-01T00:00:30"}\n')
    assert run() == [
        (1, "2026-01-01 00:00:10"),
        (1, "2026-01-01 00:00:30"),
    ]


def test_streaming_dimension_upsert_sink(spark, tmp_path):
    """Streaming MERGE: two micro-batches of keyed updates roll the
    versioned snapshot forward; last-write-wins inside a batch, upsert
    across batches, pointer always names a complete snapshot."""
    import json

    from kyiv_traffic_bigdata_spark.streaming.analytics import (
        current_dimension_version,
        read_current_dimension,
        start_dimension_upsert_sink,
    )

    src = tmp_path / "updates"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def write_batchfile(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )

    # batch 1: ids 1..3, with an intra-batch dup on id 2 (ver decides)
    write_batchfile(
        "b1.json",
        [
            {"id": 1, "val": "a", "ver": 1},
            {"id": 2, "val": "old", "ver": 1},
            {"id": 2, "val": "new", "ver": 2},
            {"id": 3, "val": "c", "ver": 1},
        ],
    )
    stream = (
        spark.readStream.schema("id long, val string, ver long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_dimension_upsert_sink(
        stream, store, ["id"], ckpt, order_col="ver", trigger_s=1
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and current_dimension_version(store) is None:
            time.sleep(0.5)
        assert current_dimension_version(store) is not None
        snap1 = {
            r.id: r.val for r in read_current_dimension(spark, store).collect()
        }
        assert snap1 == {1: "a", 2: "new", 3: "c"}

        # batch 2: update id 1, insert id 4
        v_before = current_dimension_version(store)
        write_batchfile(
            "b2.json",
            [{"id": 1, "val": "a2", "ver": 3}, {"id": 4, "val": "d", "ver": 1}],
        )
        while time.time() < deadline and current_dimension_version(store) == v_before:
            time.sleep(0.5)
        snap2 = {
            r.id: r.val for r in read_current_dimension(spark, store).collect()
        }
        assert snap2 == {1: "a2", 2: "new", 3: "c", 4: "d"}
    finally:
        q.stop()


def test_upsert_store_orphan_version_invisible(spark, tmp_path):
    """Crash consistency: a version dir written without a pointer
    advance (death between write and commit) is invisible garbage —
    the reader keeps serving the committed snapshot."""
    import os

    from kyiv_traffic_bigdata_spark.streaming.analytics import (
        current_dimension_version,
        read_current_dimension,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    committed = spark.createDataFrame([(1, "a")], "id long, val string")
    committed.write.parquet(os.path.join(store, "v0"))
    with open(os.path.join(store, "_CURRENT"), "w") as f:
        f.write("v0")
    # orphan: a half-finished v1 with different content, no pointer move
    spark.createDataFrame([(1, "CRASHED")], "id long, val string").write.parquet(
        os.path.join(store, "v1")
    )
    assert current_dimension_version(store) == "v0"
    got = read_current_dimension(spark, store).collect()
    assert [(r.id, r.val) for r in got] == [(1, "a")]


@pytest.mark.slow
def test_prune_dimension_versions(spark, tmp_path):
    import os

    from kyiv_traffic_bigdata_spark.streaming.analytics import (
        prune_dimension_versions,
        read_current_dimension,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    for i in (0, 1, 2, 3):
        spark.createDataFrame([(i,)], "id long").write.parquet(
            os.path.join(store, f"v{i}")
        )
    with open(os.path.join(store, "_CURRENT"), "w") as f:
        f.write("v3")
    # orphan beyond the pointer: crashed write
    spark.createDataFrame([(9,)], "id long").write.parquet(
        os.path.join(store, "v9")
    )
    # default never touches dirs newer than the pointer (they might be
    # a LIVE in-flight write, not a crashed one)
    removed = prune_dimension_versions(store, keep=2)
    assert sorted(removed) == ["v0", "v1"]
    assert sorted(os.listdir(store)) == ["_CURRENT", "v2", "v3", "v9"]
    # offline maintenance may reap the orphan explicitly
    removed = prune_dimension_versions(store, keep=2, remove_orphans=True)
    assert removed == ["v9"]
    assert sorted(os.listdir(store)) == ["_CURRENT", "v2", "v3"]
    assert read_current_dimension(spark, store).collect()[0].id == 3
    # keep=0 degenerates to keep-current-only
    removed = prune_dimension_versions(store, keep=0)
    assert removed == ["v2"]


def test_stream_static_enrich_end_to_end(spark, tmp_path):
    """Streaming positions x static route dim: every emitted row carries
    the dimension columns; unmatched keys survive the left join."""
    from kyiv_traffic_bigdata_spark.streaming.joins import stream_static_enrich

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"vehicle_id": 1, "route_id": 7}\n{"vehicle_id": 2, "route_id": 99}\n'
    )
    dim = spark.createDataFrame(
        [(7, "Bus", "42")], "route_id long, route_type string, number string"
    )
    stream = spark.readStream.schema("vehicle_id long, route_id long").json(
        str(src)
    )
    out = stream_static_enrich(stream, dim, ["route_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.vehicle_id: r for r in spark.sql("select * from enriched").collect()}
    assert rows[1].route_type == "Bus" and rows[1].number == "42"
    assert rows[2].route_type is None  # left join keeps unmatched


def test_prune_snapshots_keeps_current_and_newest(tmp_path):
    """Retention GC: newest `keep` versions survive, the _CURRENT target
    survives regardless of age, everything else is removed."""
    import os

    from kyiv_traffic_bigdata_spark.operators.maintenance import prune_snapshots

    store = tmp_path / "dim"
    store.mkdir()
    for b in (1, 2, 3, 7, 10):
        d = store / f"v{b}"
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    # pointer pinned to an OLD version (reader lag scenario)
    (store / "_CURRENT").write_text("v2")

    removed = prune_snapshots(str(store), keep=2)
    assert sorted(removed) == ["v1", "v3"]
    left = sorted(p.name for p in store.iterdir() if p.is_dir())
    assert left == ["v10", "v2", "v7"]  # newest 2 + the pinned current
    assert (store / "_CURRENT").read_text() == "v2"

    # pruning again is a no-op; keep=1 drops v7 but never the current
    assert prune_snapshots(str(store), keep=2) == []
    assert prune_snapshots(str(store), keep=1) == ["v7"]
    assert sorted(p.name for p in store.iterdir() if p.is_dir()) == ["v10", "v2"]


def test_sliding_windows_streaming_end_to_end(spark, tmp_path):
    """Hopping (sliding) variant of the windowed stats: the same
    streaming graph runs with slide < window, and the batch twin shows
    every position contributing to exactly window/slide = 2 windows —
    the overlap contract behind the batch hopping_stats operator."""
    src = tmp_path / "src_slide"
    src.mkdir()
    lines = [
        f'42["locations",["{v},7,50.45,30.52,0,0,{1_770_000_000 + v}"]]'
        for v in range(1, 6)
    ]
    (src / "a.txt").write_text("\n".join(lines) + "\n")

    raw = replay_text_stream(spark, str(src))
    positions = ingest_transform(raw, dedup_ttl_s=None)
    stats = windowed_position_stats(
        positions, window="5 minutes", slide="150 seconds"
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("slidestats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert spark.sql("select * from slidestats").columns == [
        "window_start", "window_end", "route_id", "n_positions", "n_vehicles",
    ]
    batch = spark.read.text(str(src))
    batch_stats = windowed_position_stats(
        ingest_transform(batch, dedup_ttl_s=None),
        window="5 minutes",
        slide="150 seconds",
    )
    rows = batch_stats.collect()
    # all 5 fixes share one wall-clock instant bucket: they land in
    # exactly 2 overlapping windows, each window seeing all 5
    assert len(rows) == 2
    assert all(r.n_positions == 5 and r.n_vehicles == 5 for r in rows)
    starts = sorted(r.window_start for r in rows)
    assert (starts[1] - starts[0]).total_seconds() == 150.0
