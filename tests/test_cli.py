"""CLI parity surface (__main__.py): every reference-runnable pipeline
driven end-to-end through its offline (`--replay` / `--from-file`) twin,
which shares the live path's parse/scan code."""

from __future__ import annotations

import base64
import json
import os
import struct

import pytest

from kyiv_traffic_bigdata_spark.__main__ import main

REF_POS = "/root/reference/data/kpt_positions_20260207.jsonl"


def test_query_command_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "q.parquet")
    rc = main(
        ["query", "--name", "global_event_stats", "--sf-dir", "/root/testdata/sf0.001", "--out", out]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == 1


def test_query_command_rejects_unknown_name(tmp_path):
    assert main(["query", "--name", "nope", "--out", str(tmp_path / "x")]) == 2


@pytest.mark.skipif(not os.path.exists(REF_POS), reason="reference data absent")
def test_visualize_command_renders_map(tmp_path):
    out = str(tmp_path / "map.html")
    assert main(["visualize", "--positions", REF_POS, "--out", out]) == 0
    html = open(out).read()
    assert "leaflet" in html and "circleMarker" in html


def test_ingest_command_partitions_by_date(spark, tmp_path):
    src = tmp_path / "env.jsonl"
    env = {
        "timestamp": "2026-02-07T10:00:00",
        "count": 2,
        "positions": [
            {"vehicle_id": 1, "route_id": 5, "lat": 50.4, "lon": 30.5,
             "direction": 0, "flag": 0, "timestamp": 100},
            {"vehicle_id": 2, "route_id": 5, "lat": 50.5, "lon": 30.6,
             "direction": 0, "flag": 0, "timestamp": 200},
        ],
    }
    src.write_text(json.dumps(env) + "\n")
    out = str(tmp_path / "store")
    assert main(["ingest", "--positions", str(src), "--out", out]) == 0
    assert os.path.isdir(os.path.join(out, "date=20260207"))
    assert spark.read.parquet(out).count() == 2


def test_eway_capture_replay_builds_report(tmp_path):
    # uint32/1e8 wire format caps coords at ~42.9 degrees (the same limit
    # the reference decoder has), so all real decodes land in 'other'
    ankara = struct.pack("<II", int(38.0 * 1e8), int(37.0 * 1e8))
    msg = base64.b64encode(ankara * 15).decode().rstrip("=")
    replay = tmp_path / "cap.txt"
    replay.write_text(msg + "\n")
    out = str(tmp_path / "report.json")
    assert main(["eway-capture", "--replay", str(replay), "--out", out]) == 0
    rep = json.load(open(out))
    assert rep["summary"]["other"] == 15 and rep["summary"]["total"] == 15
    assert len(rep["other_positions"]) == 15


def test_osm_import_from_file(tmp_path):
    elements = {
        "version": 0.6,
        "elements": [
            {"type": "node", "id": 1, "lat": 50.45, "lon": 30.52,
             "tags": {"name": "stop A", "highway": "bus_stop"}},
            {"type": "way", "id": 2, "tags": {"highway": "primary"}},
        ],
    }
    src = tmp_path / "elements.json"
    src.write_text(json.dumps(elements))
    out = str(tmp_path / "out.geojson")
    assert main(["osm-import", "--from-file", str(src), "--out", out]) == 0
    gj = json.load(open(out))
    assert gj["type"] == "FeatureCollection" and len(gj["features"]) == 1
    assert gj["features"][0]["geometry"]["coordinates"] == [30.52, 50.45]


def test_weather_from_file(spark, tmp_path):
    from kyiv_traffic_bigdata_spark.schemas import WEATHER_HOURLY_FIELDS

    payload = {
        "latitude": 50.45,
        "longitude": 30.52,
        "elevation": 150.0,
        "timezone": "UTC",
        "hourly": {
            "time": ["2026-01-01T00:00", "2026-01-01T01:00"],
            **{f: [1.0, 2.0] for f in WEATHER_HOURLY_FIELDS},
        },
    }
    src = tmp_path / "resp.json"
    src.write_text(json.dumps(payload))
    out = str(tmp_path / "hourly.parquet")
    assert main(["weather", "--from-file", str(src), "--out", out]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert set(got.columns) == {"time", *WEATHER_HOURLY_FIELDS}


def test_curate_command_publishes_corpus_and_lineage(spark, tmp_path, capsys):
    out = str(tmp_path / "curated")
    rc = main(["curate", "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert summary["docs_in"] == lineage.count() == 500
    assert summary["docs_kept"] == corpus.count() > 0
    # the kept corpus is exactly the lineage's kept set, with full text
    assert set(corpus.columns) >= {"doc_id", "text", "lang", "source"}
    kept_ids = {r.doc_id for r in lineage.where("kept").select("doc_id").collect()}
    assert {r.doc_id for r in corpus.select("doc_id").collect()} == kept_ids
    # drop accounting covers every non-kept doc (gates may overlap)
    assert summary["docs_kept"] + summary["dropped_quality"] >= 500 - (
        summary["dropped_neardup"] + summary["dropped_sample"]
    )


def test_sql_command_runs_adhoc_query(spark, tmp_path):
    out = str(tmp_path / "sql.parquet")
    rc = main(
        [
            "sql",
            "--query",
            "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out,
        ]
    )
    assert rc == 0
    got = {r.l_returnflag: r.n for r in spark.read.parquet(out).collect()}
    assert set(got) == {"A", "N", "R"} and sum(got.values()) > 0


def test_sql_views_expose_normalized_events(spark):
    from kyiv_traffic_bigdata_spark.tables import run_sql

    df = run_sql(
        spark,
        "/root/testdata/sf0.001",
        "SELECT COUNT(*) AS n FROM events WHERE ts_us IS NOT NULL AND ts IS NOT NULL",
    )
    assert df.collect()[0].n > 0


def test_query_list_flag(capsys):
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "geo_trajectory:" in out and "doc_bm25_topk:" in out
    assert len(out.strip().splitlines()) >= 120
    # neither --name nor --list is an error
    assert main(["query"]) == 2


def test_bench_map_loadavg_gate(tmp_path):
    """bench.py's committed-map hygiene (r08 VERDICT #3): a refresh
    taken on a contended host must not clobber an idle-host map, while
    every other combination still writes."""
    import json as _json

    from bench import map_refresh_verdict

    mp = str(tmp_path / "bench_queries.json")

    # no prior map -> always write, loaded or not
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 2.0) == (True, None)
    # idle host -> write
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps({"host_loadavg_prerun_1_5_15": [0.4, 1.0, 1.0]})
    )
    assert map_refresh_verdict(mp, [0.5, 0.7, 1.0], 2.0) == (True, None)
    # loaded host over an idle-host map -> REFUSE, reason names both
    ok, reason = map_refresh_verdict(mp, [9.9, 9.9, 9.9], 2.0)
    assert not ok and "9.9" in reason and "0.4" in reason
    # r11 VERDICT #1: 1-min idle but 5-min still hot -> warm host, REFUSE
    ok, reason = map_refresh_verdict(mp, [1.7, 8.9, 18.8], 2.0)
    assert not ok and "8.9" in reason
    # loaded host over a map that was itself loaded -> write
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps({"host_loadavg_prerun_1_5_15": [25.0, 9.0, 9.0]})
    )
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 2.0) == (True, None)
    # ...including a prior map that passed the old 1-min-only gate but
    # was warm at the 5-min scale (the r11 final map's exact shape)
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps({"host_loadavg_prerun_1_5_15": [1.78, 8.98, 18.82]})
    )
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 2.0) == (True, None)
    # prior map without loadavg (pre-r05 format) -> write
    (tmp_path / "bench_queries.json").write_text(_json.dumps({"queries": {}}))
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 2.0) == (True, None)
    # corrupt prior map -> write
    (tmp_path / "bench_queries.json").write_text("not json")
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 2.0) == (True, None)
    # gate disabled / loadavg unreadable -> write
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 0.0) == (True, None)
    assert map_refresh_verdict(mp, None, 2.0) == (True, None)


def test_noise_band_derivation():
    """tools/noise_band.py (r10 VERDICT #2): the band is derived from
    two idle runs' per-query deltas; sub-floor queries are excluded
    from the distribution; the percentile summary is monotone."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from noise_band import band, rel_delta

    qa = {"q1": 1.00, "q2": 2.00, "q3": 0.05, "q4": 4.00}
    qb = {"q1": 1.10, "q2": 2.00, "q3": 0.08, "q4": 4.80}
    nb = band(qa, qb)
    # q3 is under the 0.1 s floor on both sides with a 0.03 s delta —
    # its 60% ratio must NOT inflate the band
    assert nb["max_rel"] <= 0.21
    assert nb["p50_rel"] <= nb["p95_rel"] <= nb["max_rel"]
    assert nb["n_queries"] == 4
    assert rel_delta(1.0, 1.1) == rel_delta(1.1, 1.0)


def test_bench_mover_flagging_logic():
    """The mover rule bench.py applies: |delta| must exceed BOTH the
    absolute floor and the band's p95 relative delta (vs the smaller
    of the two timings)."""
    nb = {"p95_rel": 0.2, "abs_floor_sec": 0.1}
    prior = {"fast": 0.05, "steady": 2.0, "mover": 1.0, "tiny_move": 3.0}
    now = {"fast": 0.09, "steady": 2.3, "mover": 1.5, "tiny_move": 3.05}

    def is_mover(n):
        d = abs(now[n] - prior[n])
        return d > nb["abs_floor_sec"] and d / min(now[n], prior[n]) > nb["p95_rel"]

    assert not is_mover("fast")       # 80% rel but under the abs floor
    assert not is_mover("steady")     # 0.3 s but only 15% rel
    assert is_mover("mover")          # 0.5 s and 50% rel
    assert not is_mover("tiny_move")  # under the floor


def test_bench_map_throughput_canary(tmp_path):
    """r12: loadavg cannot see a merely-SLOW host (cpu-quota /
    noisy-neighbor throttling without runnable-queue pressure) — the
    saturated-ingest-rate canary must refuse such a refresh over an
    idle-host map, and only then."""
    import json as _json

    from bench import map_refresh_verdict

    mp = str(tmp_path / "bench_queries.json")
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps(
            {
                "host_loadavg_prerun_1_5_15": [0.4, 1.0, 1.0],
                "ingest_saturated_positions_per_sec": 5630394.7,
            }
        )
    )
    # idle loadavg but 6x-degraded throughput (the live r12 incident
    # shape) -> REFUSE, reason names both rates
    ok, reason = map_refresh_verdict(mp, [0.14, 1.09, 2.66], 2.0, 896880.3)
    assert not ok and "896880" in reason and "5630395" in reason
    # healthy throughput on an idle host -> write
    assert map_refresh_verdict(mp, [0.14, 1.09, 2.66], 2.0, 5100000.0) == (
        True,
        None,
    )
    # no rate measured this run -> loadavg rules alone decide
    assert map_refresh_verdict(mp, [0.14, 1.09, 2.66], 2.0, None) == (
        True,
        None,
    )
    # prior map itself taken on a loaded host -> its rate is not a
    # trustworthy baseline; degraded refresh still writes
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps(
            {
                "host_loadavg_prerun_1_5_15": [9.0, 9.0, 9.0],
                "ingest_saturated_positions_per_sec": 5630394.7,
            }
        )
    )
    assert map_refresh_verdict(mp, [0.14, 1.09, 2.66], 2.0, 896880.3) == (
        True,
        None,
    )
    # prior map predates the rate stat -> no canary, loadavg decides
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps({"host_loadavg_prerun_1_5_15": [0.4, 1.0, 1.0]})
    )
    assert map_refresh_verdict(mp, [0.14, 1.09, 2.66], 2.0, 896880.3) == (
        True,
        None,
    )


def test_bench_map_gate_escape_hatches(tmp_path):
    """r12 ADVICE: max_load <= 0 must disable BOTH gates (it documented
    "gate disabled" before the canary existed), and min_rate_frac <= 0
    (the SPARK_GRAFT_BENCH_MIN_RATE_FRAC env knob) must disable just
    the throughput canary — a legitimately slower replacement host must
    be able to refresh the map without hand-editing the committed rate."""
    import json as _json

    from bench import map_refresh_verdict

    mp = str(tmp_path / "bench_queries.json")
    (tmp_path / "bench_queries.json").write_text(
        _json.dumps(
            {
                "host_loadavg_prerun_1_5_15": [0.4, 1.0, 1.0],
                "ingest_saturated_positions_per_sec": 5630394.7,
            }
        )
    )
    # degraded throughput AND loaded host, but gate disabled -> write
    assert map_refresh_verdict(mp, [9.9, 9.9, 9.9], 0.0, 896880.3) == (
        True,
        None,
    )
    # canary alone disabled: idle host writes despite degraded rate...
    assert map_refresh_verdict(
        mp, [0.14, 1.09, 2.66], 2.0, 896880.3, min_rate_frac=0.0
    ) == (True, None)
    # ...but the loadavg gate still applies
    ok, reason = map_refresh_verdict(
        mp, [9.9, 9.9, 9.9], 2.0, 896880.3, min_rate_frac=0.0
    )
    assert not ok and "loadavg" in reason
