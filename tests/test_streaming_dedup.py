"""Streaming near-dup gate tests (streaming/dedup.py): intra-batch
keep-first, cross-batch store collisions, replay idempotency, and the
end-to-end file-replay stream."""

from __future__ import annotations

import pytest

import json
import os


A = "the quick brown fox jumps over the lazy dog again and again today"
B = "completely different text about spark shuffles and parquet row groups"
A2 = A + " tonight"  # near-dup of A: one appended word, J = 11/12
C = "a third unrelated document concerning websocket reconnect backoff rules"


def _decisions(spark, out_dir):
    rows = spark.read.parquet(os.path.join(out_dir, "b*")).collect()
    return {r.doc_id: r.near_dup for r in rows}


@pytest.mark.slow
def test_handler_intra_and_cross_batch_and_replay(spark, tmp_path):
    from kyiv_traffic_bigdata_spark.streaming.dedup import neardup_batch_handler

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    apply = neardup_batch_handler(store, out)

    b0 = spark.createDataFrame([(1, A), (2, A), (3, B)], "doc_id long, text string")
    apply(b0, 0)
    got = _decisions(spark, out)
    # intra-batch: doc 2 is an exact copy of the smaller-id doc 1
    assert got == {1: False, 2: True, 3: False}

    # cross-batch: near-copy of accepted doc 1 and a copy of REJECTED
    # doc 2's content still collide with doc 1's stored buckets; C is new
    b1 = spark.createDataFrame([(4, A2), (5, C)], "doc_id long, text string")
    apply(b1, 1)
    got = _decisions(spark, out)
    assert got[4] is True and got[5] is False

    # replay of a committed batch is a no-op (same decisions, no dup rows)
    apply(b1, 1)
    assert _decisions(spark, out) == got

    # the store holds buckets only for ACCEPTED docs
    kept = {r.doc_id for r in spark.read.parquet(os.path.join(store, "b*")).collect()}
    assert kept == {1, 3, 5}


@pytest.mark.slow
def test_streaming_end_to_end_file_replay(spark, tmp_path):
    from kyiv_traffic_bigdata_spark.streaming.dedup import start_neardup_filter_sink

    src = tmp_path / "src"
    src.mkdir()
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        p = src / name
        p.write_text("\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows))

    write_batch("a.json", [(1, A), (2, B)])
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = start_neardup_filter_sink(stream, store, out, ckpt, trigger_s=1)
    try:
        q.processAllAvailable()
        write_batch("b.json", [(3, A2), (4, C)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = _decisions(spark, out)
    assert got == {1: False, 2: False, 3: True, 4: False}
