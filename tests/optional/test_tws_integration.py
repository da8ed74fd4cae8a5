"""OPT-IN wire-level test for the transformWithState adapter.

``streaming/tws.py``'s processor semantics are unit-tested in the
default suite (test_streaming.py::test_tws_change_detector_processor_
semantics), but the transformWithStateInPandas WIRING — OUTPUT_SCHEMA,
the real ValueState tuple shape, the RocksDB provider handshake — needs
protobuf + the RocksDB state store, neither shipped in this container
(round-5 ADVICE: keep the integration test runnable on clusters that
have them, instead of deleting it). Collection is gated in
tests/conftest.py: the whole ``tests/optional/`` tree is ignored unless
``SPARK_GRAFT_TWS_INTEGRATION=1`` is set, so the default suite carries
zero environment-dead skips.

Run on a capable cluster:
    SPARK_GRAFT_TWS_INTEGRATION=1 python -m pytest tests/optional/ -q
"""

from __future__ import annotations

import os

import pytest


def _write_events_json(dirpath, rows):
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, f"batch_{len(os.listdir(dirpath))}.json")
    with open(path, "w") as fh:
        for r in rows:
            fh.write(r + "\n")
    return path


def test_transform_with_state_change_detection(spark, tmp_path):
    """detect_changes_stream_tws (the Spark 4 typed-state twin of
    detect_changes_stream) must produce the same change feed across
    micro-batches — this exercises the real engine wiring end-to-end."""
    pytest.importorskip("google.protobuf.descriptor")
    from webscrap_datapipeline_spark.streaming.tws import (
        ROCKSDB_PROVIDER,
        detect_changes_stream_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    src_dir = str(tmp_path / "keys_tws")
    ckpt = str(tmp_path / "ckpt_tws")
    _write_events_json(src_dir, ['{"key": "A", "last_seen_ts": "t1"}',
                                 '{"key": "B", "last_seen_ts": "t1"}'])
    stream = spark.readStream.schema("key string, last_seen_ts string").json(src_dir)
    q = (
        detect_changes_stream_tws(stream)
        .writeStream.format("memory")
        .queryName("cd_tws_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r["key"], r["change_kind"])
            for r in spark.sql("select * from cd_tws_test").collect()
        }
        assert first == {("A", "new"), ("B", "new")}

        _write_events_json(src_dir, ['{"key": "A", "last_seen_ts": "t1"}',
                                     '{"key": "B", "last_seen_ts": "t2"}',
                                     '{"key": "C", "last_seen_ts": "t1"}'])
        q.processAllAvailable()
        allrows = {
            (r["key"], r["last_seen_ts"], r["change_kind"])
            for r in spark.sql("select * from cd_tws_test").collect()
        }
    finally:
        q.stop()
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert ("B", "t2", "changed") in allrows
    assert ("C", "t1", "new") in allrows
    assert len([r for r in allrows if r[0] == "A"]) == 1
