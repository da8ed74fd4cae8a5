"""Structured Streaming tests: windowed aggregation parity with the
batch twin, stateful change detection across micro-batches, and the
file-arrival source — run on memory/file sources with processAllAvailable
(deterministic, no timers)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from webscrap_datapipeline_spark.streaming.change_detection import detect_changes_stream
from webscrap_datapipeline_spark.streaming.file_source import stream_raw_reports
from webscrap_datapipeline_spark.streaming.windows import tumbling_counts


def _write_events_json(dirpath, rows):
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, f"batch_{len(os.listdir(dirpath))}.json")
    with open(path, "w") as fh:
        for r in rows:
            fh.write(r + "\n")
    return path


def test_tumbling_stream_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    _write_events_json(
        src_dir,
        [
            '{"ts": "2024-01-01T00:01:00", "event_type": "click", "value": 1.0}',
            '{"ts": "2024-01-01T00:04:00", "event_type": "click", "value": 2.0}',
            '{"ts": "2024-01-01T00:11:00", "event_type": "view", "value": 3.0}',
        ],
    )
    schema = "ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).json(src_dir)
    q = (
        tumbling_counts(stream, window="10 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("select * from tumbling_test").collect()
        }
    finally:
        q.stop()
    batch = spark.read.schema(schema).json(src_dir)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(batch).collect()
    }
    assert got == want
    assert got[(dt.datetime(2024, 1, 1, 0, 0), "click")] == (2, 3.0)


def test_stateful_change_detection_across_microbatches(spark, tmp_path):
    src_dir = str(tmp_path / "keys")
    ckpt = str(tmp_path / "ckpt")
    _write_events_json(src_dir, ['{"key": "A", "last_seen_ts": "t1"}',
                                 '{"key": "B", "last_seen_ts": "t1"}'])
    stream = spark.readStream.schema("key string, last_seen_ts string").json(src_dir)
    q = (
        detect_changes_stream(stream)
        .writeStream.format("memory")
        .queryName("cd_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(r["key"], r["change_kind"]) for r in spark.sql("select * from cd_test").collect()}
        assert first == {("A", "new"), ("B", "new")}

        # second micro-batch: A unchanged (dup), B changed, C new
        _write_events_json(src_dir, ['{"key": "A", "last_seen_ts": "t1"}',
                                     '{"key": "B", "last_seen_ts": "t2"}',
                                     '{"key": "C", "last_seen_ts": "t1"}'])
        q.processAllAvailable()
        allrows = {(r["key"], r["last_seen_ts"], r["change_kind"])
                   for r in spark.sql("select * from cd_test").collect()}
    finally:
        q.stop()
    assert ("B", "t2", "changed") in allrows
    assert ("C", "t1", "new") in allrows
    # A's unchanged re-observation emitted nothing new
    assert len([r for r in allrows if r[0] == "A"]) == 1


def test_file_source_streams_new_reports(spark, tmp_path):
    from webscrap_datapipeline_spark.sources.csv_reports import RAW_REPORT_SCHEMA

    src_dir = str(tmp_path / "downloads")
    os.makedirs(src_dir)
    header = "|".join(f.name for f in RAW_REPORT_SCHEMA.fields)
    with open(os.path.join(src_dir, "ALPHA_08132026_10-00-00.csv"), "w") as fh:
        fh.write(header + "\n")
        fh.write("R1|KING|2026-08-10|1|100.0|90.0|10.0|WEB|OPEN|1|7|N|N||00042|x\n")

    stream = stream_raw_reports(spark, src_dir, RAW_REPORT_SCHEMA)
    q = (
        stream.withColumn("src", F.input_file_name())
        .writeStream.format("memory")
        .queryName("files_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from files_test").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["Ref Code"] == "00042"  # col 14 stays string
    assert "ALPHA_08132026" in rows[0]["src"]
