"""Stream-side enrichment and dedup.

Two more SURVEY §2.8 extension operators:

* stream-static join — the streaming twin of the reference's per-run
  enrichment (reference src/process_files.py:49-52 stamps literal
  columns; the general form joins each micro-batch against a slowly
  changing dimension). The static side re-resolves per micro-batch, so
  a dim-table refresh is picked up without restarting the query.
* streaming dedup — `dropDuplicatesWithinWatermark`: bounded-state
  exactly-once-per-key within the lateness horizon. The unbounded
  `dropDuplicates` would grow state forever at 100 TB/day; the
  watermark variant evicts keys once they can no longer collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Join a stream against a static dimension. Spark plans this as a
    broadcast per micro-batch when the dim is small (the only sane plan:
    the stream side can't be re-shuffled against a static table cheaply).
    Left outer so unmatched events survive with NULL enrichment —
    observability over silent drops (reference ST4 semantics)."""
    return stream.join(F.broadcast(dim), on, "left_outer")


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-per-key emission within the watermark horizon.
    State size is bounded by (distinct keys during the horizon), not by
    stream lifetime — the difference between a pipeline that runs for a
    day and one that runs forever."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
