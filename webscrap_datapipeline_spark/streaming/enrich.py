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


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "10 minutes",
) -> DataFrame:
    """Stream⋈stream inner join on ``key`` where the right event lands
    within ``±within`` of the left event (click↔impression attribution,
    request↔response pairing).

    Both sides carry watermarks and the join condition bounds the time
    difference in BOTH directions — that pair of constraints is what
    lets Spark compute, per side, how long a row can still find a match,
    and evict join state past that horizon. Without the time bound the
    state grows with the full stream history; with it, state is
    O(rate × (watermark + within)) regardless of stream lifetime.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{right_ts} BETWEEN l.{left_ts} - INTERVAL {within} "
            f"AND l.{left_ts} + INTERVAL {within}"
        ),
    )
