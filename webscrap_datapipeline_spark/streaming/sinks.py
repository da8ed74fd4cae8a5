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
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function: idempotent append + ordered state
    commit.

    Idempotence: the warehouse write is partitioned by __batch_id, so a
    batch replay rewrites exactly its own partition (dynamic partition
    overwrite) — the micro-batch equivalent of the reference's
    retry-same-hotels-next-hour behavior, without the duplicates.
    """

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
        tmp = os.path.join(state_dir, f"_staging_{batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.coalesce(1).write.mode("overwrite").parquet(prev_path)

    return write_batch
