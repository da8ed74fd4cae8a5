"""Bucketed-table layout: pre-shuffle once at write time, join/aggregate
shuffle-free forever after.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Bucketing amortizes it: ``bucketBy(N, key)`` hash-partitions rows
into N files per partition at WRITE time and records the layout in the
catalog; every later equi-join or groupBy on that key reads the buckets
as pre-distributed input — the physical plan has NO Exchange on the
bucketed side(s). This is the batch analog of the reference's per-hotel
file layout (one file per hotel key, reference src/process_files.py:57),
done by the engine instead of by filename convention.

Rules of thumb encoded here:
  * both join sides bucketed on the SAME key with the SAME bucket count
    → zero-shuffle sort-merge join;
  * bucket count is a layout contract — pick it for the TARGET scale
    (e.g. 4096 at 100 TB) since changing it means rewriting the table;
  * ``sortBy`` within buckets additionally removes the sort from
    sort-merge joins (files are merge-ready on disk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally sorted) on ``keys``. The catalog entry carries the bucket
    spec — that metadata is what lets the planner elide the Exchange."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option("path", path).saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (reading the bare
    parquet path would LOSE the bucket metadata and reintroduce the
    shuffle — the catalog round-trip is load-bearing)."""
    return spark.table(table)
