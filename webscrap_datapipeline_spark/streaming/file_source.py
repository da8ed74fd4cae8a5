"""File-arrival streaming source (ST3) — the reference's
validate_file_download poll loop (src/utils.py:96-114: wait ≤15 s for a
completed .csv vs a partial .crdownload, then move it out of the
download dir) replaced by Spark's file streaming source, which only
lists fully-committed files and tracks processed ones in the checkpoint
(no manual move needed; cleanSource archives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_raw_reports(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 100,
    archive_dir: str | None = None,
) -> DataFrame:
    """Micro-batch stream of newly-arrived pipe-delimited report files.
    ``maxFilesPerTrigger`` bounds per-batch work (the reference's
    batch-of-3 workers analog); ``cleanSource=archive`` reproduces the
    reference's move-out-of-downloads step transactionally."""
    reader = (
        spark.readStream.option("sep", "|")
        .option("header", True)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .schema(schema)
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.csv(path)
