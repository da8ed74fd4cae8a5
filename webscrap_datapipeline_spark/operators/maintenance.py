"""Table-maintenance operators: small-file compaction.

Small files are the silent killer of a 100 TB lake: a table written by
1000 executors × many micro-batches accumulates millions of KB-sized
parquet files, and every later scan pays per-file open/footer/seek cost
(plus driver memory for the file listing). Compaction rewrites a table
into ~target-sized files. The reference's analog is its archive step
(one file per hotel copied to GCS, reference src/gcp_processes.py:13-17)
— which preserves the small-file problem; the engine fixes it at write
time instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..fsutil import hadoop_fs, list_child_names


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path``'s parquet as ``ceil(total/target)`` files at
    ``out_path``. Returns the output file count.

    File sizing uses the real on-disk byte total (Hadoop FS listing, no
    data read). Coalesce, not repartition: compaction must not pay a
    shuffle — it only needs fewer, bigger files, and coalesce merges
    input splits task-side. (Use repartition only if the input is
    skewed enough that merged splits would be unbalanced.)
    """
    fs, path = hadoop_fs(spark, in_path)
    total = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-total // target_file_bytes))

    df = spark.read.parquet(in_path)
    df.coalesce(int(n_files)).write.mode("overwrite").parquet(out_path)

    return sum(
        1
        for name in list_child_names(spark, out_path)
        if name.endswith(".parquet")
    )
