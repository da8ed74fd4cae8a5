"""SCD current-flag maintenance — the reference's K5+K3 protocol
(src/gcp_processes.py:29-47 UPDATE CURRENT_IND=NULL + append with 'Y',
src/process_files.py:50) re-expressed two ways per SURVEY.md §2.6:

  * storage-time: ``apply_current_flag`` — deterministic overwrite
    protocol (read target ∪ new → window → rewrite flags). On Delta this
    would be one MERGE INTO; plain parquet gets the same end state.
  * query-time:  ``latest_per_key`` — row_number()==1 view, no mutation
    at all (the formulation that scales best: the flag becomes derived
    data, and the append stays blind/idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(df: DataFrame, key: str, ts: str, tiebreak: str | None = None) -> DataFrame:
    """Query-time current rows: row_number over (key, ts desc[, tiebreak
    desc]) == 1. Deterministic when a tiebreak is supplied."""
    order = [F.col(ts).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def apply_current_flag(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    ts: str,
    flag_col: str = "CURRENT_IND",
    tiebreak: str | None = None,
    dedupe_exact: bool = True,
) -> DataFrame:
    """Storage-time protocol: union existing+incoming, then set
    ``flag_col`` = 'Y' on every row of the latest (ts[, tiebreak]) batch
    per key and NULL on all others — the combined effect of the
    reference's UPDATE + append. The flag is DENSE per batch: a key's
    newest file contributes many rows and all of them are current
    (reference src/process_files.py:50 flags whole files, the UPDATE at
    src/gcp_processes.py:39 de-flags whole hotels). One shuffle,
    idempotent under replay."""
    combined = existing.unionByName(incoming, allowMissingColumns=True)
    if dedupe_exact:
        # replay safety: a re-appended batch is byte-identical (same
        # lineage columns) → collapse; the flag column is recomputed
        # below so it can't mask a real difference
        combined = combined.drop(flag_col).dropDuplicates().withColumn(
            flag_col, F.lit(None).cast("string")
        )
    w = Window.partitionBy(key)
    latest_ts = F.max(ts).over(w)
    is_latest_ts = F.col(ts) == latest_ts
    if tiebreak:
        latest_tb = F.max(F.when(is_latest_ts, F.col(tiebreak))).over(w)
        is_current = is_latest_ts & (F.col(tiebreak) == latest_tb)
    else:
        is_current = is_latest_ts
    return combined.withColumn(
        flag_col, F.when(is_current, F.lit("Y")).otherwise(F.lit(None).cast("string"))
    )


def _target_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the Hadoop FileSystem API, not ``os.path`` —
    the target of an upsert is an s3a://, hdfs://, or executor-only URI
    in any real deployment, where a driver-local ``os.path.exists``
    reports an EXISTING table as absent and the init branch's plain
    ``mode('overwrite')`` would then clobber it (round-2 ADVICE). The
    scheme's own FileSystem answers for every URI Spark can write."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def scd_upsert_partitioned(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    key: str,
    ts: str,
    flag_col: str = "CURRENT_IND",
    tiebreak: str | None = None,
    n_buckets: int = 64,
    dedupe_exact: bool = True,
    bucket_col: str = "__bucket",
) -> list[int]:
    """Partition-scoped storage-time SCD — reference K5's MERGE semantics
    (src/gcp_processes.py:29-47) without rewriting the whole target.

    The target is laid out hash-bucketed by key (``bucket_col`` =
    pmod(xxhash64(key), n_buckets) partition dirs). An incoming batch:

      1. computes its touched buckets (≤ n_buckets ints — driver-sized
         by construction, never key-cardinality);
      2. reads back ONLY those buckets (the isin filter prunes at the
         parquet partition level — at 100 TB the read is proportional to
         the batch's key spread, not the corpus);
      3. re-flags existing ∪ incoming via ``apply_current_flag``;
      4. rewrites ONLY the touched partition dirs via dynamic partition
         overwrite — untouched partition files stay byte-identical
         (asserted in tests/test_pipeline_e2e.py).

    The eager localCheckpoint before the write is required, not a
    convenience: Spark (correctly) refuses to overwrite a path that the
    write's own plan is still reading; checkpointing the merged slice
    truncates lineage to an in-memory RDD first. Its size is the touched
    slice only. Returns the touched bucket ids.
    """
    bucket = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")
    inc = incoming.withColumn(bucket_col, bucket)
    if not _target_exists(spark, target_path):
        merged = apply_current_flag(
            inc.limit(0), inc, key, ts, flag_col, tiebreak, dedupe_exact
        )
        merged.write.mode("overwrite").partitionBy(bucket_col).parquet(target_path)
        return sorted(r[0] for r in inc.select(bucket_col).distinct().collect())

    touched = sorted(r[0] for r in inc.select(bucket_col).distinct().collect())
    existing = spark.read.parquet(target_path).filter(F.col(bucket_col).isin(touched))
    merged = apply_current_flag(
        existing, inc, key, ts, flag_col, tiebreak, dedupe_exact
    ).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(bucket_col)
        .parquet(target_path)
    )
    return touched
