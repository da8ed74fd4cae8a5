"""Audit-log builder (reference create_log_dataframe,
src/process_files.py:85-124): one row per requested key with the row
count, source filename, file timestamp, and creation stamp — keys with
no file get a NULL-filled row (the J4 for…else at :110-119).

Spark shape: per-file counts from the enriched scan (A1 via groupBy on
lineage), LEFT OUTER joined onto the requested-key list — the NULL log
row falls out of the join instead of an imperative else-branch. The
reference's substring containment (filename ⊇ hotel code) is replaced by
the equi key it provably derives (F3 regexp) — SURVEY.md §7.4's
theta-join-at-scale mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import creation_ts, data_amount


def build_log_table(requested_keys: DataFrame, enriched: DataFrame, key: str = "LOC_ID") -> DataFrame:
    """``requested_keys``: one column ``key``; ``enriched``: output of
    enrich_reports. Returns the reference's log schema
    (src/process_files.py:100-117): LOC_ID, DATA_AMT, SRC_FILENAME,
    FILE_TS, CREAT_TS."""
    per_file = enriched.groupBy(key).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("SRC_FILENAME").alias("SRC_FILENAME"),
        F.max("LST_UPDT_TS").alias("FILE_TS"),
    )
    return (
        requested_keys.select(F.col(key))
        .join(per_file, key, "left_outer")
        .select(
            key,
            data_amount("__n").alias("DATA_AMT"),
            "SRC_FILENAME",
            "FILE_TS",
            creation_ts().alias("CREAT_TS"),
        )
    )
