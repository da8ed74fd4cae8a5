"""The enrichment transform (reference §3.3: create_modified_files
src/process_files.py:34-59 + create_rate_rule_dataframe :62-82) as ONE
lazy plan over the multi-file scan — scan → derive lineage columns from
the filename → normalize names → cast timestamps. The reference's
read-enrich-write-reread-union round trip disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    filename_timestamp,
    location_code,
    modified_filename,
    normalize_columns,
    path_basename,
)


def enrich_reports(raw: DataFrame, src_col: str = "src_path") -> DataFrame:
    """Adds the reference's four derived columns (P9,
    src/process_files.py:49-52) from per-file lineage, then normalizes
    column names (P10) and casts LST_UPDT_TS to a UTC timestamp (F6,
    src/process_files.py:80). Column order mirrors the reference:
    LOC_ID first (the insert-at-position-0 at :49), lineage last."""
    base = path_basename(F.col(src_col))
    enriched = raw.select(
        location_code(base).alias("LOC_ID"),
        *[c for c in raw.columns if c != src_col],
        F.lit("Y").alias("CURRENT_IND"),
        modified_filename(base).alias("SRC_FILENAME"),
        filename_timestamp(base).alias("LST_UPDT_TS"),
    )
    return normalize_columns(enriched)
