"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``webscrap_datapipeline_spark.plans`` — the query
registry where every operator from SURVEY.md §2 lives as a
(Spark plan, DuckDB oracle SQL) pair. See plans/registry.py for the
determinism rules that make exact value-hash parity achievable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webscrap_datapipeline_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's change-detection core (anti-join of
    source watermarks against stored state, reference src/utils.py:168-194)
    on sf0.001."""
    _ensure_nanos_conf(spark)
    return plans.REGISTRY["change_detection"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    wrapped = {}
    for name, fn in plans.queries().items():
        wrapped[name] = _with_conf(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return plans.oracle_sql()


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    # read as long (the catalog converts long-ns → µs timestamps). The
    # driver builds its own SparkSession, so set it here too.
    #
    # Failures are LOUD on purpose: a silently-rejected conf means every
    # timestamp-bearing query would produce subtly wrong values (round-1
    # postmortem, VERDICT.md "What's wrong" #1) — a visible error beats a
    # silent hash mismatch.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Read micros-precision NTZ parquet timestamps as TimestampType
        # directly (stored micros = the UTC instant, no per-row rewrite;
        # bit-identical to the catalog's make_timestamp fallback under
        # any session tz — measured 2× on lineitem scans, r12). Runtime
        # (SQLConf) conf, so it applies to the driver's own session.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception as exc:  # pragma: no cover - depends on host session
        raise RuntimeError(
            "SparkSession rejected a required conf "
            "(spark.sql.legacy.parquet.nanosAsLong=true, "
            "spark.sql.session.timeZone=UTC); timestamp results would be "
            f"unreliable: {exc}"
        ) from exc


def _with_conf(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_nanos_conf(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run
