"""Every registered query with an oracle must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate, run at sf0.001 for
speed (driver uses sf0.01; set SPARK_GRAFT_PARITY_SF to override)."""

from __future__ import annotations

import os

import pytest

from webscrap_datapipeline_spark.plans import REGISTRY

from .conftest import SF_SMALL
from .oracle_compare import compare, duckdb_con

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", SF_SMALL)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_con(PARITY_SF)
    yield con
    con.close()


ORACLE_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, PARITY_SF)
    res = compare(df, duck, q.oracle)
    assert res["ok"], f"{name}: {res}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, PARITY_SF)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable, non-empty schema


@pytest.mark.parametrize(
    "name", ORACLE_QUERIES[:3] + ["pricing_summary", "event_lag_deltas"]
)
def test_hashed_comparator_agrees_green(spark, duck, name):
    """compare_hashed (the large-factor sweep mode, round-11 VERDICT
    item 7) must return the same green verdict as the faithful
    comparator on real query/oracle pairs."""
    from .oracle_compare import compare_hashed

    q = REGISTRY[name]
    res = compare_hashed(q.fn(spark, PARITY_SF), duck, q.oracle)
    assert res["ok"], f"{name}: {res}"


def test_hashed_comparator_catches_mismatches(spark, duck):
    """...and must stay dtype-sensitive and mismatch-sensitive: a value
    diff, a row-count diff, and an int-vs-float dtype diff (the round-2
    class of driver failure) all go red under the hash too."""
    from .oracle_compare import compare_hashed

    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "k int, v double")
    assert compare_hashed(df, duck, "SELECT * FROM (VALUES (1, 2.5), (2, 3.5)) t(k, v)")["ok"]
    # value diff
    assert not compare_hashed(
        df, duck, "SELECT * FROM (VALUES (1, 2.5), (2, 99.0)) t(k, v)"
    )["ok"]
    # row-count diff
    assert not compare_hashed(df, duck, "SELECT 1 AS k, 2.5 AS v")["ok"]
    # dtype diff: same VALUES, int vs float k on the oracle side
    assert not compare_hashed(
        df, duck, "SELECT CAST(k AS DOUBLE) AS k, v FROM (VALUES (1, 2.5), (2, 3.5)) t(k, v)"
    )["ok"]
    # column-name diff
    assert not compare_hashed(
        df, duck, "SELECT * FROM (VALUES (1, 2.5), (2, 3.5)) t(kk, v)"
    )["ok"]
