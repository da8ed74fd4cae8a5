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
