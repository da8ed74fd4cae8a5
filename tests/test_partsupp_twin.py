"""Invariant pins for the deterministic partsupp twin
(plans/analytics_queries.synth_partsupp) — the relation behind the true
TPC-H Q9/Q11/Q16/Q20 shapes. Cross-engine equality is already proven by
the oracle parity of those four queries; these pins document the twin's
OWN contract so a future edit that silently changes it (key layout,
attribute domains) fails here first, with a named invariant instead of
a value-hash diff.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscrap_datapipeline_spark.catalog import load_table
from webscrap_datapipeline_spark.plans.analytics_queries import synth_partsupp

from .conftest import SF_SMALL


def test_partsupp_twin_invariants(spark):
    ps = synth_partsupp(spark, SF_SMALL).cache()
    try:
        stats = ps.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_partkey", "ps_suppkey").alias("n_keys"),
            F.min("ps_availqty").alias("min_qty"),
            F.max("ps_availqty").alias("max_qty"),
            F.min("ps_supplycost_cents").alias("min_cost"),
            F.max("ps_supplycost_cents").alias("max_cost"),
        ).first()
        # (partkey, suppkey) is a key — the union-distinct guarantees it
        assert stats["n"] == stats["n_keys"] > 0
        # dbgen's own attribute domains: availqty 1..9999, cost 1.00..1000.00
        assert 1 <= stats["min_qty"] and stats["max_qty"] <= 9999
        assert 100 <= stats["min_cost"] and stats["max_cost"] <= 100000

        # Q9's semantic precondition: EVERY observed lineitem
        # (partkey, suppkey) pair finds its partsupp row (inner join to
        # the twin loses no lineitem rows)
        li = load_table(spark, "lineitem", SF_SMALL).select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        orphans = li.join(ps, ["ps_partkey", "ps_suppkey"], "left_anti").count()
        assert orphans == 0

        # every part carries at least one supplier (the dbgen formula
        # contributes up to 4; collisions may dedupe but never to zero)
        n_parts = load_table(spark, "part", SF_SMALL).count()
        assert ps.select("ps_partkey").distinct().count() >= n_parts
    finally:
        ps.unpersist()


def test_partsupp_twin_deterministic_across_builds(spark):
    a = synth_partsupp(spark, SF_SMALL)
    b = synth_partsupp(spark, SF_SMALL)
    sym_diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert sym_diff == 0
