"""Global contiguous id assignment — stable 0..N-1 row numbers in a
total order, without the single-partition bottleneck.

The naive formulation, ``row_number() OVER (ORDER BY key)`` with no
PARTITION BY, collapses the whole table into ONE task — the canonical
100 TB anti-pattern. The scalable shape is two passes:

  1. range-repartition on the sort key (so partition p holds keys all
     smaller than partition p+1's; equal keys co-locate) and count rows
     per partition — a driver-sized vector of partition counts;
  2. broadcast the per-partition starting offsets back and add them to
     the *within*-partition row_number.

The within-partition window sorts each partition independently (no
global sort barrier beyond the range exchange), and the result is
identical to the global row_number whatever boundaries the range
sampler picked — the oracle checks exactly that.

``monotonically_increasing_id`` remains the zero-shuffle alternative
when ids only need uniqueness + per-partition monotonicity, not
contiguity; the trade-off is documented here because choosing it
wrongly (e.g. for resumable sharding) is a classic pipeline bug.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_contiguous_ids(
    df: DataFrame, order_col: str, id_name: str = "row_id", num_partitions: int | None = None
) -> DataFrame:
    """Add ``id_name``: the 0-based rank of each row in the total order
    of ``order_col`` (which must be unique — ties would make the rank
    assignment of equal keys arbitrary). Two-pass, no global window."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The eager localCheckpoint is CORRECTNESS, not caching:
    # repartitionByRange picks its boundaries by reservoir-sampling the
    # input, and the sample seed differs per execution — without
    # materializing, pass 1 (offset counts) and pass 2 (the returned
    # plan) re-execute the exchange with DIFFERENT boundaries, so the
    # offsets disagree with the actual partition sizes and ids come out
    # with gaps/collisions. Reproduced at sf0.1 (round 3); the smaller
    # SFs sample every row, which made the boundaries accidentally
    # deterministic and hid the bug.
    ranged = (
        df.repartitionByRange(n, F.col(order_col).asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Pass 1: per-partition counts -> starting offsets (driver-sized).
    counts = ranged.groupBy("__pid").count().collect()
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["count"]
    # Pass 2: within-partition rank + broadcast offset. The offset map is
    # a literal CASE over partition ids (driver-sized by construction).
    w = Window.partitionBy("__pid").orderBy(F.col(order_col).asc())
    offset_expr: Column = F.lit(0)
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        offset_expr = mapping[F.col("__pid")]
    return (
        ranged.withColumn(
            id_name, (F.row_number().over(w) - 1 + offset_expr).cast("bigint")
        )
        .drop("__pid")
    )


def budgeted_take(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep the prefix of ``df`` in the total order of ``order_cols``
    whose running ``weight_col`` sum stays ≤ ``budget`` — "take the
    first N tokens of the hash-shuffled corpus" without the naive
    global-window cumulative sum (one-task bottleneck at scale).

    Same two-pass shape as :func:`assign_contiguous_ids`: range-
    partition on the order key (materialized eagerly — the same
    boundary-sampling determinism requirement), collect per-partition
    weight totals (driver-sized), broadcast prefix offsets back, and
    filter on within-partition cumulative sum + offset. The first row
    that would cross the budget is excluded (strict prefix ≤ budget).
    Weights must be non-negative; the order key must be unique (ties
    would make the crossing row ambiguous)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *[F.col(c).asc() for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = ranged.groupBy("__pid").agg(F.sum(weight_col).alias("w")).collect()
    offsets, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["w"]
    offset_expr: Column = F.lit(0)
    if offsets:
        mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        offset_expr = mapping[F.col("__pid")]
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(weight_col).over(w) + offset_expr
    return (
        ranged.withColumn("__cum", cum)
        .filter(F.col("__cum") <= budget)
        .drop("__pid", "__cum")
    )
