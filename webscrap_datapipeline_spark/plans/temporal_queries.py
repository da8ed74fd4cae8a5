"""Time-series / window / temporal-join queries over `events` and
`orders` — the batch formulations of the streaming surface (SURVEY.md
§2.8) plus the as-of / range joins absent from the reference (§2.3).

Timestamp determinism: events.ts is µs-precision on both engines (see
catalog nanos handling); interval math uses epoch seconds as doubles,
which both engines derive identically from the same µs values. Running
float sums go through DECIMAL (segment-tree vs streaming accumulation
would otherwise produce different doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators.temporal import asof_join, range_join
from .registry import query


@query(
    "tumbling_10min_events",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming-batch"),
)
def tumbling_10min_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the batch twin of the Structured
    Streaming windowed count in streaming/windows.py (same F.window
    call). Epoch-aligned 10-minute buckets on both engines."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "session_windows_4h",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 14400
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM o
    )
    SELECT user_id, session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_no
    """,
    tags=("window", "session"),
)
def session_windows_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (4 h inactivity gap) via gaps-and-islands — the
    deterministic batch equivalent of F.session_window (the streaming
    formulation lives in streaming/windows.py). One shuffle on user_id;
    both window passes reuse the same partitioning."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    is_new = F.when(F.lag("ts").over(w).isNull() | (gap > 14400), 1).otherwise(0)
    return (
        events.withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(run).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "running_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
    tags=("window",),
)
def running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user. DECIMAL accumulation: Spark's streaming
    window aggregator and DuckDB's segment tree would associate float
    additions differently — decimals make the frame sum exact."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "event_lag_deltas",
    oracle="""
    SELECT event_id, user_id, ts,
           epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS secs_since_prev,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_event_type
    FROM events
    """,
    tags=("window", "lag"),
)
def event_lag_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation: seconds since the previous event and the next
    event's type, per user."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")).alias(
            "secs_since_prev"
        ),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "user_value_rank",
    oracle="""
    WITH t AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, total_value, n_events,
           CAST(dense_rank() OVER (ORDER BY total_value DESC, user_id ASC) AS BIGINT) AS rnk
    FROM t
    """,
    tags=("window", "rank"),
)
def user_value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank over exact per-user totals (global window — fine for
    |users| rows post-aggregation; never applied pre-aggregation)."""
    events = load_table(spark, "events", sf_dir)
    t = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    return t.select(
        "user_id", "total_value", "n_events", F.dense_rank().over(w).cast("bigint").alias("rnk")
    )


@query(
    "asof_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS matched_ts
    FROM events e
    ASOF JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("asof-join", "temporal"),
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order at-or-before it
    (operators/temporal.py union-and-carry-forward — one shuffle, no
    nested loop; DuckDB's native ASOF JOIN is the oracle)."""
    events = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    out = asof_join(
        events.withColumnRenamed("user_id", "k"),
        orders.withColumnRenamed("o_custkey", "k"),
        on="k",
        left_ts="ts",
        right_ts="o_orderdate",
        matched_as="matched_ts",
    )
    return (
        out.filter(F.col("matched_ts").isNotNull())  # inner semantics like the oracle
        .select("event_id", F.col("k").alias("user_id"), "ts", "matched_ts")
    )


@query(
    "price_band_distribution",
    oracle="""
    SELECT b.band, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem l
    JOIN (VALUES ('low', 0.0, 20000.0), ('mid', 20000.0, 60000.0),
                 ('high', 60000.0, 120000.0)) b(band, lo, hi)
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band
    """,
    tags=("range-join",),
)
def price_band_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a tiny band table (operators/temporal.py
    range_join: band side broadcast, fact side streams — a map-side
    interval lookup at any scale)."""
    li = load_table(spark, "lineitem", sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 20000.0), ("mid", 20000.0, 60000.0), ("high", 60000.0, 120000.0)],
        ["band", "lo", "hi"],
    )
    return (
        range_join(li, bands, F.col("l_extendedprice"), "lo", "hi")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias(
                "total_price"
            ),
        )
    )


@query(
    "sliding_10min_5min_events",
    oracle="""
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
                     time_bucket(INTERVAL '5 minutes', ts)]) AS window_start,
             event_type
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM expanded GROUP BY 1, 2
    """,
    tags=("window", "sliding", "streaming-batch"),
)
def sliding_10min_5min_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min window, 5 min slide — overlap factor 2):
    each event lands in exactly two windows; Spark expands them with the
    same F.window call the streaming builder (streaming/windows.py
    sliding_counts) uses. The oracle expands explicitly via unnest of the
    two epoch-aligned bucket starts."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@query(
    "value_percentiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (F.percentile ≡ DuckDB
    quantile_cont — same linear interpolation, so values hash-match).
    At 100 TB the same query swaps to percentile_approx (t-digest sketch,
    map-combinable) — kept exact here because the oracle demands it and
    the exact form is still a single shuffle."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.9), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


@query(
    "daily_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events WHERE user_id < 50 GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), days AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    )
    SELECT d.user_id, d.day, dl.day_value,
           last_value(dl.day_value IGNORE NULLS) OVER (
             PARTITION BY d.user_id ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM days d LEFT JOIN daily dl ON d.user_id = dl.user_id AND d.day = dl.day
    """,
    tags=("temporal", "gap-fill", "resample", "window"),
)
def daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per-user daily totals on a
    dense calendar (sequence+explode generates missing days), carry-
    forward imputation via last(ignorenulls) over an ordered window.
    The standard sensor/feed densification op.

    Scale: the dense calendar is generated per user from its own bounds
    (no global cross join); the left join and the window share the
    user_id partitioning, so the whole densify+fill is one shuffle.
    """
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 50)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("day_value"))
    days = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    joined = days.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "approx_value_percentiles",
    oracle=None,  # sketch output: deterministic for fixed input but not
    # portable across engines (DuckDB's approx_quantile is t-digest,
    # Spark's is Greenwald-Khanna); pytest pins <=1% error vs exact.
    tags=("agg", "sketch", "percentile", "rows-only"),
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch) per event type — the 100 TB
    percentile path. The exact twin (value_percentiles_by_type) needs a
    full sort per group; the sketch is one pass, mergeable map-side, and
    bounded-memory (accuracy parameter = 1/eps), which is why it is the
    only formulation that survives a 10^12-row group."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("approx_p")
    ).select(
        "event_type",
        F.col("approx_p")[0].alias("p50"),
        F.col("approx_p")[1].alias("p90"),
        F.col("approx_p")[2].alias("p99"),
    )


@query(
    "hourly_from_minute_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("rollup", "materialized-view", "agg"),
)
def hourly_from_minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable-rollup) semantics: the hourly
    answer is served FROM a minute-grain rollup — count of counts, sum
    of partial decimal sums — never from raw events; the oracle computes
    hourly directly from raw. Equality proves the rollup is a lossless
    re-aggregation point, the property that lets a 100 TB events table
    answer dashboard queries from a table 1/60th (or 1/3600th) its
    size. Partial sums stay DECIMAL through the rollup so the two-level
    aggregation is order-independent."""
    events = load_table(spark, "events", sf_dir)
    minute = events.groupBy(
        F.date_trunc("minute", "ts").alias("minute_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_partial"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_partial"),
    )
    return minute.groupBy(
        F.date_trunc("hour", "minute_start").alias("hour_start"), "event_type"
    ).agg(
        F.sum("n_partial").alias("n_events"),
        F.sum("sum_partial").cast("double").alias("total_value"),
    )
