"""Extended SQL surface (SURVEY.md §2.3–§2.7 extension rows).

Operators absent from the reference (a 741-LoC pandas ETL with two
anti-joins and zero aggregates, see SURVEY §2.5-§2.6) but required for
"a user could switch their analytics here": full outer join, grouping
sets, scalar subqueries, explode/UDTF fan-out, array/string/math scalar
functions, and the rest of the window-function family. All pure
DataFrame built-ins — whole-stage codegen end-to-end, no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .core_queries import dsum
from .registry import query

# ----------------------------------------------------------------------------
# Joins: full outer


@query(
    "full_outer_customer_activity",
    oracle="""
    WITH early AS (
        SELECT o_custkey, COUNT(*) AS n_early
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
        GROUP BY o_custkey
    ), late AS (
        SELECT o_custkey, COUNT(*) AS n_late
        FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY o_custkey
    )
    SELECT COALESCE(e.o_custkey, l.o_custkey) AS o_custkey,
           COALESCE(e.n_early, 0) AS n_early,
           COALESCE(l.n_late, 0) AS n_late
    FROM early e FULL OUTER JOIN late l ON e.o_custkey = l.o_custkey
    """,
    tags=("join", "full-outer"),
)
def full_outer_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two disjoint-period aggregates of the same fact
    table — customers active only-early, only-late, or both.

    Scale: both inputs are aggregates of one scan (Spark reuses the
    exchange when keys match); the full outer is an equi sort-merge on
    the already-shuffled key, so no extra wide dependency.
    """
    orders = load_table(spark, "orders", sf_dir)
    cut = F.lit("1995-01-01").cast("timestamp")
    early = (
        orders.filter(F.col("o_orderdate") < cut)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_early"))
    )
    late = (
        orders.filter(F.col("o_orderdate") >= cut)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
    return (
        early.join(late, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_early", F.lit(0)).alias("n_early"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
    )


# ----------------------------------------------------------------------------
# Aggregation: GROUPING SETS (rollup/cube's general form)


@query(
    "grouping_sets_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize
    (SURVEY §2.5: absent in reference, Spark built-in). One pass over the
    fact table; Catalyst expands the sets map-side, so the shuffle still
    carries partially-aggregated rows, not the raw scan."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))


# ----------------------------------------------------------------------------
# Scalar subquery


@query(
    "parts_above_avg_price",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (
        SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) FROM part
    )
    """,
    tags=("subquery", "scalar"),
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: parts priced above the global mean.
    Expressed as a 1-row aggregate cross-joined (broadcast) into the
    scan — the plan Catalyst itself produces for an uncorrelated scalar
    subquery: one reduce to a single row, zero-cost broadcast, predicate
    evaluated inside the scan's codegen stage. Mean follows the
    exact-decimal-sum / count determinism rule."""
    part = load_table(spark, "part", sf_dir)
    mean = part.agg(
        (
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__mean")
    )
    return (
        part.join(F.broadcast(mean))
        .filter(F.col("p_retailprice") > F.col("__mean"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


# ----------------------------------------------------------------------------
# UDTF-ish fan-out: explode (SURVEY §2.9 X5 generalized to 1:N)


@query(
    "word_explode_topk",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
        FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
    tags=("explode", "udtf", "text"),
)
def word_explode_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N row fan-out (the generalized shape of the reference's
    row-building loop, src/process_files.py:90-121): explode documents
    into tokens, global top-20 by frequency with a total-order tiebreak.

    Scale: explode is a narrow op (no shuffle); the groupBy partially
    aggregates map-side so the shuffle carries (token, count) pairs —
    cardinality of the vocabulary, not the token stream.
    """
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# ----------------------------------------------------------------------------
# Scalar function families (SURVEY §2.7 extension: arrays / strings / math)


@query(
    "embedding_array_probe",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_component,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_component
    FROM embeddings WHERE vec_id < 100
    """,
    tags=("array", "functions"),
)
def embedding_array_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions over the embedding column: size,
    element_at, array_max/min. All JVM-side codegen; the float32→double
    cast is exact so both engines round the same value."""
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_component"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_component"),
    )


@query(
    "string_functions_probe",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS segment_rev,
           replace(c_name, '#', '-') AS name_dashed,
           concat_ws('|', c_mktsegment, c_name) AS seg_name
    FROM customer WHERE c_custkey % 97 = 0
    """,
    tags=("string", "functions"),
)
def string_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family (the reference's F4/F5/F9 surface widened):
    case, length, substring, pad, reverse, replace, concat_ws."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("segment_rev"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
    )


@query(
    "math_functions_probe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_delta,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           round(l_extendedprice, 1) AS price_round1,
           sqrt(l_quantity) AS qty_sqrt,
           l_extendedprice * l_extendedprice AS price_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem WHERE l_orderkey % 997 = 0
    """,
    tags=("math", "functions"),
)
def math_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family: abs/floor/ceil/round/sqrt/square/mod. Only
    IEEE-exact ops (sqrt is correctly rounded per IEEE-754 in both
    engines) — no libm-approximated transcendentals in a value-hashed
    query."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(F.col("l_orderkey") % 997 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_delta"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


# ----------------------------------------------------------------------------
# Window family completion: ntile / percent_rank / cume_dist,
# first/last/nth value, RANGE frames


@query(
    "ntile_value_quartiles",
    oracle="""
    WITH q AS (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS quartile
        FROM events
    )
    SELECT event_type, quartile, COUNT(*) AS n,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM q GROUP BY event_type, quartile
    """,
    tags=("window", "ntile"),
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) bucketing per event type, aggregated to quartile
    envelopes. Total order (value, event_id) makes bucket membership
    deterministic; both engines assign remainder rows to the earliest
    buckets."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


@query(
    "customer_balance_distribution",
    oracle="""
    SELECT c_custkey, c_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    QUALIFY c_custkey % 211 = 0
    """,
    tags=("window", "percent-rank"),
)
def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over a global total order (acctbal with
    key tiebreak), sampled post-window. Both are exact rationals of row
    positions — one IEEE division, identical on both engines.

    Scale note: a single global window is a 1-partition sort — at 100 TB
    this becomes rank-within-stratum or an approx quantile sketch; kept
    global here because the whole customer table at any sane SF fits one
    executor's sort buffer."""
    cust = load_table(spark, "customer", sf_dir)
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_acctbal",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("c_custkey") % 211 == 0)
    )


@query(
    "user_value_bookends",
    oracle="""
    SELECT user_id, event_id, value,
           first_value(value) OVER w AS v_first,
           last_value(value)  OVER w AS v_last,
           nth_value(value, 2) OVER w AS v_second
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY user_id < 50
    """,
    tags=("window", "first-last"),
)
def user_value_bookends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit unbounded frame (the
    default frame would make last_value = current row — the classic
    trap, spelled out here on purpose) with a total order per user."""
    events = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.first("value").over(w).alias("v_first"),
            F.last("value").over(w).alias("v_last"),
            F.nth_value("value", 2).over(w).alias("v_second"),
        )
        .filter(F.col("user_id") < 50)
    )


@query(
    "trailing_30d_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def trailing_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): each order's trailing
    30-day spend for its customer. Peers at the same day share a frame,
    so the result is deterministic even with date ties — the reason
    RANGE, not ROWS, is the correct frame here."""
    orders = load_table(spark, "orders", sf_dir)
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d"),
    )


# ----------------------------------------------------------------------------
# Sketch aggregation: approx_count_distinct (rows-only — HLL estimates
# are engine-specific by construction; pytest pins <5% relative error
# against the exact count)


@query(
    "approx_distinct_users",
    oracle=None,
    tags=("agg", "sketch", "rows-only"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type, next to the
    exact count. The sketch is THE 100 TB form of count-distinct: fixed
    ~kB state per group, map-side combinable, no key shuffle of the raw
    stream — exact distinct is the one aggregate that can't partially
    aggregate. rsd=0.01 ≈ 1% target error; pytest pins <5% observed."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )


# ----------------------------------------------------------------------------
# Date/time scalar family (SURVEY §2.7 F1/F2/F6/F7 widened: the reference
# only parses one filename timestamp format; an analytics user needs the
# full calendar toolbox)


@query(
    "date_functions_probe",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_ts,
           CAST(date_diff('day', TIMESTAMP '1995-06-01', o_orderdate) AS INT) AS days_from_epoch_cut,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders WHERE o_orderkey % 499 = 0
    """,
    tags=("date", "functions"),
)
def date_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar family: trunc/extract/offset/diff/format.
    Engine quirk pinned here: DuckDB `dayofweek` is 0=Sunday while
    Spark `dayofweek` is 1=Sunday — the oracle shifts by one. All
    JVM-side, codegen-friendly, no UDFs."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.filter(F.col("o_orderkey") % 499 == 0).select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-06-01").cast("timestamp")
        ).cast("int").alias("days_from_epoch_cut"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "order_value_tiers",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS tier,
           o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("case-when", "agg"),
)
def order_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing feeding a grouped aggregate — the
    conditional-column pattern the reference hand-rolled row-by-row
    (reference src/process_files.py:26-28) in its set-based form."""
    orders = load_table(spark, "orders", sf_dir)
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        orders.withColumn("tier", tier)
        .groupBy("tier", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@query(
    "lineitem_sample_stats",
    # Hash-of-key Bernoulli: the selection predicate (first md5 byte of
    # the composite line key < 26 ≈ 10.16%) is identical in both
    # dialects, so — unlike engine-seeded `sample()`, whose RNG stream
    # is engine-internal — the sampled SET is value-checkable exactly
    # (round-3 VERDICT item 6: one fewer rows-only row). avg goes
    # through an exact decimal sum + one shared IEEE division per the
    # registry determinism rules.
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_quantity FROM lineitem
      WHERE CAST(('0x' || substring(md5(l_orderkey || '|' || l_linenumber), 1, 2))
                 AS BIGINT) < 26
    )
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty
    FROM s GROUP BY 1
    """,
    tags=("sample", "hash-bernoulli"),
)
def lineitem_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample → grouped stats, selected by HASHING THE
    ROW KEY (first md5 byte of (l_orderkey, l_linenumber) < 26/256)
    rather than ``df.sample(fraction, seed)``. Sampling is THE first
    step of any 100 TB profiling pass; hash-of-key selection keeps it a
    pure scan-level projection+filter (no shuffle, cost scales with the
    table scan) while making membership rerun/append-stable AND
    engine-independent — the same row is picked on every engine, which
    is what lets the oracle value-check the sample itself. The
    engine-RNG path (`sample()`/TABLESAMPLE, reader-level pushdown,
    per-engine stream) remains covered rows-only by
    stratified_event_sample and its pytest fraction/determinism pins."""
    li = load_table(spark, "lineitem", sf_dir)
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("bigint")
    return (
        li.filter(h < 26)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_qty"),
        )
    )


# ----------------------------------------------------------------------------
# Skew mitigation as a checked query (operators/skew.py)


@query(
    "salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           COUNT(value) AS count_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
    tags=("skew", "agg"),
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the low-cardinality (hence
    hot-keyed) event_type column — result must equal a plain GROUP BY,
    which is exactly what the oracle asserts. Only decomposable
    aggregates (count/min/max) so salting is value-exact; a salted
    double-sum would reorder IEEE addition and is deliberately excluded
    (registry determinism rules)."""
    from ..operators.skew import salted_agg

    events = load_table(spark, "events", sf_dir)
    out = salted_agg(
        events,
        ["event_type"],
        [("value", "count"), ("value", "min"), ("value", "max")],
        salt_from="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type",
        "count_value",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@query(
    "map_functions_probe",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           array_to_string(json_keys(props), ',') AS key_list
    FROM events
    WHERE event_id < 2000
    """,
    tags=("map", "json", "functions"),
)
def map_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props column into a real
    map<string,int> (`from_json`), then element_at / size / map_keys —
    the typed-map path, versus json_props_extract's per-path string
    extraction. All JVM-side; the map never leaves codegen."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 2000)
    mp = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(mp, "k").alias("k_val"),
        F.size(mp).cast("int").alias("n_keys"),
        F.concat_ws(",", F.map_keys(mp)).alias("key_list"),
    )


# ----------------------------------------------------------------------------
# UNPIVOT / melt: wide→long reshaping as a first-class relational op
# (df.unpivot — Spark's Expand-based melt; DuckDB's UNPIVOT is the same
# reshape). The inverse of pivot_status_by_priority.


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS size,
               CAST(p_retailprice AS DOUBLE) AS retailprice
        FROM part WHERE p_partkey < 200
    )
    UNPIVOT (value FOR measure IN (size, retailprice))
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of two part measures via ``df.unpivot`` (one
    Expand projection — a 2× row fan-out, zero shuffles, streams at any
    scale). UNPIVOT in both engines drops NULL measure values by
    default; the measures here are non-null so the semantics agree
    trivially."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") < 200)
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ----------------------------------------------------------------------------
# LATERAL correlated subquery (SQL front door): per-customer top-2
# recent orders via LATERAL, the set-returning correlated form — a
# different planner path (DomainJoin de-correlation) than the window
# formulation in sql_top3_orders_per_customer.


@query(
    "lateral_recent_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_orderdate
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 2
    ) o
    WHERE c.c_custkey < 100
    """,
    tags=("sql", "lateral", "correlated", "topk"),
)
def lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's 2 most recent orders through a correlated LATERAL
    subquery — the same SQL text runs on Spark and the oracle. Catalyst
    de-correlates the per-row ORDER BY ... LIMIT into a ranked window
    join (no per-customer re-execution, unlike a true nested-loops
    LATERAL); the deterministic (date, orderkey) tiebreak makes both
    engines pick identical rows."""
    from ..catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_orderdate
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
            LIMIT 2
        ) o
        WHERE c.c_custkey < 100
        """
    )


# ----------------------------------------------------------------------------
# Array-valued aggregation: per-user ordered distinct event types —
# array results flowing through the oracle comparison.


@query(
    "user_event_type_sets",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), '|')
             AS event_types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    """,
    tags=("agg", "array"),
)
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → array_sort per user: array-typed aggregate (sorted,
    so both engines produce identical arrays — a raw collect_list would
    be partition-order-dependent and can never be oracle-checked).

    The array is emitted '|'-joined as a string: list-valued cells crash
    the driver's pandas ``sort_values`` canonicalization (the
    ``label_centroids`` round-2 comparator error), so array outputs must
    cross the driver boundary in a hashable form. The array-typed
    aggregation itself is still what's exercised — the join is the last
    projection on both engines."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("event_type")), "|"
            ).alias("event_types"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


# ----------------------------------------------------------------------------
# Regex function family (SURVEY §2.7 F1-F3 generalized): extract-all,
# count, group-replace — kept to RE2-safe syntax so Java and DuckDB
# dialects agree.


@query(
    "regex_functions_probe",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels
    FROM documents WHERE doc_id < 200
    """,
    tags=("regex", "functions"),
)
def regex_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all / regexp_extract(group) / regexp_replace over
    document text. Dialect discipline: character classes and groups
    only — no lookaround, no \\d-style escapes (Java and RE2 disagree on
    those corners). Spark's regexp_replace is global by default; DuckDB
    needs the explicit 'g' flag — the kind of cross-engine semantic the
    oracle exists to pin."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).alias("n_numbers"),
        F.regexp_extract("text", "([A-Za-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("len_no_vowels"),
    )


# ----------------------------------------------------------------------------
# NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other instead of vanishing — the semantic difference between
# "join on possibly-absent attribute" and silent row loss.


@query(
    "null_safe_region_match",
    oracle="""
    WITH a AS (
        SELECT n_nationkey,
               CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS rk
        FROM nation
    ), b AS (
        SELECT r_regionkey,
               CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END AS rk,
               r_name
        FROM region
    )
    SELECT a.n_nationkey, b.r_name
    FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk
    """,
    tags=("join", "null-safe"),
)
def null_safe_region_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join under NULL-safe equality (Spark's <=>): nations whose
    region key was nulled out still pair with the nulled region row —
    a plain `=` would silently drop them. Still hash-partitionable
    (NULL is just another key value to the partitioner), so the plan
    stays a broadcast/shuffled hash join, never nested-loop."""
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey",
        F.when(F.col("n_regionkey") == 0, F.lit(None))
        .otherwise(F.col("n_regionkey"))
        .alias("rk_a"),
    )
    region = load_table(spark, "region", sf_dir).select(
        F.when(F.col("r_regionkey") == 0, F.lit(None))
        .otherwise(F.col("r_regionkey"))
        .alias("rk_b"),
        "r_name",
    )
    return nation.join(
        F.broadcast(region), F.col("rk_a").eqNullSafe(F.col("rk_b"))
    ).select("n_nationkey", "r_name")


# ----------------------------------------------------------------------------
# Stratified sampling (sampleBy): per-stratum Bernoulli with distinct
# fractions — the class-balancing primitive for training-data curation.


@query(
    "stratified_event_sample",
    oracle=None,  # seeded sampling is engine-internal RNG; pytest pins
    # per-stratum proportions and determinism instead.
    tags=("sampling", "stratified", "rows-only"),
)
def stratified_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling: 50% of clicks, 10% of views, 100% of
    purchases (seed 7) — ``df.stat.sampleBy``, the scan-level
    class-rebalancer (each row decides locally from the seeded hash, no
    shuffle). Summary per type so the driver rows-check is stable."""
    events = load_table(spark, "events", sf_dir)
    sampled = events.sampleBy(
        "event_type", {"click": 0.5, "view": 0.1, "purchase": 1.0}, seed=7
    )
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_sampled"))


# ----------------------------------------------------------------------------
# Statistics aggregates, determinism-hardened: exact median, and sample
# stddev/variance derived from exact decimal power sums — never the
# engines' native one-pass (Welford) accumulators, whose float results
# differ per partitioning.


@query(
    "value_median_by_type",
    oracle="""
    SELECT event_type, median(value) AS median_value, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("agg", "stats", "median"),
)
def value_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (Spark's median == percentile 0.5 exact,
    DuckDB's median; both interpolate the even-count midpoint on the
    stored doubles, so values agree bit-for-bit). Exact medians need a
    per-group sort — the approx_percentile sketch twin is the 100 TB
    default; this is the small-group/high-stakes path."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.median("value").alias("median_value"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "value_dispersion_by_type",
    oracle="""
    WITH sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           s1 / n AS mean_value,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_value
    FROM sums
    """,
    tags=("agg", "stats", "stddev"),
)
def value_dispersion_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean and sample stddev per group via exact decimal power sums
    (Σx, Σx²) + one closed-form double computation. The engines' native
    stddev_samp is a streaming accumulator whose float result depends on
    partition boundaries — unusable for cross-engine parity AND for
    run-to-run reproducibility on a shuffling cluster; power sums are
    order-independent, and at scale they also partially aggregate
    map-side like any sum."""
    events = load_table(spark, "events", sf_dir)
    # value is exactly 2-decimal in the testdata; DECIMAL(18,2) holds it
    # exactly and its square (scale 4, precision 37) fits BOTH engines'
    # 38-digit decimal cap losslessly. Wider casts (e.g. (30,8)) overflow
    # the cap on multiplication and each engine truncates differently —
    # caught as a last-ulp stddev mismatch at sf0.001.
    v2 = F.col("value").cast("decimal(18,2)")
    sums = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v2).cast("double").alias("s1"),
        F.sum(v2 * v2).cast("double").alias("s2"),
    )
    return sums.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_value"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("stddev_value"),
    )


# ----------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type): parse once into the binary
# variant encoding, extract typed paths — the schema-on-read path that
# replaces per-query JSON string re-parsing (shredded storage upstream
# of columnar engines). Oracle: DuckDB JSON path extraction computes
# the same typed values.


@query(
    "variant_props_stats",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    """,
    tags=("variant", "semi-structured", "agg"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props parsed into a VARIANT column (parse_json — Spark 4's
    binary semi-structured encoding, parsed ONCE per row) with typed
    path extraction via variant_get, aggregated per bucket. At scale
    the variant column would be materialized at ingest so analytic
    queries never touch JSON text at all; this is that read path."""
    ev = load_table(spark, "events", sf_dir)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("k_sum"),
        )
    )
