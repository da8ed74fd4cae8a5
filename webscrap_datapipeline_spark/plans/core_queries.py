"""Core relational query surface (SURVEY.md §2.1–§2.5 re-expressed).

Each query maps a reference operator (cited reference file:line) onto the
driver's TPC-H-ish test tables, with an exact DuckDB oracle. These are
declarative DataFrame plans end-to-end: Catalyst supplies pushdown,
pruning, join selection, and AQE supplies runtime re-planning — nothing
here hand-schedules execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import query

# ----------------------------------------------------------------------------
# Exact-aggregate helpers (see registry docstring for the determinism rules).


def dsum(col, alias: str, scale: int = 2):
    """Order-independent sum of a double column: exact DECIMAL accumulate,
    one final cast to double. Oracle mirror:
    CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def dsum_expr(expr, alias: str, scale: int = 6):
    """Same, for a computed per-row double expression (per-row IEEE math is
    deterministic; only the *accumulation* needs the decimal detour).
    Scale must cover the product's exact decimal width (e.g. 2-dec price ×
    2-dec disc × 2-dec tax → 6 decimals) so the cast never rounds — Spark
    and DuckDB disagree on double→decimal half-way rounding."""
    return F.sum(expr.cast(f"decimal(24,{scale})")).cast("double").alias(alias)


# ----------------------------------------------------------------------------
# Flagship: the reference's change-detection core (J1+J2+U2,
# reference src/utils.py:168-194) — "which keys changed since the stored
# state?" as one lazy anti-join plan. State here is simulated as the
# per-user watermark computed *excluding* a slice of events, so some users
# are missing (J1 path) and some have stale timestamps (J2 path).


@query(
    "change_detection",
    oracle="""
    WITH available AS (
        SELECT user_id, max(ts) AS lst_optimization
        FROM events GROUP BY user_id
    ), state AS (
        SELECT user_id, max(ts) AS lst_optimization
        FROM events WHERE event_id % 7 <> 0 GROUP BY user_id
    )
    SELECT a.user_id, a.lst_optimization
    FROM available a
    WHERE NOT EXISTS (
        SELECT 1 FROM state s
        WHERE s.user_id = a.user_id
          AND s.lst_optimization = a.lst_optimization
    )
    """,
    tags=("flagship", "anti-join", "incremental"),
)
def change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed-key detection: source watermarks anti-joined against state
    on the composite (key, ts) — one anti-join subsumes the reference's
    missing-hotels + stale-timestamp pair (src/utils.py:117-165).

    Scale: both sides are aggregates of the same fact table, so the join
    keys are already partitioned by the groupBy shuffle; the state side is
    small relative to the source and AQE broadcast-joins it.
    """
    events = load_table(spark, "events", sf_dir)
    available = events.groupBy("user_id").agg(F.max("ts").alias("lst_optimization"))
    state = (
        events.filter(F.col("event_id") % 7 != 0)
        .groupBy("user_id")
        .agg(F.max("ts").alias("lst_optimization"))
    )
    return available.join(
        state, ["user_id", "lst_optimization"], "left_anti"
    ).dropDuplicates(["user_id"])


# ----------------------------------------------------------------------------
# Aggregation over a big fact table (the "enrich + load" analytics shape;
# TPC-H Q1 pattern). Exercises filter pushdown + map-side partial agg.


@query(
    "pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) ) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate with filter pushed to the parquet scan.

    Scale: partial aggregation happens map-side; only |groups| rows
    shuffle. The shipdate predicate reaches the scan as a parquet filter.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
        dsum_expr(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            "sum_charge",
        ),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / cnt).alias(
            "avg_price"
        ),
        (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# ----------------------------------------------------------------------------
# Multi-way equi-join + agg + deterministic top-k (TPC-H Q3 pattern).


@query(
    "top_revenue_orders",
    oracle="""
    SELECT
        l_orderkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem → revenue per order → top 10.

    Scale: the segment filter prunes customer before the join; the
    (filtered) customer⋈orders side is the small one, so we pin the
    broadcast THERE and stream lineitem — without the hint Spark's
    size-estimate can pick the fact table as build side at small SF,
    which inverts catastrophically at 100 TB. Top-k is
    TakeOrderedAndProject — no full sort of the fact table. Tiebreak on
    l_orderkey keeps the limit deterministic for the oracle hash.
    """
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    co = cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.join(F.broadcast(co), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ----------------------------------------------------------------------------
# Six-table join (TPC-H Q5 pattern) — the join-reordering stress test.


@query(
    "local_supplier_volume",
    oracle="""
    SELECT
        n_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by supplier nation where customer and supplier share a
    nation — six-way join with dimension filters.

    Scale: region/nation/supplier/customer are dimensions → broadcast
    joins; only lineitem⋈orders is a real shuffle. Catalyst reorders the
    join tree; the r_name filter partition-prunes the dimension chain.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ----------------------------------------------------------------------------
# Anti / semi joins (reference J1/J2/J5, src/utils.py:117-165,
# src/gcp_processes.py:50-57).


@query(
    "customers_without_pending_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
    tags=("anti-join",),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join on a single key (reference J1). Broadcast-able:
    the distinct key set of orders is what actually joins. Filtered to
    in-progress orders so the anti-join result is non-empty at every SF."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "P")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
    tags=("semi-join",),
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (reference J5 — the IN-list string interpolation at
    src/gcp_processes.py:35-39 replaced by a real join; injection-free and
    pushdown-friendly)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ----------------------------------------------------------------------------
# Union + dedup (reference U1/U2, src/utils.py:134-190).


@query(
    "union_dedup_keys",
    oracle="""
    SELECT DISTINCT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_acctbal < 0
    )
    """,
    tags=("union", "dedup"),
)
def union_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of two key sets then dedup — the reference's combine of
    missing∪mismatched hotels (src/utils.py:187-190)."""
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.unionByName(b).dropDuplicates(["c_custkey"])


@query(
    "union_missing_columns",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT c_custkey, NULL AS c_mktsegment FROM customer WHERE c_acctbal < -500
    """,
    tags=("union",),
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the narrower side NULL-fills
    — exactly how the reference appends 1-column new-hotel rows into the
    2-column state table (src/utils.py:134-136)."""
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey", "c_mktsegment")
    b = cust.filter(F.col("c_acctbal") < -500).select("c_custkey")
    return a.unionByName(b, allowMissingColumns=True)


# ----------------------------------------------------------------------------
# Predicates (reference P4/P5, src/gcp_processes.py:39).


@query(
    "filter_in_conjunctive",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus = 'O'
      AND o_totalprice > 50000
    """,
    tags=("filter",),
)
def filter_in_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list ∧ equality ∧ range predicate, all pushed to the scan
    (reference's UPDATE WHERE clause, src/gcp_processes.py:39)."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 50000)
    ).select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")


# ----------------------------------------------------------------------------
# Theta (containment) join (reference J4, src/process_files.py:92-119):
# left outer so unmatched probe rows surface as NULL/zero — the
# reference's "hotel with no file gets a NULL log row" semantics.


@query(
    "keyword_containment_join",
    oracle="""
    SELECT k.kw, COUNT(d.doc_id) AS n_docs
    FROM (VALUES ('spark'), ('merge'), ('vector'), ('zzz_no_such_token')) k(kw)
    LEFT JOIN documents d ON contains(d.text, k.kw)
    GROUP BY k.kw
    """,
    tags=("theta-join",),
)
def keyword_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-containment left outer join. Non-equi → Spark picks
    BroadcastNestedLoopJoin with the 4-row side broadcast — the correct
    plan at any scale since the keyword side stays tiny. (At 100 TB with a
    *large* pattern side, the operator in operators/containment.py derives
    an equi key instead, as the reference's F3 regexp proves possible.)"""
    docs = load_table(spark, "documents", sf_dir)
    kw = spark.createDataFrame(
        [("spark",), ("merge",), ("vector",), ("zzz_no_such_token",)], ["kw"]
    )
    return (
        F.broadcast(kw)
        .join(docs, F.col("text").contains(F.col("kw")), "left_outer")
        .groupBy("kw")
        .agg(F.count("doc_id").alias("n_docs"))
    )


# ----------------------------------------------------------------------------
# Latest-record-per-key (reference K5+K3 current-flag protocol,
# src/gcp_processes.py:29-47 + src/process_files.py:50 — the query-time
# formulation per SURVEY.md §2.6).


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
    tags=("window", "scd"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRENT_IND='Y' as a window: row_number over (key, ts desc) = 1.
    event_id tiebreak keeps it deterministic."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query(
    "scd_current_flag_protocol",
    # Driver-checks the K5 storage protocol END-TO-END through the
    # engine-primitive path (operators/scd.scd_merge_into: saveAsTable
    # init → MERGE INTO de-flag / INSERT OVERWRITE fallback → INSERT
    # append) — round-6 VERDICT task 6. The oracle expresses the same
    # two-batch end state declaratively: batch-1 rows keep 'Y' unless
    # their key (NULL-safely) reappears in batch 2; batch-2 rows are
    # all current. Any divergence in the mutation path — a dropped
    # de-flag, a NULL key matched with plain equality, a lost row in
    # the overwrite — breaks the hash.
    oracle="""
    WITH b1 AS (
      SELECT o_custkey AS custkey, MAX(o_orderdate) AS last_order_date,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_custkey % 3 = 0 AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
      GROUP BY o_custkey
      UNION ALL
      SELECT NULL, TIMESTAMP '1990-01-01 00:00:00', CAST(0 AS BIGINT)
    ), b2 AS (
      SELECT o_custkey AS custkey, MAX(o_orderdate) AS last_order_date,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_custkey % 2 = 0 AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      GROUP BY o_custkey
      UNION ALL
      SELECT NULL, TIMESTAMP '1991-01-01 00:00:00', CAST(1 AS BIGINT)
    )
    SELECT b1.custkey, b1.last_order_date, b1.n_orders,
           CASE WHEN EXISTS (
             SELECT 1 FROM b2 WHERE b2.custkey IS NOT DISTINCT FROM b1.custkey
           ) THEN NULL ELSE 'Y' END AS current_ind
    FROM b1
    UNION ALL
    SELECT custkey, last_order_date, n_orders, 'Y' AS current_ind FROM b2
    """,
    tags=("scd", "mutation", "protocol"),
)
def scd_current_flag_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SCD current-flag protocol (K5+K3,
    src/gcp_processes.py:29-47 + src/process_files.py:50) executed FOR
    REAL against a catalog table: batch 1 (early-window per-customer
    order aggregates, keys ≡ 0 mod 3, plus a NULL-key row) initializes
    the table flagged 'Y'; batch 2 (late-window aggregates, keys ≡ 0
    mod 2, plus a NULL-key row) is applied through ``scd_merge_into`` —
    MERGE INTO on a v2 catalog, the identical-end-state INSERT OVERWRITE
    on the v1 catalog this container ships — and the FINAL table (both
    current and de-flagged rows) is returned. The table name is
    per-call unique and dropped in a ``finally``, so the query is
    side-effect-free and replayable; the result is eagerly checkpointed
    first so it survives the drop. The NULL-key rows pin the null-safe
    (``<=>``) match: plain equality would leave two current rows for
    the NULL key. At 100 TB the mutation cost is batch-key-sized (the
    MERGE source is DISTINCT keys), not table-sized."""
    import uuid as _uuid

    from ..operators.scd import scd_merge_into

    orders = load_table(spark, "orders", sf_dir)
    cutoff = F.lit("1995-01-01 00:00:00").cast("timestamp")

    def _batch(mod: int, early: bool, null_ts: str, null_n: int) -> DataFrame:
        pred = (F.col("o_custkey") % mod == 0) & (
            (F.col("o_orderdate") < cutoff) if early else (F.col("o_orderdate") >= cutoff)
        )
        agg = (
            orders.filter(pred)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.max("o_orderdate").alias("last_order_date"),
                F.count(F.lit(1)).alias("n_orders"),
            )
        )
        null_row = spark.range(1).select(
            F.lit(None).cast("bigint").alias("custkey"),
            F.lit(null_ts).cast("timestamp").alias("last_order_date"),
            F.lit(null_n).cast("bigint").alias("n_orders"),
        )
        return agg.unionByName(null_row)

    b1 = _batch(3, True, "1990-01-01 00:00:00", 0)
    b2 = _batch(2, False, "1991-01-01 00:00:00", 1)
    tbl = f"scd_protocol_tmp_{_uuid.uuid4().hex}"
    try:
        scd_merge_into(spark, tbl, b1, key="custkey", flag_col="current_ind")
        scd_merge_into(spark, tbl, b2, key="custkey", flag_col="current_ind")
        return (
            spark.table(tbl)
            .select("custkey", "last_order_date", "n_orders", "current_ind")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")


# ----------------------------------------------------------------------------
# Update-merge (reference J3, src/process_files.py:15-31): the iterrows
# state-update loop collapsed to one left join + coalesce.


@query(
    "state_update_merge",
    oracle="""
    WITH state AS (
        SELECT user_id, max(ts) AS lst_optimization
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id
    ), updates AS (
        SELECT user_id, max(ts) AS lst_optimization
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT s.user_id,
           coalesce(u.lst_optimization, s.lst_optimization) AS lst_optimization
    FROM state s LEFT JOIN updates u ON s.user_id = u.user_id
    """,
    tags=("join", "incremental"),
)
def state_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State table updated by changed keys: left join + coalesce — the
    set-based form of the reference's per-row `df.loc[...] = ts` loop."""
    events = load_table(spark, "events", sf_dir)
    state = (
        events.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.max("ts").alias("lst_optimization"))
    )
    updates = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("lst_optimization"))
    )
    return state.alias("s").join(updates.alias("u"), "user_id", "left").select(
        F.col("user_id"),
        F.coalesce(F.col("u.lst_optimization"), F.col("s.lst_optimization")).alias(
            "lst_optimization"
        ),
    )


# ----------------------------------------------------------------------------
# Grouping sets / rollup (extension surface, SURVEY.md §2.5).


@query(
    "rollup_order_stats",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with exact-decimal sums; NULL group markers match the SQL
    standard on both engines."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price")
    )


@query(
    "distinct_counts",
    oracle="""
    SELECT
        COUNT(DISTINCT l_partkey) AS distinct_parts,
        COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
        COUNT(DISTINCT l_orderkey) AS distinct_orders,
        COUNT(*) AS n_rows
    FROM lineitem
    """,
    tags=("agg", "distinct"),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (the approx_count_distinct variant lives
    in the rows-only surface — HLL sketches differ per engine)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count_distinct("l_suppkey").alias("distinct_suppliers"),
        F.count_distinct("l_orderkey").alias("distinct_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ----------------------------------------------------------------------------
# JSON extraction (extension surface for events.props; the reference's
# JSON state file read S4, src/utils.py:120-121, generalized).


@query(
    "json_props_extract",
    oracle="""
    SELECT
        event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over a JSON-string column, aggregated. Stays fully
    JVM-side (no Python UDF) — codegen-friendly at scale."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("bigint").alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ----------------------------------------------------------------------------
# Date bucketing (reference F2/F6/F7 date handling generalized).


@query(
    "orders_by_month",
    oracle="""
    SELECT
        CAST(year(o_orderdate) AS INTEGER) AS order_year,
        CAST(month(o_orderdate) AS INTEGER) AS order_month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("date", "agg"),
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing with exact sums — the shape of every
    partition-by-date layout decision at scale."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
    ).agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))


@query(
    "ship_months_without_orders",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month FROM lineitem
    EXCEPT
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS ship_month FROM orders
    """,
    tags=("setop", "except"),
)
def ship_months_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference, distinct semantics — SURVEY §2.4 notes the
    reference expresses difference only via anti-joins; this is the
    relational set-op twin). Months where something shipped but nothing
    was ordered — the shipping tail past the last order month."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # subtract = EXCEPT DISTINCT (set semantics); exceptAll would be bag
    # difference and keep months whose row counts merely differ.
    return li.select(F.date_trunc("month", "l_shipdate").alias("ship_month")).subtract(
        orders.select(F.date_trunc("month", "o_orderdate").alias("ship_month"))
    )


@query(
    "nations_with_customers_and_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "intersect"),
)
def nations_with_customers_and_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nations present on both sides of the
    market. Catalyst plans this as a left-semi aggregate, one shuffle."""
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    return cust.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supp.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "cube_order_stats",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2² grouping sets in one pass (Spark expands grouping
    sets map-side; one shuffle total, vs four separate groupBys)."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot", "agg"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): order counts per priority ×
    status. Explicit value list so the plan needs no extra distinct-scan
    pass and the output schema is static — the form that scales."""
    orders = load_table(spark, "orders", sf_dir)
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"),
        )
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
        F.col("P_n").alias("n_p"),
        F.col("O_t").cast("double").alias("open_total"),
    )
