"""Analytic query surface: multi-way joins, rollups, pivots, percentiles,
JSON extraction — the GROUP BY/join analytics the reference lacks entirely
(SURVEY.md §2.4/§2.6 note their absence) and Spark provides natively.
All decimal-exact or rounded per the parity rules in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import load_table


def _dec(col: str, scale: int = 4):
    return F.col(col).cast(f"decimal(18,{scale})")


@query(
    "top_revenue_orders",
    oracle="""
    WITH rev AS (
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY 1, 2, 3
    )
    SELECT o_orderkey, o_orderdate, o_orderpriority, revenue FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rn
      FROM rev
    ) WHERE rn <= 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3-shaped: selective dimension filter → fact join → top-k.
    customer is broadcast (small side); lineitem↔orders is the only real
    shuffle; the top-k is ``orderBy().limit()`` — Spark plans that as
    TakeOrderedAndProject (per-partition partial top-10, merged on the
    driver), NOT the single-task global sort a row_number window plans;
    the deterministic o_orderkey tiebreak keeps the boundary row stable
    (same rows as the oracle's rn <= 10)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )


@query(
    "regional_customer_volume",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_lineitems,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def regional_customer_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5-shaped 5-way join: the dimension chain
    region→nation→customer broadcasts down onto the fact scan — one fact
    shuffle for the final aggregation, everything else map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey).join(
            r, n.n_regionkey == r.r_regionkey
        ).select("c_custkey", F.col("n_name").alias("nation"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            # nation-grain scale-8 sums exceed 2^53·10⁻⁸ — string round-trip
            # avoids DuckDB's double-rounded decimal→double (see queries.py)
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("string")
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "priority_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in the reference; Spark-native).
    Subtotal rows carry NULL group keys in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    )


@query(
    "status_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders
    GROUP BY 1
    """,
)
def status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (deterministic column set — an
    explicit values list is also what makes `pivot()` scale-safe: no
    distinct-scan to discover columns)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


@query(
    "status_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 grouping combinations)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "scalar_function_families",
    oracle="""
    SELECT o_orderkey,
           to_base64(encode(o_orderpriority)) AS prio_b64,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_millis,
           md5(o_orderstatus || '|' || o_orderpriority) AS row_md5,
           o_orderdate + INTERVAL '90 days' < TIMESTAMP '1998-01-01 00:00:00' AS overdue,
           concat(o_orderstatus, ':', lpad(CAST(o_custkey AS VARCHAR), 10, '0')) AS status_key
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def scalar_function_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar families in one pass: base64, date formatting, epoch
    millis, md5, interval arithmetic, concat/pad — each mapped to the same
    DuckDB builtin."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return orders.select(
        "o_orderkey",
        F.base64(F.encode(F.col("o_orderpriority"), "UTF-8")).alias("prio_b64"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_millis"),
        F.md5(F.concat_ws("|", "o_orderstatus", "o_orderpriority")).alias("row_md5"),
        (
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            < F.lit("1998-01-01 00:00:00").cast("timestamp")
        ).alias("overdue"),
        F.concat(
            F.col("o_orderstatus"),
            F.lit(":"),
            F.lpad(F.col("o_custkey").cast("string"), 10, "0"),
        ).alias("status_key"),
    )


@query(
    "set_except_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operation: EXCEPT. DataFrame ``subtract`` IS SQL's
    EXCEPT DISTINCT (``exceptAll().distinct()`` would differ when the left
    side has duplicates — it only removes per-occurrence)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.subtract(big)


@query(
    "set_intersect_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: INTERSECT via DataFrame.intersect (INTERSECT DISTINCT)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big)


@query(
    "exists_semi_join",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
    )
    """,
)
def exists_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (the positive half of J1's anti-join)."""
    supplier = load_table(spark, sf_dir, "supplier")
    big_items = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 49
    ).select(F.col("l_suppkey").alias("s_suppkey"))
    return supplier.join(big_items, on="s_suppkey", how="left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "verify_report_all_tables",
    oracle="""
    WITH r AS (
      SELECT 'region' AS table_name,
             md5(string_agg(h, '' ORDER BY h)) AS checksum, COUNT(*) AS n_rows
      FROM (SELECT md5(concat_ws('|',
              COALESCE(CAST(r_regionkey AS VARCHAR), ''), COALESCE(r_name, ''))) AS h
            FROM region)
    ),
    n AS (
      SELECT 'nation' AS table_name,
             md5(string_agg(h, '' ORDER BY h)) AS checksum, COUNT(*) AS n_rows
      FROM (SELECT md5(concat_ws('|',
              COALESCE(CAST(n_nationkey AS VARCHAR), ''), COALESCE(n_name, ''),
              COALESCE(CAST(n_regionkey AS VARCHAR), ''))) AS h
            FROM nation)
    ),
    s AS (
      SELECT 'supplier' AS table_name,
             md5(string_agg(h, '' ORDER BY h)) AS checksum, COUNT(*) AS n_rows
      FROM (SELECT md5(concat_ws('|',
              COALESCE(CAST(s_suppkey AS VARCHAR), ''), COALESCE(s_name, ''),
              COALESCE(CAST(s_nationkey AS VARCHAR), ''),
              COALESCE(printf('%.6f', s_acctbal), ''))) AS h
            FROM supplier)
    )
    SELECT * FROM r UNION ALL SELECT * FROM n UNION ALL SELECT * FROM s
    """,
)
def verify_report_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verify command's report shape: one (table, checksum, rows) line
    per table — the reference's parallel multi-table verification
    (verify.rs:175-244) as a single unioned job."""
    from .operators.verify import strict_checksum_df

    parts = []
    for t in ("region", "nation", "supplier"):
        cs = strict_checksum_df(load_table(spark, sf_dir, t))
        parts.append(
            cs.select(
                F.lit(t).alias("table_name"),
                F.col("checksum"),
                F.col("row_count").alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "totalprice_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p25,
           round(percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p75
    FROM orders
    GROUP BY 1
    """,
)
def totalprice_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (both engines use the
    percentile_cont formula; rounded to 6 dp for float safety). At 100 TB
    swap to approx_percentile with a documented error bound."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
    )


@query(
    "events_props_json",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (§2.8 JSON family /
    get_json_object), aggregated by the extracted key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("bigint"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


@query(
    "checksum_customer_ordered",
    oracle="""
    WITH rendered AS (
      SELECT concat_ws('|',
        COALESCE(CAST(c_custkey AS VARCHAR), ''),
        COALESCE(c_name, ''),
        COALESCE(CAST(c_nationkey AS VARCHAR), ''),
        COALESCE(printf('%.6f', c_acctbal), ''),
        COALESCE(c_mktsegment, '')
      ) AS row_data
      FROM customer
    )
    SELECT
      CASE WHEN COUNT(*) = 0 THEN 'empty'
           ELSE md5(string_agg(row_data, '' ORDER BY row_data)) END AS checksum,
      COUNT(*) AS row_count
    FROM rendered
    """,
)
def checksum_customer_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact checksum formula — md5 over the ordered
    concatenation of rendered rows (checksum.rs:33-111, with ordering by
    the rendered string on both sides). Strict-mode only: the global sort +
    single-reducer concat is the anti-pattern our order-insensitive
    checksum (operators/verify.py) replaces at scale; this query exists to
    prove the engine can still reproduce the reference value bit-for-bit."""
    from .operators.verify import reference_ordered_checksum_df

    customer = load_table(spark, sf_dir, "customer")
    return reference_ordered_checksum_df(customer)


@query(
    "shipping_priority",
    # TPC-H q3 shape: revenue of not-yet-shipped lineitems for BUILDING
    # customers, top-10 orders. Decimal-exact revenue summed then cast to
    # double (the repo's cross-engine sum contract); ties break on
    # (o_orderdate, l_orderkey) so the top-10 set is deterministic.
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3-shaped 3-way join: the filtered customer dimension
    broadcasts onto the orders scan (both date predicates push into the
    parquet scans), one fact shuffle for the per-order aggregation, and
    the top-10 is a distributed TakeOrdered — no global sort."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
      GROUP BY 1
    ),
    f AS (
      SELECT s1.user_id, t1, t2, t3
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id
    ),
    agg AS (
      SELECT 1 AS step, 'view' AS event_type, COUNT(t1) AS n_users,
             CAST(NULL AS BIGINT) AS gap_us FROM f
      UNION ALL
      SELECT 2, 'click', COUNT(t2),
             SUM(CASE WHEN t2 IS NOT NULL THEN epoch_us(t2) - epoch_us(t1) END)
      FROM f
      UNION ALL
      SELECT 3, 'purchase', COUNT(t3),
             SUM(CASE WHEN t3 IS NOT NULL THEN epoch_us(t3) - epoch_us(t2) END)
      FROM f
    )
    SELECT step, event_type, n_users,
           round(CAST(n_users AS DOUBLE) /
                 (SELECT n_users FROM agg WHERE step = 1), 6) AS conversion,
           round(CAST(gap_us AS DOUBLE) / (n_users * 1000000.0), 6)
             AS avg_seconds_from_prev
    FROM agg
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step product funnel (view → click → purchase) via
    min-timestamp chaining: each stage is one filtered aggregation plus
    an equi-join on the user key — k small uniform-key shuffles, no
    per-user event sequences ever materialized
    (operators/funnel.funnel_counts)."""
    from .operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS TIMESTAMP)) AS act_week
      FROM events
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    ),
    joined AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS INT)
               AS week_offset,
             COUNT(*) AS n_active
      FROM activity a JOIN firsts f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT strftime(j.cohort_week, '%Y-%m-%d') AS cohort_week,
           j.week_offset, j.n_active, s.cohort_size,
           round(CAST(j.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM joined j JOIN sizes s ON j.cohort_week = s.cohort_week
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix: cohort = week of a user's first
    event; each cell is the share of the cohort active k weeks later.
    Two uniform-key shuffles (user, then cohort week) and a broadcastable
    cohort-size join — the week distinct on (user, week) collapses
    million-event users before any join."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    joined = (
        activity.join(firsts, on="user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return joined.join(F.broadcast(sizes), on="cohort_week").select(
        # render as STRING: Spark DATE reaches pandas as object(date),
        # DuckDB's week-trunc as datetime64 — same day, different dtype
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def _zorder_oracle_sql() -> str:
    from .operators.layout import interleave_bits_sql

    inter = interleave_bits_sql(["q1", "q2"], bits=8)
    return f"""
    WITH b AS (
      SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo1, CAST(MAX(o_custkey) AS DOUBLE) AS hi1,
             CAST(MIN(o_totalprice) AS DOUBLE) AS lo2, CAST(MAX(o_totalprice) AS DOUBLE) AS hi2
      FROM orders
    ),
    q AS (
      SELECT o_orderkey,
             CAST(floor((CAST(o_custkey AS DOUBLE) - lo1) / (hi1 - lo1) * 255.0) AS BIGINT) AS q1,
             CAST(floor((CAST(o_totalprice AS DOUBLE) - lo2) / (hi2 - lo2) * 255.0) AS BIGINT) AS q2
      FROM orders CROSS JOIN b
    )
    SELECT o_orderkey, CAST({inter} AS BIGINT) AS z_key,
           CAST(({inter}) >> 12 AS INT) AS z_shard
    FROM q
    """


@query("orders_zorder_keys", oracle=_zorder_oracle_sql())
def orders_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (o_custkey, o_totalprice):
    8-bit min-max quantization per column, bit interleave, and a FIXED
    top-bit shard split (16 shards) — the Delta/Iceberg OPTIMIZE ZORDER
    layout as exact reproducible arithmetic, no sampled range boundaries.
    Files written shard-by-shard carry tight min/max bounding boxes on
    BOTH columns, so parquet stats prune selective scans on either
    (operators/layout.py)."""
    from .operators.layout import column_bounds, zorder_keys

    orders = load_table(spark, sf_dir, "orders")
    bounds = column_bounds(orders, ["o_custkey", "o_totalprice"])
    out = zorder_keys(
        orders, ["o_custkey", "o_totalprice"], bounds, bits=8, n_shards=16
    )
    return out.select("o_orderkey", "z_key", "z_shard")


@query(
    "events_rolling_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    winstats AS (
      SELECT event_type, h, n,
             CAST(SUM(CAST(n AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(n AS DECIMAL(18,6)) * CAST(n AS DECIMAL(18,6))) OVER w
                  AS DOUBLE) AS s2,
             COUNT(*) OVER w AS k
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h, n, k AS window_n,
           round(s1 / k, 6) AS mean_prev,
           round((n - s1 / k) / sqrt((s2 - s1 * s1 / k) / (k - 1)), 6) AS zscore
    FROM winstats
    WHERE k >= 12 AND (s2 - s1 * s1 / k) > 0
    """,
)
def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over hourly event counts: each
    hour scored against the trailing 24-hour window (mean/std from
    EXACT decimal sums of n and n², so both engines feed identical
    doubles into the same float steps — no engine-specific streaming
    variance). One groupBy to the hour grain, then a bounded window per
    event type."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    dn = F.col("n").cast("decimal(18,6)")
    stats = hourly.select(
        "event_type",
        "h",
        "n",
        F.sum(dn).over(w).cast("double").alias("s1"),
        F.sum(dn * dn).over(w).cast("double").alias("s2"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / (F.col("k") - 1)
    return (
        stats.filter(
            (F.col("k") >= 12)
            & ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) > 0)
        )
        .select(
            "event_type",
            "h",
            "n",
            F.col("k").alias("window_n"),
            F.round(F.col("s1") / F.col("k"), 6).alias("mean_prev"),
            F.round(
                (F.col("n") - F.col("s1") / F.col("k")) / F.sqrt(var), 6
            ).alias("zscore"),
        )
    )


_PROFILE_COLS = {
    "o_orderkey": "CAST({c} AS VARCHAR)",
    "o_orderstatus": "{c}",
    "o_totalprice": "printf('%.6f', {c})",
    "o_orderdate": "strftime(CAST({c} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f')",
}


def _profile_oracle_sql() -> str:
    parts = []
    for c, render in _PROFILE_COLS.items():
        mn = render.format(c=f"MIN({c})")
        mx = render.format(c=f"MAX({c})")
        parts.append(
            f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
                 CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 COUNT(DISTINCT {c}) AS n_distinct,
                 {mn} AS min_value, {mx} AS max_value
              FROM orders"""
        )
    return " UNION ALL ".join(parts)


@query("profile_orders", oracle=_profile_oracle_sql())
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profile of four differently-typed orders columns in ONE scan
    (single agg + stack pivot): rows, nulls, exact distincts, canonical
    min/max rendering — the verification-tier stats table
    (operators/estimation.profile_table)."""
    from .operators.estimation import profile_table

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(orders, list(_PROFILE_COLS))


@query(
    "small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem l JOIN pavg p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < 0.2 * p.avg_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape — the correlated scalar subquery (per-part average
    gating the fact rows) decorrelated into an aggregate + equi-join,
    which is exactly what Catalyst's DecorrelateInnerQuery does to the
    SQL form: one part-key shuffle for the averages, one fact join on the
    same key (co-partitioned: AQE reuses the exchange), no per-row
    subquery execution anywhere. Revenue summed as exact decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    j = li.join(pavg, on="l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(
            F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6
        ).alias("avg_yearly"),
    )


@query(
    "constraint_audit_orders",
    oracle="""
    SELECT 'not_null:o_custkey' AS "constraint",
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'check:positive_total',
           CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'fk:orders_customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def constraint_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-sync data-quality audit (A3 generalized): NOT NULL + CHECK in
    one shared scan, pk uniqueness via a pruned groupBy, FK orphans via
    anti-join — one row per constraint with its violation count
    (operators/verify.constraint_audit)."""
    from .operators.verify import constraint_audit

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return constraint_audit(
        orders,
        unique_cols=["o_orderkey"],
        not_null_cols=["o_custkey"],
        checks={"positive_total": F.col("o_totalprice") > 0},
        fks={"orders_customer": (customer, "o_custkey", "c_custkey")},
    )


@query(
    "orders_price_histogram",
    oracle="""
    SELECT
      CAST(LEAST(FLOOR(o_totalprice / 50000.0), 11) AS BIGINT) AS bucket,
      COUNT(*) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        AS total_value
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (12 buckets of 50k, top bucket
    open-ended): the profiling shape behind data-distribution dashboards.
    Bucketing is a single map-side floor-divide on the same IEEE doubles
    in both engines; the per-bucket value sum carries decimal and
    round-trips through a string. One shuffle on the bucket id."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(11)).cast(
        "bigint"
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("string")
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("bucket")
    )
