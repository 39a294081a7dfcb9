"""Query-surface entries added in round 4 (late): warehouse-sink history
(SCD2), incremental view maintenance, span-level dedup, sequence analytics
(Markov transitions), TPC-H q13-shaped join distribution, token-budget
corpus selection, and time-series gap fill.

Determinism follows the house rules in queries.py: decimal-carried sums,
identical aliases both sides, integer-exact divisions emitted as the same
IEEE double on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .queries import _dec  # noqa: F401
from .sources.catalog import load_table


@query(
    "scd2_user_event_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history from a keyed change feed: the
    keep-every-version counterpart of the reference's overwrite upsert
    (J4, src/xmin/writer.rs:271-320). Consecutive duplicate states
    collapse; each version carries its validity interval. Two per-key
    windows, one shuffle on the key (operators/scd.py)."""
    from .operators.scd import scd2_from_changes

    ev = load_table(spark, sf_dir, "events")
    return scd2_from_changes(
        ev.select("user_id", "event_type", "ts", "event_id"),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    ).select(
        "user_id", "event_type", "valid_from", "valid_to", "version", "is_current"
    )


@query(
    "ivm_pricing_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
             AS l_extendedprice_sum,
           COUNT(l_extendedprice) AS l_extendedprice_cnt,
           MIN(l_extendedprice) AS l_extendedprice_min,
           MAX(l_extendedprice) AS l_extendedprice_max,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
             / CAST(COUNT(l_extendedprice) AS DOUBLE) AS l_extendedprice_avg
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def ivm_pricing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the rollup is maintained as mergeable
    partial aggregates (operators/ivm.py) — here the table is split into a
    base snapshot and a delta (the incremental-sync shape, S13), each
    aggregated independently, then MERGED. The oracle recomputes from the
    full table: merge(partial(base), partial(delta)) must equal it exactly.
    At 100 TB this replaces a full-corpus re-aggregation with an
    O(delta) + O(groups) merge per sync cycle."""
    from .operators.ivm import finalize, merge_partials, partial_agg

    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = ["l_extendedprice"]
    base = partial_agg(li.filter(F.col("l_orderkey") <= 7500), keys, measures)
    delta = partial_agg(li.filter(F.col("l_orderkey") > 7500), keys, measures)
    merged = merge_partials([base, delta], keys, measures)
    return finalize(merged, keys, measures)


#: shared CTE chain: word arrays → 8-gram windows → cross-document duplicated
#: grams → distinct covered word positions. Used by both span gates.
_SPAN_COV_CTES = """
    d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             generate_subscripts(grams, 1) - 1 AS pos,
             unnest(grams) AS gram
      FROM (
        SELECT doc_id,
               [array_to_string(words[i:i+7], ' ') FOR i IN range(1, n_words - 6)]
                 AS grams
        FROM d WHERE n_words >= 8
      )
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    cov AS (
      SELECT DISTINCT doc_id, wi FROM (
        SELECT g.doc_id, unnest(range(g.pos, g.pos + 8)) AS wi
        FROM g JOIN dup USING (gram)
      )
    )
"""


@query(
    "doc_duplicate_spans",
    oracle=f"""
    WITH {_SPAN_COV_CTES},
    per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered FROM cov GROUP BY doc_id)
    SELECT d.doc_id, d.n_words,
           COALESCE(per.n_covered, 0) AS n_covered,
           CAST(COALESCE(per.n_covered, 0) AS DOUBLE)
             / CAST(d.n_words AS DOUBLE) AS coverage
    FROM d LEFT JOIN per USING (doc_id)
    """,
)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (exact substring) duplication coverage per document — the
    fixed-k MapReduce form of suffix-array dedup (Lee et al. 2022). Word
    positions covered by any 8-gram occurring in ≥2 distinct docs count as
    duplicated; the masking stage consumes the per-doc coverage directly."""
    from .operators.corpus import duplicate_span_coverage

    docs = load_table(spark, sf_dir, "documents")
    out = duplicate_span_coverage(docs, k=8, min_docs=2)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_covered").cast("long").alias("n_covered"),
        "coverage",
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS next_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, next_type, COUNT(*) AS n_transitions,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag window on (ts, event_id), count per (prev, next), row-normalized
    per prev state. One shuffle on user_id for the lag, one on the pair for
    the count; the normalizing window runs over the tiny matrix."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wn = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wn).cast("double")
        ).alias("p"),
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: orders-per-customer via left outer join (customers
    with zero orders kept), then the distribution histogram. The outer join
    shuffles on the customer key; the histogram aggregates the (tiny)
    count space."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "corpus_token_budget",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    b AS (SELECT SUM(n_tokens) // 5 AS budget FROM t),
    c AS (
      SELECT doc_id, score, n_tokens,
             SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, score, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c, b WHERE cum_tokens <= budget
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-first corpus selection under a token budget (20% of the corpus):
    docs ranked by lexical-diversity score (type-token ratio), kept while
    the inclusive running token total fits. The oracle is the single global
    window; the engine runs the two-phase bucketed form
    (operators/corpus.py `select_token_budget`) — per-bucket windows plus
    broadcast driver-computed prefix offsets, so no task ever sorts more
    than ~1/1000 of the corpus."""
    from .operators.corpus import select_token_budget

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id",
        (
            F.size(F.array_distinct(words)).cast("double")
            / F.size(words).cast("double")
        ).alias("score"),
        F.size(words).cast("long").alias("n_tokens"),
    )
    total = t.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"]
    return select_token_budget(t, budget=int(total) // 5)


@query(
    "events_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hour_start) AS h0, MAX(hour_start) AS h1 FROM hourly),
    hours AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    spine AS (
      SELECT t.event_type, h.hour_start
      FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN hours h
    )
    SELECT s.event_type, s.hour_start,
           CAST(COALESCE(hourly.n_events, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN hourly USING (event_type, hour_start)
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time-series gap fill: a generated hour spine (min..max) per
    event type left-joined to the hourly rollup, zeros where no events — the
    shape downstream anomaly/forecast jobs require. The spine is generated
    (sequence + explode of a 1-row bound), never shuffled at data scale; the
    join shuffles only the rollup."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = hourly.agg(
        F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1")
    )
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias(
            "hour_start"
        )
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    return spine.join(hourly, ["event_type", "hour_start"], "left").select(
        "event_type",
        "hour_start",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )


@query(
    "doc_span_mask",
    oracle=f"""
    WITH {_SPAN_COV_CTES},
    wordpos AS (
      SELECT doc_id, unnest(words) AS word,
             generate_subscripts(words, 1) - 1 AS pos
      FROM d
    ),
    retained AS (
      SELECT w.doc_id, w.word, w.pos
      FROM wordpos w LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.wi = w.pos
      WHERE cov.doc_id IS NULL
    ),
    clean AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text
      FROM retained GROUP BY doc_id
    ),
    ndrop AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dropped FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(clean.clean_text, '') AS clean_text,
           COALESCE(ndrop.n_dropped, 0) AS n_dropped
    FROM d LEFT JOIN clean USING (doc_id) LEFT JOIN ndrop USING (doc_id)
    """,
)
def doc_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-producing half of span-level dedup: documents re-emitted
    with every duplicated-8-gram word position removed
    (operators/corpus.py `mask_duplicate_spans`). The per-doc rebuild is a
    lambda filter over the original word array — no reassembly shuffle."""
    from .operators.corpus import mask_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return mask_duplicate_spans(docs, k=8, min_docs=2)


@query(
    "changes_net_effect",
    oracle="""
    WITH ch AS (
      SELECT user_id,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'update' END AS op,
             event_id AS version,
             value
      FROM events
    ),
    agg AS (
      SELECT user_id,
             arg_min(op, version) AS first_op,
             arg_max(op, version) AS last_op,
             arg_max(value, version) AS value
      FROM ch GROUP BY user_id
    ),
    net AS (
      SELECT user_id,
             CASE WHEN last_op = 'delete'
                    THEN CASE WHEN first_op = 'insert' THEN NULL ELSE 'delete' END
                  WHEN first_op = 'insert' THEN 'insert'
                  ELSE 'update' END AS net_op,
             value
      FROM agg
    )
    SELECT user_id, net_op, value FROM net WHERE net_op IS NOT NULL
    """,
)
def changes_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog net-effect compaction (operators/incremental.py
    `compact_changes`): the event feed is read as a per-user change
    sequence (signup→insert, purchase→delete, else update, ordered by
    event_id) and collapsed to ONE net row per key — the normalization CDC
    runtimes apply so sink traffic is O(touched keys), not O(changes)."""
    from .operators.incremental import compact_changes

    ev = load_table(spark, sf_dir, "events")
    ch = ev.select(
        "user_id",
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .otherwise("update")
        .alias("op"),
        F.col("event_id").alias("version"),
        "value",
    )
    return compact_changes(ch, ["user_id"], "version", value_cols=["value"])


@query(
    "late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP))
            > epoch_us(CAST(o_orderdate AS TIMESTAMP)) + 7776000000000
    GROUP BY l_returnflag
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape adapted to the synthetic schema (no l_shipmode
    column): conditional aggregation over a fact-fact join with a
    cross-table date-arithmetic predicate — lines shipped >90 days after
    order placement, split by order priority class.

    The 90-day predicate is epoch-microsecond arithmetic on BOTH sides
    (90 d = 7_776_000_000_000 us) — instant arithmetic, the idiom the
    long-green ``events_funnel`` gate uses — instead of
    ``timestamp + INTERVAL 90 DAYS``, whose wall-clock semantics on
    TIMESTAMP_LTZ depend on session timezone/DST while DuckDB's naive
    timestamp interval addition does not (r5 driver hash mismatch).
    Columns are cast to the explicit LTZ type first (the load_table
    events.ts pattern — value-identical under the UTC session tz
    ensure_configured pins, and a no-op when the scan already yields
    LTZ), because ``unix_micros`` rejects TIMESTAMP_NTZ input."""
    from pyspark.sql.types import TimestampType

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ninety_days_us = 90 * 86400 * 1_000_000
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.unix_micros(F.col("l_shipdate").cast(TimestampType()))
            > F.unix_micros(F.col("o_orderdate").cast(TimestampType()))
            + F.lit(ninety_days_us)
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "orders_dow_seasonality",
    oracle="""
    WITH d AS (
      SELECT dayofweek(CAST(o_orderdate AS TIMESTAMP)) + 1 AS dow,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders
    )
    SELECT dow, n_orders, revenue, revenue / total AS revenue_share
    FROM d, t
    """,
)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: order counts and exact-decimal
    revenue per weekday plus each weekday's share of total revenue. The
    grand total is computed once in decimal (exact, order-independent) and
    broadcast — never a double sum over an unordered window, which would
    be partition-order-dependent."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.dayofweek("o_orderdate").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )
    total = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total")
    )
    return d.crossJoin(F.broadcast(total)).select(
        "dow", "n_orders", "revenue", (F.col("revenue") / F.col("total")).alias("revenue_share")
    )


@query(
    "events_user_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
               AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           MAX(len) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active days per user
    (the date-minus-row_number anchor trick). Distinct (user, day) first —
    heavy users collapse to ≤days rows before any window — then two
    aggregations on the user key."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
    )


@query(
    "orders_winsorize_report",
    oracle="""
    WITH b AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           b.p05, b.p95,
           CAST(SUM(CASE WHEN o.o_totalprice < b.p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN o.o_totalprice > b.p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high
    FROM orders o JOIN b USING (o_orderstatus)
    GROUP BY o.o_orderstatus, b.p05, b.p95
    """,
)
def orders_winsorize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-statistics winsorization report: per-group p05/p95 bounds
    (linear-interpolated percentiles — Spark and DuckDB share the
    definition, proven by the totalprice_percentiles gate) and how many
    rows each tail clip would touch. The bounds table is group-grain tiny
    and broadcast back onto the fact scan; counts are integers, so the
    output carries no double-rounding hazard."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    return (
        orders.join(F.broadcast(b), "o_orderstatus")
        .groupBy("o_orderstatus", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_totalprice") < F.col("p05"), 1).otherwise(0)).alias(
                "n_clipped_low"
            ),
            F.sum(F.when(F.col("o_totalprice") > F.col("p95"), 1).otherwise(0)).alias(
                "n_clipped_high"
            ),
        )
        .select("o_orderstatus", "n", "p05", "p95", "n_clipped_low", "n_clipped_high")
    )


@query(
    "local_supplier_revenue",
    oracle="""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 shape: revenue from lineitems where the supplier sits in
    the customer's own nation, rolled up by nation — a five-way join
    chain. The dimension spine (supplier⋈nation⋈region) is tiny and
    broadcast; the only data-scale shuffles are the two fact joins on
    their natural keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = supp.join(
        nation, supp.s_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(dims),
            (li.l_suppkey == dims.s_suppkey)
            & (cust.c_nationkey == dims.s_nationkey),
        )
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    # nation-grain scale-8 sums exceed 2^53·10⁻⁸ — string round-trip avoids
    # DuckDB's double-rounded decimal→double conversion (see queries.py)
    return joined.groupBy("n_name").agg(
        F.sum(rev).cast("string").cast("double").alias("revenue")
    )


_KMV_K = 256
_SPAN_DOUBLE = "1152921504606846976.0"  # 2^60 as an exact double literal


@query(
    "distinct_kmv_estimate",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT)
               AS h
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, h,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM h
    ),
    k AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
      FROM r WHERE rn <= {_KMV_K} GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_in_sketch,
           CASE WHEN n_in_sketch < {_KMV_K} THEN CAST(n_in_sketch AS DOUBLE)
                ELSE {_KMV_K - 1}.0 * {_SPAN_DOUBLE} / CAST(kth AS DOUBLE)
           END AS distinct_est
    FROM k
    """,
)
def distinct_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct sketch (operators/sketch.py) as a GATE: because the
    sketch is hash-deterministic (bottom-k of md5-based hash60), even the
    approximate estimate is bit-reproducible — the oracle recomputes the
    identical k smallest hashes and estimator in SQL. The engine never
    shuffles the value space (per-batch partial k-mins inside mapInPandas,
    then one k-bounded-array merge); the oracle's DISTINCT is the luxury
    the sketch exists to avoid."""
    from .operators.sketch import kmv_estimate, kmv_sketch

    li = load_table(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, ["l_returnflag"], "l_partkey", k=_KMV_K)
    return kmv_estimate(
        sk.withColumn("n_in_sketch", F.size("kmv").cast("long")), k=_KMV_K
    ).select("l_returnflag", "n_in_sketch", "distinct_est")


@query(
    "sample_quantile_estimate",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus, o_totalprice
      FROM orders
      WHERE CAST('0x' || substr(md5('7:' || CAST(o_orderkey AS VARCHAR)), 1, 15)
                 AS BIGINT) < CAST(0.25 * 1152921504606846976.0 AS BIGINT)
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           quantile_cont(o_totalprice, 0.5) AS median_est
    FROM s GROUP BY o_orderstatus
    """,
)
def sample_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile estimation from the deterministic hash-threshold sample
    (operators/sketch.py `bernoulli_sample`): the sample is reproducible
    across engines, so the estimate itself is oracle-exact. The scale
    contract: store the O(rate·n) sample next to the IVM partials and
    answer quantile queries without re-scanning the base."""
    from .operators.sketch import bernoulli_sample

    orders = load_table(spark, sf_dir, "orders")
    s = bernoulli_sample(orders, "o_orderkey", rate=0.25, seed=7)
    return s.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median_est"),
    )


@query(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
    FROM orders
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend: cumulative window aggregate over order
    history. The sum is carried in exact decimal inside the window (both
    engines fold identical decimals in frame order), cast to double only
    at the edge; ordering is total via the (date, key) tiebreak. One
    shuffle on the customer key; per-key frame state is O(1)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("cum_spend"),
    )


@query(
    "returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: revenue lost to returned items per customer, top
    20. The returnflag filter pushes into the lineitem scan; nation
    broadcasts; the top-k head is a distributed TakeOrdered (never a
    global sort). Ties broken by c_custkey so the LIMIT is deterministic
    cross-engine."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(t.total_qty AS DOUBLE) AS total_qty
    FROM customer, orders,
         (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
          FROM lineitem GROUP BY l_orderkey) t
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      AND c_custkey = o_custkey
      AND o_orderkey = t.l_orderkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: customers holding orders whose total lineitem
    quantity clears a threshold — grouped-HAVING subquery semi-joined back
    to the fact chain. The quantity rollup happens once and serves both
    the HAVING filter and the output column (ReuseExchange); quantities
    sum in exact decimal."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("total_qty")
    )
    big = totals.filter(F.col("total_qty") > 150)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@query(
    "order_grouping_sets",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
           CAST(GROUPING(CAST(year(o_orderdate) AS INT)) AS INT) AS g_year,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((CAST(year(o_orderdate) AS INT)),
                            (o_orderpriority), ())
    ORDER BY g_year, g_prio, o_year, o_orderpriority
    """,
)
def order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation flags — the
    third grouping-set surface next to the gated ROLLUP and CUBE, and the
    one that distinguishes a NULL group key from an aggregated-out key.
    Runs through spark.sql (the DataFrame API has no grouping-sets verb);
    one shuffle, partial aggregation underneath like any groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    orders.select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        "o_orderpriority",
        "o_totalprice",
    ).createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_year, o_orderpriority,
               CAST(GROUPING(o_year) AS INT) AS g_year,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_year), (o_orderpriority), ())
        ORDER BY g_year, g_prio, o_year, o_orderpriority
        """
    )


@query(
    "customer_value_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS c_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend_dec
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           CAST(CAST(spend_dec AS VARCHAR) AS DOUBLE) AS spend,
           CAST(ntile(10) OVER w AS INT) AS decile,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM spend
    WINDOW w AS (ORDER BY spend_dec DESC, c_custkey)
    ORDER BY rnk
    """,
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window family over customer lifetime spend: ntile decile
    assignment, rank, percent_rank, cume_dist. The ORDER carries a
    unique custkey tiebreak, so every member of the family derives from
    the (row rank, group size) pair: rank() = the unique rank,
    percent_rank = (r−1)/(n−1), cume_dist = r/n, ntile via the exact
    remainder-to-first-buckets formula — and the rank itself comes from
    operators/cumsum.grouped_rank (two-phase bucketed cumsum), so NO
    single task sorts the whole customer relation; this plan, not a
    promised swap, is what runs (equality with the window functions is
    asserted in tests/test_cumsum.py). percent_rank/cume_dist divide
    exact integer ranks, so the doubles match DuckDB bit-for-bit."""
    from .operators.cumsum import grouped_rank, ntile_expr

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(_dec("o_totalprice")).alias("spend_dec")
    )
    ranked = grouped_rank(
        spend, [], "spend_dec", "c_custkey", out_col="_r", ascending=False
    )
    n_df = spend.agg(F.count(F.lit(1)).alias("_n"))
    r = F.col("_r")
    n = F.col("_n")
    return (
        ranked.crossJoin(F.broadcast(n_df))
        .select(
            "c_custkey",
            F.col("spend_dec").cast("string").cast("double").alias("spend"),
            ntile_expr(r, n, 10).cast("int").alias("decile"),
            r.cast("bigint").alias("rnk"),
            # n = 1 edge: (r-1)/(n-1) is 0/0 → NULL in Spark, while
            # percent_rank() (and the DuckDB oracle) define it as 0.0
            F.when(n > 1, (r - 1) / (n - 1)).otherwise(F.lit(0.0)).alias(
                "pct_rank"
            ),
            (r / n).alias("cume"),
        )
        .orderBy("rnk")
    )


@query(
    "quality_unpivot",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
               AS BIGINT) AS n_punct
      FROM documents WHERE doc_id < 100
    )
    UNPIVOT c ON n_chars_m, n_tokens, n_punct
    INTO NAME metric VALUE value
    """,
)
def quality_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-document quality metrics to long
    (doc_id, metric, value) form — the shape feature stores and metric
    sinks ingest. Map-only (no shuffle); the DataFrame `unpivot` verb is
    the inverse of the gated conditional-aggregation pivot."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = F.col("text")
    wide = docs.select(
        "doc_id",
        F.length(t).cast("bigint").alias("n_chars_m"),
        F.size(F.split(F.trim(t), r"\s+")).cast("bigint").alias("n_tokens"),
        F.regexp_count(t, F.lit(r"[.!?,;:]")).cast("bigint").alias("n_punct"),
    )
    return wide.unpivot(
        ids=["doc_id"],
        values=["n_chars_m", "n_tokens", "n_punct"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "row_diff_orders",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'X', o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    s AS (
      SELECT o_orderkey, md5(concat_ws('|',
        COALESCE(CAST(o_custkey AS VARCHAR), ''),
        COALESCE(o_orderstatus, ''),
        COALESCE(printf('%.6f', o_totalprice), ''),
        COALESCE(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f'), ''),
        COALESCE(o_orderpriority, ''))) AS s_hash
      FROM orders
    ),
    t AS (
      SELECT o_orderkey, md5(concat_ws('|',
        COALESCE(CAST(o_custkey AS VARCHAR), ''),
        COALESCE(o_orderstatus, ''),
        COALESCE(printf('%.6f', o_totalprice), ''),
        COALESCE(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f'), ''),
        COALESCE(o_orderpriority, ''))) AS t_hash
      FROM tgt
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN t_hash IS NULL THEN 'missing_in_target'
                WHEN s_hash IS NULL THEN 'extra_in_target'
                WHEN s_hash != t_hash THEN 'mismatch' END AS status
    FROM s FULL OUTER JOIN t ON s.o_orderkey = t.o_orderkey
    WHERE (CASE WHEN t_hash IS NULL THEN 'missing_in_target'
                WHEN s_hash IS NULL THEN 'extra_in_target'
                WHEN s_hash != t_hash THEN 'mismatch' END) IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def row_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level divergence classification (operators/reconcile.row_diff):
    a synthetic target drops every 97th order, perturbs every 89th price,
    and appends shifted-key extras; the diff must name each divergent key
    with its kind and nothing else. Both sides hash the same canonical
    rendering the checksums use, so the comparison is value-exact across
    engines; the join shuffles (pk, hash) pairs only."""
    from .operators.reconcile import row_diff

    orders = load_table(spark, sf_dir, "orders")
    tgt = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    return row_diff(orders, tgt, ["o_orderkey"]).orderBy("o_orderkey")


@query(
    "fk_consistent_sample",
    oracle="""
    WITH sc AS (
      SELECT c_custkey FROM customer
      WHERE CAST('0x' || substr(md5('1:' || CAST(c_custkey AS VARCHAR)), 1, 15)
            AS BIGINT) < 230584300921369408
    ),
    so AS (
      SELECT o.o_orderkey FROM orders o JOIN sc ON sc.c_custkey = o.o_custkey
    ),
    sl AS (
      SELECT l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN so ON so.o_orderkey = l.l_orderkey
    )
    SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM sc
    UNION ALL SELECT 'orders', COUNT(*) FROM so
    UNION ALL SELECT 'lineitem', COUNT(*) FROM sl
    ORDER BY table_name
    """,
)
def fk_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity-preserving fixture sampling
    (operators/fk.fk_consistent_sample): a 20% deterministic
    hash-threshold draw of customers pulls every one of their orders and
    every one of those orders' lineitems — zero orphans by construction.
    The gate reports the per-table sampled row counts; the oracle follows
    the identical hash rule and FK chain."""
    from .operators.fk import fk_consistent_sample as fks

    tables = {
        "customer": load_table(spark, sf_dir, "customer"),
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
    }
    sampled = fks(
        tables,
        root="customer",
        root_key="c_custkey",
        child_edges=[
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
        rate=0.2,
        seed=1,
    )
    parts = [
        sampled[t].agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("table_name"), "n_rows"
        )
        for t in ("customer", "orders", "lineitem")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")
