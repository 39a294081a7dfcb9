"""Round-6 query-surface additions: concentration analytics (Pareto,
Herfindahl), discrete quantiles, last-touch attribution, asymmetric
shingle containment, an inverted keyword index, cross-source duplication
accounting, and matryoshka-truncated ANN.

These extend the beyond-reference pipeline tiers (corpus curation,
embedding serving, warehouse analytics); the replication surface itself
is complete per SURVEY.md §2. Determinism follows the house rules in
queries.py — integer/decimal-exact arithmetic until one final identical
double op per side, identical aliases, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .queries_llm import _DOT_SQL, _NORM_SQL, _SHINGLES_CTE, _UNIT_SQL
from .sources.catalog import load_table


@query(
    "nation_customer_pareto",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                           AS BIGINT)) AS BIGINT) AS units
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT n_name, units,
             SUM(units) OVER (PARTITION BY n_name
                              ORDER BY units DESC, c_custkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
             SUM(units) OVER (PARTITION BY n_name) AS total
      FROM spend
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
    )
    SELECT n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN 5 * (cum - units) < 4 * total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_top80,
           CAST(MAX(total) AS DOUBLE) / 10000 AS revenue
    FROM ranked GROUP BY n_name
    """,
)
def nation_customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per market: how many customers carry 80% of
    each nation's revenue. Spend is carried as integer ten-thousandths
    (DECIMAL(18,4)·10⁴ → BIGINT) so the cumulative window sums and the
    80% threshold (5·cum_before < 4·total) are pure integer arithmetic —
    no cross-engine decimal precision/scale typing to align. A customer
    row is in the top-80 set while the revenue BEFORE it is under 80%
    (the crossing row is included).

    Plan: one shuffle on o_custkey for the spend aggregate, broadcast
    joins to the customer/nation dims, then the running total via
    operators/cumsum.grouped_running_sum — the two-phase bucketed
    cumulative sum (per-group coarse bins, distributed prefix offsets,
    per-bucket windows), so no single task ever sorts a whole nation's
    customer slice. Value-identical to the naive one-window plan
    (tests/test_cumsum.py asserts equality), which is why this gate can
    run the 100 TB-shaped plan even at fixture scale."""
    from .operators.cumsum import grouped_running_sum

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,4)") * 10000).cast("bigint")
        ).alias("units")
    )
    ranked = (
        spend.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            spend.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "c_custkey", "units")
    )
    # per-nation totals via aggregate + join, not a partitionBy-only
    # window (which would collocate every nation's customer slice in one
    # task — the same hazard grouped_running_sum exists to remove)
    totals = ranked.groupBy("n_name").agg(F.sum("units").alias("total"))
    # size ONCE on the cheap pre-aggregated side (one row per customer)
    # instead of letting mode="auto" run its own sizing job per call —
    # the RFM gate's rank_mode idiom (one fewer job in the plan)
    from .operators.cumsum import SMALL_THRESHOLD

    rank_mode = "single" if spend.count() <= SMALL_THRESHOLD else "distributed"
    return (
        grouped_running_sum(
            ranked, ["n_name"], "units", "c_custkey", mode=rank_mode
        )
        .join(totals, on="n_name")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(
                    5 * (F.col("cum") - F.col("units")) < 4 * F.col("total"), 1
                ).otherwise(0)
            ).alias("n_top80"),
            (F.max("total").cast("double") / 10000).alias("revenue"),
        )
    )


@query(
    "doc_shingle_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2, inter, s1.n AS n1, s2.n AS n2,
           inter / LEAST(s1.n, s2.n) AS containment
    FROM co
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE 2 * inter >= LEAST(s1.n, s2.n)
    """,
)
def doc_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-duplication: the overlap coefficient
    inter/min(|A|,|B|) catches a short document CONTAINED in a long one
    (quote farms, boilerplate wrappers), which symmetric Jaccard dilutes
    — the containment measure of Broder's resemblance/containment pair
    (Broder 1997, "On the resemblance and containment of documents").
    Threshold ≥ 0.5 applied as integer arithmetic (2·inter ≥ min), the
    division to a double happens once, identically, per side.

    Plan: reuses jaccard_pairs' df≥2-pruned co-occurrence join (the
    deliberately-quadratic exact tier; the LSH-candidate variant is the
    scale path, exactly as with dedup_lsh_verified)."""
    from .operators.dedup import doc_shingles, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(doc_shingles(docs), threshold=0.0)
    least = F.least(F.col("n1"), F.col("n2"))
    return (
        pairs.filter(2 * F.col("inter") >= least)
        .withColumn("containment", F.col("inter") / least)
        .select("doc1", "doc2", "inter", "n1", "n2", "containment")
    )


@query(
    "doc_keyword_postings",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, UNNEST(regexp_split_to_array({_NORM_SQL}, ' '))
              AS tok
            FROM documents)
    )
    SELECT tok AS term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string((list_sort(list(doc_id)))[1:20], ',')
             AS postings_head
    FROM toks
    GROUP BY tok
    HAVING COUNT(*) >= 10
    """,
)
def doc_keyword_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted keyword index over the corpus: per term, document
    frequency and the head of the sorted posting list — the build step
    of full-text retrieval and of df-based quality/contamination rules.
    df < 10 terms are dropped (the long tail that dominates distinct
    terms but serves no retrieval purpose at this grain); the posting
    HEAD (first 20 doc ids, sorted, rendered as one comma-joined STRING
    so the gate output is hashable by a pandas canonicalizer — array
    columns are not) keeps row width bounded — at 100 TB the full lists
    shard by (term, doc_id bucket) instead.

    Plan: explode → distinct (term-keyed) → one groupBy on term; the
    shuffle key is the term hash (uniform), collect_list is bounded by
    the distinct-doc count per term and the output slice."""
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))), " ")
        ).alias("term"),
    ).distinct()
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20).cast(
                    "array<string>"
                ),
                ",",
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= 10)
    )


@query(
    "embedding_matryoshka_topk",
    oracle=f"""
    WITH sliced AS (
      SELECT vec_id, (embedding)[1:16] AS emb FROM embeddings
    ),
    units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='emb')} AS unit FROM sliced
    ),
    q AS (SELECT vec_id AS query_id, unit AS qvec FROM units WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             round({_DOT_SQL.format(a='c.unit', b='q.qvec')}, 6) AS cosine
      FROM units c, q
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def embedding_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncated ANN (Kusupati et al. 2022, "Matryoshka
    Representation Learning"): retrieval on the first 16 of 64 dims,
    re-normalized — the cheap first pass of adaptive-dimension serving
    (coarse candidate sweep on the prefix, exact rerank on full vectors;
    the rerank composes with topk_blas exactly as PQ's ADC prescreen
    does). Truncation is a zero-shuffle projection (F.slice), and the
    prefix index is 4× smaller — the lever that matters when the vector
    table IS the bottleneck at 100 TB."""
    from .operators.similarity import topk_blas

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    return topk_blas(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query(
    "events_last_touch_attribution",
    oracle="""
    WITH ordered AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type != 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, '(direct)') AS channel,
           COUNT(*) AS conversions,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             AS attributed_value
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the user's most recent PRECEDING non-purchase event type; purchases
    with no prior touch credit '(direct)'. The marketing-analytics
    counterpart of the funnel/retention family (operators/funnel.py).

    Plan: one user-keyed window (last-ignorenulls over an unbounded
    preceding frame — Spark evaluates it streaming within the frame, no
    per-user materialization) + one channel-keyed aggregate; both
    shuffle keys uniform. Ties inside a user break on event_id, both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", channel)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("(direct)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@query(
    "corpus_cross_source_dups",
    oracle=f"""
    WITH fp AS (
      SELECT DISTINCT
        md5(array_to_string(
              (regexp_split_to_array({_NORM_SQL}, ' '))[1:16], ' '))
          AS fingerprint,
        source
      FROM documents
    )
    SELECT a.source AS source1, b.source AS source2, COUNT(*) AS n_shared
    FROM fp a JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def corpus_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    shared document OPENINGS (md5 of the first 16 normalized tokens)
    they have — the accounting a crawl-dedup policy is built on (which
    feeds re-crawl which; whose boilerplate template leaks into whom).
    The prefix fingerprint is the standard boilerplate-detection key:
    whole-text md5 only catches byte-identical re-crawls (zero pairs at
    small scales in this corpus), while shared openings surface template
    reuse at every scale. Per-source fingerprints are deduped BEFORE the
    self-join, so the join is set-vs-set.

    Plan: one distinct on (fingerprint, source), then a self-join keyed
    on the fingerprint hash — uniform key, candidate-bounded output
    (sources² at most), no document text ever shuffled."""
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text_expr(F.coalesce(F.col("text"), F.lit("")))
    fp = docs.select(
        F.md5(F.array_join(F.slice(F.split(norm, " "), 1, 16), " ")).alias(
            "fingerprint"
        ),
        "source",
    ).distinct()
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source1"), F.col("b.source").alias("source2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "shipping_delay_quantiles",
    oracle="""
    WITH delays AS (
      SELECT o_orderpriority,
             (epoch_us(CAST(l_shipdate AS TIMESTAMP))
              - epoch_us(CAST(o_orderdate AS TIMESTAMP))) // 86400000000
               AS delay_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    ranked AS (
      SELECT o_orderpriority, delay_days,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY delay_days) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM delays
    )
    SELECT o_orderpriority,
           MAX(n) AS n_lines,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN delay_days END) AS p50_days,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delay_days END)
             AS p90_days
    FROM ranked GROUP BY o_orderpriority
    """,
)
def shipping_delay_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1) p50/p90 of order→ship delay per order priority —
    SLA reporting on the replication-verify surface. Quantiles are picked
    by POSITION in the per-group sort (rn = ⌈p·n⌉ via pure integer
    formulas), not interpolated: interpolation's fractional-weight
    arithmetic is a cross-engine 1-ulp hazard, while the element at a
    sorted position is integer-exact and tie-order-independent (equal
    delays at the boundary yield the same value under any tie order).
    Delay days use the same epoch-micros instant arithmetic as
    late_shipment_priority (timezone-free on both engines).

    Plan: one join shuffle, then ranks via the two-phase bucketed
    cumsum (operators/cumsum.positional_quantiles — per-bucket windows
    with distributed offsets, asserted equal to row_number ranking), so
    no single task sorts a whole priority group's 600k-row slice even
    though only 5 groups exist — the plan is already the 100 TB shape.
    The rank tiebreak is l_linenumber-unique (orderkey, linenumber) via
    a synthetic id; equal delays at the picked position yield the same
    value under any tie order, so the output is tie-independent."""
    from pyspark.sql.types import TimestampType

    from .operators.cumsum import positional_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = (
        (
            F.unix_micros(F.col("l_shipdate").cast(TimestampType()))
            - F.unix_micros(F.col("o_orderdate").cast(TimestampType()))
        )
        / F.lit(86400000000)
    ).cast("long")
    delays = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderpriority",
            delay.alias("delay_days"),
            (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("_rid"),
        )
        # localCheckpoint: positional_quantiles evaluates its input
        # three times (sizing count, rank pass, sizes aggregate) — one
        # fact-join execution instead of three (r14)
        .localCheckpoint()
    )
    return positional_quantiles(
        delays,
        ["o_orderpriority"],
        "delay_days",
        "_rid",
        fractions=[(1, 2, "p50_days"), (9, 10, "p90_days")],
    ).select(
        "o_orderpriority",
        F.col("n").alias("n_lines"),
        "p50_days",
        "p90_days",
    )


@query(
    "part_brand_supplier_hhi",
    oracle="""
    WITH sup_rev AS (
      SELECT p_brand, l_suppkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                           AS BIGINT)) AS BIGINT) AS units
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT p_brand,
           COUNT(*) AS n_suppliers,
           CAST(SUM(units) AS DOUBLE) / 10000 AS revenue,
           CAST(CAST(SUM(CAST(units AS DECIMAL(19,0))
                         * CAST(units AS DECIMAL(19,0))) AS VARCHAR)
                AS DOUBLE)
             / (CAST(SUM(units) AS DOUBLE) * CAST(SUM(units) AS DOUBLE))
             AS hhi
    FROM sup_rev GROUP BY p_brand
    """,
)
def part_brand_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supply concentration per part brand:
    HHI = Σ share_i² = Σ units_i² / (Σ units_i)² — 1/n for perfectly
    split supply, 1.0 for a single-supplier brand; the standard market-
    concentration screen run against the replicated warehouse.

    Numerics: revenue is carried as integer ten-thousandths (the
    nation_customer_pareto trick). Squares go through DECIMAL(19,0)
    (int128 storage in DuckDB — a bare DECIMAL(18) multiply overflows
    int64 there; scale 0 means Spark's over-38-precision cap cannot
    REDUCE any scale, so the product stays exact in both engines). The
    squares' sum converts once via the string round-trip (> 2⁵³); the
    totals (< 2⁵³ at gate scales) cast to double exactly; the final
    division runs on identical doubles.

    Plan: broadcast the part dim into the lineitem scan, one shuffle on
    (brand, suppkey), then a brand-keyed reaggregate — two map-side-
    combined aggregates, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup_rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,4)") * 10000).cast(
                    "bigint"
                )
            ).alias("units")
        )
    )
    u19 = F.col("units").cast("decimal(19,0)")
    tot = F.sum("units").cast("double")
    num = F.sum(u19 * u19).cast("string").cast("double")
    return sup_rev.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        (tot / 10000).alias("revenue"),
        (num / (tot * tot)).alias("hhi"),
    )


@query(
    "orders_rfm_segments",
    oracle="""
    WITH maxd AS (
      SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) AS d FROM orders
    ),
    cust AS (
      SELECT o_custkey,
             (epoch_us((SELECT d FROM maxd))
              - epoch_us(MAX(CAST(o_orderdate AS TIMESTAMP)))) // 86400000000
               AS recency_days,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                           AS BIGINT)) AS BIGINT) AS units
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, units,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey)
                  AS INT) AS r_q,
             CAST(ntile(5) OVER (ORDER BY n_orders DESC, o_custkey)
                  AS INT) AS f_q,
             CAST(ntile(5) OVER (ORDER BY units DESC, o_custkey)
                  AS INT) AS m_q
      FROM cust
    )
    SELECT r_q, f_q, m_q,
           COUNT(*) AS n_customers,
           CAST(SUM(units) AS DOUBLE) / 10000 AS revenue
    FROM scored GROUP BY 1, 2, 3
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quintiles), the standard warehouse micro-segmentation: each customer
    scored 1-5 on days-since-last-order, order count, and lifetime spend
    (integer ten-thousandths), then rolled up per (r,f,m) cell. Every
    ntile carries a unique custkey tiebreak, recency is the same
    epoch-micros instant arithmetic as late_shipment_priority, and the
    reference date is the corpus max (a 1-row crossJoin-broadcast
    scalar, never a correlated subquery per row).

    Plan: one shuffle on custkey, scalar broadcast, then the three
    quintile assignments via operators/cumsum.grouped_rank + ntile_expr
    (two-phase bucketed ranks; equality with NTILE asserted in
    tests/test_cumsum.py) — no task sorts the whole customer relation,
    so the 100 TB-shaped plan is what actually runs, three key-uniform
    join-backs replacing three single-task global sorts."""
    from pyspark.sql.types import TimestampType

    from .operators.cumsum import grouped_rank, ntile_expr

    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast(TimestampType())
    maxd = orders.agg(F.max(od).alias("d"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(od).alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,4)") * 10000).cast(
                    "bigint"
                )
            ).alias("units"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            "n_orders",
            "units",
            (
                (F.unix_micros(F.col("d")) - F.unix_micros(F.col("last_order")))
                / F.lit(86400000000)
            )
            .cast("long")
            .alias("recency_days"),
        )
    )
    from .operators.cumsum import SMALL_THRESHOLD

    # size ONCE and share the plan decision across the three quintile
    # passes (auto mode would re-count the customer relation per pass)
    n_customers = cust.count()
    rank_mode = "single" if n_customers <= SMALL_THRESHOLD else "distributed"
    n_df = cust.agg(F.count(F.lit(1)).alias("_n"))

    def quintile(order_col: str, ascending: bool, out: str, base: DataFrame):
        ranked = grouped_rank(
            base, [], order_col, "o_custkey", out_col="_r",
            ascending=ascending, mode=rank_mode,
        )
        return (
            ranked.crossJoin(F.broadcast(n_df))
            .withColumn(out, ntile_expr(F.col("_r"), F.col("_n"), 5).cast("int"))
            .drop("_r", "_n")
        )

    scored = quintile(
        "recency_days", True, "r_q",
        quintile("n_orders", False, "f_q", quintile("units", False, "m_q", cust)),
    ).select("o_custkey", "units", "r_q", "f_q", "m_q")
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("units").cast("double") / 10000).alias("revenue"),
    )


@query(
    "part_type_affinity",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_all FROM ot),
    tc AS (SELECT p_type, COUNT(*) AS n_orders FROM ot GROUP BY p_type),
    pairs AS (
      SELECT a.p_type AS type_a, b.p_type AS type_b, COUNT(*) AS n_both
      FROM ot a JOIN ot b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           ta.n_orders AS n_a, tb.n_orders AS n_b,
           CAST(n_both * n_all AS DOUBLE)
             / CAST(ta.n_orders * tb.n_orders AS DOUBLE) AS lift
    FROM pairs
    JOIN tc ta ON ta.p_type = type_a
    JOIN tc tb ON tb.p_type = type_b
    CROSS JOIN tot
    WHERE n_both >= 5
    """,
)
def part_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between part types: for every type pair,
    co-occurrence count within orders and the association LIFT
    n_both·N / (n_a·n_b) (>1 = bought together more than independence
    predicts) — association-rules mining over the replicated warehouse.
    Counts stay integers through the products (all < 2⁵³, so the one
    double division is exact-input-identical in both engines); n_both<5
    pairs are pruned (support floor, the standard a-priori cut).

    Plan: broadcast part dim, distinct on (order, type), pair self-join
    keyed on l_orderkey — per-order pair fan-out bounded by types-per-
    order (≤ lines-per-order, single digits), so the join output is
    O(orders), not quadratic; type totals broadcast back."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ot = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_type")
        .distinct()
    )
    tot = ot.agg(F.countDistinct("l_orderkey").alias("n_all"))
    tc = ot.groupBy("p_type").agg(F.count(F.lit(1)).alias("n_orders"))
    a = ot.alias("a")
    b = ot.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(
            F.col("a.p_type").alias("type_a"), F.col("b.p_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    ta = F.broadcast(tc.select(F.col("p_type").alias("type_a"), F.col("n_orders").alias("n_a")))
    tb = F.broadcast(tc.select(F.col("p_type").alias("type_b"), F.col("n_orders").alias("n_b")))
    return (
        pairs.join(ta, on="type_a")
        .join(tb, on="type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both") * F.col("n_all")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "events_dau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           dau, wau, CAST(dau AS DOUBLE) / wau AS stickiness
    FROM daily
    JOIN weekly ON CAST(date_trunc('week', CAST(day AS TIMESTAMP)) AS DATE)
                   = week
    """,
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: daily distinct actives over the
    Monday-anchored calendar week's distinct actives — the product-
    analytics engagement ratio. Date extraction runs under the UTC
    session tz the engine pins (ensure_configured), so day/week
    boundaries agree with DuckDB's naive-timestamp truncation; the
    ratio divides two exact integers, identically per side.

    Plan: two distinct-aggregates (day-keyed, week-keyed) over one
    events scan each + a broadcast-size join of day rows to week rows —
    no window, no self-join; at 100 TB swap exact COUNT(DISTINCT) for
    the KMV sketch tier (operators/sketch.py) per day/week."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).agg(F.countDistinct("user_id").alias("wau"))
    return (
        daily.withColumn(
            "week", F.to_date(F.date_trunc("week", F.col("day").cast("timestamp")))
        )
        .join(F.broadcast(weekly), on="week")
        .select(
            # render the date as a STRING: Spark DATE reaches pandas as
            # object(datetime.date) while DuckDB DATE arrives as
            # datetime64 — same calendar day, different canonical dtype
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@query(
    "customer_order_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT c_mktsegment,
             (epoch_us(CAST(o_orderdate AS TIMESTAMP))
              - epoch_us(lag(CAST(o_orderdate AS TIMESTAMP))
                           OVER (PARTITION BY o_custkey
                                 ORDER BY CAST(o_orderdate AS TIMESTAMP),
                                          o_orderkey))) // 86400000000
               AS gap_days
      FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, gap_days,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY gap_days) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM gaps WHERE gap_days IS NOT NULL
    )
    SELECT c_mktsegment,
           MAX(n) AS n_gaps,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_days END) AS p50_gap_days,
           CAST(SUM(gap_days) AS DOUBLE) / MAX(n) AS avg_gap_days
    FROM ranked GROUP BY c_mktsegment
    """,
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap profile per market segment: the reorder-cadence
    statistic behind churn/replenishment models. Per-customer
    consecutive-order gaps (lag over a custkey-keyed window, first order
    contributes nothing), then the positional median + exact-integer
    mean per segment — the same interpolation-free quantile idiom as
    shipping_delay_quantiles, the same epoch-micros day arithmetic as
    late_shipment_priority.

    Plan: one custkey-keyed window (uniform key), broadcast customer
    dim, then the per-segment median via the two-phase bucketed ranks
    (operators/cumsum.positional_quantiles) — only 5 groups exist, but
    the plan already avoids the whole-group single-task sort, so it IS
    the 100 TB shape rather than promising it."""
    from pyspark.sql.types import TimestampType

    from .operators.cumsum import positional_quantiles

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    od = F.col("o_orderdate").cast(TimestampType())
    w_cust = Window.partitionBy("o_custkey").orderBy(od, F.col("o_orderkey"))
    gaps = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.col("o_orderkey").alias("_rid"),
            (
                (F.unix_micros(od) - F.unix_micros(F.lag(od).over(w_cust)))
                / F.lit(86400000000)
            )
            .cast("long")
            .alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
        # localCheckpoint: this derived relation (join + custkey window)
        # feeds FOUR evaluations otherwise — positional_quantiles'
        # sizing count, its rank pass, its sizes aggregate, and the
        # mean/sum branch below (r14; the r13 watch-item regression on
        # this gate was 4x re-execution amplifying flutter). Three
        # narrow columns, O(orders) rows.
        .localCheckpoint()
    )
    medians = positional_quantiles(
        gaps,
        ["c_mktsegment"],
        "gap_days",
        "_rid",
        fractions=[(1, 2, "p50_gap_days")],
    )
    stats = gaps.groupBy("c_mktsegment").agg(
        F.sum("gap_days").alias("_sum_gaps")
    )
    return medians.join(stats, on="c_mktsegment").select(
        "c_mktsegment",
        F.col("n").alias("n_gaps"),
        "p50_gap_days",
        (F.col("_sum_gaps").cast("double") / F.col("n")).alias("avg_gap_days"),
    )


@query(
    "doc_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    first_seen AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
             / COUNT(*) AS novelty
    FROM sh JOIN first_seen ON first_seen.shingle = sh.shingle
    GROUP BY sh.doc_id
    """,
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's shingles
    whose corpus-wide FIRST occurrence (minimum doc_id — ingestion order
    in this fixture) is this document. The redundancy-curve statistic
    behind crawl-ordering decisions ("how much new text does each
    successive batch contribute") — documents near 0 are re-hashes of
    earlier material even when no single pair crosses a dedup threshold.
    The ratio divides two exact integers, once, identically per side.

    Plan: one shingle-keyed min-aggregate, a same-keyed join back (the
    two sides share the shuffle key), then a doc-keyed aggregate — at
    100 TB the first-seen table is the natural incremental index (merge
    new batches with a running MIN, the corpus_ingest fingerprint
    pattern at shingle grain)."""
    from .operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    first_seen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first_seen, on="shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            (novel / F.count(F.lit(1))).alias("novelty"),
        )
    )


@query(
    "orders_cohort_ltv",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             year(CAST(o_orderdate AS TIMESTAMP)) * 12
               + (month(CAST(o_orderdate AS TIMESTAMP)) - 1) AS midx,
             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS BIGINT) AS units
      FROM orders
    ),
    cohort AS (SELECT o_custkey, MIN(midx) AS cmidx FROM o GROUP BY o_custkey)
    SELECT printf('%04d-%02d', cmidx // 12, cmidx % 12 + 1) AS cohort_month,
           o.midx - cmidx AS month_offset,
           COUNT(DISTINCT o.o_custkey) AS n_active,
           CAST(SUM(units) AS DOUBLE) / 10000 AS revenue
    FROM o JOIN cohort ON cohort.o_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue and active-customer count per months-since-first-order
    — the retention-revenue triangle every subscription/commerce
    warehouse reports. Months are integer indexes (year·12 + month-1)
    extracted under the pinned UTC session, so offsets are pure integer
    subtraction (no cross-engine date-interval semantics), and the
    cohort label renders through the same printf format both sides.

    Plan: one custkey-keyed aggregate for cohorts, a same-keyed join
    back, one (cohort, offset)-keyed aggregate — the distinct-count per
    cell swaps for the KMV sketch at 100 TB grain."""
    from pyspark.sql.types import TimestampType

    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast(TimestampType())
    o = orders.select(
        "o_custkey",
        (F.year(od) * 12 + (F.month(od) - 1)).alias("midx"),
        (F.col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("units"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("midx").alias("cmidx"))
    return (
        o.join(cohort, on="o_custkey")
        .groupBy(
            F.format_string(
                "%04d-%02d",
                F.expr("cmidx div 12"),
                F.pmod(F.col("cmidx"), F.lit(12)) + 1,
            ).alias("cohort_month"),
            (F.col("midx") - F.col("cmidx")).alias("month_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            (F.sum("units").cast("double") / 10000).alias("revenue"),
        )
    )


@query(
    "nation_top_supplier_share",
    oracle="""
    WITH sup AS (
      SELECT s_nationkey, l_suppkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                           AS BIGINT)) AS BIGINT) AS units
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT s_nationkey, l_suppkey, units,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY units DESC, l_suppkey ASC) AS rn,
             SUM(units) OVER (PARTITION BY s_nationkey) AS total
      FROM sup
    )
    SELECT n_name,
           l_suppkey AS top_suppkey,
           CAST(units AS DOUBLE) / 10000 AS top_revenue,
           CAST(units AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM ranked JOIN nation ON n_nationkey = s_nationkey
    WHERE rn = 1
    """,
)
def nation_top_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-supplier report per nation: the argmax supplier by
    revenue and its market share — the single-row-per-group argmax shape
    (deterministic ROW_NUMBER with suppkey tiebreak, not max_by whose
    tie rules differ across engines). Revenue in integer ten-thousandths;
    the share divides two exactly-converted doubles.

    Plan: one (nation, supplier) aggregate, one nation-partitioned
    window over supplier rows (bounded by suppliers-per-nation),
    broadcast nation dim."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        li.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,4)") * 10000).cast(
                    "bigint"
                )
            ).alias("units")
        )
    )
    w_rn = Window.partitionBy("s_nationkey").orderBy(
        F.col("units").desc(), F.col("l_suppkey").asc()
    )
    w_tot = Window.partitionBy("s_nationkey")
    return (
        sup.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("total", F.sum("units").over(w_tot))
        .filter(F.col("rn") == 1)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.col("l_suppkey").alias("top_suppkey"),
            (F.col("units").cast("double") / 10000).alias("top_revenue"),
            (F.col("units").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
    )


@query(
    "part_size_price_corr",
    oracle="""
    WITH x AS (
      SELECT p_brand,
             CAST(p_size AS BIGINT) AS xi,
             CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
               AS yi
      FROM part
    ),
    s AS (
      SELECT p_brand,
             COUNT(*) AS n,
             SUM(xi) AS sx,
             SUM(yi) AS sy,
             CAST(CAST(SUM(CAST(xi AS DECIMAL(19,0))
                           * CAST(yi AS DECIMAL(19,0))) AS VARCHAR)
                  AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(xi AS DECIMAL(19,0))
                           * CAST(xi AS DECIMAL(19,0))) AS VARCHAR)
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(yi AS DECIMAL(19,0))
                           * CAST(yi AS DECIMAL(19,0))) AS VARCHAR)
                  AS DOUBLE) AS syy
      FROM x GROUP BY p_brand
    )
    SELECT p_brand, n,
           (n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(n * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS size_price_corr
    FROM s
    """,
)
def part_size_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of part size vs retail price per brand — the
    data-profiling screen for "does this attribute carry pricing
    signal". All five sufficient statistics are EXACT (bigint sums;
    products via DECIMAL(19,0) so int64 cannot overflow in either engine
    — the HHI idiom) and convert once (string round-trip for the
    >2⁵³ product sums, exact casts for the rest); the closed-form
    n·Σxy−ΣxΣy formula then runs the identical IEEE op sequence per
    side, so even the sqrt is bit-reproducible. NOT F.corr/duckdb corr:
    their internal accumulation orders differ and would hash-mismatch.

    Plan: one map-side-combined aggregate per brand, zero joins, zero
    windows — pure codegen."""
    part = load_table(spark, sf_dir, "part")
    x = part.select(
        "p_brand",
        F.col("p_size").cast("bigint").alias("xi"),
        (F.col("p_retailprice").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("yi"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = x.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(d19("xi") * d19("yi")).cast("string").cast("double").alias("sxy"),
        F.sum(d19("xi") * d19("xi")).cast("string").cast("double").alias("sxx"),
        F.sum(d19("yi") * d19("yi")).cast("string").cast("double").alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    corr = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    )
    return s.select("p_brand", "n", corr.alias("size_price_corr"))
