"""Query-surface entries: event-time analytics (windows/sessions), the
time-window predicate rule, and the FK cascade closure."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import load_table


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (the ST9 extension surface —
    absent in the reference, native in Spark). The same expression runs
    under readStream + withWatermark (streaming/windows.py)."""
    from .streaming.windows import tumbling_agg

    ev = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        ],
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


@query(
    "events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 600 THEN 1
                  ELSE 0 END AS new_s
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (10-minute inactivity gap) via gaps-and-islands —
    the batch mirror of session_window for fixed gaps."""
    from .streaming.windows import session_stats

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return session_stats(ev, "ts", ["user_id"], gap_seconds=600)


@query(
    "time_window_filter",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >=
          (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL '1 day' FROM events)
    """,
)
def time_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4's time-window predicate, anchored to max(ts) instead of NOW() so
    the gate is deterministic; the production rule (`TableRules.
    add_time_filter`) emits the NOW()-relative form."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_twf_events")
    return spark.sql(
        """
        SELECT event_id, ts, user_id, event_type
        FROM _twf_events
        WHERE ts >= (SELECT MAX(ts) - INTERVAL 1 DAY FROM _twf_events)
        """
    )


@query(
    "skewed_agg_salted",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY 1
    """,
)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — identical results to a plain
    groupBy for algebraic aggregates (the oracle IS the plain GROUP BY),
    but hot keys spread over 16 reducers in phase 1."""
    from .operators.skew import salted_sum_count

    ev = load_table(spark, sf_dir, "events")
    out = salted_sum_count(
        ev, ["event_type"], F.col("value").cast("decimal(18,4)"), salt_buckets=16
    )
    return out.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"), "n_rows"
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH w AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
             UNNEST([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                     time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'])
               AS window_start
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM w
    WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h window, 30 min slide): each event
    lands in two windows. Spark's window() generates the assignment;
    the oracle enumerates the two candidate starts explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


@query(
    "events_asof_checkpoints",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                                  ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT u.user_id, g.pts AS probe_ts
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-02',
                                                TIMESTAMP '2024-01-30',
                                                INTERVAL 1 DAY)) AS pts) g
    )
    SELECT p.user_id, p.probe_ts,
           e.event_id AS asof_event_id, e.value AS asof_value
    FROM probes p ASOF LEFT JOIN ev e
      ON p.user_id = e.user_id AND p.probe_ts >= e.ts
    """,
)
def events_asof_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension surface; operators/asof.py): daily
    checkpoints per user pick up the latest event at or before the
    checkpoint. The oracle is DuckDB's native ASOF LEFT JOIN; the Spark
    side is the union-marker single-shuffle implementation — no
    inequality join anywhere in the plan."""
    from pyspark.sql import Window

    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    ev1 = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    probes = (
        ev.select("user_id").distinct()
        .crossJoin(
            spark.sql(
                "SELECT explode(sequence(timestamp'2024-01-02 00:00:00', "
                "timestamp'2024-01-30 00:00:00', interval 1 day)) AS probe_ts"
            )
        )
    )
    out = asof_join(
        probes, ev1, on=["user_id"], probe_time="probe_ts", right_time="ts",
        payload_cols=["event_id", "value"], tiebreak="event_id",
    )
    return out.select(
        "user_id", "probe_ts",
        F.col("event_id").alias("asof_event_id"),
        F.col("value").alias("asof_value"),
    )


@query(
    "events_window_attribution",
    oracle="""
    WITH hours AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    wins AS (
      SELECT window_id, h - INTERVAL '30 minutes' AS w_start,
             h + INTERVAL '90 minutes' AS w_end
      FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY n DESC, h ASC) AS window_id
            FROM hours)
      WHERE window_id <= 20
    )
    SELECT w.window_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e JOIN wins w
      ON CAST(e.ts AS TIMESTAMP) >= w.w_start AND CAST(e.ts AS TIMESTAMP) < w.w_end
    GROUP BY 1
    """,
)
def events_window_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join (operators/rangejoin.py): events
    attributed to the 20 busiest-hour windows, stretched to [-30 min,
    +90 min) so windows overlap and straddle bucket boundaries. The
    oracle is DuckDB's native inequality join (IEJoin); Spark would plan
    that as a nested-loop cartesian, so the operator bucketizes: explode
    intervals over an hour grid, equi-join on bucket, refine exactly."""
    from pyspark.sql import Window

    from .operators.rangejoin import range_join_intervals

    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # limit-first (TakeOrdered, distributed partial top-k), then the
    # ranking window runs over only the 20 surviving rows — the
    # corpus_top_ngrams pattern; a bare global row_number here would
    # single-task-sort the whole hours relation first
    wins = (
        hours.orderBy(F.col("n").desc(), F.col("h").asc())
        .limit(20)
        .withColumn(
            "window_id",
            F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("h").asc())),
        )
        .select(
            "window_id",
            (F.col("h") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
        )
    )
    joined = range_join_intervals(
        ev.select("event_id", "ts", "value"), wins,
        point_time="ts", start_col="w_start", end_col="w_end",
        bucket_seconds=3600,
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS id,
           'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS fingerprint
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over opaque binary payloads: the documents'
    UTF-8 bytes stand in for media blobs; decode is the deterministic stub
    (real codecs are not in this container). Gate columns are the
    decoder-independent ones; the feature vector is exercised in tests."""
    from .operators.multimodal import extract_features, fake_decode, media_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    media = media_table(docs, "doc_id", "payload", "text/plain")
    feats = extract_features(media, decoder=fake_decode)
    return feats.select("id", "mime", "n_bytes", "fingerprint")


@query(
    "fk_cascade_closure",
    oracle="""
    WITH RECURSIVE edges(child, parent) AS (
      SELECT * FROM (VALUES
        ('lineitem','orders'), ('lineitem','part'), ('lineitem','supplier'),
        ('orders','customer'), ('customer','nation'), ('supplier','nation'),
        ('nation','region')) v(child, parent)
    ),
    reach(tbl) AS (
      SELECT child FROM edges WHERE parent = 'nation'
      UNION
      SELECT e.child FROM edges e JOIN reach r ON e.parent = r.tbl
    )
    SELECT DISTINCT tbl AS table_name FROM reach
    """,
)
def fk_cascade_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/J3: TRUNCATE CASCADE blast radius of `nation` over the TPC-H FK
    graph — recursive CTE in the oracle, iterative frontier semi-joins in
    Spark (no recursive CTE support)."""
    from .operators.fk import fk_dependents

    edges = spark.createDataFrame(
        [
            ("lineitem", "orders"), ("lineitem", "part"), ("lineitem", "supplier"),
            ("orders", "customer"), ("customer", "nation"), ("supplier", "nation"),
            ("nation", "region"),
        ],
        "child string, parent string",
    )
    return fk_dependents(edges, "nation").select(F.col("table").alias("table_name"))


@query(
    "multimodal_phash",
    oracle="""
    WITH feats AS (
      SELECT doc_id, t.i,
             CAST('0x' || substr(md5(md5(text) || ':' || t.i), 1, 8) AS BIGINT)
               / 4294967296.0 AS feat
      FROM documents,
           UNNEST(list_transform(generate_series(0, 47), x -> x)) AS t(i)
    ),
    vecs AS (
      SELECT doc_id, list(feat ORDER BY i) AS fv FROM feats GROUP BY doc_id
    ),
    packed AS (
      SELECT doc_id,
             list_reduce(fv, (a, b) -> a + b) / 48.0 AS mean,
             fv
      FROM vecs
    )
    SELECT doc_id AS id,
           list_reduce(
             list_transform(
               list_zip(list_transform(generate_series(0, 47), x -> x), fv),
               p -> CASE WHEN p[2] > mean
                         THEN (CAST(1 AS BIGINT) << p[1])
                         ELSE CAST(0 AS BIGINT) END),
             (a, b) -> a + b) AS phash
    FROM packed
    """,
)
def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of every media item
    (multimodal.media_phash, 48 bits): decode runs the deterministic fake
    codec (the documented container contract — a real decoder emits
    downscaled pixels and the SAME thresholding becomes classic aHash),
    thresholding/packing are codegen HOF folds, map-only. The oracle
    replays the per-index md5 feature draws and the identical sequential
    fold for the mean, so every packed hash is value-exact.
    Near-dup pairing over these hashes (banded hamming join,
    multimodal.phash_pairs) shares the simhash machinery and is
    planted-dup tested."""
    from functools import partial

    from .operators.multimodal import fake_decode, media_phash, media_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    media = media_table(docs, "doc_id", "payload", "text/plain")
    return media_phash(media, decoder=partial(fake_decode, dim=48), dim=48)
