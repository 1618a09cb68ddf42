"""General analytics anchors over the star schema.

Classic shapes that prove the engine handles ordinary warehouse queries
with the right physical plans: partial-agg groupBy, broadcast-dim joins,
window top-n, and event sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (map-side partial agg → one shuffle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with broadcast dimensions: lineitem ⋈ orders ⋈
    customer ⋈ nation → revenue per nation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


REVENUE_SQL = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
"""


def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-3 per group."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    win = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", F.round("p_retailprice", 4).alias("price"))
        .orderBy("p_brand", "rk")
    )


TOP_PARTS_SQL = """
    SELECT p_brand, rk, p_partkey, round(p_retailprice, 4) AS price
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
        FROM part
    )
    WHERE rk <= 3
    ORDER BY p_brand, rk
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event sessionization: a new session starts after a >30-minute gap;
    lag + running-sum window (the streaming analog uses watermarked
    session windows — see gmft_spark/streaming)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(win))
            )
            > 1800,
            1,
        )
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


SESSIONIZE_SQL = """
    WITH flagged AS (
        SELECT user_id, event_id, value,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session,
               ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, value,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, session_no,
           count(*) AS n_events,
           round(sum(value), 6) AS session_value
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
"""


def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE ``F.session_window`` operator in batch mode, checked
    against a first-principles gaps-and-islands oracle — the same
    cross-validation the streaming path leans on (a session merges an
    event iff its ts falls strictly before the window end, so a gap of
    EXACTLY 30 min opens a new session: the oracle's rule is ``>=``,
    not ``>``). Value sums go fixed-point before aggregation (unordered
    double sums are not order-safe). One (user, session) shuffle with
    map-side partial merge — the engine plans session windows like any
    aggregation."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    vfp = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(vfp).alias("session_value_fp"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value_fp",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_NATIVE_SQL = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               -- microsecond granularity: date_diff counts BOUNDARY
               -- crossings, which at 'second' granularity miscounts
               -- sub-second gaps; at the data's own resolution it is
               -- the exact elapsed time
               CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts)
                         >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               -- event_id tiebreak matches the flagged CTE's window: with
               -- duplicate (user_id, ts) rows spanning a 30-min boundary a
               -- ts-only ROWS frame assigns sids nondeterministically
               sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS session_value_fp
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
"""


def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per group (no approx percentile —
    matches the reference's exact-median discipline, D7)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


QUANTILES_SQL = """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, and
    for each day-offset k the count of cohort members active again k
    days later — the product-analytics staple. Counts only (no ratio
    column: int/int division rounded at a fixed precision can land on
    the engines' .5 boundary; the consumer divides).

    Shape: one (user, day) distinct aggregation (map-side combinable),
    a per-user min as a window over the SAME user partitioning, then one
    (cohort_day, k) count-distinct. Day arithmetic is date_diff on
    date-truncated TIMESTAMP_NTZ — no timezone dependence."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = e.select(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).distinct()
    first = Window.partitionBy("user_id")
    with_cohort = days.withColumn("cohort_day", F.min("day").over(first))
    return (
        with_cohort.withColumn(
            "k", F.date_diff(F.col("day"), F.col("cohort_day"))
        )
        .groupBy("cohort_day", "k")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "k")
    )


COHORT_SQL = """
    WITH days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    with_cohort AS (
        SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM days
    )
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS INT) AS k,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM with_cohort
    GROUP BY cohort_day, k
    ORDER BY cohort_day, k
"""


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time bucketing: per-hour, per-type counts and value sums."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


HOURLY_SQL = """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour, event_type
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set complement via anti-join: customers with no URGENT orders."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


NO_ORDERS_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
"""


def priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping sets) over order status × priority."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — the classic operator Spark's DataFrame API lacks:
    attribute each click event to the most recent prior (or same-instant)
    view by the same user.

    Scale design — the union trick, not a per-key loop: tag both streams,
    union them, and take ``last(view, ignorenulls)`` over a
    (user_id)-partitioned window ordered by (ts, side) — ONE shuffle
    keyed on user_id, no range self-join (which explodes on long
    histories) and no per-key collect. Ordering views (side 0) before
    clicks (side 1) at equal ts gives the inclusive ts_click >= ts_view
    match, exactly DuckDB's native ASOF LEFT JOIN — the oracle — whose
    independent merge-based implementation cross-checks the window form.
    The lag is a TIMESTAMP_NTZ microsecond diff (timestamp_diff), never
    an epoch conversion (timezone-dependent; CLAUDE.md sessionize
    gotcha)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.lit(0).alias("side")
    )
    # event_id completes the total order: without it, two same-user views
    # at an identical ts would make last() shuffle-order-dependent (the
    # input data has no such ties, but determinism must not rely on that;
    # DuckDB's ASOF tie choice is likewise unspecified, so a tied corpus
    # would need a tie-broken oracle too)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(views).withColumn(
        "last_view",
        F.last(
            F.when(
                F.col("side") == 0,
                F.struct(F.col("event_id"), F.col("ts").alias("vts")),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        tagged.filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("click_event_id"),
            "user_id",
            F.col("last_view.event_id").alias("view_event_id"),
            F.timestamp_diff(
                "MICROSECOND", F.col("last_view.vts"), F.col("ts")
            ).alias("lag_us"),
        )
        .orderBy("click_event_id")
    )


ASOF_SQL = """
    SELECT c.event_id AS click_event_id,
           c.user_id,
           v.event_id AS view_event_id,
           date_diff('microsecond', v.ts, c.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    ORDER BY click_event_id
"""


def range_join_clicks_before_errors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Banded range join — the scale pattern for interval predicates when
    BOTH sides are large (a broadcast interval join needs a small side;
    a raw theta-join is a cartesian): count the clicks in the 60s window
    before each error event.

    Scale design: time is binned into buckets exactly as wide as the
    window, the probe side explodes each error into its 2 covering
    buckets, and the join is a plain EQUI-join on the bucket followed by
    the exact window post-filter — shuffles keyed on bucket (balanced by
    construction, AQE splits hot buckets), never a cartesian. The DuckDB
    twin is the direct interval LEFT JOIN."""
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    win_us = 60_000_000
    e = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "us", F.timestamp_diff("MICROSECOND", anchor, F.col("ts"))
    )
    err = e.filter(F.col("event_type") == "error").select("event_id", "us")
    bucket = F.floor(F.col("us") / float(win_us)).cast("long")
    clk = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("us").alias("cus"))
        .withColumn("bucket", F.floor(F.col("cus") / float(win_us)).cast("long"))
    )
    probe = err.withColumn(
        "bucket", F.explode(F.array(bucket - 1, bucket))
    )
    counts = (
        probe.join(clk, "bucket")
        .filter(
            (F.col("cus") >= F.col("us") - win_us) & (F.col("cus") < F.col("us"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        err.join(counts, "event_id", "left")
        .select(
            F.col("event_id").alias("error_event_id"),
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_clicks_60s"),
        )
        .orderBy("error_event_id")
    )


RANGE_JOIN_SQL = """
    WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
    clk AS (SELECT ts FROM events WHERE event_type = 'click')
    SELECT e.event_id AS error_event_id,
           CAST(count(c.ts) AS BIGINT) AS n_clicks_60s
    FROM err e
    LEFT JOIN clk c
      ON c.ts >= e.ts - INTERVAL 60 SECOND AND c.ts < e.ts
    GROUP BY e.event_id
    ORDER BY error_event_id
"""


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis: per user, the deepest
    view → click → purchase stage reached, each step within ONE HOUR of
    the previous stage's anchor (strictly increasing event time; the
    anchor is the FIRST qualifying event in the window). Stage 0 = no
    view, 3 = full conversion within both windows; the chosen
    anchor event ids ride along so the whole path is value-checked, not
    just the count.

    Scale shape: three per-user aggregations (map-side combined) chained
    by equi-joins on user_id — no window over the raw event stream and no
    self-join of events against events; each stage joins the (much
    smaller) per-user anchor frame back to one filtered scan."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts", "event_id"
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("vts"),
            F.min_by("event_id", "ts").alias("first_view_id"),
        )
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v.select("user_id", "vts"), "user_id")
        .filter(
            (F.col("ts") > F.col("vts"))
            & (F.col("ts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("cts"),
            F.min_by("event_id", "ts").alias("first_click_id"),
        )
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "cts"), "user_id")
        .filter(
            (F.col("ts") > F.col("cts"))
            & (F.col("ts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min_by("event_id", "ts").alias("first_purchase_id"))
    )
    users = e.select("user_id").distinct()
    stage = (
        F.when(F.col("first_purchase_id").isNotNull(), 3)
        .when(F.col("first_click_id").isNotNull(), 2)
        .when(F.col("first_view_id").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v.select("user_id", "first_view_id"), "user_id", "left")
        .join(c.select("user_id", "first_click_id"), "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            stage.cast("int").alias("stage"),
            "first_view_id",
            "first_click_id",
            "first_purchase_id",
        )
        .orderBy("user_id")
    )


FUNNEL_SQL = """
    WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
    v AS (
        SELECT user_id, min(ts) AS vts,
               arg_min(event_id, ts) AS first_view_id
        FROM e WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS cts,
               arg_min(e.event_id, e.ts) AS first_click_id
        FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.vts
                   AND e.ts <= v.vts + INTERVAL 1 HOUR
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, arg_min(e.event_id, e.ts) AS first_purchase_id
        FROM e JOIN c ON e.user_id = c.user_id AND e.ts > c.cts
                   AND e.ts <= c.cts + INTERVAL 1 HOUR
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM e)
    SELECT u.user_id,
           CAST(CASE WHEN p.first_purchase_id IS NOT NULL THEN 3
                     WHEN c.first_click_id IS NOT NULL THEN 2
                     WHEN v.first_view_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage,
           v.first_view_id, c.first_click_id, p.first_purchase_id
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    ORDER BY u.user_id
"""


PAGERANK_ITERS = 3


def _handoff_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) for every consecutive event pair (by event_id) whose
    users differ — THE handoff-graph edge derivation. graph_pagerank and
    graph_triangles both build on this so the graph definition (which
    events form an edge) lives in exactly one place."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    nxt = e.select(
        (F.col("event_id") - 1).alias("event_id"),
        F.col("user_id").alias("dst"),
    )
    return (
        e.select("event_id", F.col("user_id").alias("src"))
        .join(nxt, "event_id")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event handoff graph — the canonical iterative
    graph workload, bit-exact against an unrolled SQL twin. Graph: edge
    src→dst whenever consecutive events (by event_id) belong to different
    users, weighted by occurrence count. Ranks are FIXED-POINT (×1e6)
    integers: each iteration distributes floor(rank·w/out_degree) along
    edges (double division of exact ints — identical in both engines) and
    damps with r' = 150000 + floor(0.85·Σcontrib + 0.5), so every rank is
    an exact integer at every step. Dangling-node mass leaks (standard
    simplification, documented).

    Scale shape: the edge list aggregates once (one shuffle) and is
    reused every round; each iteration is one join keyed on src (rank
    frame × edges — sort-merge when both are web-scale, broadcast when
    the rank frame fits) plus a map-side-combined contribution sum keyed
    on dst. Rank frames localCheckpoint per round (CLAUDE.md iterative
    plan-growth rule)."""
    edges = (
        _handoff_pairs(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.sum("w").alias("d"))
    nodes = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
    )
    ranks = nodes.select("user_id", F.lit(1000000).cast("long").alias("rx"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges["src"] == ranks["user_id"])
            .select(
                "dst",
                F.floor(F.col("rx") * F.col("w") / F.col("d"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["user_id"] == contrib["dst"], "left")
            .select(
                "user_id",
                (
                    F.lit(150000)
                    + F.floor(0.85 * F.coalesce(F.col("s"), F.lit(0)) + F.lit(0.5))
                )
                .cast("long")
                .alias("rx"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(deg, ranks["user_id"] == deg["src"], "left")
        .select(
            "user_id",
            F.col("rx").alias("rank_x1e6"),
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("out_weight"),
        )
        .orderBy("user_id")
    )


def _pagerank_sql() -> str:
    parts = [
        """
    WITH e AS (SELECT event_id, user_id FROM events),
    edges AS (
        SELECT a.user_id AS src, b.user_id AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM e a
        JOIN e b ON b.event_id = a.event_id + 1 AND a.user_id <> b.user_id
        GROUP BY a.user_id, b.user_id
    ),
    deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT user_id FROM e),
    r0 AS (SELECT user_id, CAST(1000000 AS BIGINT) AS rx FROM nodes)"""
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        parts.append(
            f""",
    c{i} AS (
        SELECT ed.dst,
               CAST(sum(CAST(floor(r.rx * ed.w / dg.d) AS BIGINT)) AS BIGINT)
                 AS s
        FROM edges ed
        JOIN deg dg ON ed.src = dg.src
        JOIN r{i - 1} r ON r.user_id = ed.src
        GROUP BY ed.dst
    ),
    r{i} AS (
        SELECT n.user_id,
               CAST(150000 + floor(0.85 * coalesce(c.s, 0) + 0.5) AS BIGINT)
                 AS rx
        FROM nodes n LEFT JOIN c{i} c ON n.user_id = c.dst
    )"""
        )
    parts.append(
        f"""
    SELECT r.user_id, r.rx AS rank_x1e6,
           coalesce(dg.d, 0) AS out_weight
    FROM r{PAGERANK_ITERS} r
    LEFT JOIN deg dg ON r.user_id = dg.src
    ORDER BY r.user_id
"""
    )
    return "".join(parts)


PAGERANK_SQL = _pagerank_sql()


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected event handoff graph
    (same edge derivation as graph_pagerank, direction dropped).

    Uses the degree-ordered node-iterator (Schank–Wagner / "node-
    iterator++"): orient every undirected edge from its lower-(degree,id)
    endpoint to its higher one, enumerate wedges only at the lower-ranked
    apex, and close them with an equi-join back onto the oriented edge
    list. Orientation bounds each apex's wedge fan-out by its oriented
    out-degree (O(sqrt(m)) on any graph), so the wedge join is O(m^1.5)
    total work in equi-joins — no cartesian, no high-degree hub blowup,
    which is what makes triangle counting survive a web-scale power-law
    graph. All joins are keyed on node ids (sort-merge at scale; AQE
    handles residual apex skew)."""
    und = (
        _handoff_pairs(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        # und feeds deg AND the orientation join; deg feeds both endpoint
        # attaches and the output — materialize once instead of replaying
        # the scan + consecutive-event join per branch (same rule as the
        # connected-components rounds)
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    ed = (
        und.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ornt = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("bd"),
    ).localCheckpoint(eager=True)  # consumed 3×: both wedge sides + close
    x, y = ornt.alias("x"), ornt.alias("y")
    wedges = (
        x.join(y, F.col("x.a") == F.col("y.a"))
        .filter(
            (F.col("x.bd") < F.col("y.bd"))
            | ((F.col("x.bd") == F.col("y.bd")) & (F.col("x.b") < F.col("y.b")))
        )
        .select(
            F.col("x.a").alias("a"), F.col("x.b").alias("b"), F.col("y.b").alias("c")
        )
    )
    tri = wedges.join(
        ornt.select(F.col("a").alias("b"), F.col("b").alias("c")), ["b", "c"]
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias("user_id"),
            F.col("deg").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
        .orderBy("user_id")
    )


TRIANGLES_SQL = """
    WITH e AS (SELECT event_id, user_id FROM events),
    und AS (
        SELECT DISTINCT least(a.user_id, b.user_id) AS u,
                        greatest(a.user_id, b.user_id) AS v
        FROM e a
        JOIN e b ON b.event_id = a.event_id + 1 AND a.user_id <> b.user_id
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        GROUP BY node
    ),
    ornt AS (
        SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
                    THEN u ELSE v END AS a,
               CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
                    THEN v ELSE u END AS b,
               CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
                    THEN dv.deg ELSE du.deg END AS bd
        FROM und
        JOIN deg du ON du.node = und.u
        JOIN deg dv ON dv.node = und.v
    ),
    wedges AS (
        SELECT x.a, x.b, y.b AS c
        FROM ornt x
        JOIN ornt y ON x.a = y.a
              AND ((x.bd < y.bd) OR (x.bd = y.bd AND x.b < y.b))
    ),
    tri AS (
        SELECT w.a, w.b, w.c
        FROM wedges w JOIN ornt o ON o.a = w.b AND o.b = w.c
    ),
    pn AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri
        )
        GROUP BY node
    )
    SELECT d.node AS user_id, d.deg AS degree,
           CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM deg d LEFT JOIN pn ON pn.node = d.node
    ORDER BY user_id
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-format daily report via ``pivot``: one row per day, one
    count column per event type (the reshaping step every metrics
    dashboard export needs). The value list is EXPLICIT — with it Spark
    skips the extra distinct-values job and the output schema is fixed
    at plan time; missing (day, type) combos fill 0 to match the SQL
    twin's FILTER counts (count never returns NULL there).

    Scale shape: a pivot with an explicit value list compiles to ONE
    map-side-combinable aggregation with 5 conditional counts — same
    plan as a manual CASE WHEN rollup, one shuffle keyed on day."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("day")
    )


PIVOT_SQL = """
    SELECT date_trunc('day', ts) AS day,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
               AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS view
    FROM events
    GROUP BY date_trunc('day', ts)
    ORDER BY day
"""


def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation: 1-hour windows sliding every 30
    minutes (each event lands in exactly 2 overlapping windows) — the
    smoothing shape behind every rate/alerting dashboard, and the same
    windowing Structured Streaming uses (``F.window`` is identical in
    batch and streaming, so this query IS the streaming aggregation's
    batch twin). events.ts is TIMESTAMP_NTZ: window boundaries are
    wall-clock arithmetic, no timezone dependence (CLAUDE.md rule).

    Scale shape: the window explode is in-row (2 rows per event, before
    the shuffle's map-side combine); one aggregation keyed on window
    start — balanced by construction since the key is time."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "n_users",
        )
        .orderBy("win_start")
    )


SLIDING_SQL = """
    WITH s AS (
        SELECT ts, user_id,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts)
                           - INTERVAL '30 minutes']) AS win_start
        FROM events
    )
    SELECT win_start,
           win_start + INTERVAL '1 hour' AS win_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s
    WHERE ts >= win_start AND ts < win_start + INTERVAL '1 hour'
    GROUP BY win_start
    ORDER BY win_start
"""


def cube_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup: event counts + value sums at every margin of
    (event_type, day) — the all-subtotals report a dashboard backend
    materializes once instead of running 4 separate GROUP BYs. Grouping
    nulls become 'ALL' (the input columns are never null, so the
    coalesce is unambiguous). Value sums go through the fixed-point rule
    (floor(v·1e6+0.5) per row, integer sum, divide back) so the
    unordered double sum is engine-exact (CLAUDE.md recipe).

    Scale shape: Spark expands CUBE before the shuffle (each input row
    emits its 4 grouping combos map-side, then one partial-agg shuffle
    keyed on the grouping set) — one pass over the data for all margins,
    and the key space stays tiny (types × days + margins)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    vfp = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    return (
        e.select(
            "event_type",
            F.to_date("ts").cast("string").alias("day"),
            vfp.alias("vfp"),
        )
        .cube("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("vfp") / F.lit(1000000.0), 4).alias("value_sum"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n_events",
            "value_sum",
        )
        .orderBy("event_type", "day")
    )


CUBE_SQL = """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(day, 'ALL') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(vfp) AS BIGINT) / 1000000.0, 4) AS value_sum
    FROM (
        SELECT event_type,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vfp
        FROM events
    )
    GROUP BY CUBE (event_type, day)
    ORDER BY event_type, day
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation: recency (days since last event, vs the
    corpus max day), frequency (event count), monetary (fixed-point
    value sum), each quartiled with ``ntile(4)`` (score 1 = best
    quartile) and mapped to a segment label — the classic audience-split
    every growth/curation pipeline runs. All three orderings carry a
    user_id tiebreak and sort INTEGER keys (days, counts, fixed-point
    sums), so the quartile boundaries are engine-deterministic; both
    engines share SQL-standard ntile (first ``n mod k`` buckets one row
    larger).

    Scale shape: one map-side-combinable groupBy(user_id), a 1-row
    global-max broadcast, then three global ntile windows. A global
    ntile is a total sort — correct here because the frame is one row
    per USER (already aggregated, ~10^6-10^8 rows at corpus scale, not
    10^12 events); at larger user counts the quartile boundaries would
    come from approx_percentile instead and scores from a broadcast
    range join against them."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    vfp = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    per_user = e.select(
        "user_id", F.to_date("ts").alias("day"), vfp.alias("vfp")
    ).groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count("*").alias("frequency"),
        F.sum("vfp").alias("mon_fp"),
    )
    corpus_max = e.agg(F.max(F.to_date("ts")).alias("max_day"))
    scored = (
        per_user.crossJoin(F.broadcast(corpus_max))
        .withColumn("recency_days", F.datediff("max_day", "last_day"))
        .withColumn(
            "r_score",
            F.ntile(4).over(
                Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
            ),
        )
        .withColumn(
            "f_score",
            F.ntile(4).over(
                Window.orderBy(F.desc("frequency"), F.asc("user_id"))
            ),
        )
        .withColumn(
            "m_score",
            F.ntile(4).over(
                Window.orderBy(F.desc("mon_fp"), F.asc("user_id"))
            ),
        )
    )
    segment = (
        F.when(
            (F.col("r_score") == 1)
            & (F.col("f_score") == 1)
            & (F.col("m_score") == 1),
            "champion",
        )
        .when((F.col("r_score") == 4) & (F.col("f_score") == 4), "churned")
        .when(F.col("m_score") == 1, "big_spender")
        .when(F.col("r_score") == 1, "recent")
        .otherwise("regular")
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        F.round(F.col("mon_fp") / F.lit(1000000.0), 4).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        segment.alias("segment"),
    ).orderBy("user_id")


RFM_SQL = """
    WITH per_user AS (
        SELECT user_id,
               max(CAST(ts AS DATE)) AS last_day,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                    AS BIGINT) AS mon_fp
        FROM events
        GROUP BY user_id
    ),
    scored AS (
        SELECT user_id,
               date_diff('day', last_day,
                         (SELECT max(CAST(ts AS DATE)) FROM events))
                   AS recency_days,
               frequency, mon_fp,
               ntile(4) OVER (ORDER BY date_diff('day', last_day,
                         (SELECT max(CAST(ts AS DATE)) FROM events)) ASC,
                         user_id ASC) AS r_score,
               ntile(4) OVER (ORDER BY frequency DESC, user_id ASC)
                   AS f_score,
               ntile(4) OVER (ORDER BY mon_fp DESC, user_id ASC)
                   AS m_score
        FROM per_user
    )
    SELECT user_id, CAST(recency_days AS INT) AS recency_days, frequency,
           round(mon_fp / 1000000.0, 4) AS monetary,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE WHEN r_score = 1 AND f_score = 1 AND m_score = 1
                    THEN 'champion'
                WHEN r_score = 4 AND f_score = 4 THEN 'churned'
                WHEN m_score = 1 THEN 'big_spender'
                WHEN r_score = 1 THEN 'recent'
                ELSE 'regular' END AS segment
    FROM scored
    ORDER BY user_id
"""


HIST_BINS = 256


def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile sketch — the scale path that
    replaces ``percentile``'s full sort: one map-side-combinable groupBy
    folds the corpus into ≤``HIST_BINS`` (bin, count) cells, and the
    p50/p90/p99 estimates interpolate inside the selected bin. Following
    the KMV pattern, the EXACT percentile rides in the output, so the
    sketch's error is itself part of the hash-checked contract.

    Engine-exact by construction: bin edges come from exact min/max
    (identical doubles), the bin index is one float expression written
    identically in both engines, the target rank is pure integer
    arithmetic (``(n*q + 99) div 100`` — never a double→int cast, the
    round-vs-truncate trap), and the interpolation is a single
    parenthesization-pinned double expression rounded at 4 dp.

    Scale shape: bounds are a 1-row broadcast; the histogram shuffle
    carries at most HIST_BINS rows per task (map-side combine); the
    cumulative window runs over ≤256 rows (single partition by design —
    that is the sketch's whole point). Sketches from disjoint corpus
    partitions merge by adding counts, so this is the per-executor →
    global two-level pattern at 1000 executors."""
    x = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_extendedprice").alias("x")
    )
    bounds = x.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("*").alias("n")
    )
    binc = F.least(
        F.floor(
            (F.col("x") - F.col("lo"))
            * F.lit(float(HIST_BINS))
            / (F.col("hi") - F.col("lo"))
        ).cast("int"),
        F.lit(HIST_BINS - 1),
    )
    hist = (
        x.crossJoin(F.broadcast(bounds))
        .groupBy(binc.alias("bin"))
        .agg(F.count("*").alias("c"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).withColumn("cum_before", F.col("cum") - F.col("c"))
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q int")
    exact = x.agg(
        *[
            F.round(F.expr(f"percentile(x, {q / 100.0!r})"), 4).alias(f"e{q}")
            for q in (50, 90, 99)
        ]
    )
    sel = (
        cum.crossJoin(F.broadcast(bounds))
        .join(
            F.broadcast(qs),
            (F.col("cum") >= F.expr("(n * q + 99) div 100"))
            & (F.col("cum_before") < F.expr("(n * q + 99) div 100")),
        )
        .crossJoin(F.broadcast(exact))
    )
    est = F.col("lo") + (F.col("hi") - F.col("lo")) * (
        (
            F.col("bin").cast("double")
            + (
                F.expr("(n * q + 99) div 100") - F.col("cum_before")
            ).cast("double")
            / F.col("c").cast("double")
        )
        / F.lit(float(HIST_BINS))
    )
    return sel.select(
        "q",
        F.expr("CAST((n * q + 99) div 100 AS BIGINT)").alias("rank"),
        "bin",
        F.round(est, 4).alias("est"),
        F.when(F.col("q") == 50, F.col("e50"))
        .when(F.col("q") == 90, F.col("e90"))
        .otherwise(F.col("e99"))
        .alias("exact_p"),
    ).orderBy("q")


HIST_QUANTILES_SQL = f"""
    WITH bounds AS (
        SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
               count(*) AS n
        FROM lineitem
    ),
    hist AS (
        SELECT least(CAST(floor((l_extendedprice - lo)
                                * {float(HIST_BINS)!r} / (hi - lo)) AS INT),
                     {HIST_BINS - 1}) AS bin,
               count(*) AS c
        FROM lineitem, bounds
        GROUP BY 1
    ),
    cum AS (
        SELECT bin, c,
               sum(c) OVER (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM hist
    ),
    qs AS (SELECT unnest([50, 90, 99]) AS q),
    exact AS (
        SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS e50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS e90,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS e99
        FROM lineitem
    )
    SELECT q,
           CAST((n * q + 99) // 100 AS BIGINT) AS rank,
           bin,
           round(lo + (hi - lo)
                 * ((CAST(bin AS DOUBLE)
                     + CAST((n * q + 99) // 100 - (cum - c) AS DOUBLE)
                       / CAST(c AS DOUBLE))
                    / {float(HIST_BINS)!r}), 4) AS est,
           CASE WHEN q = 50 THEN e50
                WHEN q = 90 THEN e90
                ELSE e99 END AS exact_p
    FROM cum, bounds, qs, exact
    WHERE cum >= (n * q + 99) // 100
      AND cum - c < (n * q + 99) // 100
    ORDER BY q
"""


def sketch_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP histogram-quantile sketch (p50/p95 per l_returnflag):
    the grouped form of ``sketch_histogram_quantiles`` — per-group
    min/max bounds broadcast back, one (group, bin) map-side-combinable
    fold, a per-group cumulative window over ≤256 rows, in-bin
    interpolation. Same engine-exactness recipe (integer ranks via div,
    one parenthesization-pinned double expression, exact percentile
    riding in the output)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("x")
    )
    bounds = li.groupBy("g").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("*").alias("n")
    )
    binc = F.least(
        F.floor(
            (F.col("x") - F.col("lo"))
            * F.lit(float(HIST_BINS))
            / (F.col("hi") - F.col("lo"))
        ).cast("int"),
        F.lit(HIST_BINS - 1),
    )
    hist = (
        li.join(F.broadcast(bounds), "g")
        .groupBy("g", binc.alias("bin"))
        .agg(F.count("*").alias("c"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("g")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("cum_before", F.col("cum") - F.col("c"))
    qs = spark.createDataFrame([(50,), (95,)], "q int")
    exact = li.groupBy("g").agg(
        F.round(F.expr("percentile(x, 0.5)"), 4).alias("e50"),
        F.round(F.expr("percentile(x, 0.95)"), 4).alias("e95"),
    )
    sel = (
        cum.join(F.broadcast(bounds), "g")
        .join(
            F.broadcast(qs),
            (F.col("cum") >= F.expr("(n * q + 99) div 100"))
            & (F.col("cum_before") < F.expr("(n * q + 99) div 100")),
        )
        .join(F.broadcast(exact), "g")
    )
    est = F.col("lo") + (F.col("hi") - F.col("lo")) * (
        (
            F.col("bin").cast("double")
            + (
                F.expr("(n * q + 99) div 100") - F.col("cum_before")
            ).cast("double")
            / F.col("c").cast("double")
        )
        / F.lit(float(HIST_BINS))
    )
    return sel.select(
        F.col("g").alias("l_returnflag"),
        "q",
        F.round(est, 4).alias("est"),
        F.when(F.col("q") == 50, F.col("e50")).otherwise(F.col("e95")).alias(
            "exact_p"
        ),
    ).orderBy("l_returnflag", "q")


GROUP_QUANTILES_SQL = f"""
    WITH bounds AS (
        SELECT l_returnflag AS g, min(l_extendedprice) AS lo,
               max(l_extendedprice) AS hi, count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    ),
    hist AS (
        SELECT g,
               least(CAST(floor((l_extendedprice - lo)
                                * {float(HIST_BINS)!r} / (hi - lo)) AS INT),
                     {HIST_BINS - 1}) AS bin,
               count(*) AS c
        FROM lineitem JOIN bounds ON l_returnflag = g
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT g, bin, c,
               sum(c) OVER (PARTITION BY g ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM hist
    ),
    qs AS (SELECT unnest([50, 95]) AS q),
    exact AS (
        SELECT l_returnflag AS g,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS e50,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS e95
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT g AS l_returnflag, q,
           round(lo + (hi - lo)
                 * ((CAST(bin AS DOUBLE)
                     + CAST((n * q + 99) // 100 - (cum - c) AS DOUBLE)
                       / CAST(c AS DOUBLE))
                    / {float(HIST_BINS)!r}), 4) AS est,
           CASE WHEN q = 50 THEN e50 ELSE e95 END AS exact_p
    FROM cum
    JOIN bounds USING (g)
    JOIN exact USING (g)
    JOIN qs ON cum >= (n * q + 99) // 100
           AND cum - c < (n * q + 99) // 100
    ORDER BY l_returnflag, q
"""


QUERIES = {
    "agg_pricing_summary": (pricing_summary, PRICING_SQL),
    "sketch_histogram_quantiles": (
        sketch_histogram_quantiles,
        HIST_QUANTILES_SQL,
    ),
    "sketch_group_quantiles": (sketch_group_quantiles, GROUP_QUANTILES_SQL),
    "agg_price_quantiles": (price_quantiles, QUANTILES_SQL),
    "agg_priority_rollup": (priority_rollup, ROLLUP_SQL),
    "agg_hourly_event_rollup": (hourly_event_rollup, HOURLY_SQL),
    "agg_event_type_pivot": (pivot_event_types, PIVOT_SQL),
    "agg_sliding_window_events": (sliding_window_events, SLIDING_SQL),
    "agg_cube_event_rollup": (cube_event_rollup, CUBE_SQL),
    "window_rfm_segments": (rfm_segments, RFM_SQL),
    "join_revenue_by_nation": (revenue_by_nation, REVENUE_SQL),
    "join_customers_without_orders": (customers_without_orders, NO_ORDERS_SQL),
    "window_top_parts_per_brand": (top_parts_per_brand, TOP_PARTS_SQL),
    "window_sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "window_session_native": (session_window_native, SESSION_NATIVE_SQL),
    "window_cohort_retention": (cohort_retention, COHORT_SQL),
    "join_asof_click_attribution": (asof_join_events, ASOF_SQL),
    "join_range_clicks_before_errors": (
        range_join_clicks_before_errors,
        RANGE_JOIN_SQL,
    ),
    "graph_pagerank": (graph_pagerank, PAGERANK_SQL),
    "graph_triangles": (graph_triangles, TRIANGLES_SQL),
    "window_funnel_stages": (funnel_stages, FUNNEL_SQL),
}
