"""Relational (R) twins of the extraction operators.

Each gmft pipeline stage that is SQL-expressible (SURVEY.md §2) is also
implemented as a declarative DataFrame query over the driver's testdata
star schema, with a matching DuckDB oracle (``__spark_entry__``). The
geometry is synthesized deterministically from integer key columns with
identical arithmetic on both engines, so value hashes match exactly.

Word/band scene derived from the testdata:
  * words  ← events:  bbox from ``event_id`` modular arithmetic, text =
    event_type, page = user_id % 8, reading order = event_id
  * row bands ← nation: 25 horizontal bands sorted by ymax
  * col bands ← region: 5 vertical bands sorted by xmax

These queries are the *scale path* for relational formulations: every one
is pure built-in-function Catalyst plan (whole-stage codegen, no Python),
with the small band tables broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


# ---------------------------------------------------------------- scene --

WORDS_SQL = """
    SELECT event_id AS word_id,
           user_id % 8 AS page,
           CAST(event_id % 37 AS DOUBLE) * 12.0 AS x0,
           CAST(event_id % 53 AS DOUBLE) * 11.0 AS y0,
           CAST(event_id % 37 AS DOUBLE) * 12.0
             + 4.0 + CAST(length(event_type) AS DOUBLE) * 4.0 AS x1,
           CAST(event_id % 53 AS DOUBLE) * 11.0 + 8.0 AS y1,
           event_type AS text
    FROM events
"""

ROWS_SQL = """
    SELECT n_nationkey AS row_idx,
           0.0 AS x0,
           CAST(n_nationkey AS DOUBLE) * 23.0 AS y0,
           450.0 AS x1,
           CAST(n_nationkey AS DOUBLE) * 23.0 + 22.0 AS y1
    FROM nation
"""

COLS_SQL = """
    SELECT r_regionkey AS col_idx,
           CAST(r_regionkey AS DOUBLE) * 90.0 AS x0,
           0.0 AS y0,
           CAST(r_regionkey AS DOUBLE) * 90.0 + 88.0 AS x1,
           580.0 AS y1
    FROM region
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def words_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    x0 = (F.col("event_id") % 37).cast("double") * 12.0
    y0 = (F.col("event_id") % 53).cast("double") * 11.0
    return e.select(
        F.col("event_id").alias("word_id"),
        (F.col("user_id") % 8).alias("page"),
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + 4.0 + F.length("event_type").cast("double") * 4.0).alias("x1"),
        (y0 + 8.0).alias("y1"),
        F.col("event_type").alias("text"),
    )


def row_bands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    y0 = F.col("n_nationkey").cast("double") * 23.0
    return n.select(
        F.col("n_nationkey").alias("row_idx"),
        F.lit(0.0).alias("x0"),
        y0.alias("y0"),
        F.lit(450.0).alias("x1"),
        (y0 + 22.0).alias("y1"),
    )


def col_bands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    x0 = F.col("r_regionkey").cast("double") * 90.0
    return r.select(
        F.col("r_regionkey").alias("col_idx"),
        x0.alias("x0"),
        F.lit(0.0).alias("y0"),
        (x0 + 88.0).alias("x1"),
        F.lit(580.0).alias("y1"),
    )


def _overlap(a0, a1, b0, b1):
    return F.greatest(F.least(a1, b1) - F.greatest(a0, b0), F.lit(0.0))


# -------------------------------------------------------------- queries --


def f1_confidence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: per-label confidence gate (structure.py:774-778) — keep a
    predicted box when score >= required[label]; labels 4/5 need 0.5,
    label 6 never passes."""
    e = _events(spark, sf_dir)
    label = (F.col("event_id") % 7).alias("label")
    score = ((F.col("event_id") % 100).cast("double") / 100.0).alias("score")
    preds = e.select(label, score)
    required = (
        F.when(F.col("label").isin(4, 5), 0.5)
        .when(F.col("label") == 6, 99.0)
        .otherwise(0.3)
    )
    return (
        preds.filter(F.col("score") >= required)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("label")
    )


F1_SQL = """
    WITH preds AS (
        SELECT event_id % 7 AS label,
               CAST(event_id % 100 AS DOUBLE) / 100.0 AS score
        FROM events
    )
    SELECT label,
           count(*) AS n_kept,
           round(min(score), 6) AS min_score,
           round(max(score), 6) AS max_score
    FROM preds
    WHERE score >= CASE WHEN label IN (4, 5) THEN 0.5
                        WHEN label = 6 THEN 99.0
                        ELSE 0.3 END
    GROUP BY label
    ORDER BY label
"""


def f2_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: rank assignment — horizontals ordered by ymax within a page
    (structure.py:791-794) as a window rank."""
    w = words_df(spark, sf_dir)
    win = Window.partitionBy("page").orderBy(F.col("y1").asc(), F.col("word_id").asc())
    ranked = w.withColumn("rank_in_page", F.row_number().over(win))
    return (
        ranked.filter(F.col("rank_in_page") <= 3)
        .select("page", "rank_in_page", "word_id", F.round("y1", 6).alias("ymax"))
        .orderBy("page", "rank_in_page")
    )


F2_SQL = f"""
    WITH words AS ({WORDS_SQL}),
    ranked AS (
        SELECT page, word_id, y1,
               row_number() OVER (PARTITION BY page ORDER BY y1 ASC, word_id ASC)
                 AS rank_in_page
        FROM words
    )
    SELECT page, rank_in_page, word_id, round(y1, 6) AS ymax
    FROM ranked WHERE rank_in_page <= 3
    ORDER BY page, rank_in_page
"""


def d4_words_in_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: strict-inequality spatial join of words against table regions +
    table-local offset removal (detectors/base.py:158-186, base.py:26-33)."""
    w = words_df(spark, sf_dir)
    tables = col_bands_df(spark, sf_dir).select(
        F.col("col_idx").alias("table_id"),
        (F.col("x0") * 1.0).alias("bx0"),
        F.lit(50.0).alias("by0"),
        (F.col("x1") * 1.0).alias("bx1"),
        F.lit(400.0).alias("by1"),
    )
    joined = w.join(
        F.broadcast(tables),
        (F.greatest(w.x0, tables.bx0) < F.least(w.x1, tables.bx1))
        & (F.greatest(w.y0, tables.by0) < F.least(w.y1, tables.by1)),
    )
    return (
        joined.groupBy("table_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.sum(F.col("x0") - F.col("bx0")), 4).alias("sum_local_x0"),
            F.round(F.sum(F.col("y0") - F.col("by0")), 4).alias("sum_local_y0"),
        )
        .orderBy("table_id")
    )


D4_SQL = f"""
    WITH words AS ({WORDS_SQL}),
    tables AS (
        SELECT r_regionkey AS table_id,
               CAST(r_regionkey AS DOUBLE) * 90.0 AS bx0,
               50.0 AS by0,
               CAST(r_regionkey AS DOUBLE) * 90.0 + 88.0 AS bx1,
               400.0 AS by1
        FROM region
    )
    SELECT table_id,
           count(*) AS n_words,
           round(sum(x0 - bx0), 4) AS sum_local_x0,
           round(sum(y0 - by0), 4) AS sum_local_y0
    FROM words JOIN tables
      ON greatest(x0, bx0) < least(x1, bx1)
     AND greatest(y0, by0) < least(y1, by1)
    GROUP BY table_id
    ORDER BY table_id
"""


def f7_cell_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — the flagship relational op (structure.py:671-757): every word
    goes to the row and column with maximal iob (first index wins ties),
    the word must sit in the row∩column cell with iob >= 0.05, and cell
    text concatenates in reading order. Bands broadcast; ranking via
    row_number windows."""
    w = words_df(spark, sf_dir)
    rows = row_bands_df(spark, sf_dir)
    cols = col_bands_df(spark, sf_dir)

    warea = (w.x1 - w.x0) * (w.y1 - w.y0)

    # argmax-by-iob is a map-side-combinable min(struct(-iob, idx, ...))
    # aggregation (first strict max ≡ lexicographic min), not a window sort
    # — partial aggregation shrinks the shuffle to one row per word.
    riob = (
        _overlap(w.x0, w.x1, rows.x0, rows.x1)
        * _overlap(w.y0, w.y1, rows.y0, rows.y1)
        / warea
    )
    word_cols = ["page", "word_id", "text", "wx0", "wy0", "wx1", "wy1"]
    wr = (
        w.join(F.broadcast(rows), riob > 0)
        .select(
            "page", "word_id", "text",
            w.x0.alias("wx0"), w.y0.alias("wy0"),
            w.x1.alias("wx1"), w.y1.alias("wy1"),
            F.struct(
                (-riob).alias("neg_iob"),
                rows.row_idx.alias("row_idx"),
                rows.y0.alias("ry0"),
                rows.y1.alias("ry1"),
            ).alias("cand"),
        )
        .groupBy(*word_cols)
        .agg(F.min("cand").alias("best_row"))
        .select(*word_cols, "best_row.row_idx", "best_row.ry0", "best_row.ry1")
    )

    warea2 = (F.col("wx1") - F.col("wx0")) * (F.col("wy1") - F.col("wy0"))
    ciob = (
        _overlap(F.col("wx0"), F.col("wx1"), cols.x0, cols.x1)
        * _overlap(F.col("wy0"), F.col("wy1"), cols.y0, cols.y1)
        / warea2
    )
    row_cols = word_cols + ["row_idx", "ry0", "ry1"]
    wrc = (
        wr.join(F.broadcast(cols), ciob > 0)
        .select(
            *row_cols,
            F.struct(
                (-ciob).alias("neg_iob"),
                cols.col_idx.alias("col_idx"),
                cols.x0.alias("cx0"),
                cols.x1.alias("cx1"),
            ).alias("cand"),
        )
        .groupBy(*row_cols)
        .agg(F.min("cand").alias("best_col"))
        .select(*row_cols, "best_col.col_idx", "best_col.cx0", "best_col.cx1")
    )

    # cell = row ∩ column; rows span [0,450]×row-y, columns span col-x×[0,580]
    cell_score = (
        _overlap(F.col("wx0"), F.col("wx1"), F.col("cx0"), F.col("cx1"))
        * _overlap(F.col("wy0"), F.col("wy1"), F.col("ry0"), F.col("ry1"))
        / warea2
    )
    kept = wrc.withColumn("score", cell_score).filter(F.col("score") >= 0.05)

    return (
        kept.groupBy("page", "row_idx", "col_idx")
        .agg(
            F.count("*").alias("n_words"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("cell_text"),
        )
        .orderBy("page", "row_idx", "col_idx")
    )


F7_CTES = f"""
    WITH words AS ({WORDS_SQL}),
    rowbands AS ({ROWS_SQL}),
    colbands AS ({COLS_SQL}),
    wr AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY page, word_id
                       ORDER BY riob DESC, row_idx ASC) AS rn
            FROM (
                SELECT w.page, w.word_id, w.text,
                       w.x0 AS wx0, w.y0 AS wy0, w.x1 AS wx1, w.y1 AS wy1,
                       r.row_idx, r.y0 AS ry0, r.y1 AS ry1,
                       (greatest(least(w.x1, r.x1) - greatest(w.x0, r.x0), 0.0)
                        * greatest(least(w.y1, r.y1) - greatest(w.y0, r.y0), 0.0))
                        / ((w.x1 - w.x0) * (w.y1 - w.y0)) AS riob
                FROM words w JOIN rowbands r
                  ON (greatest(least(w.x1, r.x1) - greatest(w.x0, r.x0), 0.0)
                      * greatest(least(w.y1, r.y1) - greatest(w.y0, r.y0), 0.0)) > 0
            ) t0
        ) t WHERE rn = 1
    ),
    wrc AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY page, word_id
                       ORDER BY ciob DESC, col_idx ASC) AS rn2
            FROM (
                SELECT wr.page, wr.word_id, wr.text,
                       wr.wx0, wr.wy0, wr.wx1, wr.wy1,
                       wr.row_idx, wr.ry0, wr.ry1,
                       c.col_idx, c.x0 AS cx0, c.x1 AS cx1,
                       (greatest(least(wr.wx1, c.x1) - greatest(wr.wx0, c.x0), 0.0)
                        * greatest(least(wr.wy1, c.y1) - greatest(wr.wy0, c.y0), 0.0))
                        / ((wr.wx1 - wr.wx0) * (wr.wy1 - wr.wy0)) AS ciob
                FROM wr JOIN colbands c
                  ON (greatest(least(wr.wx1, c.x1) - greatest(wr.wx0, c.x0), 0.0)
                      * greatest(least(wr.wy1, c.y1) - greatest(wr.wy0, c.y0), 0.0)) > 0
            ) t0
        ) t WHERE rn2 = 1
    ),
    kept AS (
        SELECT * FROM (
            SELECT *,
                   (greatest(least(wx1, cx1) - greatest(wx0, cx0), 0.0)
                    * greatest(least(wy1, ry1) - greatest(wy0, ry0), 0.0))
                    / ((wx1 - wx0) * (wy1 - wy0)) AS score
            FROM wrc
        ) t WHERE score >= 0.05
    )
"""

F7_SQL = f"""{F7_CTES}
    SELECT page, row_idx, col_idx,
           count(*) AS n_words,
           string_agg(text, ' ' ORDER BY word_id) AS cell_text
    FROM kept
    GROUP BY page, row_idx, col_idx
    ORDER BY page, row_idx, col_idx
"""


def d5_position_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: text assembly (detectors/base.py:23-48) — newline when the
    bottom edge jumps by >= 3 units from the previous word, else space;
    one assembled string per page."""
    w = words_df(spark, sf_dir)
    win = Window.partitionBy("page").orderBy("word_id")
    pieces = w.withColumn("prev_y1", F.lag("y1").over(win)).withColumn(
        "piece",
        F.when(F.col("prev_y1").isNull(), F.col("text")).otherwise(
            F.concat(
                F.when(
                    F.abs(F.col("y1") - F.col("prev_y1")) >= 3.0, F.lit("\n")
                ).otherwise(F.lit(" ")),
                F.col("text"),
            )
        ),
    )
    return (
        pieces.groupBy("page")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "piece"))),
                    lambda s: s["piece"],
                ),
            ).alias("page_text")
        )
        .orderBy("page")
    )


D5_SQL = f"""
    WITH words AS ({WORDS_SQL}),
    pieces AS (
        SELECT page, word_id,
               CASE WHEN lag(y1) OVER w IS NULL THEN text
                    WHEN abs(y1 - lag(y1) OVER w) >= 3.0 THEN chr(10) || text
                    ELSE ' ' || text END AS piece
        FROM words
        WINDOW w AS (PARTITION BY page ORDER BY word_id)
    )
    SELECT page, string_agg(piece, '' ORDER BY word_id) AS page_text
    FROM pieces
    GROUP BY page
    ORDER BY page
"""


def s3_line_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: line-break inference as a running counter (lag + windowed sum) —
    the relational approximation of pdf_bindings/base.py:173-208 (the exact
    anchor-based form lives in kernel.text.infer_line_breaks)."""
    w = words_df(spark, sf_dir)
    win = Window.partitionBy("page").orderBy("word_id")
    thresh = F.greatest(
        F.avg(F.col("y1") - F.col("y0")).over(Window.partitionBy("page")) * 0.8,
        F.lit(0.1),
    )
    flagged = w.withColumn(
        "new_line",
        F.when(
            F.abs(F.col("y0") - F.lag("y0").over(win)) > thresh, 1
        ).otherwise(0),
    )
    lines = flagged.withColumn(
        "line_no",
        F.sum("new_line").over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        lines.groupBy("page", "line_no")
        .agg(F.count("*").alias("n_words"))
        .orderBy("page", "line_no")
    )


S3_SQL = f"""
    WITH words AS ({WORDS_SQL}),
    flagged AS (
        SELECT page, word_id,
               CASE WHEN abs(y0 - lag(y0) OVER w)
                         > greatest(0.8 * avg(y1 - y0) OVER (PARTITION BY page), 0.1)
                    THEN 1 ELSE 0 END AS new_line
        FROM words
        WINDOW w AS (PARTITION BY page ORDER BY word_id)
    ),
    lines AS (
        SELECT page,
               CAST(sum(new_line) OVER (PARTITION BY page ORDER BY word_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS line_no
        FROM flagged
    )
    SELECT page, line_no, count(*) AS n_words
    FROM lines
    GROUP BY page, line_no
    ORDER BY page, line_no
"""


def d7_word_height(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: predicted word height = 0.95 × exact median of qualifying word
    heights (detectors/base.py:223-257)."""
    w = words_df(spark, sf_dir)
    heights = w.withColumn("h", F.col("y1") - F.col("y0")).filter(F.col("h") > 0.1)
    return (
        heights.groupBy("page")
        .agg(F.round(F.expr("0.95 * percentile(h, 0.5)"), 6).alias("word_height"))
        .orderBy("page")
    )


D7_SQL = f"""
    WITH words AS ({WORDS_SQL})
    SELECT page, round(0.95 * median(y1 - y0), 6) AS word_height
    FROM words WHERE (y1 - y0) > 0.1
    GROUP BY page
    ORDER BY page
"""


def f8_null_row_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: null-row removal — anti-join the row catalog against rows that
    received any cell text (structure.py:980-987)."""
    cells = f7_cell_assignment(spark, sf_dir)
    rows = row_bands_df(spark, sf_dir)
    pages = cells.select("page").distinct()
    all_rows = pages.crossJoin(F.broadcast(rows.select("row_idx")))
    occupied = cells.select("page", "row_idx").distinct()
    return (
        all_rows.join(occupied, ["page", "row_idx"], "left_anti")
        .orderBy("page", "row_idx")
        .select("page", "row_idx")
    )


F8_SQL = f"""{F7_CTES},
    allrows AS (
        SELECT p.page, r.n_nationkey AS row_idx
        FROM (SELECT DISTINCT page FROM kept) p CROSS JOIN nation r
    )
    SELECT a.page, a.row_idx
    FROM allrows a
    WHERE NOT EXISTS (
        SELECT 1 FROM kept c WHERE c.page = a.page AND c.row_idx = a.row_idx
    )
    ORDER BY page, row_idx
"""


def h1_sweep_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1: sweep-line interval histogram (histogram.py:5-137) — explode
    intervals into ±1 events, running coverage, merge maximal gaps where
    coverage <= 0 (island detection)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 997 == 0
    )
    iv = li.select(
        (F.col("l_quantity") * 7.0).alias("s"),
        (F.col("l_quantity") * 7.0 + F.col("l_linenumber").cast("double") * 2.0).alias(
            "e"
        ),
    ).filter(F.col("e") > F.col("s"))
    events = iv.select(F.col("s").alias("p"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("e").alias("p"), F.lit(-1).alias("d"))
    )
    pts = events.groupBy("p").agg(F.sum("d").alias("d"))
    win = Window.orderBy("p")
    cov = pts.withColumn(
        "cov", F.sum("d").over(win.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("nxt", F.lead("p").over(win))
    segs = cov.filter(F.col("nxt").isNotNull())
    # island grouping of consecutive low-coverage segments
    segs = segs.withColumn("low", (F.col("cov") <= 0).cast("int")).withColumn(
        "grp",
        F.sum(1 - F.col("low")).over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        segs.filter(F.col("low") == 1)
        .groupBy("grp")
        .agg(
            F.round(F.min("p"), 6).alias("gap_start"),
            F.round(F.max("nxt"), 6).alias("gap_end"),
        )
        .select("gap_start", "gap_end")
        .orderBy("gap_start")
    )


H1_SQL = """
    WITH iv AS (
        SELECT l_quantity * 7.0 AS s,
               l_quantity * 7.0 + CAST(l_linenumber AS DOUBLE) * 2.0 AS e
        FROM lineitem WHERE l_orderkey % 997 = 0 AND
             (l_quantity * 7.0 + CAST(l_linenumber AS DOUBLE) * 2.0) > l_quantity * 7.0
    ),
    ev AS (
        SELECT s AS p, 1 AS d FROM iv
        UNION ALL
        SELECT e AS p, -1 AS d FROM iv
    ),
    pts AS (SELECT p, sum(d) AS d FROM ev GROUP BY p),
    cov AS (
        SELECT p,
               sum(d) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cov,
               lead(p) OVER (ORDER BY p) AS nxt
        FROM pts
    ),
    segs AS (
        SELECT p, nxt,
               CASE WHEN cov <= 0 THEN 1 ELSE 0 END AS low,
               sum(CASE WHEN cov <= 0 THEN 0 ELSE 1 END)
                 OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS grp
        FROM cov WHERE nxt IS NOT NULL
    )
    SELECT round(min(p), 6) AS gap_start, round(max(nxt), 6) AS gap_end
    FROM segs WHERE low = 1
    GROUP BY grp
    ORDER BY gap_start
"""


def h3_divider_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: divider-partition cell fill (dividers.py:37-79) — a word's cell
    index = number of dividers strictly below its midpoint (bisect_left)."""
    w = words_df(spark, sf_dir)
    ydivs = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select((F.col("n_nationkey").cast("double") * 25.0).alias("yd"))
    )
    xdivs = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .select((F.col("r_regionkey").cast("double") * 120.0).alias("xd"))
    )
    mids = w.select(
        "page",
        "word_id",
        "text",
        ((F.col("x0") + F.col("x1")) / 2.0).alias("xm"),
        ((F.col("y0") + F.col("y1")) / 2.0).alias("ym"),
    )
    rowed = (
        mids.join(F.broadcast(ydivs), F.col("yd") < F.col("ym"), "left")
        .groupBy("page", "word_id", "text", "xm", "ym")
        .agg(F.count("yd").alias("row_idx"))
    )
    celled = (
        rowed.join(F.broadcast(xdivs), F.col("xd") < F.col("xm"), "left")
        .groupBy("page", "word_id", "text", "row_idx")
        .agg(F.count("xd").alias("col_idx"))
    )
    return (
        celled.groupBy("page", "row_idx", "col_idx")
        .agg(
            F.count("*").alias("n_words"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("cell_text"),
        )
        .orderBy("page", "row_idx", "col_idx")
    )


H3_SQL = f"""
    WITH words AS ({WORDS_SQL}),
    mids AS (
        SELECT page, word_id, text,
               (x0 + x1) / 2.0 AS xm, (y0 + y1) / 2.0 AS ym
        FROM words
    ),
    celled AS (
        SELECT page, word_id, text,
               (SELECT count(*) FROM nation
                 WHERE CAST(n_nationkey AS DOUBLE) * 25.0 < ym) AS row_idx,
               (SELECT count(*) FROM region
                 WHERE CAST(r_regionkey AS DOUBLE) * 120.0 < xm) AS col_idx
        FROM mids
    )
    SELECT page, row_idx, col_idx,
           count(*) AS n_words,
           string_agg(text, ' ' ORDER BY word_id) AS cell_text
    FROM celled
    GROUP BY page, row_idx, col_idx
    ORDER BY page, row_idx, col_idx
"""


def t3_interval_complement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: content intervals between sorted dividers (dividers.py:98-130) —
    lag over sorted divider ends generates the complementary spans."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    divs = n.select(
        (F.col("n_nationkey").cast("double") * 25.0).alias("ds"),
        (F.col("n_nationkey").cast("double") * 25.0 + 5.0).alias("de"),
    )
    win = Window.orderBy("ds")
    gaps = divs.withColumn("prev_end", F.lag("de").over(win))
    return (
        gaps.select(
            F.coalesce(F.col("prev_end"), F.lit(0.0)).alias("content_start"),
            F.col("ds").alias("content_end"),
        )
        .filter(F.col("content_end") > F.col("content_start"))
        .orderBy("content_start")
    )


T3_SQL = """
    WITH divs AS (
        SELECT CAST(n_nationkey AS DOUBLE) * 25.0 AS ds,
               CAST(n_nationkey AS DOUBLE) * 25.0 + 5.0 AS de
        FROM nation
    ),
    gaps AS (
        SELECT coalesce(lag(de) OVER (ORDER BY ds), 0.0) AS content_start,
               ds AS content_end
        FROM divs
    )
    SELECT content_start, content_end
    FROM gaps WHERE content_end > content_start
    ORDER BY content_start
"""


def f11_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: hierarchical-left semantic fill (structure.py:610-628) as the
    classic last-non-null forward fill over an ordered window."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sparse = docs.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 4 == 0, F.substring("text", 1, 8)).alias("header"),
    )
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        sparse.withColumn("filled", F.last("header", ignorenulls=True).over(win))
        .select("doc_id", "source", "filled")
        .orderBy("doc_id")
    )


F11_SQL = """
    WITH sparse AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 4 = 0 THEN substr(text, 1, 8) END AS header
        FROM documents
    )
    SELECT doc_id, source,
           last_value(header IGNORE NULLS) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM sparse
    ORDER BY doc_id
"""


def f9_multiheader_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 multi-header column naming (structure.py:1056-1060): when more
    than one header row survives, each column's name is the ' \\n'-joined
    (space + literal backslash-n, the reference's exact separator)
    concatenation of its NON-EMPTY header cells, top row first. Synthetic
    two-header grid: 5 tables × 5 columns off the nation table; every
    third second-row header cell is empty and must vanish from the join
    (no dangling separator)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    g = n.select(
        F.floor(F.col("n_nationkey") / 5).cast("int").alias("tbl"),
        (F.col("n_nationkey") % 5).cast("int").alias("col"),
        F.concat(
            F.lit("col"), (F.col("n_nationkey") % 5).cast("string")
        ).alias("h0"),
        F.when(
            F.col("n_nationkey") % 3 != 0, F.substring("n_name", 1, 4)
        )
        .otherwise(F.lit(""))
        .alias("h1"),
    )
    name = F.when(
        F.col("h1") != "",
        F.concat(F.col("h0"), F.lit(" \\n"), F.col("h1")),
    ).otherwise(F.col("h0"))
    return g.select(
        "tbl", "col", name.alias("column_name")
    ).orderBy("tbl", "col")


F9_MULTIHEADER_SQL = r"""
    SELECT CAST(n_nationkey // 5 AS INT) AS tbl,
           CAST(n_nationkey % 5 AS INT) AS col,
           'col' || CAST(n_nationkey % 5 AS VARCHAR)
           || CASE WHEN n_nationkey % 3 <> 0
                   THEN ' \n' || substr(n_name, 1, 4)
                   ELSE '' END AS column_name
    FROM nation
    ORDER BY tbl, col
"""


def histogram_formatter_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE histogram formatter (H1→H4,
    formatters/histogram.py:142-199) as one declarative plan: per-page
    coverage profiles over word x/y extents (rounded 2dp) → maximal
    zero-coverage gaps (x-gaps wider than 3 become column dividers, all
    y-gaps become row dividers) → divider midpoints bucket the words →
    ordered cell-text concatenation. No UDFs anywhere."""
    w = words_df(spark, sf_dir).select(
        "page",
        "word_id",
        "text",
        F.round("x0", 2).alias("rx0"),
        F.round("y0", 2).alias("ry0"),
        F.round("x1", 2).alias("rx1"),
        F.round("y1", 2).alias("ry1"),
        ((F.col("x0") + F.col("x1")) / 2.0).alias("xm"),
        ((F.col("y0") + F.col("y1")) / 2.0).alias("ym"),
    )

    def gaps(lo_col: str, hi_col: str):
        ev = w.select("page", F.col(lo_col).alias("p"), F.lit(1).alias("d")).unionAll(
            w.select("page", F.col(hi_col).alias("p"), F.lit(-1).alias("d"))
        )
        pts = ev.groupBy("page", "p").agg(F.sum("d").alias("d"))
        win = Window.partitionBy("page").orderBy("p")
        cov = pts.withColumn(
            "cov", F.sum("d").over(win.rowsBetween(Window.unboundedPreceding, 0))
        ).withColumn("nxt", F.lead("p").over(win))
        segs = (
            cov.filter(F.col("nxt").isNotNull())
            .withColumn("low", (F.col("cov") <= 0).cast("int"))
            .withColumn(
                "grp",
                F.sum(1 - F.col("low")).over(
                    win.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        )
        return (
            segs.filter(F.col("low") == 1)
            .groupBy("page", "grp")
            .agg(F.min("p").alias("gs"), F.max("nxt").alias("ge"))
            .select(F.col("page").alias("dpage"), "gs", "ge")
        )

    xdiv = (
        gaps("rx0", "rx1")
        .filter(F.col("ge") - F.col("gs") > 3.0)
        .select("dpage", ((F.col("gs") + F.col("ge")) / 2.0).alias("xd"))
    )
    ydiv = gaps("ry0", "ry1").select(
        "dpage", ((F.col("gs") + F.col("ge")) / 2.0).alias("yd")
    )

    rowed = (
        w.join(
            ydiv,
            (F.col("page") == F.col("dpage")) & (F.col("yd") < F.col("ym")),
            "left",
        )
        .groupBy("page", "word_id", "text", "xm")
        .agg(F.count("yd").alias("row_idx"))
    )
    celled = (
        rowed.join(
            xdiv,
            (F.col("page") == F.col("dpage")) & (F.col("xd") < F.col("xm")),
            "left",
        )
        .groupBy("page", "word_id", "text", "row_idx")
        .agg(F.count("xd").alias("col_idx"))
    )
    return (
        celled.groupBy("page", "row_idx", "col_idx")
        .agg(
            F.count("*").alias("n_words"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("cell_text"),
        )
        .orderBy("page", "row_idx", "col_idx")
    )


HISTOGRAM_FORMATTER_SQL = f"""
    WITH words AS ({WORDS_SQL}),
    w AS (
        SELECT page, word_id, text,
               round(x0, 2) AS rx0, round(y0, 2) AS ry0,
               round(x1, 2) AS rx1, round(y1, 2) AS ry1,
               (x0 + x1) / 2.0 AS xm, (y0 + y1) / 2.0 AS ym
        FROM words
    ),
    xev AS (
        SELECT page, rx0 AS p, 1 AS d FROM w
        UNION ALL SELECT page, rx1 AS p, -1 AS d FROM w
    ),
    xpts AS (SELECT page, p, sum(d) AS d FROM xev GROUP BY page, p),
    xcov AS (
        SELECT page, p,
               sum(d) OVER (PARTITION BY page ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cov,
               lead(p) OVER (PARTITION BY page ORDER BY p) AS nxt
        FROM xpts
    ),
    xsegs AS (
        SELECT page, p, nxt,
               CASE WHEN cov <= 0 THEN 1 ELSE 0 END AS low,
               sum(CASE WHEN cov <= 0 THEN 0 ELSE 1 END)
                 OVER (PARTITION BY page ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM xcov WHERE nxt IS NOT NULL
    ),
    xdiv AS (
        SELECT page, (min(p) + max(nxt)) / 2.0 AS xd
        FROM xsegs WHERE low = 1
        GROUP BY page, grp
        HAVING max(nxt) - min(p) > 3.0
    ),
    yev AS (
        SELECT page, ry0 AS p, 1 AS d FROM w
        UNION ALL SELECT page, ry1 AS p, -1 AS d FROM w
    ),
    ypts AS (SELECT page, p, sum(d) AS d FROM yev GROUP BY page, p),
    ycov AS (
        SELECT page, p,
               sum(d) OVER (PARTITION BY page ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cov,
               lead(p) OVER (PARTITION BY page ORDER BY p) AS nxt
        FROM ypts
    ),
    ysegs AS (
        SELECT page, p, nxt,
               CASE WHEN cov <= 0 THEN 1 ELSE 0 END AS low,
               sum(CASE WHEN cov <= 0 THEN 0 ELSE 1 END)
                 OVER (PARTITION BY page ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM ycov WHERE nxt IS NOT NULL
    ),
    ydiv AS (
        SELECT page, (min(p) + max(nxt)) / 2.0 AS yd
        FROM ysegs WHERE low = 1
        GROUP BY page, grp
    ),
    celled AS (
        SELECT w.page, w.word_id, w.text,
               (SELECT count(*) FROM ydiv
                 WHERE ydiv.page = w.page AND ydiv.yd < w.ym) AS row_idx,
               (SELECT count(*) FROM xdiv
                 WHERE xdiv.page = w.page AND xdiv.xd < w.xm) AS col_idx
        FROM w
    )
    SELECT page, row_idx, col_idx,
           count(*) AS n_words,
           string_agg(text, ' ' ORDER BY word_id) AS cell_text
    FROM celled
    GROUP BY page, row_idx, col_idx
    ORDER BY page, row_idx, col_idx
"""


QUERIES = {
    "f1_confidence_filter": (f1_confidence_filter, F1_SQL),
    "f2_sort_rank": (f2_sort_rank, F2_SQL),
    "d4_words_in_table": (d4_words_in_table, D4_SQL),
    "d5_position_words": (d5_position_words, D5_SQL),
    "s3_line_breaks": (s3_line_breaks, S3_SQL),
    "d7_word_height": (d7_word_height, D7_SQL),
    "f7_cell_assignment": (f7_cell_assignment, F7_SQL),
    "f8_null_row_removal": (f8_null_row_removal, F8_SQL),
    "h1_sweep_gaps": (h1_sweep_gaps, H1_SQL),
    "h3_divider_fill": (h3_divider_fill, H3_SQL),
    "t3_interval_complement": (t3_interval_complement, T3_SQL),
    "f9_multiheader_columns": (f9_multiheader_columns, F9_MULTIHEADER_SQL),
    "f11_forward_fill": (f11_forward_fill, F11_SQL),
    "histogram_formatter_relational": (
        histogram_formatter_relational,
        HISTOGRAM_FORMATTER_SQL,
    ),
}
