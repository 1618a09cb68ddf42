"""DuckDB twin of the synthetic scene generator (kernel/synth.py).

Every word-layout draw in ``synth_scene`` is a *named* md5 draw
(``kernel.synth._h32``: first 8 hex chars of md5(key) as a 32-bit int).
This module re-derives, in pure SQL over the ``documents`` table:

  * the full page word layout (captions + table cells, rotation included),
  * the stand-in layout detector's output (operators/detect.py — the
    line/block gap-clustering replicated as two sessionization passes),
  * per-table text (kernel.text.assemble_text separator rule) and its
    per-conversation assembly (plans/skew.assemble_conversation_text),
  * per-page word/table counts (operators/extract.assemble_pages).

giving the driver full value-hash oracles for the detection and assembly
pipelines. Arithmetic is kept EXPRESSION-IDENTICAL to the Python side
(same double ops in the same order), so values match bit-for-bit before
the final round(…, 6).
"""

from __future__ import annotations

_CHARS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _hxs(hexcol: str, start: int = 1) -> str:
    """SQL: 32-bit int from 8 hex chars of an existing hex-string column."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hexcol}, {start + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"


def _hx(key_expr: str) -> str:
    """SQL: kernel.synth._h32(key) — 32-bit int of md5(key)."""
    return _hxs(f"md5({key_expr})")


def _hrand(key_expr: str) -> str:
    return f"({_hx(key_expr)} / 4294967296.0::DOUBLE)"


def _huni(key_expr: str, a: float, b: float) -> str:
    return (
        f"({a}::DOUBLE + ({b}::DOUBLE - {a}::DOUBLE) * {_hrand(key_expr)})"
    )


def _hint(key_expr: str, lo: int, hi: int) -> str:
    return f"({lo} + {_hx(key_expr)} % {hi - lo})"


def _token(v: str, suffix: str) -> str:
    """SQL: kernel.synth._token_of — 4 base-36 chars (LSB first) + suffix."""
    chars = " || ".join(
        f"substr('{_CHARS}', CAST(({v}) // {36 ** i} AS BIGINT) % 36 + 1, 1)"
        for i in range(4)
    )
    return f"({chars} || {suffix})"


def sampled(sql: str, mod: int) -> str:
    """DuckDB twin of ``transcripts_from_documents(..., sample_mod=mod)``:
    push the doc_id % mod == 0 keep-filter into the seeds CTE (the only
    place any scene SQL reads ``documents``). Scene draws are keyed per
    (conv_id, turn_idx) — i.i.d. across turns — so a subsample is exactly
    the same pipeline over fewer scenes."""
    if mod <= 1:
        return sql
    assert sql.count("FROM documents") == 1
    return sql.replace("FROM documents", f"FROM documents WHERE doc_id % {mod} = 0")


# one row per transcript turn (sources/transcripts.transcripts_from_documents)
TURNS_SQL = """
    SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR) AS conv_id,
           CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
           'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
             || '|' || CAST(floor(doc_id / 16.0) AS INT) AS s
    FROM documents
"""

# per-scene tables with layout parameters (named draws)
_TBL_SQL = f"""
    SELECT seeds.*, tt.t, seeds.s || '|' || CAST(tt.t AS VARCHAR) AS tk,
           CASE WHEN {_hrand("seeds.s || '|' || CAST(tt.t AS VARCHAR) || '|ang'")} < 0.1::DOUBLE
                THEN 90 ELSE 0 END AS angle,
           72.0::DOUBLE + {_huni("seeds.s || '|' || CAST(tt.t AS VARCHAR) || '|ox'", 0.0, 20.0)} AS ox,
           {_hint("seeds.s || '|' || CAST(tt.t AS VARCHAR) || '|nr'", 3, 10)} AS n_rows,
           {_hint("seeds.s || '|' || CAST(tt.t AS VARCHAR) || '|nc'", 2, 6)} AS n_cols,
           CASE WHEN {_hrand("seeds.s || '|' || CAST(tt.t AS VARCHAR) || '|deg'")} < 0.02::DOUBLE
                THEN 1 ELSE 0 END AS degenerate
    FROM seeds, (VALUES (0), (1)) AS tt(t)
    WHERE tt.t < (CASE WHEN {_hrand("seeds.s || '|nt'")} < 0.15::DOUBLE THEN 2 ELSE 1 END)
"""

# per-column cumulative x edges (window prefix sums replicate np.cumsum's
# sequential double adds; x0e via 1-PRECEDING frame, NOT x1e - cw, because
# (a+b)-b != a in floating point)
_COLS_SQL = f"""
    SELECT tbl.*, g.c,
           {_huni("tbl.tk || '|cw' || CAST(g.c AS VARCHAR)", 55.0, 90.0)} AS cw
    FROM tbl, range(0, 6) AS g(c)
    WHERE g.c < tbl.n_cols
"""

_COLX_SQL = """
    SELECT *,
           coalesce(sum(cw) OVER (PARTITION BY conv_id, turn_idx, t ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0::DOUBLE) AS cx0,
           sum(cw) OVER (PARTITION BY conv_id, turn_idx, t ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx1
    FROM cols
"""

# per-table logical dims + page origin (second table sits 60pt below the
# first table's page bbox; the bbox y-extent swaps for rotated tables)
_TDIM_SQL = """
    SELECT conv_id, turn_idx, s, t, tk, angle, ox, n_rows, n_cols, degenerate,
           max(cx1) AS width,
           (n_rows + 1) * 14.0::DOUBLE AS height,
           CASE WHEN angle = 90 THEN max(cx1) ELSE (n_rows + 1) * 14.0::DOUBLE END
             AS yext
    FROM colx
    GROUP BY conv_id, turn_idx, s, t, tk, angle, ox, n_rows, n_cols,
             degenerate
"""

_TPOS_SQL = """
    SELECT d.*,
           CASE WHEN d.t = 0 THEN 100.0::DOUBLE
                ELSE 100.0::DOUBLE + first.yext + 60.0::DOUBLE END AS oy
    FROM tdim d
    LEFT JOIN tdim first
      ON d.conv_id = first.conv_id AND d.turn_idx = first.turn_idx
     AND first.t = 0 AND d.t = 1
"""

# cell words in LOGICAL (unrotated, table-local) coordinates; one md5 per
# cell carries sparse mask / second-word mask / both token values
_CELLS_SQL = f"""
    SELECT cx.conv_id, cx.turn_idx, cx.t, cx.c, g.r,
           cx.cx0, cx.cx1,
           md5(cx.tk || '|cell' || CAST(g.r AS VARCHAR) || '_'
               || CAST(cx.c AS VARCHAR)) AS h
    FROM colx cx, range(0, 10) AS g(r)
    WHERE g.r <= cx.n_rows
"""

_CWORDS_SQL = f"""
    SELECT conv_id, turn_idx, t, r, c, cx1,
           CASE WHEN r = 0 THEN 'col' || CAST(c AS VARCHAR)
                ELSE {_token(f"{_hxs('h', 17)} % 1679616",
                             "CAST(r AS VARCHAR) || CAST(c AS VARCHAR)")}
           END AS txt,
           cx0 + 3.0::DOUBLE AS x0l,
           r * 14.0::DOUBLE + 2.5::DOUBLE AS y0l,
           r * 14.0::DOUBLE + 2.5::DOUBLE + 8.2::DOUBLE AS y1l,
           cx0 + 3.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * (CASE WHEN r = 0 THEN 4 ELSE 6 END)
             AS x1raw,
           least(cx0 + 3.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * (CASE WHEN r = 0 THEN 4 ELSE 6 END),
                 cx1 - 1.0::DOUBLE) AS x1l,
           CASE WHEN r > 0 AND {_hxs("h", 9)} / 4294967296.0::DOUBLE < 0.15::DOUBLE
                THEN 1 ELSE 0 END AS has_second,
           {_token(f"{_hxs('h', 25)} % 1679616",
                   "CAST(r AS VARCHAR) || CAST(c + 11 AS VARCHAR)")} AS txt2
    FROM cells
    WHERE NOT (r > 0 AND {_hxs("h", 1)} / 4294967296.0::DOUBLE < 0.08::DOUBLE)
"""

# first words ∪ second words (second word keeps the cell's y band; its x
# start chains off the UNCLAMPED first-word x1, exactly as the generator)
_LWORDS_SQL = """
    SELECT conv_id, turn_idx, t, r, c, 0 AS sec, txt, x0l, y0l, x1l, y1l
    FROM cwords
    UNION ALL
    SELECT conv_id, turn_idx, t, r, c, 1 AS sec, txt2 AS txt,
           x1raw + 3.0::DOUBLE AS x0l, y0l,
           least(x1raw + 3.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * 7, cx1 - 1.0::DOUBLE) AS x1l, y1l
    FROM cwords
    WHERE has_second = 1
      AND least(x1raw + 3.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * 7, cx1 - 1.0::DOUBLE) > x1raw + 3.0::DOUBLE
"""

# page coordinates: identity for angle 0; the angle-90 placement maps
# logical (x0,y0,x1,y1) -> (ox+y0, oy+w-x1, ox+y1, oy+w-x0)
_TWORDS_SQL = """
    SELECT w.conv_id, w.turn_idx, w.t, w.r, w.c, w.sec, w.txt,
           CASE WHEN p.angle = 90 THEN p.ox + w.y0l ELSE p.ox + w.x0l END AS px0,
           CASE WHEN p.angle = 90 THEN p.oy + p.width - w.x1l
                ELSE p.oy + w.y0l END AS py0,
           CASE WHEN p.angle = 90 THEN p.ox + w.y1l ELSE p.ox + w.x1l END AS px1,
           CASE WHEN p.angle = 90 THEN p.oy + p.width - w.x0l
                ELSE p.oy + w.y1l END AS py1
    FROM lwords w
    JOIN tpos p ON w.conv_id = p.conv_id AND w.turn_idx = p.turn_idx
                AND w.t = p.t
"""

# caption words (fixed layout, before any table in generation order)
_CAPTION_SQL = """
    SELECT conv_id, turn_idx, -1 AS t, 0 AS r, cap.i AS c, 0 AS sec,
           cap.txt AS txt,
           72.0::DOUBLE + cap.i * 48.0::DOUBLE AS px0,
           60.0::DOUBLE AS py0,
           72.0::DOUBLE + cap.i * 48.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * cap.len AS px1,
           68.2::DOUBLE AS py1
    FROM seeds, LATERAL (
        SELECT * FROM (VALUES
            (0, 'Table', 5),
            (1, CAST(turn_idx AS VARCHAR) || '.',
                length(CAST(turn_idx AS VARCHAR)) + 1),
            (2, 'Synthetic', 9),
            (3, 'caption', 7)
        ) AS v(i, txt, len)
    ) AS cap
"""

# all page words in generation order (caption, then tables row-major with
# second words chained after their cell word)
_WORDS_SQL = """
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
             ORDER BY t, r, c, sec) AS ord
    FROM (
        SELECT * FROM captions
        UNION ALL
        SELECT * FROM twords
    )
"""

SCENE_CTES = f"""
    WITH seeds AS ({TURNS_SQL}),
    tbl AS ({_TBL_SQL}),
    cols AS ({_COLS_SQL}),
    colx AS ({_COLX_SQL}),
    tdim AS ({_TDIM_SQL}),
    tpos AS ({_TPOS_SQL}),
    cells AS ({_CELLS_SQL}),
    cwords AS ({_CWORDS_SQL}),
    lwords AS ({_LWORDS_SQL}),
    twords AS ({_TWORDS_SQL}),
    captions AS ({_CAPTION_SQL}),
    words AS ({_WORDS_SQL})
"""

# ---------------------------------------------------------------------------
# Detector oracle: operators/detect._LayoutDetector.infer replicated as two
# sessionization passes (words→lines by y0 gap ≤ 6, lines→blocks by
# top-to-previous-line-bottom gap ≤ 25), blocks with ≥ 3 lines kept,
# score = min(0.9::DOUBLE + 0.002::DOUBLE·n_words, 0.999::DOUBLE).
# ---------------------------------------------------------------------------

DETECT_SQL = SCENE_CTES + """,
    sorted AS (
        SELECT conv_id, turn_idx, ord, px0, py0, px1, py1,
               CASE WHEN py0 - lag(py0) OVER w > 6.0::DOUBLE THEN 1 ELSE 0 END AS nl
        FROM words
        WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY py0, ord)
    ),
    lined AS (
        SELECT *, CAST(sum(nl) OVER (PARTITION BY conv_id, turn_idx
                 ORDER BY py0, ord ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW) AS BIGINT) AS line_no
        FROM sorted
    ),
    lines AS (
        SELECT conv_id, turn_idx, line_no,
               min(py0) AS ly0, max(py1) AS lbot,
               min(px0) AS lx0, max(px1) AS lx1,
               count(*) AS nw
        FROM lined
        GROUP BY conv_id, turn_idx, line_no
    ),
    blocked AS (
        SELECT *, CASE WHEN ly0 - lag(lbot) OVER w > 25.0::DOUBLE THEN 1 ELSE 0 END
                 AS nb
        FROM lines
        WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY line_no)
    ),
    blocks AS (
        SELECT *, CAST(sum(nb) OVER (PARTITION BY conv_id, turn_idx
                 ORDER BY line_no ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW) AS BIGINT) AS block_no
        FROM blocked
    ),
    bagg AS (
        SELECT conv_id, turn_idx, block_no,
               count(*) AS n_lines, CAST(sum(nw) AS BIGINT) AS n_words,
               min(lx0) AS bx0, min(ly0) AS by0,
               max(lx1) AS bx1, max(lbot) AS by1
        FROM blocks
        GROUP BY conv_id, turn_idx, block_no
        HAVING count(*) >= 3
    )
    SELECT conv_id, turn_idx,
           CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                ORDER BY block_no) - 1 AS INT) AS det_id,
           round(bx0, 6) AS x0, round(by0, 6) AS y0,
           round(bx1, 6) AS x1, round(by1, 6) AS y1,
           round(least(0.9::DOUBLE + 0.002::DOUBLE * n_words, 0.999::DOUBLE), 6) AS score,
           0 AS label
    FROM bagg
    ORDER BY conv_id, turn_idx, det_id
"""

# ---------------------------------------------------------------------------
# Conversation-text oracle: per-table text via the assemble_text separator
# rule (newline when |y1 jump| >= 3, page coords, generation order —
# detectors/base.py:23-48), concatenated per conversation in
# (turn_idx, table_id) order (plans/skew.assemble_conversation_text).
# ---------------------------------------------------------------------------

_TBLBOX_SQL = """
    SELECT conv_id, turn_idx, t, ox AS bx0, oy AS by0,
           ox + CASE WHEN angle = 90 THEN height ELSE width END AS bx1,
           oy + CASE WHEN angle = 90 THEN width ELSE height END AS by1
    FROM tpos
"""

_TTEXT_CTES = SCENE_CTES + f""",
    tblbox AS ({_TBLBOX_SQL}),
    hitwords AS (
        SELECT b.conv_id, b.turn_idx, b.t AS table_id, w.ord, w.txt, w.py1
        FROM tblbox b
        JOIN words w ON w.conv_id = b.conv_id AND w.turn_idx = b.turn_idx
        WHERE greatest(w.px0, b.bx0) < least(w.px1, b.bx1)
          AND greatest(w.py0, b.by0) < least(w.py1, b.by1)
    ),
    pieces AS (
        SELECT conv_id, turn_idx, table_id, ord,
               CASE WHEN lag(py1) OVER tw IS NULL THEN ''
                    WHEN abs(py1 - lag(py1) OVER tw) >= 3.0::DOUBLE THEN chr(10)
                    ELSE ' ' END || txt AS piece
        FROM hitwords
        WINDOW tw AS (PARTITION BY conv_id, turn_idx, table_id ORDER BY ord)
    ),
    ttext AS (
        SELECT conv_id, turn_idx, table_id,
               string_agg(piece, '' ORDER BY ord) AS table_text
        FROM pieces
        GROUP BY conv_id, turn_idx, table_id
    ),
    alltbl AS (
        SELECT b.conv_id, b.turn_idx, b.t AS table_id,
               coalesce(x.table_text, '') AS table_text
        FROM tblbox b
        LEFT JOIN ttext x ON x.conv_id = b.conv_id
                         AND x.turn_idx = b.turn_idx AND x.table_id = b.t
    )
"""

CONV_TEXT_SQL = _TTEXT_CTES + """
    SELECT conv_id,
           string_agg(table_text, chr(10) ORDER BY turn_idx, table_id)
             AS full_text
    FROM alltbl
    GROUP BY conv_id
    ORDER BY conv_id
"""

# per-table text parity: the REAL extraction pipeline's table_text column
# (extract_tables -> select_table_words + assemble_text over the kernel
# path) against the independent SQL derivation above — the north rule's
# per-turn text-equality invariant as a driver value-hash check
TABLE_TEXT_SQL = _TTEXT_CTES + """
    SELECT conv_id, turn_idx, CAST(table_id AS INT) AS table_id, table_text
    FROM alltbl
    ORDER BY conv_id, turn_idx, table_id
"""

# ---------------------------------------------------------------------------
# Page-assembly counts oracle: per-turn word count and embedded-table count
# (a scene table embeds unless its predictions are degenerate — the 2%
# named-draw path whose extraction yields an error row by construction).
# ---------------------------------------------------------------------------

PAGE_COUNTS_SQL = SCENE_CTES + """,
    wcount AS (
        SELECT conv_id, turn_idx, CAST(count(*) AS INT) AS n_words
        FROM words GROUP BY conv_id, turn_idx
    ),
    tcount AS (
        SELECT conv_id, turn_idx,
               CAST(sum(1 - degenerate) AS INT) AS n_tables
        FROM tbl GROUP BY conv_id, turn_idx
    )
    SELECT w.conv_id, w.turn_idx, w.n_words, t.n_tables
    FROM wcount w
    JOIN tcount t ON w.conv_id = t.conv_id AND w.turn_idx = t.turn_idx
    ORDER BY w.conv_id, w.turn_idx
"""

# ---------------------------------------------------------------------------
# Page-render oracle (operators/render.py): the rasterizer inks pixel rows
# [floor(y0), ceil(y1)) × cols [floor(x0), ceil(x1)) per word, clamped to
# the 612×792 canvas. Scene word boxes never overlap at pixel resolution
# (≥3pt construction gaps; differentially asserted in tests/test_raster.py),
# so the per-word clamped-area sum IS the union ink count.
# ---------------------------------------------------------------------------

PAGE_RENDER_SQL = SCENE_CTES + """,
    ink AS (
        SELECT conv_id, turn_idx,
               CAST(count(*) AS INT) AS n_words,
               CAST(sum(
                   greatest(0, least(CAST(ceil(px1) AS BIGINT), 612)
                               - greatest(CAST(floor(px0) AS BIGINT), 0))
                 * greatest(0, least(CAST(ceil(py1) AS BIGINT), 792)
                               - greatest(CAST(floor(py0) AS BIGINT), 0))
               ) AS BIGINT) AS n_ink_px
        FROM words
        GROUP BY conv_id, turn_idx
    )
    SELECT conv_id, turn_idx,
           CAST(612 AS INT) AS width, CAST(792 AS INT) AS height,
           n_words, n_ink_px
    FROM ink
    ORDER BY conv_id, turn_idx
"""

# ---------------------------------------------------------------------------
# Perceptual average-hash oracle (operators/render.page_ahash): the 8×8
# tile ink counts re-derived as clamped word-area sums intersected with the
# integer tile boundaries (tile b spans pixels [b·dim//8, (b+1)·dim//8));
# bit = tile ink · 64 strictly above the page total. Valid because scene
# word boxes never overlap at pixel resolution (render-ink tripwire).
# ---------------------------------------------------------------------------

# Shared by AHASH_SQL and VISUAL_DEDUP_SQL: the 8×8 clamped word-area tile
# sums are ONE rule — edit here and both parity oracles move together
# (same pattern as _kmeans_ctes for KMEANS_SQL/SEMDEDUP_SQL).
_AHASH_CTES = """,
    blocks AS (
        SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) b(i)
    ),
    tileink AS (
        SELECT w.conv_id, w.turn_idx,
               CAST(by.i AS INT) AS block_y, CAST(bx.i AS INT) AS block_x,
               CAST(sum(
                   greatest(0,
                       least(CAST(ceil(w.px1) AS BIGINT), 612,
                             ((bx.i + 1) * 612) // 8)
                       - greatest(CAST(floor(w.px0) AS BIGINT), 0,
                                  (bx.i * 612) // 8))
                 * greatest(0,
                       least(CAST(ceil(w.py1) AS BIGINT), 792,
                             ((by.i + 1) * 792) // 8)
                       - greatest(CAST(floor(w.py0) AS BIGINT), 0,
                                  (by.i * 792) // 8))
               ) AS BIGINT) AS ink_px
        FROM words w, blocks bx, blocks by
        GROUP BY w.conv_id, w.turn_idx, by.i, bx.i
    )
"""

AHASH_SQL = SCENE_CTES + _AHASH_CTES + """
    SELECT conv_id, turn_idx, block_y, block_x, ink_px,
           CAST(CASE WHEN ink_px * 64 >
                          sum(ink_px) OVER (PARTITION BY conv_id, turn_idx)
                     THEN 1 ELSE 0 END AS INT) AS bit
    FROM tileink
    ORDER BY conv_id, turn_idx, block_y, block_x
"""


# ---------------------------------------------------------------------------
# Structure-recognition shape parity: the extraction pipeline's recovered
# column structure and error routing against the scene's named draws.
# status/message: degenerate prediction sets (the 2% |deg draw) error with
# the kernel's fixed message; otherwise the header row is recovered exactly
# (columns = col0..col{n_cols-1}). n_rows is intentionally absent — the
# Mersenne drop-row path can remove a trailing row (unrecoverable by
# design, reference gap-fill only fills interior gaps), so row count is
# not a function of the named draws.
# ---------------------------------------------------------------------------

EXTRACT_SHAPE_SQL = SCENE_CTES + """
    SELECT conv_id, turn_idx, CAST(t AS INT) AS table_id,
           CASE WHEN degenerate = 1 THEN 'error' ELSE 'ok' END AS status,
           CASE WHEN degenerate = 1 THEN 'No rows or columns detected'
                ELSE '' END AS message,
           CAST(CASE WHEN degenerate = 1 THEN 0 ELSE n_cols END AS INT)
             AS n_cols,
           CASE WHEN degenerate = 1 THEN ''
                WHEN n_cols = 2 THEN '["col0","col1"]'
                WHEN n_cols = 3 THEN '["col0","col1","col2"]'
                WHEN n_cols = 4 THEN '["col0","col1","col2","col3"]'
                ELSE '["col0","col1","col2","col3","col4"]'
           END AS columns
    FROM tbl
    ORDER BY conv_id, turn_idx, table_id
"""


def _cstr_cte() -> str:
    """Per-cell expected text: '' for sparse cells, 'colC' for the header
    row, tok1 (+' '+tok2 when the second word fires AND its clamped box is
    non-degenerate) for data cells — shared by the CSV and flags oracles."""
    m = "4294967296.0::DOUBLE"
    tok1 = _token(f"{_hxs('h', 17)} % 1679616",
                  "CAST(r AS VARCHAR) || CAST(c AS VARCHAR)")
    tok2 = _token(f"{_hxs('h', 25)} % 1679616",
                  "CAST(r AS VARCHAR) || CAST(c + 11 AS VARCHAR)")
    # identical float text to the generator: x1raw for a 6-char data token
    x1raw = "cx0 + 3.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * 6"
    fits = (f"least({x1raw} + 3.0::DOUBLE + 4.0::DOUBLE + 4.6::DOUBLE * 7, "
            f"cx1 - 1.0::DOUBLE) > {x1raw} + 3.0::DOUBLE")
    return f"""cstr AS (
        SELECT conv_id, turn_idx, t, r, c,
               CASE WHEN r > 0 AND {_hxs('h', 1)} / {m} < 0.08::DOUBLE
                    THEN ''
                    WHEN r = 0 THEN 'col' || CAST(c AS VARCHAR)
                    WHEN {_hxs('h', 9)} / {m} < 0.15::DOUBLE AND {fits}
                    THEN {tok1} || ' ' || {tok2}
                    ELSE {tok1}
               END AS cellstr
        FROM cells
    )"""


def _build_extract_csv_sql(tatr: bool = True) -> str:
    """Full-CSV oracle for the flagship extraction pipeline: the expected
    ``render_csv`` output re-derived from the named draws — header row,
    per-cell space-joined word text (second word only when it fits inside
    the column), null-row removal (fully-sparse rows), and the dropped
    LAST-row case (the named |dropq/|dropr draws; interior drops are
    recovered by gap fill so they don't change the CSV). Validated
    cell-for-cell against extract_turn on every table at sf0.01 and sf0.1
    before being registered."""
    if tatr:
        # TATR model predictions: degenerate sets error out, a dropped
        # LAST row box loses that row
        drop_pred = "NOT (d.dropr = d.n_rows AND c.r = d.n_rows)"
        status_expr = ("CASE WHEN d.degenerate = 1 THEN 'error' "
                       "ELSE 'ok' END")
        csv_expr = ("CASE WHEN d.degenerate = 1 THEN '' "
                    "ELSE h.line || chr(10) "
                    "|| coalesce(b.body || chr(10), '') END")
    else:
        # DITR divider predictions derive from the ground-truth grid:
        # no degenerate path, no dropped dividers -> every row survives
        drop_pred = "TRUE"
        status_expr = "'ok'"
        csv_expr = "h.line || chr(10) || coalesce(b.body || chr(10), '')"
    return SCENE_CTES + f""",
    {_cstr_cte()},
    crows AS (
        SELECT conv_id, turn_idx, t, r,
               string_agg(cellstr, ',' ORDER BY c) AS line,
               max(CASE WHEN cellstr <> '' THEN 1 ELSE 0 END) AS nonempty
        FROM cstr
        GROUP BY conv_id, turn_idx, t, r
    ),
    tdrop AS (
        SELECT conv_id, turn_idx, t, n_rows, degenerate,
               CASE WHEN {_hrand("tk || '|dropq'")} < 0.2::DOUBLE
                    THEN 1 + {_hx("tk || '|dropr'")} % n_rows
                    ELSE -1 END AS dropr
        FROM tbl
    ),
    tbody AS (
        SELECT c.conv_id, c.turn_idx, c.t,
               string_agg(c.line, chr(10) ORDER BY c.r) AS body
        FROM crows c
        JOIN tdrop d ON c.conv_id = d.conv_id AND c.turn_idx = d.turn_idx
                     AND c.t = d.t
        WHERE c.r > 0 AND c.nonempty = 1
          AND ({drop_pred})
        GROUP BY c.conv_id, c.turn_idx, c.t
    )
    SELECT d.conv_id, d.turn_idx, CAST(d.t AS INT) AS table_id,
           {status_expr} AS status,
           {csv_expr} AS csv
    FROM tdrop d
    JOIN (SELECT conv_id, turn_idx, t, line FROM crows WHERE r = 0) h
      ON d.conv_id = h.conv_id AND d.turn_idx = h.turn_idx AND d.t = h.t
    LEFT JOIN tbody b
      ON d.conv_id = b.conv_id AND d.turn_idx = b.turn_idx AND d.t = b.t
    ORDER BY d.conv_id, d.turn_idx, table_id
"""


EXTRACT_CSV_SQL = _build_extract_csv_sql()
DITR_CSV_SQL = _build_extract_csv_sql(tatr=False)


def _build_extract_flags_sql() -> str:
    """Flags/diagnostics parity for the flagship pipeline — the output
    columns the CSV/shape/text oracles don't cover, re-derived from the
    named draws:

    * ``top_header``: '[0]' whenever extraction succeeds (the header row
      box is never dropped; multi-header is off in the default config so
      kernel/table.py emits ``[0] if header_indices else []``);
    * ``projecting``: the |prq/|prr named draws place a projected-row
      header over data row ``pr``; the output index is pr's rank among
      SURVIVING data rows (fully-sparse rows are removed by F8; only the
      LAST row can be lost to the |dropq/|dropr draw — interior drops are
      gap-filled back). A fully-sparse pr row is removed before the
      iob>0.7 test, so the flag vanishes;
    * ``outliers``: the only key these scenes can produce is
      'skipped text' — the dropped LAST row's words (their row band is
      gone and no band reaches iob 0.05). Misfit second words never
      exist as words (the generator clamps them away), NMS removals stay
      under nms_warn_threshold=5, and in-band words have iob 1 (so no
      'lowest iob'). Value = ' ' + ' '.join(row words in generation
      order), which is the row's nonempty cellstrs joined by ' ';
    * ``hier_left`` '[]' (spanning semantics off) and ``confidence`` 1.0.

    Validated against extract_turn on every table at sf0.01 and sf0.1
    before registration."""
    return _flags_ctes() + _FLAGS_SELECT


def _flags_ctes() -> str:
    """Shared derivation for the flags and cell-span oracles: per-row
    nonempty/word-text flags, the drop/projected named draws, and the
    surviving-data-row set."""
    return SCENE_CTES + f""",
    {_cstr_cte()},
    rflag AS (
        SELECT conv_id, turn_idx, t, r,
               max(CASE WHEN cellstr <> '' THEN 1 ELSE 0 END) AS nonempty,
               string_agg(cellstr, ' ' ORDER BY c)
                 FILTER (WHERE cellstr <> '') AS rowtext
        FROM cstr
        WHERE r > 0
        GROUP BY conv_id, turn_idx, t, r
    ),
    tflag AS (
        SELECT conv_id, turn_idx, t, tk, n_rows, degenerate,
               CASE WHEN {_hrand("tk || '|dropq'")} < 0.2::DOUBLE
                    THEN 1 + {_hx("tk || '|dropr'")} % n_rows
                    ELSE -1 END AS dropr,
               CASE WHEN n_rows >= 4
                         AND {_hrand("tk || '|prq'")} < 0.15::DOUBLE
                    THEN 2 + {_hx("tk || '|prr'")} % (n_rows - 2)
                    ELSE -1 END AS pr,
               CASE WHEN n_rows >= 5
                         AND {_hrand("tk || '|spq'")} < 0.1::DOUBLE
                    THEN 3 + {_hx("tk || '|spr'")} % (n_rows - 4)
                    ELSE -1 END AS sp,
               CASE WHEN {_hrand("tk || '|dropq'")} >= 0.2::DOUBLE
                         AND n_rows >= 7
                         AND {_hrand("tk || '|nmq'")} < 0.08::DOUBLE
                    THEN 1 ELSE 0 END AS nmb
        FROM tbl
    ),
    surv AS (
        SELECT f.conv_id, f.turn_idx, f.t, f.r, d.pr
        FROM rflag f
        JOIN tflag d ON f.conv_id = d.conv_id AND f.turn_idx = d.turn_idx
                     AND f.t = d.t
        WHERE f.nonempty = 1
          AND NOT (f.r = d.dropr AND d.dropr = d.n_rows)
    )"""


_FLAGS_SELECT = """,
    counts AS (
        SELECT conv_id, turn_idx, t,
               count(*) AS n_out,
               max(CASE WHEN r = pr THEN 1 ELSE 0 END) AS pr_alive,
               sum(CASE WHEN r < pr THEN 1 ELSE 0 END) AS pr_rank
        FROM surv
        GROUP BY conv_id, turn_idx, t
    ),
    skip AS (
        SELECT f.conv_id, f.turn_idx, f.t, f.rowtext
        FROM rflag f
        JOIN tflag d ON f.conv_id = d.conv_id AND f.turn_idx = d.turn_idx
                     AND f.t = d.t
        WHERE d.dropr = d.n_rows AND f.r = d.n_rows
          AND f.rowtext IS NOT NULL
    )
    SELECT d.conv_id, d.turn_idx, CAST(d.t AS INT) AS table_id,
           CASE WHEN d.degenerate = 1 THEN 'error' ELSE 'ok' END AS status,
           CASE WHEN d.degenerate = 1 THEN '[]' ELSE '[0]' END AS top_header,
           CASE WHEN d.degenerate = 0 AND d.pr >= 0
                     AND coalesce(c.pr_alive, 0) = 1
                THEN '[' || CAST(c.pr_rank AS VARCHAR) || ']'
                ELSE '[]' END AS projecting,
           '[]' AS hier_left,
           CASE WHEN d.degenerate = 1 THEN '{}'
                WHEN d.nmb = 1 THEN '{"nms removed rows":"6"}'
                WHEN s.rowtext IS NULL THEN '{}'
                ELSE '{"skipped text":" ' || s.rowtext || '"}'
           END AS outliers,
           CAST(CASE WHEN d.degenerate = 1 THEN 0
                     ELSE coalesce(c.n_out, 0) END AS INT) AS n_rows,
           1.0::DOUBLE AS confidence
    FROM tflag d
    LEFT JOIN counts c ON d.conv_id = c.conv_id AND d.turn_idx = c.turn_idx
                       AND d.t = c.t
    LEFT JOIN skip s ON d.conv_id = s.conv_id AND d.turn_idx = s.turn_idx
                     AND d.t = s.t
    ORDER BY d.conv_id, d.turn_idx, table_id
"""


EXTRACT_FLAGS_SQL = _build_extract_flags_sql()


# Cell-span parity: the pipeline's `cells` column (array<struct<row,col,
# text>> over res.grid = the SURVIVING data rows) exploded to scalar rows.
# row = the cell's rank among surviving data rows (F8 re-index), col = the
# original column, text = the cell's space-joined words; None cells
# (sparse — no word assigned) don't emit a span, error rows emit nothing.
# With this, EVERY output column of the flagship extraction row is under
# the driver's value hash. Validated at sf0.01 and sf0.1.
CELLS_SQL = _flags_ctes() + """,
    rowidx AS (
        SELECT conv_id, turn_idx, t, r,
               CAST(row_number() OVER (PARTITION BY conv_id, turn_idx, t
                                       ORDER BY r) - 1 AS INT) AS out_row
        FROM surv
    )
    SELECT s.conv_id, s.turn_idx, CAST(s.t AS INT) AS table_id,
           i.out_row AS row, CAST(s.c AS INT) AS col, s.cellstr AS text
    FROM cstr s
    JOIN rowidx i ON s.conv_id = i.conv_id AND s.turn_idx = i.turn_idx
                  AND s.t = i.t AND s.r = i.r
    JOIN tflag d ON s.conv_id = d.conv_id AND s.turn_idx = d.turn_idx
                 AND s.t = d.t
    WHERE s.cellstr <> '' AND d.degenerate = 0
    ORDER BY s.conv_id, s.turn_idx, table_id, row, col
"""


def _build_spanning_csv_sql(mode: str) -> str:
    """Full-CSV oracle for the spanning-cells config — the DISTINCTIVE
    F10/F11 behavior under the gate, not a no-op check: the |spq/|spr
    named draws place two disjoint hier-left spanning cells over column 0
    (kernel/synth.py), and the oracle re-derives the fill:

    * 'algorithm' (the default hier-left mode): two spans in column 0
      trip the >= 2 count rule, so the WHOLE column forward-fills — each
      surviving data row's col-0 cell becomes the last non-empty col-0
      value at or above it (among surviving rows; rows before the first
      value stay empty);
    * 'deep': each span [a, a+1] fills locally — when both rows survive
      and exactly one of the two col-0 cells is empty, it takes the other
      row's value; any other state is a no-op (incl. a span row removed
      as fully sparse: the surviving single-row window can never fill).

    Null-row removal precedes the fill (kernel order), so survival uses
    PRE-fill emptiness. Validated cell-for-cell at sf0.01 and sf0.1."""
    if mode == "algorithm":
        fill = """
    fill AS (
        SELECT c0.conv_id, c0.turn_idx, c0.t, c0.r,
               coalesce(last_value(nullif(c0.c0, '') IGNORE NULLS) OVER (
                   PARTITION BY c0.conv_id, c0.turn_idx, c0.t
                   ORDER BY c0.r
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), '') AS newc0
        FROM c0
        JOIN tflag d ON c0.conv_id = d.conv_id AND c0.turn_idx = d.turn_idx
                     AND c0.t = d.t
        WHERE d.sp >= 0 AND d.degenerate = 0
    )"""
    else:
        fill = """
    spans AS (
        SELECT d.conv_id, d.turn_idx, d.t,
               CASE g.k WHEN 0 THEN 1 ELSE d.sp END AS a
        FROM tflag d, (VALUES (0), (1)) AS g(k)
        WHERE d.sp >= 0 AND d.degenerate = 0
    ),
    fill AS (
        SELECT s.conv_id, s.turn_idx, s.t,
               CASE WHEN c1.c0 <> '' THEN s.a + 1 ELSE s.a END AS r,
               CASE WHEN c1.c0 <> '' THEN c1.c0 ELSE c2.c0 END AS newc0
        FROM spans s
        JOIN c0 c1 ON c1.conv_id = s.conv_id AND c1.turn_idx = s.turn_idx
                   AND c1.t = s.t AND c1.r = s.a
        JOIN c0 c2 ON c2.conv_id = s.conv_id AND c2.turn_idx = s.turn_idx
                   AND c2.t = s.t AND c2.r = s.a + 1
        WHERE (c1.c0 <> '') <> (c2.c0 <> '')
    )"""
    return _flags_ctes() + f""",
    c0 AS (
        SELECT s.conv_id, s.turn_idx, s.t, s.r, cs.cellstr AS c0
        FROM surv s
        JOIN cstr cs ON cs.conv_id = s.conv_id AND cs.turn_idx = s.turn_idx
                     AND cs.t = s.t AND cs.r = s.r AND cs.c = 0
    ),{fill},
    cstr2 AS (
        SELECT cs.conv_id, cs.turn_idx, cs.t, cs.r, cs.c,
               CASE WHEN cs.c = 0 AND f.newc0 IS NOT NULL THEN f.newc0
                    ELSE cs.cellstr END AS cellstr
        FROM cstr cs
        LEFT JOIN fill f ON f.conv_id = cs.conv_id
                         AND f.turn_idx = cs.turn_idx AND f.t = cs.t
                         AND f.r = cs.r AND cs.c = 0
    ),
    crows2 AS (
        SELECT conv_id, turn_idx, t, r,
               string_agg(cellstr, ',' ORDER BY c) AS line
        FROM cstr2
        GROUP BY conv_id, turn_idx, t, r
    ),
    tbody2 AS (
        SELECT c.conv_id, c.turn_idx, c.t,
               string_agg(c.line, chr(10) ORDER BY c.r) AS body
        FROM crows2 c
        JOIN surv s ON s.conv_id = c.conv_id AND s.turn_idx = c.turn_idx
                    AND s.t = c.t AND s.r = c.r
        GROUP BY c.conv_id, c.turn_idx, c.t
    )
    SELECT d.conv_id, d.turn_idx, CAST(d.t AS INT) AS table_id,
           CASE WHEN d.degenerate = 1 THEN 'error' ELSE 'ok' END AS status,
           CASE WHEN d.degenerate = 1 THEN ''
                ELSE h.line || chr(10) || coalesce(b.body || chr(10), '')
           END AS csv
    FROM tflag d
    JOIN (SELECT conv_id, turn_idx, t, line FROM crows2 WHERE r = 0) h
      ON d.conv_id = h.conv_id AND d.turn_idx = h.turn_idx AND d.t = h.t
    LEFT JOIN tbody2 b
      ON d.conv_id = b.conv_id AND d.turn_idx = b.turn_idx AND d.t = b.t
    ORDER BY d.conv_id, d.turn_idx, table_id
"""


SPANNING_ALGO_CSV_SQL = _build_spanning_csv_sql("algorithm")
SPANNING_DEEP_CSV_SQL = _build_spanning_csv_sql("deep")


# Flags parity under the spanning config: identical to the default flags
# derivation EXCEPT hier_left, which becomes [0] exactly when the two
# named-draw spans fired (the 'algorithm' mode's c<3 & count>=2 rule on
# column 0; empty otherwise — including degenerate tables, which never
# get predictions). The fill itself never changes row survival (it runs
# after null-row removal), so n_rows and the rest carry over.
SPANNING_FLAGS_SQL = _build_extract_flags_sql().replace(
    "'[]' AS hier_left,",
    "CASE WHEN d.degenerate = 0 AND d.sp >= 0 THEN '[0]' ELSE '[]' END"
    " AS hier_left,",
)
assert "d.sp >= 0" in SPANNING_FLAGS_SQL


def _formatter_flags_sql(csv_sql: str) -> str:
    """Flags parity for the DITR/histogram formatter paths. Their flag
    columns are closed-form on these scenes (all-ok status, single header,
    no projected classification, no spanning, empty outliers — DITR keeps
    every row, the histogram path buckets every word), so the distinctive
    content is the grid SHAPE: n_rows/n_cols are re-derived by line/comma
    counting over the formatter's own (already value-hash-proven) CSV
    derivation — cell tokens are alnum, so the CSV is quote-free."""
    header = "split_part(csv, chr(10), 1)"
    return f"""
    WITH base AS ({csv_sql})
    SELECT conv_id, turn_idx, table_id, status,
           '[0]' AS top_header, '[]' AS projecting, '[]' AS hier_left,
           '{{}}' AS outliers,
           CAST(length(csv) - length(replace(csv, chr(10), '')) - 1 AS INT)
             AS n_rows,
           CAST(length({header}) - length(replace({header}, ',', '')) + 1
                AS INT) AS n_cols,
           1.0::DOUBLE AS confidence
    FROM base
    ORDER BY conv_id, turn_idx, table_id
"""


DITR_FLAGS_SQL = _formatter_flags_sql(DITR_CSV_SQL)
# HISTOGRAM_FLAGS_SQL is built after HISTOGRAM_CSV_SQL, end of module.


# Caption parity (D6 under the gate): for these scenes the rolling-scan
# caption finder resolves to a closed form — the page's caption line binds
# to the FIRST table (reading-order neighbour inside the 50pt margin
# band); a second table sits 60pt below the previous bbox, outside the
# band, so it gets none; nothing ever sits below a table within margin.
# Verified against find_captions on every table at sf0.01 and sf0.1.
CAPTIONS_SQL = SCENE_CTES + """
    SELECT conv_id, turn_idx, CAST(t AS INT) AS table_id,
           CASE WHEN t = 0
                THEN 'Table ' || CAST(turn_idx AS VARCHAR)
                     || '. Synthetic caption'
                ELSE '' END AS caption_above,
           '' AS caption_below
    FROM tbl
    ORDER BY conv_id, turn_idx, table_id
"""


# ---------------------------------------------------------------------------
# Histogram-formatter CSV oracle (H1→H4 under the gate): the sweep-line
# interval histogram re-derived per table over the SQL scene words —
# coverage profiles over 2dp-rounded word extents, maximal zero-coverage
# gaps (x-gaps wider than 3 become column dividers, all y-gaps row
# dividers), midpoint bucketing of the UNROUNDED words, first grid row as
# header. Mirrors kernel/histogram.py exactly (incl. the no-trailing-gap
# rule: the segment starting at the last change point never opens a gap,
# and zero-width rounded extents are excluded from the sweep but still
# bucketed).
# ---------------------------------------------------------------------------

def _hist_gap_cte(axis: str, lo: str, hi: str) -> str:
    """Coverage-gap CTE chain for one axis over the ``hw`` words."""
    return f"""
    {axis}ev AS (
        SELECT conv_id, turn_idx, t, {lo} AS p, 1 AS d FROM hw
        WHERE {hi} > {lo}
        UNION ALL
        SELECT conv_id, turn_idx, t, {hi} AS p, -1 AS d FROM hw
        WHERE {hi} > {lo}
    ),
    {axis}pts AS (
        SELECT conv_id, turn_idx, t, p, CAST(sum(d) AS BIGINT) AS d
        FROM {axis}ev GROUP BY conv_id, turn_idx, t, p
    ),
    {axis}cov AS (
        SELECT *,
               CAST(sum(d) OVER w AS BIGINT) AS cov,
               lead(p) OVER w AS nxt
        FROM {axis}pts
        WINDOW w AS (PARTITION BY conv_id, turn_idx, t ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    {axis}segs AS (
        SELECT *, CASE WHEN cov <= 0 THEN 1 ELSE 0 END AS low,
               CAST(sum(CASE WHEN cov <= 0 THEN 0 ELSE 1 END) OVER (
                   PARTITION BY conv_id, turn_idx, t ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS grp
        FROM {axis}cov
        WHERE nxt IS NOT NULL
    ),
    {axis}gaps AS (
        SELECT conv_id, turn_idx, t,
               min(p) AS gs, max(nxt) AS ge
        FROM {axis}segs
        WHERE low = 1
        GROUP BY conv_id, turn_idx, t, grp
    )"""


def _build_histogram_csv_sql() -> str:
    return SCENE_CTES + f""",
    hw AS (
        SELECT conv_id, turn_idx, t,
               round(x0l, 2) AS wx0, round(x1l, 2) AS wx1,
               round(y0l, 2) AS wy0, round(y1l, 2) AS wy1,
               (x0l + x1l) / 2 AS xm, (y0l + y1l) / 2 AS ym,
               txt, r, c, sec
        FROM lwords
    ),
    {_hist_gap_cte('x', 'wx0', 'wx1')},
    {_hist_gap_cte('y', 'wy0', 'wy1')},
    xdiv AS (
        SELECT conv_id, turn_idx, t, (gs + ge) / 2 AS xd
        FROM xgaps WHERE (ge - gs) > 3.0::DOUBLE
    ),
    ydiv AS (
        SELECT conv_id, turn_idx, t, (gs + ge) / 2 AS yd
        FROM ygaps
    ),
    dims AS (
        SELECT b.conv_id, b.turn_idx, b.t,
               coalesce(x.nx, 0) + 1 AS n_cols,
               coalesce(y.ny, 0) + 1 AS n_rows,
               b.width, b.height
        FROM tdim b
        LEFT JOIN (SELECT conv_id, turn_idx, t, count(*) AS nx
                   FROM xdiv GROUP BY conv_id, turn_idx, t) x
          ON b.conv_id = x.conv_id AND b.turn_idx = x.turn_idx AND b.t = x.t
        LEFT JOIN (SELECT conv_id, turn_idx, t, count(*) AS ny
                   FROM ydiv GROUP BY conv_id, turn_idx, t) y
          ON b.conv_id = y.conv_id AND b.turn_idx = y.turn_idx AND b.t = y.t
    ),
    bucketed AS (
        SELECT w.conv_id, w.turn_idx, w.t, w.txt, w.r, w.c, w.sec,
               (SELECT count(*) FROM xdiv d
                WHERE d.conv_id = w.conv_id AND d.turn_idx = w.turn_idx
                  AND d.t = w.t AND d.xd < w.xm) AS ci,
               (SELECT count(*) FROM ydiv d
                WHERE d.conv_id = w.conv_id AND d.turn_idx = w.turn_idx
                  AND d.t = w.t AND d.yd < w.ym) AS ri
        FROM hw w
        JOIN tdim b ON w.conv_id = b.conv_id AND w.turn_idx = b.turn_idx
                    AND w.t = b.t
        WHERE 0.0::DOUBLE <= w.xm AND w.xm <= b.width
          AND 0.0::DOUBLE <= w.ym AND w.ym <= b.height
    ),
    cellagg AS (
        SELECT conv_id, turn_idx, t, ri, ci,
               string_agg(txt, ' ' ORDER BY r, c, sec) AS cell
        FROM bucketed
        GROUP BY conv_id, turn_idx, t, ri, ci
    ),
    gridlines AS (
        SELECT d.conv_id, d.turn_idx, d.t, gr.ri,
               string_agg(coalesce(ca.cell, ''), ',' ORDER BY gc.ci) AS line
        FROM dims d
        JOIN range(0, 24) AS gr(ri) ON gr.ri < d.n_rows
        JOIN range(0, 24) AS gc(ci) ON gc.ci < d.n_cols
        LEFT JOIN cellagg ca
          ON ca.conv_id = d.conv_id AND ca.turn_idx = d.turn_idx
         AND ca.t = d.t AND ca.ri = gr.ri AND ca.ci = gc.ci
        GROUP BY d.conv_id, d.turn_idx, d.t, gr.ri
    )
    SELECT conv_id, turn_idx, CAST(t AS INT) AS table_id,
           'ok' AS status,
           string_agg(line, chr(10) ORDER BY ri) || chr(10) AS csv
    FROM gridlines
    GROUP BY conv_id, turn_idx, t
    ORDER BY conv_id, turn_idx, table_id
"""


HISTOGRAM_CSV_SQL = _build_histogram_csv_sql()
HISTOGRAM_FLAGS_SQL = _formatter_flags_sql(HISTOGRAM_CSV_SQL)


# ---------------------------------------------------------------------------
# Image-pipeline oracles (operators/render.py + detect.infer_raster): the
# ENTIRE raster path — render (pixelized word boxes), ink-row-run detection
# (blank-gap block merge, >=3 runs), crop, and whitespace-projection
# structure — re-derived relationally: interval-island window merges stand
# in for the pixel operations (exact because ink is the union of the
# clamped floor/ceil word boxes). Divider positions are emitted as
# pos_x2 = 2*midpoint (always integral) to avoid float-format drift.
# ---------------------------------------------------------------------------

RASTER_CTES = SCENE_CTES + """,
    pix AS (
        -- the empty-extent filter mirrors render_words' `c1 > c0 and
        -- r1 > r0` skip: a box clipped entirely off one page edge never
        -- inks a pixel, so it must not create phantom runs/islands here
        SELECT * FROM (
            SELECT conv_id, turn_idx, ord,
                   greatest(CAST(floor(py0) AS BIGINT), 0) AS iy0,
                   least(CAST(ceil(py1) AS BIGINT), 792) AS iy1,
                   greatest(CAST(floor(px0) AS BIGINT), 0) AS ix0,
                   least(CAST(ceil(px1) AS BIGINT), 612) AS ix1
            FROM words
        ) WHERE ix1 > ix0 AND iy1 > iy0
    ),
    -- ink-row runs: islands of the pixelized y-intervals
    yisl AS (
        SELECT *, sum(brk) OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY iy0, iy1, ord
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM (
            SELECT *, CASE WHEN prev_max IS NULL OR iy0 > prev_max THEN 1 ELSE 0 END AS brk
            FROM (
                SELECT *, max(iy1) OVER (PARTITION BY conv_id, turn_idx
                                         ORDER BY iy0, iy1, ord
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          AS prev_max
                FROM pix
            )
        )
    ),
    runs AS (
        SELECT conv_id, turn_idx, run_id, min(iy0) AS r0, max(iy1) AS r1
        FROM yisl GROUP BY conv_id, turn_idx, run_id
    ),
    -- runs -> blocks: merge when the blank gap (r0 - prev_r1) <= 25
    blk AS (
        SELECT *, sum(brk) OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY r0
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_id
        FROM (
            SELECT *, CASE WHEN lag(r1) OVER (PARTITION BY conv_id, turn_idx ORDER BY r0) IS NULL
                             OR r0 - lag(r1) OVER (PARTITION BY conv_id, turn_idx ORDER BY r0) > 25
                           THEN 1 ELSE 0 END AS brk
            FROM runs
        )
    ),
    blocks AS (
        SELECT conv_id, turn_idx, block_id,
               min(r0) AS br0, max(r1) AS br1, count(*) AS n_runs
        FROM blk GROUP BY conv_id, turn_idx, block_id
    ),
    dets AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY br0) - 1 AS INT) AS det_id
        FROM blocks WHERE n_runs >= 3
    ),
    -- member words: each word joins its run's block
    member AS (
        SELECT y.conv_id, y.turn_idx, d.det_id, d.br0, d.br1,
               b.run_id, b.r0 AS run_r0, b.r1 AS run_r1,
               y.ix0, y.ix1, y.iy0, y.iy1, y.ord
        FROM yisl y
        JOIN blk b ON y.conv_id = b.conv_id AND y.turn_idx = b.turn_idx AND y.run_id = b.run_id
        JOIN dets d ON b.conv_id = d.conv_id AND b.turn_idx = d.turn_idx AND b.block_id = d.block_id
    ),
    -- per-run x-islands (word count for the score)
    xisl_run AS (
        SELECT *, sum(brk) OVER (PARTITION BY conv_id, turn_idx, det_id, run_id
                                 ORDER BY ix0, ix1, ord
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xid
        FROM (
            SELECT *, CASE WHEN prev_max IS NULL OR ix0 > prev_max THEN 1 ELSE 0 END AS brk
            FROM (
                SELECT *, max(ix1) OVER (PARTITION BY conv_id, turn_idx, det_id, run_id
                                         ORDER BY ix0, ix1, ord
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
                FROM member
            )
        )
    ),
    det_words AS (
        SELECT conv_id, turn_idx, det_id, count(*) AS n_words FROM (
            SELECT DISTINCT conv_id, turn_idx, det_id, run_id, xid FROM xisl_run
        ) GROUP BY conv_id, turn_idx, det_id
    ),
    det_x AS (
        SELECT conv_id, turn_idx, det_id, min(ix0) AS bx0, max(ix1) AS bx1
        FROM member GROUP BY conv_id, turn_idx, det_id
    )
"""

DETECT_RASTER_SQL = RASTER_CTES + """
    SELECT d.conv_id, d.turn_idx, d.det_id,
           CAST(x.bx0 AS INT) AS x0, CAST(d.br0 AS INT) AS y0,
           CAST(x.bx1 AS INT) AS x1, CAST(d.br1 AS INT) AS y1,
           round(least(0.9::DOUBLE + 0.002::DOUBLE * w.n_words, 0.999::DOUBLE), 6) AS score
    FROM dets d
    JOIN det_x x ON d.conv_id = x.conv_id AND d.turn_idx = x.turn_idx AND d.det_id = x.det_id
    JOIN det_words w ON d.conv_id = w.conv_id AND d.turn_idx = w.turn_idx AND d.det_id = w.det_id
    ORDER BY d.conv_id, d.turn_idx, d.det_id
"""

STRUCTURE_RASTER_SQL = RASTER_CTES + """,
    -- block-wide x-islands (column ink runs across the whole tile)
    xisl_blk AS (
        SELECT *, sum(brk) OVER (PARTITION BY conv_id, turn_idx, det_id
                                 ORDER BY ix0, ix1, ord
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xid
        FROM (
            SELECT *, CASE WHEN prev_max IS NULL OR ix0 > prev_max THEN 1 ELSE 0 END AS brk
            FROM (
                SELECT *, max(ix1) OVER (PARTITION BY conv_id, turn_idx, det_id
                                         ORDER BY ix0, ix1, ord
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
                FROM member
            )
        )
    ),
    xruns AS (
        SELECT conv_id, turn_idx, det_id, xid, min(ix0) AS c0, max(ix1) AS c1
        FROM xisl_blk GROUP BY conv_id, turn_idx, det_id, xid
    ),
    -- column dividers: gaps between consecutive x-islands, tile coords
    -- (shift by -bx0 + pad); pos_x2 = start+end of the blank run
    col_div AS (
        SELECT x.conv_id, x.turn_idx, x.det_id,
               CAST(row_number() OVER (PARTITION BY x.conv_id, x.turn_idx, x.det_id ORDER BY x.c0) - 1 AS INT) AS div_idx,
               CAST(prev_c1 + x.c0 - 2 * d.bx0 + 20 AS INT) AS pos_x2
        FROM (
            SELECT *, lag(c1) OVER (PARTITION BY conv_id, turn_idx, det_id ORDER BY c0) AS prev_c1
            FROM xruns
        ) x
        JOIN det_x d ON x.conv_id = d.conv_id AND x.turn_idx = d.turn_idx AND x.det_id = d.det_id
        WHERE x.prev_c1 IS NOT NULL AND x.c0 > x.prev_c1
    ),
    -- row dividers: gaps between consecutive runs of the block, tile coords
    row_div AS (
        SELECT r.conv_id, r.turn_idx, r.det_id,
               CAST(row_number() OVER (PARTITION BY r.conv_id, r.turn_idx, r.det_id ORDER BY r.r0) - 1 AS INT) AS div_idx,
               CAST(prev_r1 + r.r0 - 2 * r.br0 + 20 AS INT) AS pos_x2
        FROM (
            SELECT b.conv_id, b.turn_idx, d.det_id, d.br0, b.r0, b.r1,
                   lag(b.r1) OVER (PARTITION BY b.conv_id, b.turn_idx, d.det_id ORDER BY b.r0) AS prev_r1
            FROM blk b
            JOIN dets d ON b.conv_id = d.conv_id AND b.turn_idx = d.turn_idx AND b.block_id = d.block_id
        ) r
        WHERE r.prev_r1 IS NOT NULL AND r.r0 > r.prev_r1
    ),
    shape AS (
        SELECT d.conv_id, d.turn_idx, d.det_id,
               CAST(d.n_runs AS INT) AS a,
               CAST((SELECT count(*) FROM xruns x
                     WHERE x.conv_id = d.conv_id AND x.turn_idx = d.turn_idx
                       AND x.det_id = d.det_id) AS INT) AS b
        FROM dets d
    )
    SELECT conv_id, turn_idx, det_id, 'col' AS axis, div_idx, pos_x2 FROM col_div
    UNION ALL
    SELECT conv_id, turn_idx, det_id, 'row' AS axis, div_idx, pos_x2 FROM row_div
    UNION ALL
    SELECT conv_id, turn_idx, det_id, 'shape' AS axis, a AS div_idx, b AS pos_x2 FROM shape
    UNION ALL
    -- ink conservation under crop+pad: tile ink == member clamped-area sum
    SELECT conv_id, turn_idx, det_id, 'ink' AS axis,
           CAST(-1 AS INT) AS div_idx,
           CAST(sum((ix1 - ix0) * (iy1 - iy0)) AS INT) AS pos_x2
    FROM member
    GROUP BY conv_id, turn_idx, det_id
    ORDER BY conv_id, turn_idx, det_id, axis, div_idx
"""


# ---------------------------------------------------------------------------
# img2table line-based detection oracle (operators/img2table.py): the line
# lattice the adapter must reconstruct by intersection + connected
# components is, by scene construction, exactly one component per table —
# so the expected candidates are closed-form on the named draws: bbox =
# table page box, page-space grid shape swaps under rotation, constant 0.9
# adapter confidence, det_id in reading order (table 1 sits 60pt below
# table 0, so reading order == t).
# ---------------------------------------------------------------------------

IMG2TABLE_SQL = f"""
    WITH seeds AS ({TURNS_SQL}),
    tbl AS ({_TBL_SQL}),
    cols AS ({_COLS_SQL}),
    colx AS ({_COLX_SQL}),
    tdim AS ({_TDIM_SQL}),
    tpos AS ({_TPOS_SQL})
    SELECT conv_id, turn_idx,
           CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                ORDER BY oy, ox) - 1 AS INT) AS det_id,
           round(ox, 6) AS x0,
           round(oy, 6) AS y0,
           round(ox + CASE WHEN angle = 90 THEN height ELSE width END, 6) AS x1,
           round(oy + CASE WHEN angle = 90 THEN width ELSE height END, 6) AS y1,
           CAST(CASE WHEN angle = 90 THEN n_cols ELSE n_rows + 1 END AS INT)
             AS grid_rows,
           CAST(CASE WHEN angle = 90 THEN n_rows + 1 ELSE n_cols END AS INT)
             AS grid_cols,
           0.9::DOUBLE AS score
    FROM tpos
    ORDER BY conv_id, turn_idx, det_id
"""


# Formatter half of the img2table path (operators/img2table.py
# img2table_extract_cells): page-space cell grid per lattice. The lattice
# edges ARE the ground-truth grid, so each word's page-space cell is a
# closed form of its logical (r, c) and the table's rotation: angle 0 →
# (r, c); angle 90 → (n_cols-1-c, r) (page y runs against logical x).
# Multi-word cells join by ' ' in (px0, py0) page order — for rotated
# pairs px0 ties (same logical y band) and the second word's smaller py0
# puts it first, identically in both engines (bit-equal doubles).
IMG2TABLE_CELLS_SQL = SCENE_CTES + """,
    det AS (
        SELECT conv_id, turn_idx, t,
               CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                    ORDER BY oy, ox) - 1 AS INT) AS det_id,
               angle, n_rows, n_cols
        FROM tpos
    )
    SELECT w.conv_id, w.turn_idx, d.det_id,
           CAST(CASE WHEN d.angle = 90 THEN d.n_cols - 1 - w.c
                     ELSE w.r END AS INT) AS row,
           CAST(CASE WHEN d.angle = 90 THEN w.r ELSE w.c END AS INT) AS col,
           string_agg(w.txt, ' ' ORDER BY w.px0, w.py0) AS text
    FROM twords w
    JOIN det d ON w.conv_id = d.conv_id AND w.turn_idx = d.turn_idx
              AND w.t = d.t
    GROUP BY w.conv_id, w.turn_idx, d.det_id,
             CASE WHEN d.angle = 90 THEN d.n_cols - 1 - w.c ELSE w.r END,
             CASE WHEN d.angle = 90 THEN w.r ELSE w.c END
    ORDER BY w.conv_id, w.turn_idx, det_id, row, col
"""


# ---------------------------------------------------------------------------
# Visual near-dup oracle (operators/render.dedup_pages_visual): the 64-bit
# ahash packs into two 32-bit halves from the same clamped word-area tile
# sums AHASH_SQL derives; candidate pairs come from the 8 one-byte bands
# (exact for hamming < 8 by pigeonhole) and confirm by bit_count(xor).
# ---------------------------------------------------------------------------

VISUAL_DEDUP_SQL = SCENE_CTES + _AHASH_CTES + """,
    tilebits AS (
        SELECT conv_id, turn_idx,
               block_y * 8 + block_x AS idx,
               CASE WHEN ink_px * 64 >
                         sum(ink_px) OVER (PARTITION BY conv_id, turn_idx)
                    THEN 1 ELSE 0 END AS bit
        FROM tileink
    ),
    sigs AS (
        SELECT conv_id, turn_idx,
               CAST(sum(CASE WHEN idx < 32
                             THEN bit * (1::BIGINT << idx) ELSE 0 END)
                    AS BIGINT) AS sig_lo,
               CAST(sum(CASE WHEN idx >= 32
                             THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END)
                    AS BIGINT) AS sig_hi
        FROM tilebits
        GROUP BY conv_id, turn_idx
    ),
    bands AS (
        SELECT s.conv_id, s.turn_idx, s.sig_lo, s.sig_hi, b.i AS band,
               CASE WHEN b.i < 4 THEN (s.sig_lo >> (8 * b.i)) & 255
                    ELSE (s.sig_hi >> (8 * (b.i - 4))) & 255 END AS val
        FROM sigs s, blocks b
    ),
    cand AS (
        SELECT DISTINCT
               a.conv_id AS conv_a, a.turn_idx AS turn_a,
               b.conv_id AS conv_b, b.turn_idx AS turn_b,
               CAST(bit_count(xor(a.sig_lo, b.sig_lo))
                    + bit_count(xor(a.sig_hi, b.sig_hi)) AS INT) AS hamming
        FROM bands a
        JOIN bands b
          ON a.band = b.band AND a.val = b.val
         AND (a.conv_id, a.turn_idx) < (b.conv_id, b.turn_idx)
    )
    SELECT conv_a, turn_a, conv_b, turn_b, hamming
    FROM cand WHERE hamming <= 2
    ORDER BY conv_a, turn_a, conv_b, turn_b
"""
