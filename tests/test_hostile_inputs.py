"""Hostile-input containment: crafted payloads that are structurally valid
but adversarial (range bombs, deflate bombs) must degrade bounded-and-fast,
never hang or OOM an executor task. These paths are unreachable by the
bit-flip fuzz tests (tiny.pdf has no embedded font), hence explicit cases."""

import struct
import time
import zlib

import pytest

from gmft_spark.kernel.page import _is_float
from gmft_spark.sources.pdfparse.fonts import _parse_tounicode
from gmft_spark.sources.pdfparse.objects import (
    _MAX_STREAM_BYTES,
    _flate_bounded,
)
from gmft_spark.sources.pdfparse.sfnt import TrueTypeFont


def _subtable(font_free_bytes: bytes) -> dict:
    tt = object.__new__(TrueTypeFont)
    return tt._parse_cmap_subtable(font_free_bytes, 0)


class TestCmapFormat12RangeBomb:
    def test_full_u32_range_terminates_bounded(self):
        # one group covering [0, 0xFFFFFFFF] — 4 billion iterations unclamped
        cm = struct.pack(">HHII", 12, 0, 0, 28 + 12) + struct.pack(">I", 1)
        cm += struct.pack(">III", 0, 0xFFFFFFFF, 1)
        t0 = time.monotonic()
        out = _subtable(cm)
        assert time.monotonic() - t0 < 30.0
        assert len(out) <= 0x120001
        # clamped range still maps the real Unicode plane correctly
        assert out[0x41] == 0x42

    def test_group_start_beyond_unicode_skipped(self):
        cm = struct.pack(">HHII", 12, 0, 0, 28 + 12) + struct.pack(">I", 1)
        cm += struct.pack(">III", 0x80000000, 0xFFFFFFFF, 1)
        assert _subtable(cm) == {}

    def test_many_groups_capped(self):
        # ngroups lies (claims 2^31) but data holds only one group: the
        # parser must stop at the data boundary, not trust the count
        cm = struct.pack(">HHII", 12, 0, 0, 28 + 12) + struct.pack(
            ">I", 0x80000000
        )
        cm += struct.pack(">III", 0x41, 0x5A, 1)
        out = _subtable(cm)
        assert out[0x41] == 1 and out[0x5A] == 0x1A

    def test_benign_format12_unchanged(self):
        cm = struct.pack(">HHII", 12, 0, 0, 28 + 24) + struct.pack(">I", 2)
        cm += struct.pack(">III", 0x20, 0x7E, 3)
        cm += struct.pack(">III", 0x2013, 0x2014, 200)
        out = _subtable(cm)
        assert out[0x20] == 3 and out[0x7E] == 3 + (0x7E - 0x20)
        assert out[0x2014] == 201


class TestBfrangeBomb:
    def test_huge_bfrange_clamped(self):
        cmap = (
            b"beginbfrange\n<00000000> <7FFFFFFF> <0041>\nendbfrange\n"
        )
        t0 = time.monotonic()
        out = _parse_tounicode(cmap)
        assert time.monotonic() - t0 < 30.0
        assert len(out) <= 0x10000
        assert out[0] == "A"

    def test_benign_bfrange_unchanged(self):
        cmap = b"beginbfrange\n<0041> <0043> <0061>\nendbfrange\n"
        out = _parse_tounicode(cmap)
        assert out == {0x41: "a", 0x42: "b", 0x43: "c"}


class TestFlateBomb:
    def test_bomb_raises_past_cap(self):
        bomb = zlib.compress(b"\x00" * (_MAX_STREAM_BYTES + (1 << 21)), 9)
        assert len(bomb) < 1 << 20  # it really is a bomb
        with pytest.raises(ValueError, match="cap"):
            _flate_bounded(bomb)

    def test_normal_roundtrip(self):
        payload = bytes(range(256)) * 1000
        assert _flate_bounded(zlib.compress(payload)) == payload

    def test_trailing_garbage_tolerated(self):
        payload = b"stream body"
        assert _flate_bounded(zlib.compress(payload) + b"garbage") == payload

    def test_corrupt_decodes_empty(self):
        assert _flate_bounded(b"\x00not deflate at all") == b""


class TestTabulateNumberRule:
    def test_inf_spellings(self):
        assert _is_float("inf") and _is_float("-inf") and _is_float("nan")
        assert _is_float("INF") and _is_float("NaN")  # tabulate lowercases
        assert not _is_float("Infinity")
        assert not _is_float("+INF")
        assert not _is_float("+inf")
        assert not _is_float("-Infinity")

    def test_plain_numbers_still_numeric(self):
        assert _is_float("3.14") and _is_float("-2") and _is_float("1e5")
        assert not _is_float("abc")


class TestEmptyCorpus:
    """Every gate query must survive a 0-row corpus (full schemas, no
    rows): at 10^12-turn scale a partition/source can legitimately come
    up empty, and ANSI mode turns an unguarded ratio into a job-killing
    DIVIDE_BY_ZERO (quality_score had exactly this bug). A full sweep of
    all 145 registered queries passed on 2026-08-18 (newest re-swept 08-19); this pins the
    queries with division / collect-scalar / iterative shapes — the
    classes that can break — as a fast tripwire."""

    REPRESENTATIVES = [
        "text_quality_score",  # per-doc ratios (the fixed bug class)
        "text_quality_filter_adaptive",  # percentile threshold over empty
        "ann_kmeans_train",  # iterative Lloyd over zero points
        "dedup_minhash_clusters",  # connected components, zero edges
        "mix_sources_weighted",  # per-source weights, zero sources
        "text_source_drift",  # ratio-of-totals drift
        "sketch_hll_distinct",  # register fold over nothing
        "curation_funnel",  # composed signals, all frames empty
        "conv_near_dup",  # shingle inverted index, no pairs
        "toolcall_retry_recovery",  # lead window over empty sequence
        "turn_grounding",  # ignorenulls window + in-row ratio
        "assistant_self_repetition",  # lag window + Jaccard ratio
        "conv_split_assignment",  # hash-fraction split over nothing
        "conv_render_spans",  # prefix-sum offsets over nothing
        "split_decontamination",  # membership-probe ratio, empty train set
        "conversation_funnel",  # composed conv signals, all frames empty
        "bpe_fertility_by_source",  # ratios over an empty trained vocab
        "curriculum_order",  # phased row_number windows over nothing
        "warc_ingest_pipeline",  # archive synthesis over zero groups
        "url_normalize_dedup",  # countDistinct agg over nothing
        "url_domain_census",  # suffix-rule census over nothing
        "url_robots_filter",  # broadcast robots join over nothing
        "warc_cdx_lookup",  # indexed-archive build over zero groups
        "archive_ingest_pipeline",  # tar/zip build over zero groups
    ]

    @pytest.fixture(scope="class")
    def empty_sf(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("empty_sf"))
        src = "/root/testdata/sf0.001"
        tables = [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
        for t in tables:
            spark.read.parquet(f"{src}/{t}.parquet").limit(0).coalesce(
                1
            ).write.parquet(f"{d}/{t}.parquet")
        return d

    def test_division_and_iteration_shapes_survive_empty(self, spark, empty_sf):
        import __spark_entry__ as e

        qs = e.queries()
        for name in self.REPRESENTATIVES:
            assert qs[name](spark, empty_sf).count() == 0, name


class TestNullTextOracleParity:
    """NULL and empty text documents must produce IDENTICAL output in
    both engines for the signal queries that tokenize/shingle text —
    split(NULL) vs string_agg-NULL-skip asymmetries are this repo's most
    recurrent cross-engine bug class (conv_near_dup shipped one)."""

    QUERIES = [
        "text_nb_lang_classifier",
        "text_char_entropy",
        "dsir_importance",
        "bpe_fertility_by_source",
        "split_decontamination",
        "conversation_funnel",
        "curriculum_order",
    ]

    def test_null_and_empty_text_agree_cross_engine(self, spark, tmp_path):
        import duckdb

        import __spark_entry__ as e
        from tests.oracle_check import TABLES, compare

        d = str(tmp_path)
        src = "/root/testdata/sf0.001"
        for t in TABLES:
            if t == "documents":
                continue
            spark.read.parquet(f"{src}/{t}.parquet").limit(0).coalesce(
                1
            ).write.parquet(f"{d}/{t}.parquet")
        rows = [
            (1, "x x y", "en", "s0", 5),
            (2, None, "de", "s0", 0),
            (3, "y z", "en", "s1", 3),
            (4, "", "fr", "s1", 0),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(f"{d}/documents.parquet")
        con = duckdb.connect()
        for t in TABLES:
            # spark writes parquet directories; duckdb needs the glob
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
            )
        qs, osql = e.queries(), e.oracle_sql()
        for name in self.QUERIES:
            ok, msg = compare(qs[name](spark, d), con, osql[name])
            assert ok, f"{name}: {msg}"


class TestHtmlSpanBomb:
    def test_span_product_bomb_bounded(self):
        """<1 KB of markup whose per-axis spans pass the clamp must not
        claim span-product slots: 50 cells of rowspan=1000 colspan=1000
        took 23 s before the _MAX_OCC budget; it must stay sub-second
        and emit a bounded grid."""
        import time

        from gmft_spark.kernel.html import extract_main_content

        html = (
            "<html><body><article><p>p p p</p><table><tr>"
            + '<td rowspan="1000" colspan="1000">x</td>' * 50
            + "</tr>"
            + "<tr><td>y</td></tr>" * 999
            + "</table></article></body></html>"
        )
        t0 = time.monotonic()
        c = extract_main_content(html)
        assert time.monotonic() - t0 < 10.0
        grid = c.tables[0]
        assert len(grid) == 1000
        assert max(len(r) for r in grid) == 50
