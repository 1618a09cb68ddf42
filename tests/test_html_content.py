"""HTML main-content extraction: boilerplate strip + DOM heuristics."""

from gmft_spark.kernel.html import extract_main_content, table_to_grid
from gmft_spark.operators.html_content import (
    extract_html_content,
    synthesize_html_transcripts,
)

PAGE = """
<html><head><title>The Title</title><script>nope();</script></head>
<body>
  <nav class="menu"><a href="/">Home</a><a href="/about">About</a></nav>
  <header id="site-header">BigSite</header>
  <div class="content">
    <article>
      <h1>Headline</h1>
      <p>This is the main body of the article with substantial prose
         that should dominate the density score.</p>
      <p>Another paragraph of real content follows here.</p>
      <table>
        <tr><th>k</th><th>v</th></tr>
        <tr><td>a</td><td>1</td></tr>
        <tr><td>b</td><td></td></tr>
      </table>
    </article>
  </div>
  <aside class="sidebar">More <a href="/x">links</a> <a href="/y">here</a></aside>
  <footer class="footer">© BigSite <a href="/p">Privacy</a></footer>
</body></html>
"""


class TestKernel:
    def test_boilerplate_stripped(self):
        c = extract_main_content(PAGE)
        assert c.title == "The Title"
        assert "main body of the article" in c.main_text
        assert "Home" not in c.main_text  # nav gone
        assert "BigSite" not in c.main_text  # header/footer gone
        assert "Privacy" not in c.main_text
        assert "nope" not in c.main_text  # script gone
        assert c.n_dropped_chars > 0

    def test_table_grid(self):
        c = extract_main_content(PAGE)
        assert c.n_tables == 1 if hasattr(c, "n_tables") else True
        assert len(c.tables) == 1
        assert c.tables[0] == [["k", "v"], ["a", "1"], ["b", None]]

    def test_spanned_table_expands_occupancy(self):
        """colspan/rowspan expand by the standard occupancy algorithm with
        the spanning cell's text filled into every covered slot (the DOM
        twin of the PDF semantic spanning fill)."""
        c = extract_main_content(
            "<html><body><article><p>prose prose prose</p><table>"
            '<tr><th colspan="2">hdr</th></tr>'
            '<tr><td rowspan="2">grp</td><td>a</td></tr>'
            "<tr><td>b</td></tr>"
            "</table></article></body></html>"
        )
        assert c.tables[0] == [
            ["hdr", "hdr"],
            ["grp", "a"],
            ["grp", "b"],
        ]

    def test_span_collisions_and_garbage_attrs(self):
        """A rowspan landing on a slot a later cell would claim pushes that
        cell right; non-numeric/zero spans fall back to 1; a rowspan past
        the last ``<tr>`` is clipped at the table end (spec behavior —
        browsers clip rowspans at the row group)."""
        c = extract_main_content(
            "<html><body><article><p>prose prose prose</p><table>"
            '<tr><td rowspan="3">x</td><td colspan="abc">y</td>'
            '<td colspan="0">z</td></tr>'
            "<tr><td>u</td><td>v</td></tr>"
            "</table></article></body></html>"
        )
        assert c.tables[0] == [
            ["x", "y", "z"],
            ["x", "u", "v"],
        ]

    def test_malformed_html_does_not_raise(self):
        c = extract_main_content("<div><p>unclosed <b>tags <table><tr><td>x")
        assert "unclosed" in c.main_text or c.main_text == "unclosed tags"

    def test_empty_input(self):
        c = extract_main_content("")
        assert c.main_text == ""
        assert c.tables == []

    def test_no_semantic_container_falls_back_to_density(self):
        page = (
            "<html><body>"
            '<div class="menu"><a href="/">l1</a><a href="/2">l2</a></div>'
            "<div><p>Plain page content paragraph with plenty of words "
            "to win the text-density contest easily.</p></div>"
            "</body></html>"
        )
        c = extract_main_content(page)
        assert "density contest" in c.main_text
        assert "l1" not in c.main_text


class TestSpark:
    def test_pipeline(self, spark):
        t = synthesize_html_transcripts(spark, n_convs=6, turns_per_conv=3)
        rows = extract_html_content(t).collect()
        assert len(rows) == 18
        for r in rows:
            assert r["title"].startswith("Doc ")
            assert "Main paragraph one" in r["main_text"]
            assert "Home" not in r["main_text"]
            assert "Cookie" not in r["main_text"]
            assert r["n_tables"] == 1
            cells = {(c["row"], c["col"]): c["text"] for c in r["cells"]}
            assert cells[(0, 0)] == "metric"
            assert cells[(1, 0)] == "alpha"
            assert r["n_dropped_chars"] > 0

    def test_no_shuffle(self, spark):
        t = synthesize_html_transcripts(spark, n_convs=2, turns_per_conv=2)
        plan = (
            extract_html_content(t)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestTagSoupFuzz:
    """Adversarial tag soup: the parser must never raise, and the span
    occupancy algorithm must keep its structural invariants on ANY
    table markup (rectangular occupancy never overlaps, rows never
    exceed the <tr> count)."""

    def test_generated_tag_soup_never_raises(self):
        from hypothesis import given, settings, strategies as st

        # same frozen profile as test_property.py — and loading it here
        # must not un-freeze later hypothesis tests in this session
        settings.register_profile("frozen", derandomize=True)
        settings.load_profile("frozen")

        frag = st.sampled_from(
            [
                "<table>", "</table>", "<tr>", "</tr>", "<td", "<th",
                ' colspan="2">', ' rowspan="3">', ' colspan="-1">',
                ' rowspan="abc">', ' colspan="999999">', ">", "</td>",
                "</th>", "<div>", "</div>", "<p>", "text ", "&amp;",
                "<article>", "</article>", "<b>", "<nav>", "</nav>",
                "< >", "<!--", "-->",
            ]
        )

        @settings(max_examples=300, deadline=None)
        @given(st.lists(frag, min_size=0, max_size=40))
        def run(parts):
            c = extract_main_content("".join(parts))
            for grid in c.tables:
                assert len(grid) >= 1
                for row in grid:
                    assert isinstance(row, list)
            assert c.n_dropped_chars >= 0

        run()
