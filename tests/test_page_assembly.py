"""Page-level rich-text assembly (P1-P3)."""

import numpy as np

from gmft_spark.kernel.page import embed_tables_into_page_text, grid_to_markdown
from gmft_spark.operators.extract import assemble_pages
from gmft_spark.sources.transcripts import synthesize_transcripts


def test_markdown_shape():
    md = grid_to_markdown(["a", "b"], [["1", "x"], ["2", "y"]])
    lines = md.split("\n")
    assert len(lines) == 4
    assert "a" in lines[0] and "b" in lines[0]
    assert set(lines[1]) <= {"|", ":", "-"}
    assert "x" in lines[2] and "y" in lines[3]


def test_embed_replaces_table_words_once():
    # paragraph, then a 2x1 table, then a trailing line
    words = [
        [0, 0, 20, 8],    # "Intro"
        [22, 0, 40, 8],   # "text"
        [0, 30, 20, 38],  # table word 1
        [0, 50, 20, 58],  # table word 2
        [0, 90, 30, 98],  # "After"
    ]
    texts = ["Intro", "text", "A", "B", "After"]
    md = "|MD|"
    out = embed_tables_into_page_text(
        np.array(words, dtype=float), texts, [(0.0, 25.0, 25.0, 60.0)], [md]
    )
    assert out == "Intro text\n|MD|\n\nAfter"


def test_embed_no_tables_is_text_with_breaks():
    words = np.array([[0, 0, 10, 8], [12, 0, 22, 8], [0, 20, 10, 28]], dtype=float)
    out = embed_tables_into_page_text(words, ["a", "b", "c"], [], [])
    assert out == "a b\nc"


def test_assemble_pages_spark(spark):
    t = synthesize_transcripts(spark, n_convs=4, turns_per_conv=3)
    rows = assemble_pages(t).collect()
    assert len(rows) == 12
    with_tables = [r for r in rows if r["n_tables"] >= 1]
    assert len(with_tables) >= 10  # ~2% of scenes are deliberately degenerate
    for r in with_tables:
        assert "|" in r["page_text"]  # markdown made it in
        assert r["page_text"].startswith("Table")  # caption paragraph first
