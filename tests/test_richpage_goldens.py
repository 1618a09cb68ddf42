"""Rich-page parity: full page text with embedded markdown tables.

The reference's strongest composition golden
(/root/reference/test/formatters/page/test_rich_page.py): for pdf7,
pages' complete text — inferred line breaks, paragraphs split around
tables, and each table's ``to_markdown()`` rendering inlined — must equal
literal page strings (data.py). We reproduce it end-to-end: raw PDF
bytes → our parser → kernel extraction → tabulate-parity markdown →
page embedding. Pages 2 and 3 (the ones with tables) match byte-for-byte,
including tabulate's numeric-column detection and decimal alignment,
reproduced from scratch (kernel/page.py:grid_to_markdown).

Page 0 (control, no tables) is byte-equal too, including the
letterspaced journal header's irregular pdfium splits
("R E S EARCH AR TIC L E").
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def refdata():
    spec = importlib.util.spec_from_file_location(
        "refdata", f"{REF}/test/formatters/page/data.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pdf7():
    import json

    from gmft_spark.sources.pdfparse import ParsedPDF

    with open(f"{REF}/data/test/references/tatr_tables.json") as f:
        tables = json.load(f)
    doc = ParsedPDF(open(f"{REF}/data/pdfs/7.pdf", "rb").read())
    return doc, tables


def _page_text(doc, tables, page_no, table_keys):
    from gmft_spark.config import ExtractConfig
    from gmft_spark.kernel.page import (
        embed_tables_into_page_text,
        grid_to_markdown,
    )
    from gmft_spark.kernel.table import extract_table

    words = doc.page_words(page_no)
    boxes = np.array([w[:4] for w in words], dtype=np.float64).reshape(-1, 4)
    texts = [w[4] for w in words]
    mds, bbs = [], []
    for key in table_keys:
        e = tables[key]
        fr = e["fctn_results"]
        res = extract_table(
            fr["scores"],
            fr["labels"],
            fr["boxes"],
            boxes,
            texts,
            e["bbox"],
            ExtractConfig(),
            angle=e.get("angle", 0) or 0,
        )
        mds.append(grid_to_markdown(res.columns, res.grid))
        bbs.append(e["bbox"])
    return embed_tables_into_page_text(boxes, texts, bbs, mds)


def test_rich_page_2_with_table(pdf7, refdata):
    doc, tables = pdf7
    assert _page_text(doc, tables, 2, ["pdf7_t0"]) == refdata._rich_page_2_text


def test_rich_page_3_with_two_tables(pdf7, refdata):
    doc, tables = pdf7
    assert (
        _page_text(doc, tables, 3, ["pdf7_t1", "pdf7_t2"])
        == refdata._rich_page_3_text
    )


def test_rich_page_0_control(pdf7, refdata):
    doc, tables = pdf7
    got = _page_text(doc, tables, 0, [])
    assert got == refdata._rich_page_0_text
