"""End-to-end parity against the reference's own 30 committed CSV goldens.

For each golden: raw PDF bytes → our from-scratch parser's page words →
the kernel's deterministic extraction (raw TATR predictions from
``tatr_tables.json``) → CSV **byte-equality** against ``tatr_csvs.json``.
This is the strongest correctness evidence in the repo: the entire
word-extraction + structure-recognition path reproduces the reference
bit-for-bit with no pypdfium2/torch dependency.

All 30 tables are byte-equal; KNOWN_DIVERGENT is kept (empty) so any
future divergence is tracked explicitly.
"""

import json
import os

import numpy as np
import pytest

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.table import extract_table
from gmft_spark.sources.pdfparse import ParsedPDF

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present"
)

KNOWN_DIVERGENT: set = set()


@pytest.fixture(scope="module")
def goldens():
    with open(f"{REF}/test/references/tatr_tables.json") as f:
        tables = json.load(f)
    with open(f"{REF}/test/references/tatr_csvs.json") as f:
        csvs = json.load(f)
    return tables, csvs


@pytest.fixture(scope="module")
def docs():
    cache = {}

    def get(fn: str) -> ParsedPDF:
        if fn not in cache:
            with open(f"{REF}/pdfs/{fn}", "rb") as f:
                cache[fn] = ParsedPDF(f.read())
        return cache[fn]

    return get


def _run(tables, key, docs):
    e = tables[key]
    fn = e["filename"].split("/")[-1]
    doc = docs(fn)
    words = doc.page_words(e["page_no"])
    boxes = np.array([w[:4] for w in words], dtype=np.float64).reshape(-1, 4)
    texts = [w[4] for w in words]
    fr = e["fctn_results"]
    return extract_table(
        fr["scores"],
        fr["labels"],
        fr["boxes"],
        boxes,
        texts,
        e["bbox"],
        ExtractConfig(),
        angle=e.get("angle", 0) or 0,
    )


def _all_keys():
    with open(f"{REF}/test/references/tatr_csvs.json") as f:
        return sorted(json.load(f))


@pytest.mark.parametrize("key", _all_keys())
def test_golden_csv_byte_equality(key, goldens, docs):
    tables, csvs = goldens
    if key in KNOWN_DIVERGENT:
        pytest.xfail("known pdfium whitespace-heuristic divergence")
    res = _run(tables, key, docs)
    assert res.status == "ok"
    assert res.csv == csvs[key]


def test_known_divergent_is_current():
    """If a KNOWN_DIVERGENT table starts passing, tighten the list."""
    tables, csvs = (
        json.load(open(f"{REF}/test/references/tatr_tables.json")),
        json.load(open(f"{REF}/test/references/tatr_csvs.json")),
    )
    cache = {}

    def docs(fn):
        if fn not in cache:
            cache[fn] = ParsedPDF(open(f"{REF}/pdfs/{fn}", "rb").read())
        return cache[fn]

    newly_passing = []
    for key in sorted(KNOWN_DIVERGENT):
        try:
            if _run(tables, key, docs).csv == csvs[key]:
                newly_passing.append(key)
        except Exception:
            pass
    assert not newly_passing, (
        f"update KNOWN_DIVERGENT: now passing {newly_passing}"
    )
