"""Corpus determinism + golden-fixture byte-equality (FIXTURES.md §2-3)."""

import pytest

from pdf_inspector_spark.corpus import build_corpus
from pdf_inspector_spark.fixtures import compute_expected, load_fixtures
from pdf_inspector_spark.kernels.pipeline import process_pdf_mem

CORPUS = build_corpus()
EXPECTED = load_fixtures()


def test_corpus_is_deterministic():
    again = {e.doc_id: e.pdf_bytes for e in build_corpus()}
    for e in CORPUS:
        assert again[e.doc_id] == e.pdf_bytes, f"{e.doc_id} not byte-stable"


def test_corpus_covers_all_fixture_ids():
    assert {e.doc_id for e in CORPUS} == set(EXPECTED)


@pytest.mark.parametrize("entry", CORPUS, ids=lambda e: e.doc_id)
def test_classification_matches_expectation(entry):
    r = process_pdf_mem(entry.pdf_bytes)
    assert r["pdf_type"] == entry.expected_type


@pytest.mark.parametrize("entry", CORPUS, ids=lambda e: e.doc_id)
def test_kernel_output_matches_golden_fixture(entry):
    """Byte-for-byte equality of text/spans/markdown vs committed goldens."""
    r = process_pdf_mem(entry.pdf_bytes)
    exp = EXPECTED[entry.doc_id]
    assert r["pdf_type"] == exp["pdf_type"]
    assert r["page_count"] == exp["page_count"]
    assert round(r["confidence"], 6) == exp["confidence"]
    assert r["ocr_recommended"] == exp["ocr_recommended"]
    assert r["title"] == exp["title"]
    assert r["text"] == exp["text"], f"text drift for {entry.doc_id}"
    assert r["markdown"] == exp["markdown"], f"markdown drift for {entry.doc_id}"
    assert r["spans"] == exp["spans"]
    assert r["error_kind"] == exp["error_kind"]


def test_compute_expected_is_stable():
    """Running the oracle twice gives identical results (no hidden state)."""
    assert compute_expected() == compute_expected()


def test_error_channel_never_raises():
    r = process_pdf_mem(b"\x01\x02 not a pdf at all")
    assert r["error_kind"] is not None
    assert r["pdf_type"] is None


def test_specific_behaviors():
    by_id = {e.doc_id: e for e in CORPUS}
    results = {k: process_pdf_mem(v.pdf_bytes) for k, v in by_id.items()}

    # TJ kerning: -50/-80 joined, -300/-250 spaced (src/extractor.rs:1112-1148)
    assert results["tj_kerning"]["text"].split("\n")[0] == "Hello World"
    assert results["tj_kerning"]["text"].split("\n")[1] == "kerning test"

    # ligature expansion (src/extractor.rs:1961-1987)
    assert "ff" in results["ligatures"]["text"]
    assert "ﬁ" not in results["ligatures"]["text"]

    # CJK join without spaces (src/extractor.rs:795-800)
    assert results["cjk_text"]["text"].split("\n")[0] == "である履行義務"

    # Differences decode (src/extractor.rs:1911-1932)
    assert "café" in results["differences_enc"]["text"]
    assert "•" in results["differences_enc"]["text"]
    assert "–" in results["differences_enc"]["text"]

    # scanned: early exit, no text/markdown, ocr flagged (src/lib.rs:62-71)
    assert results["scanned_only"]["text"] is None
    assert results["scanned_only"]["markdown"] is None
    assert results["scanned_only"]["ocr_recommended"] is True
    assert results["scanned_only"]["confidence"] == pytest.approx(0.95)

    # template mixed (src/detector.rs:187-191)
    assert results["template_mixed"]["ocr_recommended"] is True

    # tables rendered as markdown pipes
    assert "| Subject" in results["table_small_font"]["markdown"]
    assert "| Widget" in results["table_body_font"]["markdown"]
    # paragraph NOT a table
    assert "|" not in results["para_not_table"]["markdown"]

    # heading from Tm scale (H1)
    assert results["tm_positioned"]["markdown"].startswith("# Scaled Heading")

    # page numbers removed
    assert "7" not in results["page_numbers"]["text"]

    # form xobject text present
    assert "Inside the form" in results["form_xobject"]["text"]

    # two-column reading order: all left lines before right lines
    t = results["two_column"]["text"].split("\n")
    left_idx = [i for i, l in enumerate(t) if l.startswith("left")]
    right_idx = [i for i, l in enumerate(t) if l.startswith("right")]
    assert left_idx and right_idx and max(left_idx) < min(right_idx)
    assert t[0].startswith("Full Width Title")

    # multipage: page breaks preserved in order
    mp = results["multipage_7"]["text"]
    for p in range(1, 8):
        assert f"Page {p} headline" in mp
    assert results["multipage_7"]["page_count"] == 7

    # rotated text extracted without numeric blowup
    assert "Rotated sideways text" in results["rotated_text"]["text"]

    # /Contents array: both streams interpreted, in order
    ca = results["contents_array"]["text"]
    assert ca.index("First stream") < ca.index("Second stream")

    # Type3 FontMatrix: items extracted with sane positions
    assert "Type three glyphs" in results["type3_font"]["text"]

    # one-level form nesting parity: inner form text must NOT appear
    nf = results["nested_form"]["text"]
    assert "Outer form text" in nf
    assert "INNER SHOULD NOT APPEAR" not in nf

    # TOC: no table detected, dot leaders collapsed in markdown
    assert "|" not in results["toc_page"]["markdown"]
    assert " ... " in results["toc_page"]["markdown"]

    # drop cap merged into the paragraph
    assert results["drop_cap"]["markdown"].startswith("Once upon a time")

    # hyphenation fixed, caption isolated, URL auto-linked
    hc = results["hyphen_caption"]["markdown"]
    assert "state-of-the" in hc
    assert "[https://example.org/bench](https://example.org/bench)" in hc
    assert "Figure 3: throughput by executor count\n\n" in hc
