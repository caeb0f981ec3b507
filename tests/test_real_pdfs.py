"""Real-world PDF regression: system documentation PDFs (xref streams +
object streams, DocBook/LaTeX toolchains — none of our synthetic corpus's
construction). Guarded on file presence; skipped where absent."""

import os

import pytest

from pdf_inspector_spark.kernels.pipeline import process_pdf_mem

REAL_PDFS = [
    ("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf", 17),
    ("/usr/share/doc/libtasn1-doc/libtasn1.pdf", 36),
]


@pytest.mark.parametrize("path,n_pages", REAL_PDFS,
                         ids=[os.path.basename(p) for p, _ in REAL_PDFS])
def test_real_pdf_extracts(path, n_pages):
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    with open(path, "rb") as f:
        buf = f.read()
    r = process_pdf_mem(buf)
    assert r["error_kind"] is None
    assert r["pdf_type"] == "text_based"
    assert r["page_count"] == n_pages
    assert len(r["text"]) > 10_000
    assert len(r["markdown"]) > 10_000
    assert r["spans"], "span offsets expected"
    # markdown found structural headings
    assert r["markdown"].lstrip().startswith("#")


def test_real_pdf_deterministic():
    path = REAL_PDFS[0][0]
    if not os.path.exists(path):
        pytest.skip("not present")
    with open(path, "rb") as f:
        buf = f.read()
    a = process_pdf_mem(buf)
    b = process_pdf_mem(buf)
    assert a["text"] == b["text"] and a["markdown"] == b["markdown"]
