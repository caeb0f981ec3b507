"""Golden fixture generation for the synthetic corpus.

The kernels are the byte-equality oracle (FIXTURES.md §3): fixture outputs
are the kernel pipeline's results on the deterministic corpus, committed to
``tests/fixtures/corpus_expected.json``. The Spark pipeline must reproduce
them byte-for-byte per turn; regenerate ONLY when a kernel behavior change
is intentional (``python -m pdf_inspector_spark.fixtures``).
"""

from __future__ import annotations

import json
import os

from .corpus import build_corpus
from .kernels.pipeline import process_pdf_mem


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_EXPECTED = os.path.join(REPO_ROOT, "tests", "fixtures", "corpus_expected.json")


def compute_expected() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for entry in build_corpus():
        r = process_pdf_mem(entry.pdf_bytes)
        out[entry.doc_id] = {
            "pdf_type": r["pdf_type"],
            "page_count": r["page_count"],
            "confidence": round(r["confidence"], 6),
            "ocr_recommended": r["ocr_recommended"],
            "title": r["title"],
            "text": r["text"],
            "spans": r["spans"],
            "markdown": r["markdown"],
            "error_kind": r["error_kind"],
        }
    return out


def write_fixtures(path: str = CORPUS_EXPECTED) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    expected = compute_expected()
    with open(path, "w", encoding="utf-8") as f:
        json.dump(expected, f, ensure_ascii=False, indent=1, sort_keys=True)
        f.write("\n")
    return path


def load_fixtures(path: str = CORPUS_EXPECTED) -> dict[str, dict]:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


if __name__ == "__main__":
    p = write_fixtures()
    print(f"wrote {p}")
