"""Driver bench-contract tripwires (VERDICT r5 "What's wrong" #1: the
stdout summary line once outgrew the driver's tail-capture window and
the round's artifact of record parsed as null).

These run against the committed capture artifacts, so any future change
that moves evidence arrays back into the summary line fails here before
the driver ever sees it.
"""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUMMARIES = sorted(glob.glob(os.path.join(REPO, "BENCH_local_r6*.json")))


@pytest.mark.parametrize("path", SUMMARIES,
                         ids=[os.path.basename(p) for p in SUMMARIES])
def test_summary_artifact_is_compact_and_complete(path):
    with open(path, encoding="utf-8") as f:
        raw = f.read().strip()
    assert "\n" not in raw, "summary must be ONE line"
    assert len(raw) < 4096, f"summary line {len(raw)}B — tail-capture risk"
    d = json.loads(raw)
    # the driver grades these fields; they must be present and flat
    assert d["metric"] and d["unit"] == "sec"
    assert d["queries"]["extract_pipeline"] > 0
    t = d["throughput"]
    assert "interleave_evidence" not in t, "evidence belongs in the sidecar"
    assert any(k.startswith("scaling_efficiency_") for k in t)
    assert any(k.startswith("spark_vs_hw_scaling_") for k in t)
    assert os.path.basename(d["evidence_file"]).startswith("BENCH_evidence")


def test_evidence_sidecars_carry_the_audit():
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_evidence_*.json"))):
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        ev = d["interleave_evidence"]
        assert ev["order"], path
        assert ev["box_state_gate"]["attempts"] is not None, path
        assert any(k.startswith("graded_n") for k in ev), path
