"""Real-weights parity runbook (`scripts/parity_check.py`): mock-mode CI
run + expectations-diff logic (VERDICT r4 #2)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from parity_check import diff_expectations  # noqa: E402


def test_diff_expectations_logic():
    exp = {"real": {
        "config2": {"clip_i": 0.80, "clip_t": 0.30, "dino": 0.60,
                    "face_sim": 0.55},
        "config5": {"clip_i": 0.78, "dino": None},
    }}
    ok = {"config2": {"clip_i": 0.805, "clip_t": 0.295, "dino": 0.591,
                      "face_sim": 0.565},
          "config5": {"clip_i": 0.772}}
    assert diff_expectations(ok, exp, "real") == []
    # outside tolerance
    bad = {"config2": {"clip_i": 0.78, "clip_t": 0.30, "dino": 0.60,
                       "face_sim": 0.55},
           "config5": {"clip_i": 0.78}}
    fails = diff_expectations(bad, exp, "real")
    assert len(fails) == 1 and "config2.clip_i" in fails[0]
    # skipped config with recorded expectations = failure
    skipped = {"config2": "missing assets: --sd_ckpt",
               "config5": {"clip_i": 0.78}}
    fails2 = diff_expectations(skipped, exp, "real")
    assert any("config2" in f for f in fails2)
    # metric missing from measured scores = failure
    fails3 = diff_expectations(
        {"config2": {"clip_t": 0.30, "dino": 0.60, "face_sim": 0.55},
         "config5": {"clip_i": 0.78}}, exp, "real")
    assert any("config2.clip_i" in f for f in fails3)
    # null expectations (not yet recorded) never fail
    assert diff_expectations({"config5": {"clip_i": 0.9}},
                             {"real": {"config5": {"clip_i": None}}},
                             "real") == []


def test_real_section_graceful_skip(tmp_path):
    """Without assets, the real-mode command runs, reports skips, and
    fails ONLY where expectations were recorded."""
    from parity_check import main

    exp = tmp_path / "exp.json"
    exp.write_text(json.dumps({"real": {}}))
    rc = main(["--configs", "1", "--outdir", str(tmp_path / "o"),
               "--expectations", str(exp)])
    assert rc == 0  # nothing recorded -> skips are not failures
    rep = json.loads((tmp_path / "o" / "parity_report.json").read_text())
    assert "missing assets" in rep["results"]["config1"]


@pytest.mark.slow
def test_parity_mock_end_to_end(tmp_path):
    """--mock exercises generation, per-dir scoring, CSV aggregation and
    the expectations diff on tiny random models (the CI certificate that
    the one-command runbook works before real assets exist)."""
    from parity_check import main

    exp = tmp_path / "exp.json"
    out = tmp_path / "out"
    # record, then re-run and diff against the recording: must pass
    rc = main(["--mock", "--configs", "1,5", "--outdir", str(out),
               "--expectations", str(exp), "--update_expectations"])
    assert rc == 0
    data = json.loads(exp.read_text())
    assert "config1" in data["mock"] and "config5" in data["mock"]
    assert data["mock"]["config1"]["clip_i"] is not None

    rc2 = main(["--mock", "--configs", "1,5", "--outdir", str(out),
                "--expectations", str(exp)])
    assert rc2 == 0
    rep = json.loads((out / "parity_report.json").read_text())
    assert rep["failures"] == []
    # poison an expectation -> the diff must catch it
    data["mock"]["config1"]["clip_i"] += 0.5
    exp.write_text(json.dumps(data))
    rc3 = main(["--mock", "--configs", "1,5", "--outdir", str(out),
                "--expectations", str(exp)])
    assert rc3 == 1
