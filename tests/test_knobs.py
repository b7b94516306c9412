"""Knob registry (`adaface_tpu/knobs.py`) — the single config layer for
ADAFACE_* trace-time toggles (VERDICT r3 weak #5)."""

import numpy as np

from adaface_tpu import knobs


def test_live_reads(monkeypatch):
    monkeypatch.delenv("ADAFACE_TESTKNOB", raising=False)
    assert knobs.get("ADAFACE_TESTKNOB") is None
    assert knobs.flag("ADAFACE_TESTKNOB", default=True) is True
    monkeypatch.setenv("ADAFACE_TESTKNOB", "0")
    assert knobs.get("ADAFACE_TESTKNOB") == "0"
    assert knobs.flag("ADAFACE_TESTKNOB", default=True) is False
    monkeypatch.setenv("ADAFACE_TESTKNOB", "7")
    assert knobs.intval("ADAFACE_TESTKNOB", 3) == 7


def test_fingerprint_tracks_trace_knobs(monkeypatch):
    monkeypatch.delenv("ADAFACE_TESTKNOB", raising=False)
    base = knobs.fingerprint()
    monkeypatch.setenv("ADAFACE_TESTKNOB", "1")
    assert knobs.fingerprint() != base  # trace-affecting knobs invalidate


def test_fingerprint_ignores_host_only(monkeypatch):
    """Host-only operational vars (cache paths, bench modes, trace dirs)
    must NOT change the fingerprint — flipping them would otherwise
    invalidate every on-disk AOT entry and re-pay the remote compile for
    byte-identical programs (round-4 review finding)."""
    base = knobs.fingerprint()
    for var in ("ADAFACE_AOT_CACHE", "ADAFACE_BENCH_LATENCY",
                "ADAFACE_TRACE_DIR", "ADAFACE_BENCH_PIPELINE_DEPTH"):
        monkeypatch.setenv(var, "/some/other/value")
    assert knobs.fingerprint() == base

