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


def test_teacher_filter_per_block_thresholds():
    """`TeacherFilter.per_block`: teachability thresholds + per-block best
    candidate with the best-scoring fallback for unteachable blocks."""
    from adaface_tpu.training.teacher_filter import FilterVerdict, TeacherFilter

    tf = TeacherFilter.__new__(TeacherFilter)  # thresholds only, no models
    tf.clip_loss_thres = 0.28
    tf.cls_subj_clip_margin = 0.002

    # cand-major [n_cand=2, CB=2]: block 0 teachable via cand 1 (bigger
    # gap), block 1 unteachable (mix loss over threshold)
    l_mix = np.array([[0.20, 0.50],
                      [0.10, 0.60]])
    l_subj = np.array([[0.21, 0.58],
                       [0.15, 0.70]])
    v = FilterVerdict(False, 0, l_subj.reshape(-1), l_mix.reshape(-1),
                      images=None, x_recons=None)
    any_ok, best, block_ok = tf.per_block(v, n_cand=2, CB=2)
    assert any_ok
    assert list(block_ok) == [True, False]
    assert best[0] == 1  # gap 0.05 beats 0.01
    assert best[1] == 1  # fallback: best-scoring (gap 0.10 beats 0.08)

    # CB=1 summary reduces to the reference single-block behavior
    v1 = FilterVerdict(False, 0, l_subj[:, 0], l_mix[:, 0],
                       images=None, x_recons=None)
    any_ok1, best1, ok1 = tf.per_block(v1, n_cand=2, CB=1)
    assert any_ok1 and bool(ok1[0]) and best1[0] == 1
