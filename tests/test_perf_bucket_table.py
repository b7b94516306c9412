"""Per-bucket roofline analyzer (`scripts/perf_bucket_table.py`): leaf
self-time accounting on nested traces, bucket classification, and the
padded-ideal flash arithmetic — on a synthetic xprof trace."""

import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from perf_bucket_table import _flash_ideal_ms, analyze_trace  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    meta = [{"ph": "M", "name": "process_name", "pid": 3,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "process_name", "pid": 9,
             "args": {"name": "/host:CPU"}}]
    # a dense host track the analyzer must NOT pick
    host = [{"ph": "X", "pid": 9, "tid": 1, "ts": 0, "dur": 10_000_000,
             "name": "python"}] * 3
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": meta + host + events}, f)
    return str(tmp_path)


def test_flash_ideal_padded_arithmetic():
    # B8 H8 L4096 D40: QK pads d 40->128, PVT PV side unpadded
    ideal = _flash_ideal_ms((8, 4096, 320), calls=1)
    qk = 2 * 4096**2 * 128 * 8 * 8
    pv = 2 * 4096**2 * 40 * 8 * 8
    assert ideal == pytest.approx((qk + pv) / 197e12 * 1e3, rel=1e-6)
    # D=160 pads to 256 lanes
    i2 = _flash_ideal_ms((16, 256, 1280), calls=1)
    qk2 = 2 * 256**2 * 256 * 8 * 16
    pv2 = 2 * 256**2 * 160 * 8 * 16
    assert i2 == pytest.approx((qk2 + pv2) / 197e12 * 1e3, rel=1e-6)


def test_analyze_trace_buckets_and_nesting(tmp_path):
    # durations in whole ms (the report rounds buckets to 0.1 ms)
    evs = [
        # parent fusion [0, 10ms] with a nested child [1, 4ms]:
        # parent self-time must be 7 ms, child 3 ms
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 10_000,
         "name": "fusion.1",
         "args": {"hlo_category": "convolution fusion",
                  "source": "flax/linen/linear.py:123",
                  "model_flops": str(int(162e12 * 7e-3))}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 1000, "dur": 3000,
         "name": "fusion.2",
         "args": {"hlo_category": "convolution fusion",
                  "source": "flax/linen/linear.py:99",
                  "model_flops": str(int(162e12 * 3e-3))}},
        # flash custom-call
        {"ph": "X", "pid": 3, "tid": 3, "ts": 20_000, "dur": 5000,
         "name": "attn1.7",
         "args": {"hlo_category": "custom-call",
                  "long_name": "%attn1.7 = bf16[8,4096,320]{...} "
                               "custom-call(bf16[8,4096,320]...)"}},
        # einsum cross-attn: conv fusion sourced to flash_attention.py
        {"ph": "X", "pid": 3, "tid": 3, "ts": 30_000, "dur": 2000,
         "name": "fusion.3",
         "args": {"hlo_category": "convolution fusion",
                  "source": "adaface_tpu/ops/flash_attention.py:50",
                  "bytes_accessed": str(int(819e9 * 2e-3))}},
        # data formatting
        {"ph": "X", "pid": 3, "tid": 3, "ts": 40_000, "dur": 1000,
         "name": "copy.9",
         "args": {"hlo_category": "data formatting",
                  "bytes_accessed": "1000"}},
        # other
        {"ph": "X", "pid": 3, "tid": 3, "ts": 50_000, "dur": 500,
         "name": "reduce.2", "args": {"hlo_category": "reduce"}},
    ]
    out = analyze_trace(_write_trace(tmp_path, evs))
    b = out["buckets"]
    assert b["conv_gemm"]["ms"] == pytest.approx(10.0)  # 7+3 self-times
    # flops were fabricated at exactly 162 TF/s -> 100% of ceiling
    assert b["conv_gemm"]["pct_of_measured_ceiling"] == pytest.approx(
        100.0, abs=0.5)
    assert b["flash_attn"]["ms"] == pytest.approx(5.0)
    assert "B8xL4096xHD320" in b["flash_attn"]["by_shape"]
    assert b["einsum_cross_attn_hbm"]["ms"] == pytest.approx(2.0)
    assert b["einsum_cross_attn_hbm"]["eff_gb_s"] == pytest.approx(819, abs=1)
    assert b["data_formatting"]["ms"] == pytest.approx(1.0)
    assert b["other"]["ms"] == pytest.approx(0.5)
    assert out["total_ms"] == pytest.approx(18.5)
    # roofline <= total, and conv at ceiling contributes its full time
    assert out["padded_roofline_ms"] <= out["total_ms"] + 1e-6
    assert 0 < out["pct_of_padded_roofline"] <= 100.0
