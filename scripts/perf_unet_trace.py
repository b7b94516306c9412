"""Capture an xprof trace of N chained UNet forwards and print per-op totals.

Usage: python scripts/perf_unet_trace.py [batch] [outdir]

Parses the trace.json.gz event stream (TensorCore op track) and aggregates
device time by fusion/op name so the UNet budget can be attributed without
the xprof UI.
"""

import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from scripts.perf_micro import _zeros_params  # noqa: E402


def run(batch=8, outdir="/tmp/unet_trace", n=10, dedup=False):
    from adaface_tpu.models.unet import NUM_CA_LAYERS, UNetConfig, UNetModel

    cfg = UNetConfig.sd_v1(use_flash_attention=True)
    model = UNetModel(cfg, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((batch,), 500, jnp.int32)
    cb = 2 * batch if dedup else batch  # dedup: ctx carries the CFG pair
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (NUM_CA_LAYERS, cb, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t, ctx,
                                               cfg_dedup=dedup))
    params = _zeros_params(shapes, jnp.bfloat16)["params"]

    @jax.jit
    def chained(x, params, t, ctx):
        def body(h, _):
            out = model.apply({"params": params}, h, t, ctx, cfg_dedup=dedup)
            if dedup:  # fold the 2B eps back to B like the CFG combine
                e_c, e_u = jnp.split(out, 2, axis=0)
                out = e_u + 5.0 * (e_c - e_u)
            return out.astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h.astype(jnp.float32).sum()

    float(chained(x, params, t, ctx))  # compile
    t0 = time.perf_counter()
    float(chained(x, params, t, ctx))
    print(f"# steady: {(time.perf_counter()-t0)/n*1e3:.1f} ms/call (incl RTT/n)",
          flush=True)
    with jax.profiler.trace(outdir):
        float(chained(x, params, t, ctx))
    print(f"# trace in {outdir}", flush=True)
    analyze(outdir, n)


def analyze(outdir, n):
    files = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace.json.gz found", flush=True)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find the TensorCore ops track: pick the pid/tid combo with the largest
    # total duration of 'X' events whose names look like XLA ops
    by_track = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        by_track.setdefault(key, []).append(e)
    # choose densest track
    names = {p.get("pid"): p.get("args", {}).get("name", "")
             for p in events if p.get("ph") == "M" and p.get("name") == "process_name"}
    best, best_dur = None, 0
    for key, evs in by_track.items():
        label = names.get(key[0], "")
        if "TPU" not in label and "Tensor" not in label:
            continue  # host/python tracks are denser but not what we want
        d = sum(e.get("dur", 0) for e in evs)
        if d > best_dur:
            best, best_dur = key, d
    if best is None:  # fall back to densest track
        for key, evs in by_track.items():
            d = sum(e.get("dur", 0) for e in evs)
            if d > best_dur:
                best, best_dur = key, d
    evs = by_track[best]
    print(f"# track pid={best[0]} ({names.get(best[0],'?')}) total "
          f"{best_dur/1e3/n:.2f} ms/call over {len(evs)} events", flush=True)
    agg = {}
    for e in evs:
        name = e["name"]
        # strip trailing .N indices for aggregation
        base = name.rstrip("0123456789.")
        a = agg.setdefault(base, [0.0, 0])
        a[0] += e.get("dur", 0)
        a[1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/call':>9} {'count':>6}  op")
    for name, (dur, cnt) in rows[:40]:
        print(f"{dur/n:9.0f} {cnt:6d}  {name[:110]}", flush=True)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--dedup"]
    dedup = "--dedup" in sys.argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else 8
    outdir = argv[1] if len(argv) > 1 else "/tmp/unet_trace"
    print(f"devices: {jax.devices()}", flush=True)
    run(batch, outdir, dedup=dedup)
