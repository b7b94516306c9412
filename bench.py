"""Headline benchmark: images/sec/chip, 512x512, DDIM-50, CFG, bf16.

Mirrors BASELINE config 2 (single-subject 512², DDIM-50, annealed CFG
(10→4), subject embedding spliced) with random weights — throughput is
weight-independent. The reference publishes no numbers (BASELINE.md);
`vs_baseline` is computed against the commonly-reported PyTorch SD-v1.5
fp16 xformers figure of ~2.0 images/sec at 512px/DDIM-50 on an A100 —
the closest thing to a reference operating point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# operating point: batch 8 beats batch 4 since the round-3 GN/no-pad
# fixes removed the superlinear pad+copy terms (1.268 vs 1.214 img/s)
N_SAMPLES = int(os.environ.get("ADAFACE_BENCH_BATCH", "8"))
STEPS = 50
SIZE = 512
TORCH_A100_BASELINE_IMG_S = 2.0


def main():
    import time as _t

    t_start = _t.time()
    print("# bench: importing jax / claiming device (the axon pool is "
          "shared — a blocked claim means another tenant holds the chip)",
          file=sys.stderr, flush=True)
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: a degraded tunnel once pushed
    # compile+first to 699 s (BENCH_r02). NOTE (r3 seventh pass): under
    # the axon tunnel compilation happens on the REMOTE side, so this
    # local cache does not eliminate the ~370 s compile+first — it is
    # kept for CPU/TPU-local runs where it does
    cache_dir = os.environ.get("ADAFACE_COMPILE_CACHE",
                               "/tmp/adaface_jax_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        except Exception as e:  # cache is best-effort
            print(f"# bench: compile cache unavailable: {e}", file=sys.stderr)
    # AOT executable cache (pipeline._aot_wrap): unlike the compilation
    # cache above, this DOES remove the remote-side compile+first (~370-640s
    # through the tunnel) once a prior run has populated it — serialized
    # PJRT executables reload in ~0.2s (scripts/perf_aot_cold.py).
    # Per-user dir: cache hits unpickle, so the path must be trusted.
    from adaface_tpu.aot import default_cache_dir

    os.environ.setdefault("ADAFACE_AOT_CACHE", default_cache_dir())

    jnp.zeros(()).block_until_ready()
    print(f"# bench: device claimed in {_t.time() - t_start:.1f}s; "
          f"building pipeline", file=sys.stderr, flush=True)

    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.pipeline import StableDiffusionPipeline
    from adaface_tpu.personalization.static_embedding import init_static_embedder

    tok = HashTokenizer()
    kw = {}
    if os.environ.get("ADAFACE_FUSE_QKV") == "1":
        # A/B arm: fused-QKV ON (default is off — the on-chip A/B measured
        # the kernel concat losing ~0.7%, `UNetConfig.fuse_qkv`)
        from adaface_tpu.models.unet import UNetConfig

        kw["unet_cfg"] = UNetConfig.sd_v1(fuse_qkv=True)
    # on_device: all params initialize in one jitted (AOT-cached) program
    # on the chip, already bf16 — skips the ~1 GB host->device upload that
    # dominates cold start once compilation is AOT-cached (bf16 weights
    # halve the weight-side HBM traffic of every matmul/conv)
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, dtype=jnp.bfloat16, on_device=True, **kw)
    tid = tok.add_placeholder("z")
    pipe.embedding_manager.add_placeholder("z", token_id=tid, num_vectors=9,
                                           init_key=jax.random.PRNGKey(7))

    prompts = ["a photo of a z , , , , , , , , person"] * N_SAMPLES

    def run(seed):
        return pipe.generate(prompts, num_steps=STEPS, guidance_scale=(10.0, 4.0),
                             height=SIZE, width=SIZE, seed=seed)

    t0 = time.time()
    run(0)  # compile + first run
    compile_s = time.time() - t0

    # optional xprof trace (the aux tracing/profiling subsystem; the
    # reference only logs epoch wall time + peak memory, `main.py:702-722`)
    trace_dir = os.environ.get("ADAFACE_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            run(99)
        print(f"# xprof trace written to {trace_dir}", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    best = min(times)
    latency_img_s = N_SAMPLES / best
    # p50 per-image latency (the BASELINE.json north-star's second metric):
    # median synchronous batch latency divided by the batch size.
    p50_batch_s = sorted(times)[len(times) // 2]

    # ---- pipelined throughput (the headline): dispatch R batches
    # back-to-back without synchronizing, convert results as they land.
    # This is how a serving deployment runs — the ~35 ms dispatch RTT and
    # the ~6 MB uint8 readback of batch i overlap batch i+1's device
    # compute instead of serializing with it (xprof: the sequential-latency
    # loop leaves ~0.3 s/batch of host+tunnel gaps on the table).
    import numpy as _np

    # R=16: at R=4 the un-overlapped ramp/drain edges (~0.3 s: first
    # dispatch + final readback) amortize to ~75 ms/batch on top of the
    # ~4.5 s device program; each doubling halves the edge share (R8
    # 1.7685 -> R16 1.7818 img/s same-day). This is the steady-state
    # serving number the headline claims to be.
    R = int(os.environ.get("ADAFACE_BENCH_PIPELINE_DEPTH", "16"))
    t0 = time.time()
    outs = [pipe.generate(prompts, num_steps=STEPS,
                          guidance_scale=(10.0, 4.0), height=SIZE, width=SIZE,
                          seed=10 + i, block=False) for i in range(R)]
    for o in outs:
        _np.asarray(o)
    pipelined = time.time() - t0
    img_s = N_SAMPLES * R / pipelined

    # ---- per-stage attribution (text encode / DDIM scan / VAE decode).
    # Text encode and VAE decode are timed directly (the decode jit is a
    # small extra compile); the scan time is the remainder — no second
    # compile of the big sampling program.
    stages = {}
    try:
        from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL

        prompts_l = list(prompts)

        def time_op(f, reps=3):
            f()  # warm
            ts = []
            for _ in range(reps):
                t0 = time.time()
                f()
                ts.append(time.time() - t0)
            return min(ts)

        neg = "ugly"
        t_text = time_op(lambda: (
            jax.block_until_ready(pipe.encode_prompts(prompts_l)),
            jax.block_until_ready(pipe.encode_negative(neg, N_SAMPLES))))
        f = 2 ** (len(pipe.vae.cfg.ch_mult) - 1)
        z = jnp.zeros((N_SAMPLES, SIZE // f, SIZE // f, 4), jnp.float32)
        dec = jax.jit(lambda p, z: pipe.vae.apply(
            {"params": p}, z / SD_VAE_SCALE_FACTOR,
            method=AutoencoderKL.decode))
        t_vae = time_op(
            lambda: jax.block_until_ready(dec(pipe.vae_params, z)))
        # Synchronous-latency-derived numbers (ddim_scan_s/unet_ms_per_call)
        # include per-dispatch host+tunnel RTT (~0.3-0.7 s/batch, varies
        # with tunnel load) — the r04 "4% scan regression" was exactly this
        # noise: pipelined device time was flat 4.49-4.51 s/batch across
        # r03/r04/r05 while sync latency swung 4.83-5.22 s. The *_device
        # fields divide the pipelined wall (pure back-to-back device
        # programs) instead and are the numbers to trend. Caveat: the
        # scan/unet split still subtracts the SYNC-measured t_text/t_vae
        # (~0.1-0.2 s of their own dispatch RTT), a small constant
        # UNDERestimate of scan — `device_batch_s` is fully RTT-free, and
        # the `roofline` trace table below is the precise attribution.
        dev_batch = pipelined / R
        dev_scan = max(dev_batch - t_text - t_vae, 0.0)
        stages = {
            "text_encode_s": round(t_text, 4),
            "vae_decode_s": round(t_vae, 4),
            "ddim_scan_s": round(max(best - t_text - t_vae, 0.0), 4),
            "unet_ms_per_call": round(
                max(best - t_text - t_vae, 0.0) / STEPS * 1e3, 2),
            "device_batch_s": round(dev_batch, 4),
            "ddim_scan_s_device": round(dev_scan, 4),
            "unet_ms_per_call_device": round(dev_scan / STEPS * 1e3, 2),
        }
    except Exception as e:
        print(f"# stage breakdown failed: {e}", file=sys.stderr)

    # ---- single-request latency operating point (VERDICT r3 #6): what a
    # batch-1 user waits, vs the batch-8 throughput point above. Costs an
    # extra fused-program compile (~minutes through the tunnel), so it is
    # opt-in and the measured numbers live in PERF.md's operating-point
    # table rather than every driver run.
    lat_point = {}
    if os.environ.get("ADAFACE_BENCH_LATENCY") == "1":
        try:
            p1 = [prompts[0]]
            pipe.generate(p1, num_steps=STEPS, guidance_scale=(10.0, 4.0),
                          height=SIZE, width=SIZE, seed=0)  # compile
            b1 = []
            for i in range(3):
                t0 = time.time()
                pipe.generate(p1, num_steps=STEPS,
                              guidance_scale=(10.0, 4.0),
                              height=SIZE, width=SIZE, seed=i + 1)
                b1.append(time.time() - t0)
            lat_point = {"latency_b1_s": round(min(b1), 4),
                         "p50_latency_b1_s": round(sorted(b1)[1], 4)}
        except Exception as e:
            print(f"# batch-1 latency point failed: {e}", file=sys.stderr)

    # ---- per-bucket roofline table (VERDICT r4 #1: the bench artifact
    # carries the proof that every bucket runs at its measured ceiling).
    # One extra traced run + parse (~20 s); ADAFACE_BENCH_BUCKETS=0 skips.
    buckets = {}
    if os.environ.get("ADAFACE_BENCH_BUCKETS", "1") == "1":
        try:
            import sys as _sys
            import tempfile

            _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from scripts.perf_bucket_table import analyze_trace

            td = trace_dir or tempfile.mkdtemp(prefix="adaface_bench_trace_")
            if not trace_dir:  # don't re-trace if ADAFACE_TRACE_DIR ran one
                with jax.profiler.trace(td):
                    run(98)
            buckets = {"roofline": analyze_trace(td)}
        except Exception as e:
            print(f"# bucket table failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "images/sec/chip @512px DDIM-50 CFG bf16",
        "value": round(img_s, 4),
        "unit": "images/sec",
        "vs_baseline": round(img_s / TORCH_A100_BASELINE_IMG_S, 4),
        "latency_batch_s": round(best, 4),
        "latency_img_s": round(latency_img_s, 4),
        "p50_latency_batch_s": round(p50_batch_s, 4),
        "p50_s_per_image": round(p50_batch_s / N_SAMPLES, 4),
        **stages, **lat_point, **buckets,
    }))
    print(f"# compile+first: {compile_s:.1f}s; runs: {[round(t,2) for t in times]}; "
          f"pipelined {R} batches: {pipelined:.2f}s; "
          f"n_samples={N_SAMPLES} steps={STEPS}", file=sys.stderr)


if __name__ == "__main__":
    main()
