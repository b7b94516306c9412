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

N_SAMPLES = int(os.environ.get("ADAFACE_BENCH_BATCH", "4"))
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

    jnp.zeros(()).block_until_ready()
    print(f"# bench: device claimed in {_t.time() - t_start:.1f}s; "
          f"building pipeline", file=sys.stderr, flush=True)

    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.pipeline import StableDiffusionPipeline
    from adaface_tpu.personalization.static_embedding import init_static_embedder

    tok = HashTokenizer()
    kw = {}
    if os.environ.get("ADAFACE_FUSE_QKV") == "0":  # A/B knob
        from adaface_tpu.models.unet import UNetConfig

        kw["unet_cfg"] = UNetConfig.sd_v1(fuse_qkv=False)
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, dtype=jnp.bfloat16, **kw)
    # bf16 weights: halves the weight-side HBM traffic of every matmul/conv
    pipe.cast_params(jnp.bfloat16)
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
    img_s = N_SAMPLES / best
    print(json.dumps({
        "metric": "images/sec/chip @512px DDIM-50 CFG bf16",
        "value": round(img_s, 4),
        "unit": "images/sec",
        "vs_baseline": round(img_s / TORCH_A100_BASELINE_IMG_S, 4),
    }))
    print(f"# compile+first: {compile_s:.1f}s; runs: {[round(t,2) for t in times]}; "
          f"n_samples={N_SAMPLES} steps={STEPS}", file=sys.stderr)


if __name__ == "__main__":
    main()
