#!/usr/bin/env python
"""Prewarm the AOT executable cache at the standard serving points.

VERDICT r4 weak #3 / next #5: an empty `ADAFACE_AOT_CACHE` pays the full
remote-side compile (125-176 s cold, PERF.md round 4) once per
(shape, knob, jax-version, device-kind) key. This CLI compiles the
standard operating points into the cache up front (e.g. overnight, or
once per image/jax upgrade), so every later serving process starts at the
warm ~40 s path. The compiled programs take params as jit ARGUMENTS, so
prewarming with random weights produces executables that real-weight
serving reuses — the cache key is (program signature, arg shapes/dtypes,
device kind, jax version), never weight values.

The key DOES include the embedding-manager pytree structure: prewarm with
the same placeholder layout serving will use (`--num_vectors`, and
`--with_bg` when checkpoints carry a background token).

Usage:
    python scripts/aot_prewarm.py                     # 512x50 @ batch 8/4/1
    python scripts/aot_prewarm.py --points 512x50x8 768x30x4
    ADAFACE_AOT_CACHE=/path python scripts/aot_prewarm.py

Train-step programs are NOT prewarmed here: they are jitted per run (their
trainable/optimizer pytrees vary per config) and their compile is a one-off
cost of a 2000-step run, not a serving-latency term.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--points", nargs="*", default=["512x50x8", "512x50x4",
                                                   "512x50x1"],
                   help="SIZExSTEPSxBATCH operating points to compile")
    p.add_argument("--num_vectors", type=int, default=9,
                   help="subject placeholder vector count (must match the "
                        "embedding layout serving will load)")
    p.add_argument("--with_bg", action="store_true",
                   help="also register a 4-vector background token (match "
                        "checkpoints trained with --background_string)")
    p.add_argument("--samplers", nargs="*", default=["ddim"],
                   choices=("ddim", "plms"), help="samplers to compile")
    p.add_argument("--fp32", action="store_true",
                   help="compile the fp32 arm instead of bf16")
    p.add_argument("--cache_dir", default=None,
                   help="override ADAFACE_AOT_CACHE (default per-user dir)")
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from adaface_tpu.aot import default_cache_dir

    cache = opt.cache_dir or os.environ.get("ADAFACE_AOT_CACHE",
                                            default_cache_dir())
    os.environ["ADAFACE_AOT_CACHE"] = cache
    print(f"# prewarming AOT cache at {cache} "
          f"(device: {jax.devices()[0].device_kind})")

    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.pipeline import StableDiffusionPipeline

    tok = HashTokenizer()
    dtype = jnp.float32 if opt.fp32 else jnp.bfloat16
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, dtype=dtype, on_device=True)
    tid = tok.add_placeholder("z")
    pipe.embedding_manager.add_placeholder(
        "z", token_id=tid, num_vectors=opt.num_vectors,
        init_key=jax.random.PRNGKey(7))
    if opt.with_bg:
        pipe.embedding_manager.add_placeholder(
            "y", token_id=tok.add_placeholder("y"), num_vectors=4,
            is_background=True, init_key=jax.random.PRNGKey(8))

    pad = ", ".join([""] * opt.num_vectors)
    prompt = f"a photo of a z{pad} person"
    done = []
    for point in opt.points:
        size, steps, batch = (int(v) for v in point.split("x"))
        for sampler in opt.samplers:
            t0 = time.time()
            pipe.generate([prompt] * batch, num_steps=steps,
                          guidance_scale=(10.0, 4.0), height=size,
                          width=size, seed=0, sampler=sampler)
            dt = time.time() - t0
            done.append((point, sampler, dt))
            print(f"# {point} {sampler} {'fp32' if opt.fp32 else 'bf16'}: "
                  f"compiled+cached in {dt:.1f}s")
    if not opt.fp32:
        # dtype is part of the cache key: bf16 entries only serve bf16
        # processes (bench.py and the recommended serving arm are bf16;
        # `txt2img.py` needs `--bf16` to hit them — its bare default is
        # fp32, which needs a `--fp32` prewarm pass of its own)
        print("# NOTE: prewarmed the bf16 arm — serve with `txt2img.py "
              "--bf16` (or re-run with --fp32 for the fp32 arm)")
    n_files = len([f for f in os.listdir(cache) if f.endswith(".aot")]) \
        if os.path.isdir(cache) else 0
    total = sum(os.path.getsize(os.path.join(cache, f))
                for f in os.listdir(cache)) / 2**20 if n_files else 0
    print(f"# cache now holds {n_files} executables, {total:.0f} MiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
