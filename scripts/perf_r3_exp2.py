"""A/B the PVT flash kernel's non-MXU arms on-chip.

Arms (see flash_attention.py:_flash_kernel_heads_pvt):
  - ADAFACE_FLASH_EXP_BF16: exp2 on bf16-quantized scores (the fp32 exp2
    pass is ~2.5 ms/step in the fused-program trace, outside any MXU
    roofline; p is consumed in bf16 by the PV dot either way).
  - ADAFACE_FLASH_MXU_SUM: softmax denominator as a ones-row in the PV
    dot ([d+1, lk] @ [lk, bq]) instead of a [lk, bq] VPU reduction.

Run on the real chip: python scripts/perf_r3_exp2.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

_RTT = None


def rtt():
    global _RTT
    if _RTT is None:
        x = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda x: x.sum())
        float(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def timeit_chained(fn, x, n=20, reps=3):
    @jax.jit
    def run(x):
        def body(h, _):
            return fn(h).astype(h.dtype).reshape(h.shape), None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h.astype(jnp.float32).sum()

    float(run(x))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt(), 1e-9) / n


ARMS = [
    {},
    {"ADAFACE_FLASH_MXU_SUM": "1"},
    {"ADAFACE_FLASH_EXP_BF16": "1"},
    {"ADAFACE_FLASH_MXU_SUM": "1", "ADAFACE_FLASH_EXP_BF16": "1"},
]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from adaface_tpu.ops import flash_attention as fa

    # SD self-attn shapes at the bench operating point (CFG batch 16).
    # L256 is excluded: lk <= 256 routes to _flash_kernel_heads_short,
    # which reads neither arm env knob — all arms would measure the same
    # program there (any delta is tunnel noise).
    for (b, l, heads, d) in [(16, 4096, 8, 40), (16, 1024, 8, 80)]:
        w = heads * d
        q = jax.random.normal(jax.random.PRNGKey(0), (b, l, w), jnp.bfloat16)

        def attn(h):
            return fa.flash_attention_blc(h, h, h, heads)

        base = None
        for env in ARMS:
            for kk, vv in env.items():
                os.environ[kk] = vv
            try:
                t = timeit_chained(attn, q)
                label = ",".join(sorted(env)) or "baseline"
                if base is None:
                    base = t
                print(f"B{b} L{l} H{heads} D{d}: {label:<55s} "
                      f"{t*1e3:8.3f} ms  ({base/t:5.2f}x)", flush=True)
            except Exception as e:
                print(f"B{b} L{l} H{heads} D{d}: {sorted(env)} FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            for kk in env:
                os.environ.pop(kk, None)


if __name__ == "__main__":
    main()
