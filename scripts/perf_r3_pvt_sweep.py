"""Sweep the transposed-PV packed flash kernel's q-block size on-chip.

The PVT kernel (flash_attention.py:_flash_kernel_heads_pvt) measured
2.18 ms at bq 512 (B8 H8 L4096 D40). Larger q blocks halve the program
count (less per-program K/V restripe amortization is needed — the
restripe runs once per batch row either way — and bigger GEMMs); the
[Lk, bq] fp32 score panel is the VMEM limit (4096 x 1024 fp32 = 16 MB).

Run on the real chip: python scripts/perf_r3_pvt_sweep.py
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


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from adaface_tpu.ops import flash_attention as fa

    for (b, l, heads, d) in [(16, 4096, 8, 40), (16, 1024, 8, 80),
                             (16, 256, 8, 160)]:
        w = heads * d
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, l, w), jnp.bfloat16)

        def attn(h):
            # q=k=v=h: timing-equivalent to distinct tensors, keeps the
            # scan carry a single array
            return fa.flash_attention_blc(h, h, h, heads)

        for bq in (256, 512, 1024, 2048):
            if bq > l:
                continue
            os.environ["ADAFACE_FLASH_PACKED_BQ"] = str(bq)
            try:
                t = timeit_chained(attn, q)
                print(f"B{b} L{l} H{heads} D{d}: pvt bq{bq:<5d} "
                      f"{t*1e3:8.3f} ms", flush=True)
            except Exception as e:
                print(f"B{b} L{l} H{heads} D{d}: pvt bq{bq:<5d} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        os.environ.pop("ADAFACE_FLASH_PACKED_BQ", None)
        # non-PVT max-free baseline at its best block for reference
        os.environ["ADAFACE_FLASH_PVT"] = "0"
        t = timeit_chained(attn, q)
        print(f"B{b} L{l} H{heads} D{d}: maxfree bq256  {t*1e3:8.3f} ms",
              flush=True)
        os.environ.pop("ADAFACE_FLASH_PVT", None)


if __name__ == "__main__":
    main()
