"""On-chip A/B: fused Pallas Winograd F(2x2,3x3) vs XLA direct 3x3 conv.

Shapes = the SD U-Net ResBlock convs at 64x64 latents, CFG batch 8
(bench.py operating point). Same chained-scan timing as perf_micro.py
(the axon tunnel has ~30-40 ms dispatch RTT; chain N calls in one jit).

Usage: python scripts/perf_winograd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from adaface_tpu.ops.winograd import direct_conv3x3, winograd_conv3x3

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
        print(f"# dispatch round-trip: {_RTT*1e3:.1f} ms", flush=True)
    return _RTT


def timeit_conv(fn, x, k, b, n=200, reps=3):
    @jax.jit
    def run(x, k, b):
        def body(h, _):
            y = fn(h, k, b)
            # keep shape/channels stable so the op chains
            return y.astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h.astype(jnp.float32).sum()

    float(run(x, k, b))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, k, b))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt(), 1e-9) / n


SHAPES = [
    # (B, H, W, C) -> C (square in/out so the scan chains)
    (8, 64, 64, 320),
    (8, 32, 32, 640),
    (8, 16, 16, 1280),
]


def main():
    dt = jnp.bfloat16
    print(f"# devices: {jax.devices()}")
    for (b, h, w, c) in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, c), dt)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), dt)
             * (0.1 / c ** 0.5))
        bias = jnp.zeros((c,), dt)
        td = timeit_conv(direct_conv3x3, x, k, bias)
        try:
            tw = timeit_conv(winograd_conv3x3, x, k, bias)
            msg = f"wino {tw*1e3:7.3f} ms  ({td/tw:4.2f}x)"
        except Exception as e:  # noqa: BLE001 — report compile failures inline
            msg = f"wino FAILED: {type(e).__name__}: {str(e)[:120]}"
        gmac = h * w * 9 * c * c * b / 1e9
        print(f"B{b} {h}x{w} C{c}: direct {td*1e3:7.3f} ms "
              f"({gmac/td/1e3:6.1f} TMAC/s)  {msg}", flush=True)


if __name__ == "__main__":
    main()
