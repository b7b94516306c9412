"""On-chip A/B: group_norm probe-shifted one-pass moments vs the raw
one-pass arm (ADAFACE_GN_SHIFT=0), standalone AND fused behind the SD
ResBlock conv (GN's real position — the stats reduce usually fuses into
the producer conv's epilogue, so the shift's cost must be measured there).

Shapes = SD U-Net GN slabs at 64x64 latents, CFG batch 16 (bench.py
operating point). Chained-scan timing, RTT-subtracted (perf_winograd.py
pattern).

Usage: python scripts/perf_gn_shift.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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


def timeit_chain(make_body, x, n=200, reps=3):
    @jax.jit
    def run(x):
        h, _ = jax.lax.scan(make_body(), x, None, length=n)
        return h.astype(jnp.float32).sum()

    float(run(x))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt(), 1e-9) / n


SHAPES = [  # (B, H, W, C): SD GN slabs at the bench operating point
    (16, 64, 64, 320),
    (16, 32, 32, 640),
    (16, 16, 16, 1280),
]


def main():
    from adaface_tpu.ops.basic import group_norm

    dt = jnp.bfloat16
    print(f"# devices: {jax.devices()}")
    for (b, h, w, c) in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), dt)
        scale = jnp.ones((c,), dt)
        bias = jnp.zeros((c,), dt)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), dt)
             * (0.1 / c ** 0.5))

        def gn_body():
            def body(hh, _):
                return group_norm(hh, scale, bias, 32).astype(hh.dtype), None
            return body

        def conv_gn_body():
            def body(hh, _):
                y = jax.lax.conv_general_dilated(
                    hh, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return group_norm(y.astype(dt), scale, bias, 32
                                  ).astype(hh.dtype), None
            return body

        for label, maker in (("gn", gn_body), ("conv+gn", conv_gn_body)):
            times = {}
            for arm in ("shift", "raw"):
                # the unset default is the RAW one-pass (bdc637d); the
                # accurate arm must opt in explicitly
                os.environ["ADAFACE_GN_SHIFT"] = "1" if arm == "shift" else "0"
                times[arm] = timeit_chain(maker, x)
            os.environ.pop("ADAFACE_GN_SHIFT", None)
            s, r = times["shift"] * 1e3, times["raw"] * 1e3
            print(f"B{b} {h}x{w} C{c} {label:8s}: shift {s:7.4f} ms  "
                  f"raw {r:7.4f} ms  ({r/s:5.3f}x)", flush=True)


if __name__ == "__main__":
    main()
