"""Round-3 FF experiment: chunked-pipelined GEGLU feed-forward kernel.

xprof (post-PVT, CFG batch 16): the transformer FF chain is the biggest
remaining non-conv cost per UNet call — in-proj GEMMs 9.7 ms (~70% of
ideal), GEGLU gate + out-proj + residual `add_add_fusion` 6.4 ms (~50%),
LN stats passes 4.0 ms. XLA materializes the [16, 4096, 2560] GEGLU
intermediate in HBM (~672 MB round trip per 64x64 layer) and the out GEMM
is bandwidth-bound on it.

The round-3 serial fused kernel (ops/fused_ff.py) lost (+0.9 ms/fwd):
its in-GEMM -> gate -> out-GEMM chain serializes MXU and VPU per program.
This experiment splits the hidden dim F into chunks: iteration i's
in-GEMMs are independent of iteration i-1's VPU gate, so the scheduler
can overlap them, and the intermediate never exceeds [bq, fc] in VMEM.

Run on the real chip: python scripts/perf_r3_ff.py

NEGATIVE RESULT (2026-08-17, v5e): xla-chain 1.244 ms vs serial-fused
1.440 ms vs chunked fc256 1.594 ms at B16 L4096 C320. Splitting F into
chunks makes the GEMMs too small to hide their overheads (the K=320->384
pad is paid either way), and the isolated XLA chain is already at ~79% of
its padded MXU ideal (0.98 ms) — the [B, L, 2F] HBM intermediate is
cheaper than it looks because XLA fuses the gate+out-GEMM+residual into
one pass over it. FF fusion is not a lever on this chip; kept for the
record.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from adaface_tpu.ops.fused_ff import _ff_core, _reference_ln_geglu_ff  # noqa: E402

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


def timeit_chained(fn, x, extra, n=20, reps=3):
    @jax.jit
    def run(x, extra):
        def body(h, _):
            return fn(h, *extra).astype(h.dtype).reshape(h.shape), None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h.astype(jnp.float32).sum()

    float(run(x, extra))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, extra))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt(), 1e-9) / n


# ------------------------------------------------- chunked-pipelined kernel
def _ff_kernel_chunked(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       o_ref, *, eps: float, fc: int):
    x = x_ref[0]                                     # [bq, C]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0].astype(jnp.float32)
         + be_ref[0].astype(jnp.float32)).astype(x.dtype)
    f = w2_ref.shape[0]
    bq, c = x.shape
    acc = jnp.zeros((bq, c), jnp.float32)
    for c0 in range(0, f, fc):
        ua = jax.lax.dot_general(y, w1_ref[:, c0:c0 + fc],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ug = jax.lax.dot_general(y, w1_ref[:, f + c0:f + c0 + fc],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        a = ua.astype(x.dtype) + b1_ref[0, c0:c0 + fc]
        g = ug.astype(x.dtype) + b1_ref[0, f + c0:f + c0 + fc]
        h = (a * jax.nn.gelu(g)).astype(x.dtype)
        acc = acc + jax.lax.dot_general(h, w2_ref[c0:c0 + fc, :],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    o_ref[0] = x + (acc.astype(x.dtype) + b2_ref[0])


def chunked_ff(x, ln_g, ln_b, w1, b1, w2, b2, eps=1e-5, block_q=256, fc=256):
    b, l, c = x.shape
    bq = min(block_q, l)
    while l % bq:
        bq //= 2
    f2 = w1.shape[1]
    fh = w2.shape[0]
    row = lambda t: t.reshape(1, -1)
    par = pltpu.GridDimensionSemantics.PARALLEL
    return pl.pallas_call(
        functools.partial(_ff_kernel_chunked, eps=eps, fc=fc),
        interpret=jax.devices()[0].platform != "tpu",
        grid=(b, l // bq),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(par, par),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fh, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
    )(x, row(ln_g), row(ln_b), w1, row(b1), w2, row(b2))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for (b, l, c) in [(16, 4096, 320), (16, 1024, 640)]:
        f = c * 4
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (b, l, c), jnp.bfloat16)
        ln_g = jnp.ones((c,), jnp.bfloat16)
        ln_b = jnp.zeros((c,), jnp.bfloat16)
        w1 = (jax.random.normal(ks[1], (c, 2 * f), jnp.bfloat16) * 0.02)
        b1 = jnp.zeros((2 * f,), jnp.bfloat16)
        w2 = (jax.random.normal(ks[2], (f, c), jnp.bfloat16) * 0.02)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        extra = (ln_g, ln_b, w1, b1, w2, b2)

        ref = _reference_ln_geglu_ff(x, *extra, 1e-5)
        t = timeit_chained(
            lambda h, *e: _reference_ln_geglu_ff(h, *e, 1e-5), x, extra)
        print(f"B{b} L{l} C{c}: xla-chain          {t*1e3:8.3f} ms", flush=True)

        t = timeit_chained(
            lambda h, *e: _ff_core(h, *e, 1e-5, 256), x, extra)
        print(f"B{b} L{l} C{c}: serial-fused bq256 {t*1e3:8.3f} ms", flush=True)

        for bq in (256, 512):
            for fc in (256, 512, f):
                if fc > f:
                    continue
                out = chunked_ff(x, *extra, block_q=bq, fc=fc)
                err = jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - ref.astype(jnp.float32)))
                t = timeit_chained(
                    lambda h, *e, bq=bq, fc=fc: chunked_ff(
                        h, *e, block_q=bq, fc=fc), x, extra)
                print(f"B{b} L{l} C{c}: chunked bq{bq:<4d} fc{fc:<5d}"
                      f"{t*1e3:8.3f} ms   maxerr {float(err):.4f}", flush=True)


if __name__ == "__main__":
    main()
