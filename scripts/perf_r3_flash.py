"""Round-3 flash-attention experiment: single-pass whole-row kernel vs the
online-softmax kernel.

At SD self-attention shapes (Lk <= 4096, D padded to 128) the ENTIRE K/V
panel fits VMEM (1 MB each in bf16), so the flash online-softmax
recurrence — designed for Lk that does NOT fit — pays loop-carried
corrections (acc*corr, m/l updates) for nothing. The row kernel computes
s = q·Kᵀ in one MXU pass, one softmax over the full row, one p·V — two
large matmuls, no sequential dependency between k-blocks.

Run on the real chip: python scripts/perf_r3_flash.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
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


def timeit_chained(fn, q, extra, n=20, reps=3):
    @jax.jit
    def run(q, extra):
        def body(x, _):
            return fn(x, *extra).astype(x.dtype).reshape(x.shape), None
        x, _ = jax.lax.scan(body, q, None, length=n)
        return x.astype(jnp.float32).sum()

    float(run(q, extra))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(q, extra))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt(), 1e-9) / n


# ---------------------------------------------------------------- row kernel
def _row_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]                      # [bq, d]
    k = k_ref[0]                      # [lk, d]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * LOG2E)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def row_attention(q, k, v, scale, block_q):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    q2, k2, v2 = (t.reshape(bh, t.shape[2], d) for t in (q, k, v))
    grid = (bh, lq // block_q)
    out = pl.pallas_call(
        functools.partial(_row_kernel, scale=scale),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.PARALLEL)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
    )(q2, k2, v2)
    return out.reshape(b, h, lq, d)


# ------------------------------------------------- row kernel, head-batched
def _row_kernel_heads(q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    # q_ref: [1, heads, bq, d]; k/v: [1, heads, lk, d] — back-to-back MXU
    # work from different heads hides the VPU softmax
    for hh in range(heads):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * LOG2E)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, hh] = (o / l).astype(o_ref.dtype)


def row_attention_heads(q, k, v, scale, block_q, heads_per=2):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    hb = h // heads_per
    q4 = q.reshape(b * hb, heads_per, lq, d)
    k4 = k.reshape(b * hb, heads_per, lk, d)
    v4 = v.reshape(b * hb, heads_per, lk, d)
    grid = (b * hb, lq // block_q)
    out = pl.pallas_call(
        functools.partial(_row_kernel_heads, scale=scale, heads=heads_per),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.PARALLEL)),
        in_specs=[
            pl.BlockSpec((1, heads_per, block_q, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads_per, lk, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads_per, lk, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, heads_per, block_q, d),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hb, heads_per, lq, d), q.dtype),
    )(q4, k4, v4)
    return out.reshape(b, h, lq, d)


def main():
    """Round-3 results (v5e, 2026-08-17): the ONLINE kernel wins — row
    variants are 11-19% slower (B8 L4096: online 3.70 ms vs row 4.10-4.42,
    row-heads hp2 3.82; hp4/bq512 exceed scoped vmem). The serial
    dot->softmax->dot of the row kernel cannot overlap MXU/VPU work the
    way the unrolled online k-loop does. Remaining sweep: finer online
    (block_q, block_k, unroll) tuning at the bench shapes."""
    import os

    from adaface_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", flush=True)
    for (B, H, L, D) in [(8, 8, 4096, 128), (16, 8, 4096, 128),
                         (8, 8, 1024, 128)]:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (B, H, L, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, L, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, L, D), jnp.bfloat16)
        scale = 40.0 ** -0.5  # real head dim pre-pad
        res = {}

        def run(name, fn):
            try:
                t = timeit_chained(lambda x, kk, vv: fn(x, kk, vv), q, (k, v))
                res[name] = t * 1e3
                print(f"  B{B} L{L}: {name:28s} {t*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"  B{B} L{L}: {name:28s} FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

        def online(bq, bk, unroll):
            def f(x, kk, vv):
                b, h, lq, d = x.shape
                bh = b * h
                kern = functools.partial(
                    fa._flash_kernel, block_k=bk, scale=scale,
                    have_bias=False, unroll=unroll)
                out = pl.pallas_call(
                    kern, grid=(bh, lq // bq),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=(
                            pltpu.GridDimensionSemantics.PARALLEL,
                            pltpu.GridDimensionSemantics.PARALLEL)),
                    in_specs=[
                        pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((bh, lq, d), x.dtype),
                )(x.reshape(bh, lq, d), kk.reshape(bh, lq, d),
                  vv.reshape(bh, lq, d), jnp.zeros((bh, 1, 1), x.dtype))
                return out.reshape(b, h, lq, d)
            return f

        run("online 512/512/u4 (cur)",
            lambda x, kk, vv: fa.flash_attention(x, kk, vv, scale=scale))
        for bq, bk, u in [(512, 512, 8), (512, 512, 16), (512, 1024, 4),
                          (1024, 512, 8), (1024, 1024, 4), (512, 256, 16),
                          (256, 512, 8)]:
            if L % bq or L % bk or (L // bk) % max(u, 1):
                continue
            run(f"online {bq}/{bk}/u{u}", online(bq, bk, u))


if __name__ == "__main__":
    main()
