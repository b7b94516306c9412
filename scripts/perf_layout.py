"""Matmul layout experiments for the D=40 attention contraction on v5e.

Times candidate QK^T / PV layouts inside a single Pallas kernel (looped to
steady state) to find whether the D=40 head dim can avoid the 128-lane pad.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LOOP = 500


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out).astype(jnp.float32))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def make_loop_kernel(body_fn, out_shape):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def loop(i, acc):
            return acc + body_fn(a, b, i)

        o_ref[...] = jax.lax.fori_loop(
            0, N_LOOP, loop, jnp.zeros(out_shape, jnp.float32)).astype(o_ref.dtype)

    return kernel


def run_case(name, a, b, body_fn, out_shape, useful_flops):
    kernel = make_loop_kernel(body_fn, out_shape)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(a, b))
    try:
        dt = timeit(f, a, b)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return
    per = (dt - 0.03) / N_LOOP
    print(f"{name}: {per*1e6:8.2f} us/iter  {useful_flops/per/1e12:6.1f} TF/s useful",
        flush=True)


def main():
    key = jax.random.PRNGKey(0)
    bq, bk, d, dp = 256, 512, 40, 128
    useful = 2 * bq * bk * d  # one QK-like matmul's useful flops

    # 1. padded lane contraction (current kernel shape)
    a = jax.random.normal(key, (bq, dp), jnp.bfloat16)
    b = jax.random.normal(key, (bk, dp), jnp.bfloat16)
    run_case("qk pad128 [256,128]x[512,128]^T", a, b,
             lambda a, b, i: jax.lax.dot_general(
                 a, b, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32),
             (bq, bk), useful)

    # 2. unpadded lane contraction K=40
    a = jax.random.normal(key, (bq, d), jnp.bfloat16)
    b = jax.random.normal(key, (bk, d), jnp.bfloat16)
    run_case("qk K=40   [256,40]x[512,40]^T  ", a, b,
             lambda a, b, i: jax.lax.dot_general(
                 a, b, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32),
             (bq, bk), useful)

    # 3. sublane contraction: q_t [40,256], k_t [40,512]
    a = jax.random.normal(key, (d, bq), jnp.bfloat16)
    b = jax.random.normal(key, (d, bk), jnp.bfloat16)
    run_case("qk^T sublane [40,256]^Tx[40,512]", a, b,
             lambda a, b, i: jax.lax.dot_general(
                 a, b, (((0,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32),
             (bq, bk), useful)

    # 4. PV padded: p [256,512] x v [512,128]
    a = jax.random.normal(key, (bq, bk), jnp.bfloat16)
    b = jax.random.normal(key, (bk, dp), jnp.bfloat16)
    run_case("pv pad128 [256,512]x[512,128]  ", a, b,
             lambda a, b, i: jax.lax.dot_general(
                 a, b, (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32),
             (bq, dp), useful)

    # 5. PV unpadded: p [256,512] x v [512,40]
    b = jax.random.normal(key, (bk, d), jnp.bfloat16)
    run_case("pv N=40   [256,512]x[512,40]   ", a, b,
             lambda a, b, i: jax.lax.dot_general(
                 a, b, (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32),
             (bq, d), useful)

    # 6. PV transposed: v_t [40,512] x p^T -> [40,256]
    b2 = jax.random.normal(key, (d, bk), jnp.bfloat16)
    run_case("pv^T      [40,512]x[256,512]^T ", b2, a,
             lambda a, b, i: jax.lax.dot_general(
                 a, b, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32),
             (d, bq), useful)

    # 7. 8-head packed QK: a [256, 320] x b [512, 320] with 8 grouped 40-dim
    #    contractions is NOT expressible as one dot; skip.

    # 8. exp throughput on [256,512] fp32
    a = jax.random.normal(key, (bq, bk), jnp.float32)
    b = jax.random.normal(key, (bq, bk), jnp.float32)
    run_case("exp [256,512] fp32 (VPU)      ", a, b,
             lambda a, b, i: jnp.exp(a * (1.0 + 1e-9 * i)),
             (bq, bk), bq * bk)

    # 9. full flash inner iteration (matmul+softmax+matmul) padded
    q = jax.random.normal(key, (bq, dp), jnp.bfloat16)
    kv = jax.random.normal(key, (2 * bk, dp), jnp.bfloat16)

    def flash_iter(q, kv, i):
        ks = kv[:bk]
        vs = kv[bk:]
        s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        acc = jax.lax.dot_general(p.astype(jnp.bfloat16), vs,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return acc

    run_case("flash inner iter (pad128)     ", q, kv, flash_iter,
             (bq, dp), 2 * useful)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    main()
