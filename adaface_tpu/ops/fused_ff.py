"""Fused LayerNorm + GEGLU feed-forward for the UNet transformer blocks.

The unfused chain (`ldm/modules/attention.py` FeedForward/GEGLU: LN ->
Linear(C, 8C) -> a*gelu(b) -> Linear(4C, C) -> +residual) makes XLA
materialize the [B, L, 8C] projection in HBM (168 MB at 64x64/B8) and run
LN and the residual as separate memory passes — xprof (round 3) shows the
w2 GEMM memory-bound on that intermediate (271 us vs a 140 us flop ideal).
This kernel keeps the whole chain in VMEM per row-block: one LN, two MXU
GEMMs with fp32 accumulation, the gate on the VPU, and the residual add —
HBM traffic is x in / out once, plus the weight panels (fetched once per
call; their BlockSpec index is constant so Mosaic elides refetches).

Backward recomputes through the reference jnp chain (a standard remat; the
intermediate is cheap to rebuild relative to storing it).

NEGATIVE RESULT (round 3, v5e): the fused kernel measured ~0.9 ms SLOWER
per B8 UNet forward (53.5 vs 52.7 ms) — the GEGLU gate's VPU work
serializes against the MXU inside each program, while XLA's pipelined
GEMM+epilogue fusions keep the MXU busy. Default OFF; `ADAFACE_FUSED_FF=1`
enables it for A/B.
"""

from __future__ import annotations

import functools
from adaface_tpu import knobs

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_ln_geglu_ff(x, ln_g, ln_b, w1, b1, w2, b2, eps):
    """Bit-faithful to the flax chain it replaces (LayerNorm fp32 stats,
    bf16 GEMMs, tanh gelu)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    # clamp like flax nn.LayerNorm: the one-pass E[x^2]-mu^2 can go
    # slightly negative for near-constant rows with large |mu|
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * ln_g.astype(jnp.float32) + ln_b.astype(jnp.float32)).astype(x.dtype)
    u = jnp.dot(y, w1, preferred_element_type=jnp.float32).astype(x.dtype) + b1
    a, g = jnp.split(u, 2, axis=-1)
    h = (a * jax.nn.gelu(g)).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(x.dtype) + b2
    return x + o


def _ff_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
               eps: float):
    x = x_ref[0]                                     # [bq, C]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0].astype(jnp.float32)
         + be_ref[0].astype(jnp.float32)).astype(x.dtype)
    u = jax.lax.dot_general(y, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u.astype(x.dtype) + b1_ref[0]                # [bq, 2F]
    f = u.shape[-1] // 2
    h = (u[:, :f] * jax.nn.gelu(u[:, f:])).astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = x + (o.astype(x.dtype) + b2_ref[0])


def _ff_forward(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_q):
    b, l, c = x.shape
    bq = min(block_q, l)
    while l % bq:
        bq //= 2
    kernel = functools.partial(_ff_kernel, eps=eps)
    interpret = jax.devices()[0].platform != "tpu"
    par = pltpu.GridDimensionSemantics.PARALLEL
    f2 = w1.shape[1]
    fh = w2.shape[0]
    row = lambda t: t.reshape(1, -1)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
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
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ff_core(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_q):
    return _ff_forward(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_q)


def _ff_core_fwd(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_q):
    o = _ff_forward(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_q)
    return o, (x, ln_g, ln_b, w1, b1, w2, b2)


def _ff_core_bwd(eps, block_q, res, g):
    x, ln_g, ln_b, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x, ln_g, ln_b, w1, b1, w2, b2: _reference_ln_geglu_ff(
            x, ln_g, ln_b, w1, b1, w2, b2, eps),
        x, ln_g, ln_b, w1, b1, w2, b2)
    return vjp(g)


_ff_core.defvjp(_ff_core_fwd, _ff_core_bwd)


def ln_geglu_ff(
    x: jnp.ndarray,       # [B, L, C]
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,   # [C]
    w1: jnp.ndarray,      # [C, 2F] (GEGLU value | gate)
    b1: jnp.ndarray,      # [2F]
    w2: jnp.ndarray,      # [F, C]
    b2: jnp.ndarray,      # [C]
    eps: float = 1e-5,
    block_q: int = 256,
) -> jnp.ndarray:
    """x + FF(LN(x)) with the GEGLU feed-forward fused into one kernel."""
    if knobs.get("ADAFACE_FUSED_FF") != "1":
        # measured on-chip (round 3): the fused kernel is ~0.9 ms SLOWER per
        # B8 UNet forward (53.5 vs 52.7 ms) — the GEGLU gate's VPU work
        # serializes against the MXU inside each program, while XLA's big
        # pipelined GEMM+epilogue fusions keep the MXU busy. Kept for
        # reference behind ADAFACE_FUSED_FF=1.
        return _reference_ln_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    return _ff_core(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_q)
