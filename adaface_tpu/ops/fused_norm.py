"""Pallas fused GroupNorm(+affine)+SiLU for the UNet/VAE hot path.

The unfused GroupNorm reads the activation slab from HBM for the stats,
again for the normalize, and the SiLU adds another elementwise pass unless
XLA fuses it. This kernel keeps the slab VMEM-resident once per batch item
(bf16), computing stats + normalize + affine + SiLU with row-chunked fp32
working sets: SD slabs max out at 64x64x320 (bf16 2.6 MB), well under the
~16 MB/core scoped-vmem limit, while a full fp32 cast + x*x would not be.

Forward-only Pallas with a jnp backward (jax.custom_vjp recomputation):
training batches are small and the win is sampling throughput; the
backward matches the plain implementation bit-for-bit semantics.

Falls back to the jnp implementation when shapes don't divide the lane
constraints or the slab would overflow VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaface_tpu.ops.basic import group_norm

_ROW_CHUNK = 512
_CHUNK_FP32_BUDGET = 4 * 1024 * 1024  # xb + xb*xb fp32 working set target


def _pick_num_chunks(n: int, c: int) -> int:
    """Largest divisor of n whose fp32 row-chunk working set (xb and xb*xb)
    fits _CHUNK_FP32_BUDGET, preferring ~_ROW_CHUNK rows."""
    best = max(1, n // _ROW_CHUNK)
    while n % best:
        best -= 1
    while best < n and (n // best) * c * 4 * 2 > _CHUNK_FP32_BUDGET:
        nxt = best + 1
        while nxt <= n and n % nxt:
            nxt += 1
        if nxt > n:
            break
        best = nxt
    return best


# Empirical per-core block budget, measured on v5e (Mosaic scoped-vmem
# accounting behaves as ~3 fp32-equivalent copies of the block against the
# 16 MB limit, independent of the declared dtype):
#   OK:  4096x320 (f32+bf16), 1024x1280, 1024x960, 1024x640  <= 1.31M elems
#   OOM: 4096x640, 1024x1920 (f32+bf16)                      >= 1.97M elems
# Upper bound lowered from 1.35M after A/B on v5e: at the 4096x320 UNet
# slab the plain XLA path is FASTER (1.04 vs 1.30 ms inside a ResBlock) --
# XLA fuses the norm+silu into the adjacent convs, while the opaque Pallas
# call serializes; at 1024x640 the kernel still wins (0.80 vs 1.48 ms).
from adaface_tpu import knobs
# Default 0 = Pallas GN OFF: after the round-3 stats-first rewrite of the
# XLA group_norm (ops/basic.py), the plain path BEATS this kernel
# end-to-end (1.3402 vs 1.2827 img/s at the batch-8 bench point) — XLA
# fuses the affine into adjacent convs and no longer materializes fp32
# copies. Set ADAFACE_GN_MAX_ELEMS=700000 to restore the round-2 cutover.
_MAX_BLOCK_ELEMS = int(knobs.get('ADAFACE_GN_MAX_ELEMS', 0))


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, gmat_ref, o_ref, *,
                    inv_count: float, eps: float, apply_silu: bool,
                    num_chunks: int):
    # x_ref: [1, N, C] (module dtype, resident in VMEM once);
    # gmat_ref: [C, G] one-hot group membership. Group stats via matmuls
    # keep every array lane-aligned on C — no in-kernel reshape to the
    # (unaligned) per-group channel width. Row-chunked loops keep the fp32
    # working set small (a full fp32 cast + x*x of a 4096x320 slab blows
    # the ~16 MB scoped-vmem limit).
    gmat = gmat_ref[...].astype(jnp.float32)  # [C, G]
    G = gmat.shape[1]
    n = x_ref.shape[1]
    chunk = n // num_chunks

    def stats_body(i, carry):
        s, ss = carry
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        s = s + jnp.sum(jax.lax.dot_general(
            xb, gmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), axis=0, keepdims=True)
        ss = ss + jnp.sum(jax.lax.dot_general(
            xb * xb, gmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), axis=0, keepdims=True)
        return s, ss

    z = jnp.zeros((1, G), jnp.float32)
    sums, sumsq = jax.lax.fori_loop(0, num_chunks, stats_body, (z, z))
    mean_g = sums * inv_count  # [1, G]
    # clamp: one-pass E[x^2]-mean^2 can go (slightly) negative under fp32
    # cancellation; rsqrt of a negative would be NaN. (Same raw one-pass
    # form as the default XLA group_norm in ops/basic.py; probe-shifted
    # moments are the ADAFACE_GN_SHIFT=1 opt-in there.)
    var_g = jnp.maximum(sumsq * inv_count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: [1, G] @ [G, C]
    mean_c = jax.lax.dot_general(mean_g, gmat.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, gmat.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sc = scale_ref[0].astype(jnp.float32) * inv_c
    sh = bias_ref[0].astype(jnp.float32) - mean_c * sc

    def write_body(i, _):
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        out = xb * sc + sh
        if apply_silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0, pl.ds(i * chunk, chunk), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_chunks, write_body, 0)


def _fused_forward(x3, scale, bias, num_groups, eps, apply_silu):
    b, n, c = x3.shape
    cg = c // num_groups
    gmat = jnp.repeat(jnp.eye(num_groups, dtype=x3.dtype), cg, axis=0)  # [C, G]
    num_chunks = _pick_num_chunks(n, c)
    kernel = functools.partial(_gn_silu_kernel, inv_count=1.0 / (n * cg),
                               eps=eps, apply_silu=apply_silu,
                               num_chunks=num_chunks)
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x3.dtype),
    )(x3, scale[None], bias[None], gmat)


def _plain(x, scale, bias, num_groups, eps, apply_silu):
    out = group_norm(x, scale, bias, num_groups=num_groups, eps=eps)
    return jax.nn.silu(out) if apply_silu else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x3, scale, bias, num_groups, eps, apply_silu):
    return _fused_forward(x3, scale, bias, num_groups, eps, apply_silu)


def _fused_fwd(x3, scale, bias, num_groups, eps, apply_silu):
    return _fused_forward(x3, scale, bias, num_groups, eps, apply_silu), \
        (x3, scale, bias)


def _fused_bwd(num_groups, eps, apply_silu, res, g):
    x3, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _plain(x, s, b, num_groups, eps, apply_silu),
        x3, scale, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    num_groups: int = 32, eps: float = 1e-5,
                    apply_silu: bool = True) -> jnp.ndarray:
    """Fused GroupNorm(+SiLU) over the channel (last) axis of an N...C
    tensor; single-VMEM-pass Pallas kernel with a jnp fallback."""
    c = x.shape[-1]
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    if (c % num_groups or n * c > _MAX_BLOCK_ELEMS or x.ndim < 3
            or n % 8):
        return _plain(x, scale, bias, num_groups, eps, apply_silu)
    x3 = x.reshape(x.shape[0], n, c)
    out = _fused(x3, scale, bias, num_groups, eps, apply_silu)
    return out.reshape(x.shape)
