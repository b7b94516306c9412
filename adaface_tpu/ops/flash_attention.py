"""Pallas TPU flash attention for the U-Net self-attention hot path.

At 512px the level-0 self-attention is Lq=Lk=4096 over 8 heads × up to 16
CFG-doubled instances: materializing the fp32 [B·H, 4096, 4096] probability
tensor (what the einsum path does, and what the reference's torch einsum
does on CUDA — `ldm/modules/attention.py:196-243`) costs ~8 GB of HBM
traffic per layer. This kernel computes attention with the online-softmax
(flash) recurrence entirely in VMEM: one pass over K/V blocks per Q tile,
fp32 accumulators, bf16 matmul inputs on the MXU.

Shapes: q,k,v [B, H, L, D]; D is zero-padded to the 128-lane width on the
host side (padding contributes 0 to q·kᵀ and is sliced off the output).
Optional additive key bias [B, L] implements the self-attn img_mask
(`attention.py:223-232`).

Backward: jax.custom_vjp with an einsum-attention recomputation backward —
training batches run at 64×64 latents where the quadratic term is small;
the flash path is primarily a sampling-throughput win.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int,
                  scale: float, have_bias: bool, unroll: int = 4):
    # q_ref: [1, block_q, D]; k_ref/v_ref: [1, Lk, D]; bias_ref: [1, 1, Lk];
    # o_ref: [1, block_q, D]
    #
    # MXU-friendly choices (measured on v5e, scripts/perf_flash_sweep.py):
    # matmul inputs stay in the input dtype (bf16) with fp32 accumulation —
    # an fp32 upcast before the dot is pure loss; softmax uses exp2 with the
    # log2(e) folded into the score scale; the k-loop is unrolled 2x so the
    # next block's q·kᵀ can overlap the previous block's VPU softmax.
    q = q_ref[0]
    lk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = lk // block_k
    sc = scale * _LOG2E  # exp2((s*scale - m)*log2e) == exp(s*scale - m)

    def one_block(i, acc, m, l):
        ks = k_ref[0, pl.ds(i * block_k, block_k), :]
        vs = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sc
        if have_bias:
            s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :] * _LOG2E
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    def body(i, carry):
        acc, m, l = carry
        for u in range(unroll):
            acc, m, l = one_block(i * unroll + u, acc, m, l)
        return acc, m, l

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb // unroll, body, (acc0, m0, l0))

    def tail(i, carry):
        acc, m, l = carry
        return one_block(i, acc, m, l)

    acc, m, l = jax.lax.fori_loop((num_kb // unroll) * unroll, num_kb, tail,
                                  (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, bias, block_q: int, block_k: int, scale: float):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    q2 = q.reshape(bh, lq, d)
    k2 = k.reshape(bh, lk, d)
    v2 = v.reshape(bh, lk, d)
    have_bias = bias is not None
    if have_bias:
        bias2 = jnp.repeat(bias, h, axis=0).reshape(bh, 1, lk)
    else:
        bias2 = jnp.zeros((bh, 1, 1), q.dtype)  # dummy

    grid = (bh, lq // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale,
                               have_bias=have_bias)
    # Pallas TPU kernels run interpreted on non-TPU backends (CPU tests).
    interpret = jax.devices()[0].platform != "tpu"
    import os

    # both grid dims are embarrassingly parallel (no cross-program state);
    # declaring them lets Mosaic pipeline block fetches across programs
    # (ADAFACE_FLASH_SEMANTICS=arbitrary reverts for A/B)
    sem = (pltpu.GridDimensionSemantics.ARBITRARY
           if os.environ.get("ADAFACE_FLASH_SEMANTICS") == "arbitrary"
           else pltpu.GridDimensionSemantics.PARALLEL)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(sem, sem)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk if have_bias else 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
    )(q2, k2, v2, bias2)
    return out.reshape(b, h, lq, d)


def _reference_attention(q, k, v, bias, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, block_q, block_k, scale):
    return _flash_forward(q, k, v, None, block_q, block_k, scale)


def _flash_core_fwd(q, k, v, block_q, block_k, scale):
    return _flash_forward(q, k, v, None, block_q, block_k, scale), (q, k, v)


def _flash_core_bwd(block_q, block_k, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, None, scale),
                     q, k, v)
    return vjp(g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core_bias(q, k, v, bias, block_q, block_k, scale):
    return _flash_forward(q, k, v, bias, block_q, block_k, scale)


def _flash_core_bias_fwd(q, k, v, bias, block_q, block_k, scale):
    return _flash_forward(q, k, v, bias, block_q, block_k, scale), (q, k, v, bias)


def _flash_core_bias_bwd(block_q, block_k, scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q, k, v, bias: _reference_attention(q, k, v, bias, scale),
        q, k, v, bias)
    return vjp(g)


_flash_core_bias.defvjp(_flash_core_bias_fwd, _flash_core_bias_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    key_bias: Optional[jnp.ndarray] = None,  # [B, Lk] additive (-inf to mask)
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    min_pallas_len: int = 256,
) -> jnp.ndarray:
    """Flash attention with automatic lane padding and an einsum fallback for
    short sequences (cross-attn Lk=77 etc., where flash gains nothing)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if lq < min_pallas_len or lk < min_pallas_len:
        return _reference_attention(
            q, k, v, None if key_bias is None else key_bias, scale)

    dp = max(128, ((d + 127) // 128) * 128)
    if dp != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bq = min(block_q, lq)
    while lq % bq:
        bq //= 2
    bk = min(block_k, lk)
    while lk % bk:
        bk //= 2
    if key_bias is None:
        out = _flash_core(q, k, v, bq, bk, scale)
    else:
        out = _flash_core_bias(q, k, v, key_bias.astype(jnp.float32), bq, bk, scale)
    return out[..., :d]
