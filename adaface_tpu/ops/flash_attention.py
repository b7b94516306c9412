"""Pallas TPU flash attention for the U-Net self-attention hot path.

At 512px the level-0 self-attention is Lq=Lk=4096 over 8 heads × up to 16
CFG-doubled instances: materializing the fp32 [B·H, 4096, 4096] probability
tensor (what the einsum path does, and what the reference's torch einsum
does on CUDA — `ldm/modules/attention.py:196-243`) costs ~8 GB of HBM
traffic per layer. This kernel computes attention with the online-softmax
(flash) recurrence entirely in VMEM: one pass over K/V blocks per Q tile,
fp32 accumulators, bf16 matmul inputs on the MXU.

Shapes: q,k,v [B, H, L, D]; the sub-128 head dim ships UN-padded — Mosaic
pads the VMEM tiles. (Round-3 xprof: host-side jnp.pad materialized three
padded HBM arrays whose pad+copy ops scaled ~4x from CFG batch 8 to 16 —
the "batch-8 anomaly"; `ADAFACE_FLASH_HOST_PAD=1` restores that arm.)
Optional additive key bias [B, L] implements the self-attn img_mask
(`attention.py:223-232`).

Backward: real two-pass Pallas backward (parallel dq pass; parallel
dk/dv/dbias pass) recomputing probabilities from a row log2-sum-exp pass —
no [L, L] HBM materialization in training either. `ADAFACE_FLASH_BWD=
einsum` restores the einsum-recomputation arm for A/B.
"""

from __future__ import annotations

import functools
from adaface_tpu import knobs
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LOG2E = 1.4426950408889634
# Floor on the biased log2-domain scores. key_bias masks arrive as -1e30
# rows; without a floor a FULLY-masked row drives the online kernels' l to
# exactly 0 and o = acc/l = NaN (max-free sums exp2(-1.44e30) = 0; the
# guarded recurrence fails too since its m starts at NEG_INF = -1e30 >
# -1e30*log2e), where the einsum reference — equal logits — yields finite
# uniform attention. exp2(-100) ~ 7.9e-31 keeps l > 0, reproduces the
# uniform-row semantics, and leaks <= ~1e-17 relative weight onto masked
# keys of partially-masked rows (LN-bounded live scores sit above 2^-43).
# Applied uniformly wherever bias enters a kernel so forward and backward
# see identical probabilities.
#
# CONTRACT (bias callers only): live biased log2 scores must stay above
# -100, i.e. |q.k|*scale <~ 69 nats. The UNet/VAE paths satisfy this by two
# orders of magnitude (LN/GN-bounded activations); a hypothetical caller
# feeding a key_bias together with scores below -100 log2 would see its
# live keys clamped to the same floor as masked ones (uniform leak), where
# the einsum reference still separates them. No such caller exists; the
# floor is deliberately absolute because a running-max-relative clamp
# cannot be applied consistently across streamed k-blocks.
_SCORE_FLOOR = -100.0


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int,
                  scale: float, have_bias: bool, unroll: int = 8):
    # unroll=8 measured best on-chip (512/512/u8: 3.19 ms vs 3.73 at u4,
    # B8 H8 L4096; same ordering at B16 — scripts/perf_r3_flash.py r3)
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

    # see _flash_kernel_heads for the max-free rationale. This base
    # [B, H, L, D] entry point is the generic one (callers outside the
    # packed UNet path may feed arbitrary-scale activations — the VAE
    # mid-attention runs its own chunked-einsum path in models/vae.py),
    # so here the guarded recurrence stays the default;
    # ADAFACE_FLASH_MAXFREE=1 opts in.
    maxfree = knobs.get("ADAFACE_FLASH_MAXFREE") == "1"

    def one_block(i, acc, m, l):
        ks = k_ref[0, pl.ds(i * block_k, block_k), :]
        vs = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sc
        if have_bias:
            s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :] * _LOG2E
            s = jnp.maximum(s, _SCORE_FLOOR)
        if maxfree:
            p = jnp.exp2(s)
            l_new = l + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc + jax.lax.dot_general(
                p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc_new, m, l_new
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


def _flash_row_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                      have_bias: bool):
    # Single-pass whole-row attention: at SD lengths (Lk <= 4096, D padded
    # to 128) the ENTIRE K/V panel fits VMEM (1 MB each in bf16), so the
    # online-softmax recurrence — built for Lk that does NOT fit — pays
    # loop-carried acc/m/l corrections for nothing. One q·Kᵀ MXU pass, one
    # row softmax on the VPU, one p·V MXU pass with a deep (Lk) contraction.
    q = q_ref[0]                      # [bq, d]
    k = k_ref[0]                      # [lk, d]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * _LOG2E)
    if have_bias:
        s = s + bias_ref[0, 0][None, :] * _LOG2E
        s = jnp.maximum(s, _SCORE_FLOOR)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


# row kernel applies when the [block_q, Lk] fp32 score panel + K/V fit the
# ~16 MB scoped-vmem budget; at D=128/bf16 that is Lk <= 4096 with bq 256
_ROW_MAX_LK = 4096
_ROW_BLOCK_Q = 256


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


    # default pending the on-chip A/B (scripts/perf_r3_flash.py); the
    # online kernel is the measured round-2 configuration
    mode = knobs.get("ADAFACE_FLASH_MODE", "online")
    use_row = (mode == "row" and lk <= _ROW_MAX_LK
               and lq % min(_ROW_BLOCK_Q, lq) == 0)
    if use_row:
        block_q = min(_ROW_BLOCK_Q, lq)
        kernel = functools.partial(_flash_row_kernel, scale=scale,
                                   have_bias=have_bias)
    else:
        kernel = functools.partial(_flash_kernel, block_k=block_k,
                                   scale=scale, have_bias=have_bias)

    grid = (bh, lq // block_q)
    # Pallas TPU kernels run interpreted on non-TPU backends (CPU tests).
    interpret = jax.devices()[0].platform != "tpu"
    # both grid dims are embarrassingly parallel (no cross-program state);
    # declaring them lets Mosaic pipeline block fetches across programs
    # (ADAFACE_FLASH_SEMANTICS=arbitrary reverts for A/B)
    sem = (pltpu.GridDimensionSemantics.ARBITRARY
           if knobs.get("ADAFACE_FLASH_SEMANTICS") == "arbitrary"
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


# --------------------------------------------------------------- backward
# Real flash backward (round-3; replaces the einsum-recompute fallback).
# At SD lengths the full K/V (and even full Q) panels fit VMEM, so the
# backward is two single-pass kernels with NO inner recurrence:
#   pass A (parallel over q-blocks): dq = (p*(do·Vᵀ - Δ))·K · scale
#   pass B (parallel over k-blocks): dv = pᵀ·do, dk = (p*(dp-Δ))ᵀ·q · scale
# p is recomputed from the forward's saved row log2-sum-exp (lse2);
# Δ = rowsum(do*o) is precomputed in XLA.


def _row_lse_kernel(q_ref, k_ref, bias_ref, lse_ref, *, scale, have_bias):
    """Row log2-sum-exp of the scaled scores: lse2[q] = m + log2(Σ 2^(s-m)).
    Stats ride a [bh, 1, L] layout — Mosaic requires the last two block
    dims to be (8k, 128k) or full, which a [bh, L] block (1, bq) is not."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * _LOG2E)
    if have_bias:
        s = s + bias_ref[0, 0][None, :] * _LOG2E
        s = jnp.maximum(s, _SCORE_FLOOR)
    m = jnp.max(s, axis=-1)
    l = jnp.sum(jnp.exp2(s - m[:, None]), axis=-1)
    lse_ref[0, 0] = m + jnp.log2(l)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                   dq_ref, *, scale, have_bias):
    q = q_ref[0]                    # [bq, d]
    k = k_ref[0]                    # [lk, d]
    v = v_ref[0]
    do = do_ref[0]                  # [bq, d]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * _LOG2E)
    if have_bias:
        s = s + bias_ref[0, 0][None, :] * _LOG2E
        s = jnp.maximum(s, _SCORE_FLOOR)
    p = jnp.exp2(s - lse_ref[0, 0][:, None])       # [bq, lk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])       # [bq, lk] fp32
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, bias_ref,
                    dk_ref, dv_ref, dbias_ref, *, scale, have_bias):
    kb = k_ref[0]                   # [bk, d]
    vb = v_ref[0]
    q = q_ref[0]                    # [lq, d]
    do = do_ref[0]                  # [lq, d]
    s = jax.lax.dot_general(kb, q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * _LOG2E)
    if have_bias:
        s = s + bias_ref[0, 0][:, None] * _LOG2E   # bias indexed by k
        s = jnp.maximum(s, _SCORE_FLOOR)
    p = jnp.exp2(s - lse_ref[0, 0][None, :])       # [bk, lq]
    dv = jax.lax.dot_general(p.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(vb, do, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][None, :])       # [bk, lq] fp32
    dk = jax.lax.dot_general(ds.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dbias_ref[0, 0] = jnp.sum(ds, axis=-1).astype(dbias_ref.dtype)


def _flash_backward(q, k, v, bias, o, do, scale,
                    block_q: int = 256, block_k: int = 256):
    """(dq, dk, dv, dbias_per_bh) for the padded [B, H, L, D] tensors."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    q2, k2, v2 = (t.reshape(bh, t.shape[2], d) for t in (q, k, v))
    do2 = do.reshape(bh, lq, d)
    o2 = o.reshape(bh, lq, d)
    have_bias = bias is not None
    if have_bias:
        bias2 = jnp.repeat(bias, h, axis=0).reshape(bh, 1, lk)
    else:
        bias2 = jnp.zeros((bh, 1, 1), jnp.float32)

    interpret = jax.devices()[0].platform != "tpu"
    par = pltpu.GridDimensionSemantics.PARALLEL
    bq = min(block_q, lq)
    while lq % bq:
        bq //= 2
    bk = min(block_k, lk)
    while lk % bk:
        bk //= 2

    bias_spec = pl.BlockSpec((1, 1, lk if have_bias else 1),
                             lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_full = pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    q_full = pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    # row statistics (lse2) recomputed in one parallel pass; [bh, 1, L]
    # layout keeps the block shapes Mosaic-legal
    lse = pl.pallas_call(
        functools.partial(_row_lse_kernel, scale=scale, have_bias=have_bias),
        interpret=interpret, grid=(bh, lq // bq),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(par, par)),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            kv_full, bias_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, bq), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, 1, lq), jnp.float32),
    )(q2, k2, bias2)

    delta = jnp.sum(do2.astype(jnp.float32) * o2.astype(jnp.float32),
                    axis=-1)[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, have_bias=have_bias),
        interpret=interpret, grid=(bh, lq // bq),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(par, par)),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            kv_full, kv_full,
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
    )(q2, k2, v2, do2, lse, delta, bias2)

    lse_full = pl.BlockSpec((1, 1, lq), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, have_bias=have_bias),
        interpret=interpret, grid=(bh, lk // bk),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(par, par)),
        in_specs=[
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            q_full, q_full, lse_full, lse_full,
            pl.BlockSpec((1, 1, bk if have_bias else 1),
                         lambda i, j: (i, 0, j if have_bias else 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
            jax.ShapeDtypeStruct((bh, 1, lk), jnp.float32),
        ],
    )(k2, v2, q2, do2, lse, delta, bias2)

    dq = dq.reshape(b, h, lq, d)
    dk = dk.reshape(b, h, lk, d)
    dv = dv.reshape(b, h, lk, d)
    dbias = dbias.reshape(b, h, lk)
    return dq, dk, dv, dbias


def _use_einsum_bwd() -> bool:

    return knobs.get("ADAFACE_FLASH_BWD") == "einsum"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, block_q, block_k, scale):
    return _flash_forward(q, k, v, None, block_q, block_k, scale)


def _flash_core_fwd(q, k, v, block_q, block_k, scale):
    o = _flash_forward(q, k, v, None, block_q, block_k, scale)
    return o, (q, k, v, o)


def _flash_core_bwd(block_q, block_k, scale, res, g):
    q, k, v, o = res
    if _use_einsum_bwd():  # A/B fallback: full einsum recomputation
        _, vjp = jax.vjp(
            lambda q, k, v: _reference_attention(q, k, v, None, scale),
            q, k, v)
        return vjp(g)
    dq, dk, dv, _ = _flash_backward(q, k, v, None, o, g, scale)
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core_bias(q, k, v, bias, block_q, block_k, scale):
    return _flash_forward(q, k, v, bias, block_q, block_k, scale)


def _flash_core_bias_fwd(q, k, v, bias, block_q, block_k, scale):
    o = _flash_forward(q, k, v, bias, block_q, block_k, scale)
    return o, (q, k, v, bias, o)


def _flash_core_bias_bwd(block_q, block_k, scale, res, g):
    q, k, v, bias, o = res
    if _use_einsum_bwd():
        _, vjp = jax.vjp(
            lambda q, k, v, bias: _reference_attention(q, k, v, bias, scale),
            q, k, v, bias)
        return vjp(g)
    dq, dk, dv, dbias_bh = _flash_backward(q, k, v, bias, o, g, scale)
    dbias = dbias_bh.sum(axis=1)  # bias is [B, Lk], broadcast over heads
    return dq, dk, dv, dbias


_flash_core_bias.defvjp(_flash_core_bias_fwd, _flash_core_bias_bwd)


# ------------------------------------------------- packed [B, L, H*D] layout
# Round-3 xprof: feeding the kernel [B, H, L, D] forces XLA to materialize
# layout copies between the qkv GEMM (which writes [B, L, H*D]) and the
# custom-call ("data formatting" was 3.2 ms of a 56 ms UNet forward at B8).
# These specs lane-slice each head's [*, D] panel straight out of the packed
# GEMM output — the head split/merge never touches HBM.


def _flash_kernel_heads(q_ref, k_ref, v_ref, bias_ref, o_ref, kh_s, vh_s, *,
                        heads: int, d: int, block_k: int, scale: float,
                        have_bias: bool, unroll: int = 8):
    # q_ref: [1, bq, H*D]; k_ref/v_ref: [1, Lk, H*D]; o_ref: [1, bq, H*D]
    # where head h's panel sits at lanes h*d. Mosaic TPU rejects lane-dim
    # BLOCKS of d=40, so the head split happens in VMEM: once per batch row
    # (TPU grids are sequential, scratch persists across programs) the K/V
    # panels are restriped into clean per-head [Lk, d] scratch panels; the
    # per-q-block lane slices of q are cheap. The relayout VPU work mostly
    # hides under the MXU matmuls.
    j = pl.program_id(1)
    lk = k_ref.shape[1]
    bq = q_ref.shape[1]
    num_kb = lk // block_k
    sc = scale * _LOG2E

    @pl.when(j == 0)
    def _():
        for hh in range(heads):
            kh_s[hh] = k_ref[0, :, hh * d:(hh + 1) * d]
            vh_s[hh] = v_ref[0, :, hh * d:(hh + 1) * d]


    # Max-free softmax (default): SD self-attention scores are LN-bounded
    # (|s·log2e| << 128 in practice, fp32 exp2 is exact to ~2^127), so the
    # running max m and the acc/l correction multiplies of the online
    # recurrence are pure VPU overhead — exp2(s) with a plain running sum
    # is mathematically the same softmax (softmax is shift-invariant; here
    # the shift is simply 0). ADAFACE_FLASH_MAXFREE=0 restores the
    # numerically-guarded recurrence for arbitrary-scale inputs.
    maxfree = knobs.get("ADAFACE_FLASH_MAXFREE") != "0"

    for hh in range(heads):
        q = q_ref[0, :, hh * d:(hh + 1) * d]

        def one_block(i, acc, m, l):
            ks = kh_s[hh, pl.ds(i * block_k, block_k), :]
            vs = vh_s[hh, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * sc
            if have_bias:
                s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :] \
                    * _LOG2E
                s = jnp.maximum(s, _SCORE_FLOOR)
            if maxfree:
                p = jnp.exp2(s)
                l_new = l + jnp.sum(p, axis=-1, keepdims=True)
                acc_new = acc + jax.lax.dot_general(
                    p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_new, m, l_new
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
        acc, m, l = jax.lax.fori_loop(0, num_kb // unroll, body,
                                      (acc0, m0, l0))
        acc, m, l = jax.lax.fori_loop(
            (num_kb // unroll) * unroll, num_kb,
            lambda i, c: one_block(i, *c), (acc, m, l))
        o_ref[0, :, hh * d:(hh + 1) * d] = (acc / l).astype(o_ref.dtype)


def _flash_kernel_heads_short(q_ref, k_ref, v_ref, bias_ref, o_ref, kt_s, vh_s,
                              *, heads: int, d: int, scale: float,
                              have_bias: bool):
    # Short-Lk (cross-attention) variant: the whole K/V panel is one block
    # (Lk <= 256, padded to 128 lanes), so there is no online-softmax
    # recurrence and — unlike the PVT kernel — no reason to transpose q:
    # with lk on the LANE axis both GEMMs have clean outputs
    # (s[bq, lk], o[bq, d]) and only the d=40 contraction pays MXU K-pad.
    # The PVT kernel's per-head [bq, d] -> [d, bq] q transposes dominate at
    # tiny Lk (731 us vs ~300 us at B16 L4096 Lk128 D40, xprof r3).
    j = pl.program_id(1)
    sc = scale * _LOG2E

    @pl.when(j == 0)
    def _():
        for hh in range(heads):
            kt_s[hh] = k_ref[0, :, hh * d:(hh + 1) * d].T   # [d, lk]
            vh_s[hh] = v_ref[0, :, hh * d:(hh + 1) * d]     # [lk, d]

    for hh in range(heads):
        qh = q_ref[0, :, hh * d:(hh + 1) * d]               # [bq, d]
        s = jax.lax.dot_general(qh, kt_s[hh], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * sc
        if have_bias:
            s = s + bias_ref[0, 0][None, :] * _LOG2E        # bias over lanes
            s = jnp.maximum(s, _SCORE_FLOOR)
        p = jnp.exp2(s)                                     # [bq, lk]
        l = jnp.sum(p, axis=1, keepdims=True)               # [bq, 1]
        o = jax.lax.dot_general(p.astype(q_ref.dtype), vh_s[hh],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, hh * d:(hh + 1) * d] = (o / l).astype(o_ref.dtype)


def _flash_kernel_heads_pvt(q_ref, k_ref, v_ref, bias_ref, o_ref, kh_s, vt_s,
                            *, heads: int, d: int, scale: float,
                            have_bias: bool):
    # Transposed-PV variant (max-free only). The straight PV matmul
    # p[bq, lk] @ v[lk, d] pads its d=40 OUTPUT lanes to the 128-lane MXU
    # (3.2x waste); computing o^T = v^T[d, lk] @ p^T[lk, bq] instead puts
    # the large dims on the padded axes (K=lk contraction, N=bq lanes) and
    # streams d on the 8-sublane-granular M axis — NO padding. Kernel MXU
    # ideal drops from 2.79 to 1.83 ms (B8 H8 L4096 D40); measured 3.05 ->
    # 2.18 ms. Scores are computed transposed ([lk, bq]) from the start, so
    # softmax reduces over sublanes and the division rides the [1, bq] row.
    j = pl.program_id(1)
    sc = scale * _LOG2E

    # A/B arms for the remaining non-MXU time in this kernel (the fp32
    # exp2 pass + the [lk, bq] VPU row-sum are outside any MXU roofline):
    #  - ADAFACE_FLASH_EXP_BF16=1: quantize scores to bf16 BEFORE exp2 and
    #    keep p in bf16 (it is cast to bf16 for the PV dot anyway; the only
    #    numeric delta is the input quantization, |ds| <= |s|*2^-9).
    #  - ADAFACE_FLASH_MXU_SUM=1: append a ones row to v^T so the PV dot
    #    computes [o^T; l] in one MXU pass ([d+1, lk] @ [lk, bq]) and the
    #    per-panel VPU reduction disappears (d+1 rows pad to the same
    #    48-sublane granule as d=40+8).
    exp_bf16 = knobs.get("ADAFACE_FLASH_EXP_BF16") == "1"
    mxu_sum = knobs.get("ADAFACE_FLASH_MXU_SUM") == "1"

    @pl.when(j == 0)
    def _():
        for hh in range(heads):
            kh_s[hh] = k_ref[0, :, hh * d:(hh + 1) * d]
            if mxu_sum:
                vt_s[hh, :d] = v_ref[0, :, hh * d:(hh + 1) * d].T
                vt_s[hh, d:] = jnp.ones_like(vt_s[hh, d:])
            else:
                vt_s[hh] = v_ref[0, :, hh * d:(hh + 1) * d].T

    for hh in range(heads):
        qT = q_ref[0, :, hh * d:(hh + 1) * d].T           # [d, bq]
        s = jax.lax.dot_general(kh_s[hh], qT, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * sc
        if have_bias:
            s = s + bias_ref[0, 0][:, None] * _LOG2E      # bias over k rows
            s = jnp.maximum(s, _SCORE_FLOOR)
        if exp_bf16:
            p = jnp.exp2(s.astype(jnp.bfloat16))          # [lk, bq] bf16
        else:
            p = jnp.exp2(s)                               # [lk, bq] fp32
        if mxu_sum:
            ol = jax.lax.dot_general(vt_s[hh], p.astype(q_ref.dtype),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            oT, l = ol[:d], ol[d:d + 1]                   # [d, bq], [1, bq]
        else:
            l = jnp.sum(p, axis=0, keepdims=True,
                        dtype=jnp.float32)                # [1, bq]
            oT = jax.lax.dot_general(vt_s[hh], p.astype(q_ref.dtype),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        o_ref[0, :, hh * d:(hh + 1) * d] = ((oT / l).T).astype(o_ref.dtype)


def _flash_kernel_heads_pvt2(q_ref, k_ref, v_ref, bias_ref, o_ref, kh_s, vt_s,
                             ot_s, *, heads: int, d: int, scale: float,
                             have_bias: bool):
    # PVT with BATCHED head transposes: the per-head q/o transposes of the
    # base PVT kernel move [bq, 40]-lane slices — each vreg row is 2/3 pad
    # at d=40 < the 128-lane tile. Transposing the whole packed panel once
    # ([bq, H*D] -> [H*D, bq]) runs on full 128-lane tiles; per-head work
    # then slices SUBLANES (d=40 = 5 x 8-row granules, exactly aligned).
    j = pl.program_id(1)
    sc = scale * _LOG2E

    @pl.when(j == 0)
    def _():
        for hh in range(heads):
            kh_s[hh] = k_ref[0, :, hh * d:(hh + 1) * d]
            vt_s[hh] = v_ref[0, :, hh * d:(hh + 1) * d].T

    qT = q_ref[0].T                                       # [H*D, bq], one shot
    for hh in range(heads):
        s = jax.lax.dot_general(kh_s[hh], qT[hh * d:(hh + 1) * d],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * sc
        if have_bias:
            s = s + bias_ref[0, 0][:, None] * _LOG2E
            s = jnp.maximum(s, _SCORE_FLOOR)
        p = jnp.exp2(s)                                   # [lk, bq]
        l = jnp.sum(p, axis=0, keepdims=True)             # [1, bq]
        oT = jax.lax.dot_general(vt_s[hh], p.astype(q_ref.dtype),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ot_s[hh * d:(hh + 1) * d] = (oT / l).astype(ot_s.dtype)
    o_ref[0] = ot_s[...].T                                # one shot back


def _flash_forward_blc(q, k, v, heads, d, bias, block_q, block_k, scale):
    """q/k/v: [B, L, H*D] packed arrays. Returns [B, Lq, H*D]."""
    b, lq = q.shape[0], q.shape[1]
    lk = k.shape[1]
    have_bias = bias is not None
    bias2 = (bias.reshape(b, 1, lk) if have_bias
             else jnp.zeros((b, 1, 1), jnp.float32))

    maxfree = knobs.get("ADAFACE_FLASH_MAXFREE") != "0"
    use_pvt = maxfree and knobs.get("ADAFACE_FLASH_PVT") != "0"
    # pvt2 (batched head transposes) wins only where the per-head transpose
    # overhead is large relative to the GEMMs: on-chip sweep (bit-exact
    # parity): L256/D160 0.187 -> 0.117 ms, but L4096/D40 4.458 -> 4.568
    # and L1024/D80 0.276 -> 0.315 (exp2+GEMM-bound; the extra scratch
    # write loses). Default: small panels only.
    pvt2_env = knobs.get("ADAFACE_FLASH_PVT2")
    pvt2 = (lq <= 256) if pvt2_env is None else pvt2_env == "1"
    use_short = (maxfree and lk <= 256
                 and knobs.get("ADAFACE_FLASH_SHORT") != "0")
    unroll = int(knobs.get("ADAFACE_FLASH_PACKED_UNROLL", "8"))
    if use_short:
        kernel = functools.partial(
            _flash_kernel_heads_short, heads=heads, d=d, scale=scale,
            have_bias=have_bias)
    elif use_pvt and pvt2:
        kernel = functools.partial(
            _flash_kernel_heads_pvt2, heads=heads, d=d, scale=scale,
            have_bias=have_bias)
    elif use_pvt:
        kernel = functools.partial(
            _flash_kernel_heads_pvt, heads=heads, d=d, scale=scale,
            have_bias=have_bias)
    else:
        kernel = functools.partial(
            _flash_kernel_heads, heads=heads, d=d, block_k=block_k,
            scale=scale, have_bias=have_bias, unroll=unroll)
    interpret = jax.devices()[0].platform != "tpu"
    par = pltpu.GridDimensionSemantics.PARALLEL
    arb = pltpu.GridDimensionSemantics.ARBITRARY
    grid = (b, lq // block_q)
    w = q.shape[2]
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(par, arb),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, block_q, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk if have_bias else 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, heads * d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq, heads * d), q.dtype),
        scratch_shapes=[pltpu.VMEM((heads, d, lk) if use_short
                                   else (heads, lk, d), q.dtype),
                        pltpu.VMEM(
                            (heads,
                             d + (1 if use_pvt and not pvt2 and
                                  knobs.get("ADAFACE_FLASH_MXU_SUM")
                                  == "1" else 0),
                             lk) if use_pvt and not use_short
                            else (heads, lk, d), v.dtype)]
        + ([pltpu.VMEM((heads * d, block_q), q.dtype)]
           if use_pvt and pvt2 and not use_short else []),
    )(q, k, v, bias2)
    return out


def _blh_to_bhld(t, heads, d):
    b, l, _ = t.shape
    return t.reshape(b, l, heads, d).transpose(0, 2, 1, 3)


def _bhld_to_blh(t):
    b, h, l, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, l, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_core_blc3(q, k, v, bias, heads, d, block_q, block_k, scale):
    return _flash_forward_blc(q, k, v, heads, d, bias, block_q, block_k, scale)


def _flash_core_blc3_fwd(q, k, v, bias, heads, d, block_q, block_k, scale):
    o = _flash_core_blc3(q, k, v, bias, heads, d, block_q, block_k, scale)
    return o, (q, k, v, bias, o)


def _flash_core_blc3_bwd(heads, d, block_q, block_k, scale, res, g):
    q3, k3, v3, bias, o = res
    q = _blh_to_bhld(q3, heads, d)
    k = _blh_to_bhld(k3, heads, d)
    v = _blh_to_bhld(v3, heads, d)
    o4 = _blh_to_bhld(o, heads, d)
    g4 = _blh_to_bhld(g, heads, d)
    if _use_einsum_bwd():
        if bias is None:
            _, vjp = jax.vjp(
                lambda q, k, v: _reference_attention(q, k, v, None, scale),
                q, k, v)
            dq, dk, dv = vjp(g4)
            dbias = None
        else:
            # differentiate THROUGH the bias too — the A/B arm must be
            # gradient-equivalent to the flash backward's dbias
            _, vjp = jax.vjp(
                lambda q, k, v, b: _reference_attention(q, k, v, b, scale),
                q, k, v, bias)
            dq, dk, dv, dbias = vjp(g4)
    else:
        dq, dk, dv, dbias_bh = _flash_backward(q, k, v, bias, o4, g4, scale)
        dbias = None if bias is None else dbias_bh.sum(axis=1)
    return (_bhld_to_blh(dq), _bhld_to_blh(dk), _bhld_to_blh(dv), dbias)


_flash_core_blc3.defvjp(_flash_core_blc3_fwd, _flash_core_blc3_bwd)


def _pick_block(block, length):
    b = min(block, length)
    while length % b:
        b //= 2
    return b


def flash_attention_qkv(
    qkv: jnp.ndarray,  # [B, L, 3*H*D]: q | k | v lane-concatenated
    num_heads: int,
    key_bias: Optional[jnp.ndarray] = None,  # [B, L] additive
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    min_pallas_len: int = 256,
) -> jnp.ndarray:
    """Self-attention on the fused-QKV GEMM output, packed layout in and out
    ([B, L, H*D]). The q/k/v thirds are host-sliced (cheap contiguous lane
    slices) and fed to the head-looping packed kernel."""
    b, l, w3 = qkv.shape
    inner = w3 // 3
    return flash_attention_blc(
        qkv[..., :inner], qkv[..., inner:2 * inner], qkv[..., 2 * inner:],
        num_heads, key_bias=key_bias, scale=scale, block_q=block_q,
        block_k=block_k, min_pallas_len=min_pallas_len)


def flash_attention_blc(
    q: jnp.ndarray,  # [B, Lq, H*D]
    k: jnp.ndarray,  # [B, Lk, H*D]
    v: jnp.ndarray,  # [B, Lk, H*D]
    num_heads: int,
    key_bias: Optional[jnp.ndarray] = None,  # [B, Lk] additive
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    min_pallas_len: int = 256,
) -> jnp.ndarray:
    """Flash attention on packed [B, L, H*D] tensors (no head transpose)."""

    b, lq, inner = q.shape
    lk = k.shape[1]
    d = inner // num_heads
    if scale is None:
        scale = d ** -0.5
    # Short-Lk (cross-attention, Lk=77): the whole K/V panel is ONE kernel
    # block, so the online-softmax recurrence degenerates away and the
    # kernel is a single q@kT / softmax / pV pass per q block that never
    # round-trips the [B, H, Lq, Lk] score slab through HBM. Default OFF:
    # it wins standalone (attn2 5.3 -> 3.5 ms in the chained-UNet trace)
    # but LOSES end-to-end (bench A/B: 1.579 vs 1.673 img/s, UNet 96.8 vs
    # 91.2 ms/call) — inside the full DDIM program XLA fuses the einsum
    # path's softmax/PV into the surrounding projections, and the opaque
    # custom-call forces layout copies it can't. ADAFACE_FLASH_CROSS=1
    # opts in for A/B.
    short_lk = lk < min_pallas_len
    if lq < min_pallas_len or (
            short_lk and knobs.get("ADAFACE_FLASH_CROSS") != "1"):
        out = _reference_attention(
            _blh_to_bhld(q, num_heads, d), _blh_to_bhld(k, num_heads, d),
            _blh_to_bhld(v, num_heads, d), key_bias, scale)
        return _bhld_to_blh(out)
    if short_lk:
        lkp = ((lk + 127) // 128) * 128
        kb = (key_bias.astype(jnp.float32) if key_bias is not None
              else jnp.zeros((b, lk), jnp.float32))
        key_bias = jnp.pad(kb, [(0, 0), (0, lkp - lk)],
                           constant_values=-1e30)
        pz = [(0, 0), (0, lkp - lk), (0, 0)]
        k, v, lk = jnp.pad(k, pz), jnp.pad(v, pz), lkp
    # Full-panel k blocks with the max-free softmax (no recurrence work, so
    # one k-block per head wins); the kernel raises the scoped-vmem limit
    # to fit the [Lk, bq] fp32 score panel. bq 512 measured best for the
    # transposed-PV kernel at L4096 (4.39 ms vs 5.23 at bq 1024, B16 D40),
    # 256 for the others; at Lq <= 1024 the full-panel q block wins too
    # (0.395 vs 0.444 ms at L1024 D80 — scripts/perf_r3_pvt_sweep.py).
    pvt = (knobs.get("ADAFACE_FLASH_MAXFREE") != "0"
           and knobs.get("ADAFACE_FLASH_PVT") != "0")
    bq_default = ("1024" if lq <= 1024 else "512") if pvt else "256"
    if lk <= 256:
        # single-K-panel (short-Lk) kernel: no recurrence, and per-program
        # overhead dominates — the full q panel wins (0.550 vs 0.767 ms at
        # bq 512, B16 Lq4096 Lk77 D40)
        bq_default = str(lq)
    bq = _pick_block(int(knobs.get("ADAFACE_FLASH_PACKED_BQ", bq_default)), lq)
    bk = _pick_block(int(knobs.get("ADAFACE_FLASH_PACKED_BK", "4096")), lk)
    bias = None if key_bias is None else key_bias.astype(jnp.float32)
    return _flash_core_blc3(q, k, v, bias, num_heads, d, bq, bk, scale)


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


    if knobs.get("ADAFACE_FLASH_HOST_PAD") == "1":
        # legacy arm: materialize lane-padded q/k/v in HBM. The xprof
        # batch-8 diagnosis showed these pads+copies scaling 3-4x with
        # batch (347 ms/run at CFG batch 16); the default now ships the
        # un-padded [.., 40] tensors and lets Mosaic pad tiles in VMEM.
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
