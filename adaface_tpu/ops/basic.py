"""Elementwise / normalization building blocks.

All functions are shape-polymorphic pure jnp and compile to fused XLA ops.
They compute statistics in float32 regardless of input dtype (bf16-safe),
matching what the reference gets implicitly from fp32 torch modules.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings [B, dim] in [cos, sin] concat order,
    matching the reference (`ldm/modules/diffusionmodules/util.py:154-174`):
    half = dim//2 freqs = exp(-log(max_period) * arange(half)/half)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of an NHWC/N...C tensor.

    The reference uses torch GroupNorm32 with eps 1e-6 in VAE blocks
    (`ldm/modules/diffusionmodules/model.py:32-34`) and eps 1e-5 in the UNet
    (torch default, `openaimodel.py` normalization()); pass eps accordingly.
    Statistics in fp32; output cast back to x.dtype.

    Stats-first formulation: channel-wise Σx / Σx² reduced over the
    spatial axes in the tensor's NATIVE [.., C] layout, grouped only on the
    tiny [B, C] result. The naive 5-D (.., G, C/G) reshape forces XLA to
    materialize fp32 whole-tensor copies with a transposed layout (the
    round-3 xprof showed ~0.2 ms of copies/reshapes per GN call at SD
    slabs); here the big tensor is touched by exactly one fused reduction
    pass and one fused elementwise-affine pass.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    b = x.shape[0]
    red = tuple(range(1, x.ndim - 1))  # spatial axes
    n_spatial = 1
    for dd in x.shape[1:-1]:
        n_spatial *= dd
    n_per_group = n_spatial * (c // g)
    from adaface_tpu import knobs

    if knobs.get("ADAFACE_GN_BARRIER") == "1":
        # A/B knob: keep the stats reduction OUT of the producer conv's
        # fusion (xprof r3: convs with fused stats epilogues run at 62-85%
        # of roofline) at the cost of one extra HBM read of the slab
        xs = jax.lax.optimization_barrier(x)
    else:
        xs = x
    xf = xs.astype(jnp.float32)
    # One-pass E[x^2]-mean^2 cancels catastrophically when mean^2 >> var
    # (a large common-mode offset leaves ~no significant bits in the fp32
    # difference) — but torch's own fp32 GroupNorm kernel has the SAME
    # failure mode on such inputs (tests/test_ops.py), SD activations
    # never approach it (GN inputs are ~zero-mean conv outputs), and the
    # accurate fix is not free: shifting by a per-group probe value costs
    # 7%/4%/1.5% of the fused conv+GN time at the SD slabs (the probe
    # dependency splits the producer-conv epilogue fusion;
    # scripts/perf_gn_shift.py). So RAW one-pass (reference-equivalent
    # numerics) is the default and ADAFACE_GN_SHIFT=1 opts into the
    # probe-shifted moments, whose shift cancels analytically
    # (stop_gradient keeps autodiff identical to the unshifted formula).
    if knobs.get("ADAFACE_GN_SHIFT") == "1":
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        probe = xf.reshape(b, -1, c)[:, 0]               # [B, C]
        shift = jax.lax.stop_gradient(
            probe.reshape(b, g, c // g).mean(-1))        # [B, G]
        shift_c = jnp.repeat(shift, c // g, axis=1)      # [B, C]
        xsh = xf - shift_c.reshape(bshape)
    else:
        xsh = xf
        shift = jnp.zeros((b, g), jnp.float32)
    s1 = jnp.sum(xsh, axis=red)         # [B, C]
    s2 = jnp.sum(xsh * xsh, axis=red)   # [B, C]
    gs1 = s1.reshape(b, g, c // g).sum(-1)
    gs2 = s2.reshape(b, g, c // g).sum(-1)
    mean_sh = gs1 / n_per_group         # [B, G] (of the shifted values)
    var = jnp.maximum(gs2 / n_per_group - mean_sh * mean_sh, 0.0)
    mean = mean_sh + shift              # [B, G]
    rstd = jax.lax.rsqrt(var + eps)
    # fold the group stats + gamma/beta into ONE per-(b, c) affine
    mean_c = jnp.repeat(mean, c // g, axis=1)
    rstd_c = jnp.repeat(rstd, c // g, axis=1)
    sc = rstd_c * scale.astype(jnp.float32)[None]
    bi = bias.astype(jnp.float32)[None] - mean_c * sc
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    out = xf * sc.reshape(shape) + bi.reshape(shape)
    return out.astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray | None,
    bias: jnp.ndarray | None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis, fp32 statistics."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's quick-GELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(x: jnp.ndarray) -> jnp.ndarray:
    """GEGLU gate used by the UNet transformer FF (`ldm/modules/attention.py`
    GEGLU): input last dim is 2*d, output d = a * gelu(b)."""
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.gelu(b)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)
