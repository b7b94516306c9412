"""DDIM sampler as a single `lax.scan` over precomputed per-step constants.

Equivalent of the reference `ldm/models/diffusion/ddim.py` with:
- classifier-free guidance as a doubled batch in ONE UNet call, in
  (cond, uncond) order (`ddim.py:234-249` keeps that order so subject-token
  indices stay valid for conv-attn),
- guidance-scale annealing max->min as scan inputs (`ddim.py:169-218`),
- optional mask/x0 inpainting blend before each step (`ddim.py:190-196`),
- optional eta>0 stochasticity threading a PRNG key through the carry.

The whole loop jit-compiles to one XLA computation: weights stay resident,
per-step constants are tiny scan inputs, and there is no host round-trip
between steps.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from adaface_tpu.ops.schedule import DDIMSchedule, DiffusionSchedule

# eps_fn(x, t_batch, guide_scale) -> eps ; guide_scale is a traced scalar
EpsFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_cfg_eps_fn(
    apply_fn: Callable,
    context_cond: jnp.ndarray,  # [L, B, T, D] (or [B, T, D])
    context_uncond: jnp.ndarray,
    context_k_cond: Optional[jnp.ndarray] = None,
    context_k_uncond: Optional[jnp.ndarray] = None,
    dedup: bool = False,
    kv_fn: Optional[Callable] = None,
) -> EpsFn:
    """Wrap a UNet apply into a CFG eps function. `apply_fn(x, t, ctx_v,
    ctx_k)` -> eps. Batches (cond, uncond) into one call like the reference
    (`ddim.py:228-253`): e = e_u + g * (e_c - e_u).

    dedup: apply_fn runs the UNet with `cfg_dedup=True` — x/t are passed at
    batch B (the model tiles to 2B after its shared stem) while the
    contexts are still concatenated to 2B here.

    kv_fn(ctx, ctx_k): optional hoist of the loop-invariant cross-attention
    K/V projections (see `models.unet.precompute_cross_kv`); its result is
    passed to apply_fn as a 5th argument, computed once outside the scan."""
    cc = context_cond if context_cond.ndim == 4 else context_cond[None]
    cu = context_uncond if context_uncond.ndim == 4 else context_uncond[None]
    ctx = jnp.concatenate([cc, jnp.broadcast_to(cu, cc.shape)], axis=1)
    ctx_k = None
    if context_k_cond is not None:
        kc = context_k_cond if context_k_cond.ndim == 4 else context_k_cond[None]
        ku = context_k_uncond if context_k_uncond is not None else cu
        ku = ku if ku.ndim == 4 else ku[None]
        ctx_k = jnp.concatenate([kc, jnp.broadcast_to(ku, kc.shape)], axis=1)

    extra = (kv_fn(ctx, ctx_k),) if kv_fn is not None else ()

    def eps_fn(x, t, guide_scale):
        if dedup:
            eps2 = apply_fn(x, t, ctx, ctx_k, *extra)
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            eps2 = apply_fn(x2, t2, ctx, ctx_k, *extra)
        e_c, e_u = jnp.split(eps2, 2, axis=0)
        return e_u + guide_scale * (e_c - e_u)

    return eps_fn


def ddim_step(x, eps, a, a_prev, s1m, sigma, noise):
    """One DDIM update (`ddim.py:271-296`), eps-parameterization."""
    pred_x0 = (x - s1m * eps) / jnp.sqrt(a)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise
    return x_prev, pred_x0


def ddim_sample(
    eps_fn: EpsFn,
    sched: DDIMSchedule,
    x_T: jnp.ndarray,
    *,
    stochastic: bool = False,
    noise_key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    base_sched: Optional[DiffusionSchedule] = None,
    return_pred_x0: bool = False,
):
    """Run the full DDIM loop. Returns the final latent (and the last
    pred_x0 if requested). `mask`/`x0`/`base_sched` enable the inpainting
    blend; `stochastic` + `noise_key` enable eta>0 noise."""
    b = x_T.shape[0]
    if stochastic and noise_key is None:
        raise ValueError("stochastic sampling needs noise_key")
    key0 = noise_key if noise_key is not None else jax.random.PRNGKey(0)

    xs = (sched.timesteps, sched.alphas, sched.alphas_prev,
          sched.sqrt_one_minus_alphas, sched.sigmas, sched.guidance_scales)

    def step(carry, per_step):
        x, key = carry
        t, a, a_prev, s1m, sigma, g = per_step
        if mask is not None:
            key, sub = jax.random.split(key)
            noise0 = jax.random.normal(sub, x.shape, x.dtype)
            tb = jnp.full((b,), t, dtype=jnp.int32)
            img_orig = base_sched.q_sample(x0, tb, noise0)
            x = img_orig * mask + (1.0 - mask) * x
        tb = jnp.full((b,), t, dtype=jnp.int32)
        eps = eps_fn(x, tb, g)
        if stochastic:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, x.dtype)
        else:
            noise = jnp.zeros_like(x)
        x_prev, pred_x0 = ddim_step(x, eps, a, a_prev, s1m, sigma, noise)
        return (x_prev, key), pred_x0

    (x, _), pred_x0s = jax.lax.scan(step, (x_T, key0), xs)
    if return_pred_x0:
        return x, pred_x0s[-1]
    return x


def stochastic_encode(base_sched: DiffusionSchedule, x0, t, noise):
    """Noise x0 to timestep t (`ddim.py:298-313` / q_sample)."""
    return base_sched.q_sample(x0, t, noise)


def ddim_decode(eps_fn: EpsFn, sched: DDIMSchedule, x_t, t_start_index: int,
                guide_scale: float):
    """img2img decode from an intermediate step index (`ddim.py:315-350`):
    run the tail of the schedule starting at sampling index
    `t_start_index` (0 = full run)."""
    xs = (sched.timesteps[t_start_index:], sched.alphas[t_start_index:],
          sched.alphas_prev[t_start_index:],
          sched.sqrt_one_minus_alphas[t_start_index:],
          sched.sigmas[t_start_index:],
          jnp.full_like(sched.guidance_scales[t_start_index:], guide_scale))
    b = x_t.shape[0]

    def step(x, per_step):
        t, a, a_prev, s1m, sigma, g = per_step
        tb = jnp.full((b,), t, dtype=jnp.int32)
        eps = eps_fn(x, tb, g)
        x_prev, _ = ddim_step(x, eps, a, a_prev, s1m, sigma, jnp.zeros_like(x))
        return x_prev, None

    x, _ = jax.lax.scan(step, x_t, xs)
    return x
