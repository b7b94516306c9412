"""Training losses.

Re-derivations of the reference's loss battery (`ddpm.py:3457-4779`,
SURVEY.md §2.6). This module starts with the core reconstruction loss and
the always-on prompt-delta regularizer; the distillation losses land with
the compositional-iteration machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_recon_loss(
    eps_pred: jnp.ndarray,  # [B, H, W, C]
    eps_target: jnp.ndarray,
    fg_mask: Optional[jnp.ndarray] = None,  # [B, H, W, 1] in latent space
    bg_weight: float = 0.0,
    fg_weight: float = 1.0,
) -> jnp.ndarray:
    """Masked MSE eps-reconstruction (`calc_recon_loss`, `ddpm.py:3567`):
    foreground pixels weight `fg_weight`, background `bg_weight`
    (0 / 0.1 / 0.05 depending on iteration flavor, `ddpm.py:2917-2946`).
    Returns a scalar averaged over the weighted pixel count."""
    err = jnp.square(eps_pred.astype(jnp.float32) - eps_target.astype(jnp.float32))
    if fg_mask is None:
        return err.mean()
    w = fg_mask * fg_weight + (1.0 - fg_mask) * bg_weight
    w = jnp.broadcast_to(w, err.shape)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-6)


def ortho_subtract(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Remove from `a` its projection onto `b` along the last dim
    (`ldm/util.py` ortho_subtract): a - (a·b / (b·b + 1e-6)) b."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    norm = jnp.sum(b * b, axis=-1, keepdims=True)
    return a - dot / (norm + eps) * b


def cosine_loss(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """1 - mean cosine similarity along the last dim."""
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
    return 1.0 - jnp.mean(jnp.sum(an * bn, axis=-1))


def grad_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Forward identity, backward gradient × scale — the functional analog of
    the reference's ubiquitous `gen_gradient_scaler` (`ldm/util.py:1324-1369`)."""
    if scale == 1.0:
        return x
    if scale == 0.0:
        return jax.lax.stop_gradient(x)
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


def _demean(x):
    return x - x.mean(axis=-1, keepdims=True)


def ref_cosine_loss(delta, ref_delta, emb_weights=None, exponent: float = 2.0,
                    do_demean_first: bool = True, ref_grad_scale: float = 0.05,
                    aim_to_align: bool = True) -> jnp.ndarray:
    """Weighted cosine alignment of `delta` to `ref_delta`
    (`calc_ref_cosine_loss`, `ldm/util.py`): demean both over the embedding
    dim, gradient-scale + signed-pow the reference side
    (x·|x|^(e-1)), per-token cosine-embedding loss, weight-averaged."""
    if do_demean_first:
        delta = _demean(delta)
        ref_delta = _demean(ref_delta)
    ref_delta = grad_scale(ref_delta, ref_grad_scale)
    ref_pow = ref_delta * jnp.abs(ref_delta) ** (exponent - 1.0)
    an = delta / (jnp.linalg.norm(delta, axis=-1, keepdims=True) + 1e-8)
    bn = ref_pow / (jnp.linalg.norm(ref_pow, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(an * bn, axis=-1)
    losses = (1.0 - cos) if aim_to_align else jnp.maximum(cos, 0.0)
    if emb_weights is not None:
        w = jnp.broadcast_to(emb_weights, losses.shape)
        return jnp.sum(losses * w) / (jnp.sum(w) + 1e-8)
    return losses.mean()


def prompt_delta_loss(
    subj_single: jnp.ndarray,  # [L, B, T, D] prompt embeddings (4-type batch)
    subj_comp: jnp.ndarray,
    cls_single: jnp.ndarray,
    cls_comp: jnp.ndarray,
    single_mask: Optional[jnp.ndarray] = None,  # [B, T] valid-token masks
    comp_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Static prompt-delta regularizer (`calc_prompt_emb_delta_loss`,
    `ldm/util.py:2278-2331`): ortho-subtracted comp-single deltas of the
    subject prompts aligned to those of the class prompts. Token weights
    ((m_single + m_comp)² / 4 with BOS excluded) follow the reference."""
    d_subj = ortho_subtract(subj_comp, subj_single)
    d_cls = ortho_subtract(cls_comp, cls_single)
    weights = None
    if single_mask is not None and comp_mask is not None:
        agg = single_mask.astype(jnp.float32) + comp_mask.astype(jnp.float32)
        weights = (agg ** 2 / 4.0).at[:, 0].set(0.0)  # exclude BOS
        weights = weights[None]  # broadcast over L
    return ref_cosine_loss(d_subj, d_cls, emb_weights=weights)


def embedding_norm_loss(emb: jnp.ndarray, target_norm: float = 1.0) -> jnp.ndarray:
    """Keep subject embedding norms near the typical CLIP token norm
    (`embedding_manager.embedding_reg_loss`, `embedding_manager.py:2098-2207`).
    eps inside the sqrt keeps the gradient finite at exactly-zero embeddings
    (the reference's init zeroes one basis set entirely)."""
    norms = jnp.sqrt(jnp.sum(jnp.square(emb.astype(jnp.float32)), axis=-1) + 1e-12)
    return jnp.mean(jnp.square(norms - target_norm))
