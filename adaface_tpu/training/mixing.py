"""Class-subject V/K embedding mixing for compositional distillation.

Re-design of `mix_static_vk_embeddings` + `gen_emb_mixer`
(`ldm/util.py:1923-2061`) in the [L, B, T, D] layerwise layout (the
reference tucks layers into the batch dim). Semantics preserved:

- The V-context mixes the class embedding into the subject token slots
  with a per-layer scale ramping 1.0 -> 0.7 over the sync layers (so up to
  30% subject blends into the teacher's V); the K-context keeps the class
  embedding pure (ramp 1.0 -> 1.0). Non-subject positions take the CLASS
  embeddings (`mix_embeddings` 'add', `:1852-1882`).
- V and K contexts concatenate on the token dim -> [L, B, 2T, D]; the UNet
  splits them back (`openaimodel.py:885-896`; our UNet's native vk split).
- On sync layers, a t-dependent blend pulls the mixed context toward the
  plain subject context as t -> 0: subject proportion
  `1 - t_frac * (1 - training_percent * 0.3)` (`:2017-2045`).
- The mixed branch's gradient is scaled by 0.05 (`PROMPT_MIX_GRAD_SCALE`).

Returns (subj_vk, mix_vk), each [L, B, 2T, D] — the caller stacks them as
the (student, teacher) halves of the distillation batch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from adaface_tpu.training.losses import grad_scale

# CA layers 7,8,12,16..24 in ca-layer-index space (`ldm/util.py:1965-1967`)
SYNC_LAYER_INDICES = (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
PROMPT_MIX_GRAD_SCALE = 0.05


def gen_layer_cls_mix_scales(num_layers: int,
                             scale_range: Tuple[float, float],
                             sync_layers: Sequence[int] = SYNC_LAYER_INDICES
                             ) -> jnp.ndarray:
    """[L] per-layer class-mix scale: 1 outside sync layers; a linear ramp
    `scale_range[0] -> scale_range[1]` across them (`gen_emb_mixer`,
    `ldm/util.py:1928-1939`)."""
    scales = jnp.ones(num_layers)
    n = len(sync_layers)
    ramp = scale_range[0] + jnp.arange(n) * (
        (scale_range[1] - scale_range[0]) / max(n - 1, 1))
    return scales.at[jnp.asarray(sync_layers)].set(ramp)


def mix_embeddings_add(cls_emb: jnp.ndarray, subj_emb: jnp.ndarray,
                       subj_token_mask: jnp.ndarray,
                       layer_cls_scales: jnp.ndarray) -> jnp.ndarray:
    """[L, B, T, D] class-dominant mix: class everywhere, subject slots =
    cls*scale + subj*(1-scale) with per-layer scales."""
    scale = layer_cls_scales[:, None, None, None]
    tok = subj_token_mask.astype(cls_emb.dtype)[None, :, :, None]
    scale_mask = 1.0 - tok * (1.0 - scale)  # 1 off-slot, `scale` on-slot
    return cls_emb * scale_mask + subj_emb * (1.0 - scale_mask)


def mix_static_vk_embeddings(
    subj_emb: jnp.ndarray,  # [L, B, T, D]
    cls_emb: jnp.ndarray,  # [L, B, T, D]
    subj_token_mask: jnp.ndarray,  # [B, T] (1 at subject slots)
    training_percent: float,
    t_frac: jnp.ndarray,  # [B] or scalar in [0, 1]; t/T_max
    v_cls_scale_range: Tuple[float, float] = (1.0, 0.7),
    k_cls_scale_range: Tuple[float, float] = (1.0, 1.0),
    sync_layers: Sequence[int] = SYNC_LAYER_INDICES,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (subj_vk, mix_vk), each [L, B, 2T, D]: the plain subject
    context token-doubled, and the class-mixed (V; K) context."""
    L = subj_emb.shape[0]
    v_scales = gen_layer_cls_mix_scales(L, v_cls_scale_range, sync_layers)
    k_scales = gen_layer_cls_mix_scales(L, k_cls_scale_range, sync_layers)
    mix_v = mix_embeddings_add(cls_emb, subj_emb, subj_token_mask, v_scales)
    mix_k = mix_embeddings_add(cls_emb, subj_emb, subj_token_mask, k_scales)
    mix_all = jnp.concatenate([mix_v, mix_k], axis=2)  # [L, B, 2T, D]
    mix_all = grad_scale(mix_all, PROMPT_MIX_GRAD_SCALE)

    subj_vk = jnp.concatenate([subj_emb, subj_emb], axis=2)

    # t-dependent subject proportion on sync layers (`ldm/util.py:2017-2045`)
    t_frac = jnp.broadcast_to(jnp.asarray(t_frac, subj_emb.dtype),
                              (subj_emb.shape[1],))
    subj_prop = 1.0 - t_frac * (1.0 - training_percent * 0.3)  # [B]
    layer_sel = jnp.zeros(L).at[jnp.asarray(sync_layers)].set(1.0)
    blend = layer_sel[:, None] * subj_prop[None, :]  # [L, B]
    blend = blend[:, :, None, None]
    mix_vk = subj_vk * blend + mix_all * (1.0 - blend)
    return subj_vk, mix_vk
