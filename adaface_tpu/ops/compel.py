"""Compel-style CFG embedding weighting.

Re-derivation of `prob_apply_compel_cfg` (`ldm/util.py:2063-2094`) and its
UNet-forward call site (`openaimodel.py:898-916`): scale a prompt context's
offset from the EMPTY-prompt context by 1.1^level, so every token's
conditioning signal is amplified the way compel's `(token)1.1`-style
weighting does — but applied to the whole prompt at once.

TPU-native shape: the reference gates on `random.random()` inside the UNet
forward each call; here the stochastic decision (probability, level sample,
instance mask) happens on the host in `sample_compel_cfg`, and the jitted
math is the pure `apply_compel_cfg` below (level=0 is an exact no-op, so a
single compiled step covers both branches).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def apply_compel_cfg(
    context: jnp.ndarray,            # [..., B, T, D]
    empty_context: jnp.ndarray,      # [T, D] or broadcastable to context
    weight_level,                    # scalar (traced ok); weight = 1.1**level
    batch_mask: Optional[jnp.ndarray] = None,   # [B] 1 = apply
    skipped_token_mask: Optional[jnp.ndarray] = None,  # [T] 1 = keep original
) -> jnp.ndarray:
    """`layer_context2 = (ctx - empty) * 1.1**level + empty`
    (`ldm/util.py:2083-2092`), blended per instance by `batch_mask` and
    restored at `skipped_token_mask` tokens."""
    if isinstance(weight_level, (int, float)) and weight_level == 0:
        return context  # exact identity for the concrete not-applied case
    w = 1.1 ** jnp.asarray(weight_level, context.dtype)
    out = (context - empty_context) * w + empty_context
    if skipped_token_mask is not None:
        keep = skipped_token_mask.astype(context.dtype)[..., :, None]
        out = context * keep + out * (1.0 - keep)
    if batch_mask is not None:
        bm = batch_mask.astype(context.dtype)[..., :, None, None]
        out = out * bm + context * (1.0 - bm)
    return out


def sample_compel_cfg(rng, prob: float, level_or_range,
                      n_instances: int, is_training: bool = True
                      ) -> Tuple[float, Optional[jnp.ndarray]]:
    """Host-side sampling of (weight_level, batch_mask) per iteration
    (`prob_apply_compel_cfg` gating + the UNet's 50% subject-instance
    exemption, `openaimodel.py:899-911`). Returns level 0 (an exact no-op
    under `apply_compel_cfg`) when the probability gate fails.

    - training: 50% of applied iters exempt the first half of the batch
      (the subject instances of the 4-type compos batch);
    - inference: the caller passes the cond context only, so no mask.
    """
    if prob <= 0 or level_or_range is None or rng.random() > prob:
        return 0.0, None
    if isinstance(level_or_range, (list, tuple)):
        level = float(rng.uniform(level_or_range[0], level_or_range[1]))
    else:
        level = float(level_or_range)
    mask = None
    if is_training and rng.random() < 0.5:
        mask = jnp.ones((n_instances,), jnp.float32
                        ).at[: n_instances // 2].set(0.0)
    return level, mask
