"""Gradient-flow utilities.

TPU-native equivalents of the reference's autograd helpers:

- `scale_grad` replaces `ScaleGrad`/`gen_gradient_scaler`
  (`ldm/util.py:1324-1369`): identity forward, gradient multiplied by
  `alpha` on the way back. Used throughout the zero-shot stack
  (prompt2token_proj grad scale 0.4, hidden-state-layer weights scale 5,
  CLIP feature scales, ...). Expressed as a pure jnp identity so XLA fuses
  it away in the forward pass.
- `add_noise_to_tensor` replaces `ldm/util.py:2364-2379`: noise with std
  relative to the tensor's own std, optionally norm-preserving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_grad(x, alpha: float):
    """Identity in the forward pass; multiplies the cotangent by `alpha`.

    alpha=1 is a no-op, alpha=0 is `stop_gradient` — matching
    `gen_gradient_scaler` (`ldm/util.py:1360-1368`). Works on pytrees.
    """
    if alpha == 1:
        return x
    if alpha == 0:
        return jax.lax.stop_gradient(x)
    return jax.tree_util.tree_map(
        lambda t: t * alpha + jax.lax.stop_gradient(t * (1.0 - alpha)), x)


def add_noise_to_tensor(key: jax.Array, ts: jnp.ndarray, noise_std: float,
                        noise_std_is_relative: bool = True,
                        keep_norm: bool = False,
                        std_dim: int = -1, norm_dim: int = -1) -> jnp.ndarray:
    """Port of `ldm/util.py:2364-2379` (relative-std gaussian perturbation)."""
    if noise_std_is_relative:
        # the reference DETACHES the measured std (`:2367` .detach()) — it is
        # a magnitude reference; without the stop_gradient, rows with ~zero
        # variance produce NaN std-gradients
        noise_std = noise_std * jax.lax.stop_gradient(
            jnp.mean(jnp.std(ts, axis=std_dim)))
    noise = jax.random.normal(key, ts.shape, ts.dtype) * noise_std
    if keep_norm:
        orig_norm = jnp.linalg.norm(ts, axis=norm_dim, keepdims=True)
        out = ts + noise
        new_norm = jax.lax.stop_gradient(
            jnp.linalg.norm(out, axis=norm_dim, keepdims=True))
        return out * orig_norm / (new_norm + 1e-8)
    return ts + noise


def perturb_params(key: jax.Array, params, perturb_ratio: float = 0.2):
    """Multiplicative uniform perturbation of a trainable pytree — the
    reference's `perturb_model_parameters` (`embedding_manager.py:2064-2076`,
    each param scaled by U(1-ratio, 1+ratio) to inject randomness against
    overfitting when resuming)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [l * jax.random.uniform(k, l.shape, jnp.float32,
                                  1.0 - perturb_ratio,
                                  1.0 + perturb_ratio).astype(l.dtype)
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)
