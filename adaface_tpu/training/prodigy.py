"""Prodigy (D-adaptation Adam) as an optax gradient transformation.

Re-implementation of the published Prodigy algorithm as used by the
reference (`ldm/prodigy.py`, configured LR=1, d_coef=10, betas (0.9, 0.999)
for zero-shot training — `ddpm.py:5192-5209`). The global d statistics are
scalar pytree reductions inside the jitted step; under data parallelism the
gradients entering here are already XLA-all-reduced (NamedSharding DP), so
the reference's explicit `dist.all_reduce` of (d_numerator, d_denom)
(`ldm/prodigy.py` fsdp branch) is implicit. For shard_map-style use where
grads are per-shard, pass `distributed_axis` to psum the statistics — the
direct analog of the NCCL all-reduce.

The schedule multiplier (SequentialLR stack) is threaded as an optax
schedule on `lr`.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    step: jnp.ndarray  # int32 k
    d: jnp.ndarray  # current d estimate
    d_max: jnp.ndarray
    d_numerator: jnp.ndarray  # carried (beta3-decayed) numerator
    exp_avg: Any  # m, pytree
    exp_avg_sq: Any  # v, pytree
    s: Any  # D-adaptation accumulator, pytree
    p0: Any  # initial params, pytree


def prodigy(
    learning_rate: Union[float, Callable[[jnp.ndarray], jnp.ndarray]] = 1.0,
    betas=(0.9, 0.999),
    beta3: Optional[float] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decouple: bool = True,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    growth_rate: float = float("inf"),
    safeguard_warmup: bool = False,
    use_bias_correction: bool = False,
    distributed_axis: Optional[str] = None,
) -> optax.GradientTransformation:
    b1, b2 = betas
    b3 = beta3 if beta3 is not None else b2 ** 0.5

    def sched_lr(step):
        return learning_rate(step) if callable(learning_rate) else learning_rate

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros((), jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.zeros((), jnp.float32),
            exp_avg=zeros(),
            exp_avg_sq=zeros(),
            s=zeros(),
            p0=jax.tree_util.tree_map(jnp.asarray, params),
        )

    def update_fn(grads, state: ProdigyState, params=None):
        if params is None:
            raise ValueError("prodigy requires params")
        k = state.step
        d = state.d
        lr = jnp.asarray(sched_lr(k), jnp.float32)
        if use_bias_correction:
            bc = jnp.sqrt(1 - b2 ** (k.astype(jnp.float32) + 1)) / (
                1 - b1 ** (k.astype(jnp.float32) + 1))
        else:
            bc = 1.0
        dlr = d * lr * bc

        # --- numerator: beta3 decay + (d/d0) dlr <g, p0 - p> summed over tree
        def dot(g, p0, p):
            return jnp.sum(g.astype(jnp.float32) * (p0 - p).astype(jnp.float32))

        dots = jax.tree_util.tree_map(dot, grads, state.p0, params)
        num_inc = (d / d0) * dlr * sum(jax.tree_util.tree_leaves(dots))
        d_numerator = state.d_numerator * b3 + num_inc

        # --- EMAs
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + d * (1 - b1) * g.astype(jnp.float32),
            state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + d * d * (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.exp_avg_sq, grads)
        s_coef = (d / d0) * (d if safeguard_warmup else dlr)
        s = jax.tree_util.tree_map(
            lambda s_, g: b3 * s_ + s_coef * g.astype(jnp.float32), state.s, grads)
        d_denom = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(s))

        if distributed_axis is not None:
            d_numerator = jax.lax.psum(d_numerator, distributed_axis)
            d_denom = jax.lax.psum(d_denom, distributed_axis)

        # --- d update (guard d_denom == 0: keep everything unchanged)
        d_hat = jnp.where(d_denom > 0, d_coef * d_numerator / jnp.maximum(d_denom, 1e-30), d)
        d_boot = jnp.where(d == d0, jnp.maximum(d, d_hat), d)
        d_max = jnp.maximum(state.d_max, d_hat)
        d_new = jnp.minimum(d_max, d_boot * growth_rate)
        d_new = jnp.where(d_denom > 0, d_new, d)
        d_max = jnp.where(d_denom > 0, d_max, state.d_max)

        # --- parameter update: -dlr * m / (sqrt(v) + d_new*eps), decoupled WD
        def upd(m, v, p):
            step_ = -dlr * m / (jnp.sqrt(v) + d_new * eps)
            if weight_decay != 0 and decouple:
                step_ = step_ - weight_decay * dlr * p.astype(jnp.float32)
            return step_.astype(p.dtype)

        updates = jax.tree_util.tree_map(upd, exp_avg, exp_avg_sq, params)
        new_state = ProdigyState(
            step=k + 1, d=d_new, d_max=d_max, d_numerator=d_numerator,
            exp_avg=exp_avg, exp_avg_sq=exp_avg_sq, s=s, p0=state.p0)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
