"""Exponential moving average of a param pytree — the `LitEma` equivalent
(`ldm/modules/ema.py`, off by default like `v1-finetune-ada.yaml:25`).

Matches LitEma's warmup: effective decay = min(decay, (1 + n) / (10 + n))
with n the update count, so early updates average aggressively.
"""

from __future__ import annotations

import contextlib
from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: dict  # pytree matching the tracked params
    num_updates: jnp.ndarray  # scalar int32


def ema_init(params) -> EmaState:
    return EmaState(shadow=jax.tree_util.tree_map(jnp.asarray, params),
                    num_updates=jnp.asarray(0, jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p), state.shadow, params)
    return EmaState(shadow=shadow, num_updates=n)


def ema_params(state: EmaState) -> dict:
    """The shadow params (use inside `ema_scope` at eval)."""
    return state.shadow


@contextlib.contextmanager
def ema_scope(holder, attr: str, state: EmaState, context: str = ""):
    """Swap `holder.<attr>` for the EMA shadow inside the block — the
    reference's `LitEma` eval scope (`ddpm.py:310-323`: store live weights,
    copy shadow in, yield, restore). Typical use:

        with ema_scope(trainer.mgr, "embedders", trainer.ema_state,
                       "sampling"):
            pipe.generate(...)
    """
    if state is None:
        yield
        return
    live = getattr(holder, attr)
    setattr(holder, attr, ema_params(state))
    if context:
        print(f"{context}: switched to EMA weights")
    try:
        yield
    finally:
        setattr(holder, attr, live)
        if context:
            print(f"{context}: restored training weights")
