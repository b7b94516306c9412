"""LR schedules: the reference's scheduler stacks as pure step->multiplier
functions (usable as optax schedules).

- `lambda_warmup_cosine`: `ldm/lr_scheduler.py` LambdaWarmUpCosineScheduler
  (AdamW path): linear warmup lr_start->lr_max then cosine to lr_min.
- `prodigy_cycle_schedule`: the Prodigy path (`ddpm.py:5211-5268`):
  constant warmup at 1.0, then N cycles of Linear (PolynomialLR power=1
  over 1.1x cycle steps, floor ~0.09), CosineAnnealingWarmRestarts
  (eta_min 0.1), or CyclicLR (triangle 0.1<->1 starting at the top).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def lambda_warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                         lr_start: float, max_decay_steps: int) -> Callable:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) / max(warm_up_steps, 1) * step
        t = jnp.clip((step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 0, 1)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * math.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return sched


def prodigy_cycle_schedule(warm_up_steps: int, max_steps: int,
                           scheduler_type: str = "Linear",
                           num_cycles: int = 1) -> Callable:
    total_cycle_steps = max_steps - warm_up_steps
    if scheduler_type == "CyclicLR":
        eff_cycles = num_cycles - 0.5
    else:
        eff_cycles = float(num_cycles)
    single = total_cycle_steps / eff_cycles

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.maximum(step - warm_up_steps, 0.0)
        if scheduler_type == "Linear":
            # PolynomialLR(power=1, total_iters=cycle*1.1): linear 1 -> 1/11
            # within each cycle; cycles restart at the milestones.
            pos = jnp.mod(t, single)
            mult = jnp.clip(1.0 - pos / (single * 1.1), 1.0 / 11.0, 1.0)
        elif scheduler_type == "CosineAnnealingWarmRestarts":
            pos = jnp.mod(t, single) / single
            mult = 0.1 + 0.5 * (1.0 - 0.1) * (1 + jnp.cos(pos * math.pi))
        elif scheduler_type == "CyclicLR":
            # triangle wave 0.1 <-> 1.0, STARTING at the top (last_epoch
            # offset half cycle, ddpm.py:5256-5262)
            pos = jnp.mod(t + single / 2.0, single) / single  # 0..1
            tri = jnp.where(pos < 0.5, pos * 2, 2 - pos * 2)  # 0->1->0
            mult = 0.1 + (1.0 - 0.1) * tri
        else:
            raise NotImplementedError(scheduler_type)
        return jnp.where(step < warm_up_steps, 1.0, mult)

    return sched


def onecycle_schedule(max_lr: float, total_steps: int, div_factor: float = 10.0,
                      final_div_factor: float = 1.0, pct_start: float = 0.3) -> Callable:
    """torch OneCycleLR (cos annealing variant) — the delayed-AdamW schedule
    in the ProdigyAdamW dual-optimizer handoff (`ddpm.py:5270-5298`)."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up = total_steps * pct_start

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        t_up = jnp.clip(step / jnp.maximum(up, 1.0), 0, 1)
        lr_up = initial + (max_lr - initial) * 0.5 * (1 - jnp.cos(math.pi * t_up))
        t_dn = jnp.clip((step - up) / jnp.maximum(total_steps - up, 1.0), 0, 1)
        lr_dn = final + (max_lr - final) * 0.5 * (1 + jnp.cos(math.pi * t_dn))
        return jnp.where(step < up, lr_up, lr_dn)

    return sched
