"""PLMS (pseudo linear multistep) sampler.

Equivalent of `ldm/models/diffusion/plms.py`: Adams–Bashforth multistep on
the eps predictions. The first three steps use the lower-order formulas
(with an extra model call at step 0), so they are unrolled in Python; the
remaining steps run as one `lax.scan` carrying the last three eps. PLMS in
the reference uses a FIXED guidance scale (no annealing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaface_tpu.ops.schedule import DDIMSchedule
from adaface_tpu.samplers.ddim import EpsFn, ddim_step


def plms_sample(eps_fn: EpsFn, sched: DDIMSchedule, x_T: jnp.ndarray,
                guide_scale: float = 7.5):
    b = x_T.shape[0]
    S = sched.num_steps
    g = jnp.float32(guide_scale)

    def consts(i):
        return (sched.timesteps[i], sched.alphas[i], sched.alphas_prev[i],
                sched.sqrt_one_minus_alphas[i], sched.sigmas[i])

    def model(x, t):
        return eps_fn(x, jnp.full((b,), t, dtype=jnp.int32), g)

    def update(x, e_prime, i):
        t, a, a_prev, s1m, sigma = consts(i)
        x_prev, _ = ddim_step(x, e_prime, a, a_prev, s1m, sigma, jnp.zeros_like(x))
        return x_prev

    x = x_T
    old_eps = []
    # ---- unrolled low-order steps (plms.py:176-191) ----
    for i in range(min(3, S)):
        t, a, a_prev, s1m, sigma = consts(i)
        e_t = model(x, t)
        if i == 0:
            # 2nd-order via an extra eval at t_next with the Euler x_prev
            x_prev1 = update(x, e_t, i)
            t_next = sched.timesteps[min(i + 1, S - 1)]
            e_next = model(x_prev1, t_next)
            e_prime = (e_t + e_next) / 2
        elif i == 1:
            e_prime = (3 * e_t - old_eps[-1]) / 2
        else:
            e_prime = (23 * e_t - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
        x = update(x, e_prime, i)
        old_eps.append(e_t)

    if S <= 3:
        return x

    # ---- steady-state 4th-order scan ----
    xs = (sched.timesteps[3:], sched.alphas[3:], sched.alphas_prev[3:],
          sched.sqrt_one_minus_alphas[3:], sched.sigmas[3:])
    eps_hist = jnp.stack(old_eps)  # [3, ...] oldest first

    def step(carry, per_step):
        x, hist = carry
        t, a, a_prev, s1m, sigma = per_step
        e_t = model(x, t)
        e_prime = (55 * e_t - 59 * hist[2] + 37 * hist[1] - 9 * hist[0]) / 24
        x_prev, _ = ddim_step(x, e_prime, a, a_prev, s1m, sigma, jnp.zeros_like(x))
        hist = jnp.stack([hist[1], hist[2], e_t])
        return (x_prev, hist), None

    (x, _), _ = jax.lax.scan(step, (x, eps_hist), xs)
    return x
