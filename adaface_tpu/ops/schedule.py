"""Diffusion noise schedules and DDIM sub-schedules.

Pure numpy/jnp re-derivation of the schedule math used by the reference
(`ldm/modules/diffusionmodules/util.py:21-76`, `ldm/models/diffusion/ddpm.py:244-296`,
`ldm/models/diffusion/ddim.py:28-68`). Everything is precomputed on host into
immutable pytrees so the sampler can be a pure `lax.scan` over per-step
constants — no Python control flow reaches the compiled graph.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 8.5e-4,
    linear_end: float = 1.2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule (float64 on host). Matches the reference's "linear"
    (sqrt-space linspace squared), "cosine", "sqrt_linear", "sqrt" variants
    (`ldm/modules/diffusionmodules/util.py:21-43`). SD v1.5 uses "linear"
    with start 0.00085, end 0.012 (`configs/.../v1-inference-ada.yaml:5-6`)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        t = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(t / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    method: str = "uniform",
) -> np.ndarray:
    """DDIM sub-schedule timestep indices, offset by +1 like the reference
    (`util.py:48-62`): uniform stride gives [1, 21, ..., 981] for 50/1000."""
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.arange(0, num_ddpm_timesteps, c)
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2).astype(int)
    else:
        raise ValueError(f"unknown ddim discretization {method!r}")
    # the +1 offset can land exactly on num_ddpm for non-divisor step counts
    # (e.g. 3 of 1000 -> [..., 1000]); the reference would index out of
    # bounds there (`util.py:48-76` only ever sees divisor counts) — clip.
    return np.unique(np.minimum(steps + 1, num_ddpm_timesteps - 1))


@struct.dataclass
class DiffusionSchedule:
    """Full-resolution (T=1000) schedule constants, the analog of the buffers
    registered in `ddpm.py:244-296`. All arrays have shape [T], float32."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False, default=1000)

    def q_sample(self, x_start, t, noise):
        """Forward noising q(x_t | x_0) (`ddpm.py:415-423`). `t` is [B] int32."""
        a = self.sqrt_alphas_cumprod[t].reshape(-1, *([1] * (x_start.ndim - 1)))
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, *([1] * (x_start.ndim - 1)))
        return a * x_start + s * noise

    def predict_x0_from_eps(self, x_t, t, eps):
        """x0 estimate from eps-parameterization (`ddpm.py:377-381`)."""
        ra = self.sqrt_recip_alphas_cumprod[t].reshape(-1, *([1] * (x_t.ndim - 1)))
        rm = self.sqrt_recipm1_alphas_cumprod[t].reshape(-1, *([1] * (x_t.ndim - 1)))
        return ra * x_t - rm * eps


@struct.dataclass
class DDIMSchedule:
    """Per-DDIM-step constants, laid out for `lax.scan` in *sampling order*
    (index 0 = highest t, e.g. t=981 for 50 steps). Mirrors
    `ddim.py:28-68` + the guidance-annealing loop (`ddim.py:169-218`):
    guidance scale anneals linearly max→min over the steps."""

    timesteps: jnp.ndarray  # [S] int32, descending (981, 961, ..., 1)
    alphas: jnp.ndarray  # [S] alpha_cumprod at each step
    alphas_prev: jnp.ndarray  # [S] alpha_cumprod at the *next* (lower-t) step
    sqrt_one_minus_alphas: jnp.ndarray  # [S]
    sigmas: jnp.ndarray  # [S] (zero when eta=0)
    guidance_scales: jnp.ndarray  # [S] annealed CFG scales
    num_steps: int = struct.field(pytree_node=False, default=50)


def make_diffusion_schedule(
    num_timesteps: int = 1000,
    schedule: str = "linear",
    linear_start: float = 8.5e-4,
    linear_end: float = 1.2e-2,
    cosine_s: float = 8e-3,
) -> DiffusionSchedule:
    betas = make_beta_schedule(schedule, num_timesteps, linear_start, linear_end, cosine_s)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        num_timesteps=num_timesteps,
    )


def make_ddim_schedule(
    base: DiffusionSchedule,
    num_ddim_steps: int,
    eta: float = 0.0,
    guidance_scale=(10.0, 4.0),
    method: str = "uniform",
) -> DDIMSchedule:
    """Build the per-step scan constants.

    `guidance_scale` may be a scalar or a (max, min) pair; a scalar s anneals
    s→min(2, s) exactly like `ddim.py:169-181` (so s<2 means no annealing).
    The reference updates the scale *after* each step by a constant delta
    (`ddim.py:215-218`), i.e. scale at step i is max - i*(max-min)/(S-1) —
    a linspace over sampling order.
    """
    ddim_ts = make_ddim_timesteps(num_ddim_steps, base.num_timesteps, method)
    # uniform stride can yield MORE steps than requested (e.g. 6 -> 7 at
    # T=1000); the reference sizes everything off the actual array
    # (`ddim.py:163` total_steps = timesteps.shape[0]) — so do we.
    num_ddim_steps = len(ddim_ts)
    acp = np.asarray(base.alphas_cumprod, dtype=np.float64)
    # The reference indexes alphacums[ddim_timesteps] with the +1 offset
    # already folded into ddim_timesteps (`util.py:65-76`).
    alphas = acp[ddim_ts]
    alphas_prev = np.concatenate([[acp[0]], alphas[:-1]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))

    if isinstance(guidance_scale, (list, tuple)):
        gmax, gmin = float(guidance_scale[0]), float(guidance_scale[1])
    else:
        gmax = float(guidance_scale)
        gmin = min(2.0, gmax)
    scales = np.linspace(gmax, gmin, num_ddim_steps)

    # Sampling order = reversed schedule order.
    rev = slice(None, None, -1)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMSchedule(
        timesteps=jnp.asarray(ddim_ts[rev], dtype=jnp.int32),
        alphas=f32(alphas[rev]),
        alphas_prev=f32(alphas_prev[rev]),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas[rev])),
        sigmas=f32(sigmas[rev]),
        guidance_scales=f32(scales),
        num_steps=num_ddim_steps,
    )
