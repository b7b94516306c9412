"""Sampler parity vs the reference DDIM/PLMS loops run with a synthetic
denoiser (the reference sampler classes are driven directly as oracles,
with a fake LatentDiffusion carrying only schedule buffers)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaface_tpu.ops.schedule import make_diffusion_schedule, make_ddim_schedule
from adaface_tpu.samplers import ddim_sample, plms_sample, make_cfg_eps_fn
from tests.reference_oracle import reference_available, import_reference_module

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference tree absent")

SHAPE = (2, 4, 8, 8)  # NCHW for the torch side


def synth_eps_np(x, t):
    """Deterministic synthetic eps used by both implementations.
    x: [B,C,H,W] numpy; t: [B] numpy."""
    return 0.1 * x + 0.01 * np.sin(t.astype(np.float64))[:, None, None, None].astype(np.float32)


class _FakeLDM(torch.nn.Module):
    """Just enough of LatentDiffusion for the reference samplers."""

    def __init__(self, guide_scale_splits=False):
        super().__init__()
        base = make_diffusion_schedule()
        t = lambda a: torch.tensor(np.asarray(a))
        self.register_buffer("betas", t(base.betas))
        self.register_buffer("alphas_cumprod", t(base.alphas_cumprod))
        self.register_buffer("alphas_cumprod_prev", t(base.alphas_cumprod_prev))
        self.num_timesteps = 1000
        self.device = torch.device("cpu")
        self.guide_scale_splits = guide_scale_splits

    def apply_model(self, x, t, c):
        if self.guide_scale_splits:
            # doubled batch (cond, uncond): make them differ deterministically
            e = torch.tensor(synth_eps_np(x.numpy(), t.numpy()))
            half = x.shape[0] // 2
            e[:half] = e[:half] + 0.05
            return e
        return torch.tensor(synth_eps_np(x.numpy(), t.numpy()))


def _patch_cpu(sampler):
    sampler.register_buffer = lambda name, attr: setattr(sampler, name, attr)
    return sampler


def test_ddim_no_cfg_matches_reference():
    m = import_reference_module("ldm.models.diffusion.ddim")
    fake = _FakeLDM()
    sampler = _patch_cpu(m.DDIMSampler(fake))
    x_T = np.random.default_rng(0).standard_normal(SHAPE).astype(np.float32)
    with torch.no_grad():
        ref, _ = sampler.sample(S=5, batch_size=2, shape=SHAPE[1:],
                                conditioning=torch.zeros(2, 1),
                                guidance_scale=[1.0, 1.0], x_T=torch.tensor(x_T),
                                verbose=False)
    ref = ref.numpy()

    def eps_fn(x, t, g):  # NHWC side, pure-jnp mirror of synth_eps_np
        return 0.1 * x + 0.01 * jnp.sin(t.astype(jnp.float32))[:, None, None, None]

    sched = make_ddim_schedule(make_diffusion_schedule(), 5, guidance_scale=1.0)
    out = ddim_sample(eps_fn, sched, jnp.asarray(np.moveaxis(x_T, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_ddim_cfg_annealed_matches_reference():
    m = import_reference_module("ldm.models.diffusion.ddim")
    fake = _FakeLDM(guide_scale_splits=True)
    sampler = _patch_cpu(m.DDIMSampler(fake))
    x_T = np.random.default_rng(1).standard_normal(SHAPE).astype(np.float32)
    with torch.no_grad():
        ref, _ = sampler.sample(S=6, batch_size=2, shape=SHAPE[1:],
                                conditioning=torch.zeros(2, 1),
                                guidance_scale=[10.0, 4.0],
                                unconditional_conditioning=torch.ones(2, 1),
                                x_T=torch.tensor(x_T), verbose=False)
    ref = ref.numpy()

    def eps_fn(x, t, g):
        e = 0.1 * x + 0.01 * jnp.sin(t.astype(jnp.float32))[:, None, None, None]
        e_c = e + 0.05
        return e + g * (e_c - e)  # e_u + g (e_c - e_u)

    sched = make_ddim_schedule(make_diffusion_schedule(), 6, guidance_scale=(10.0, 4.0))
    out = ddim_sample(eps_fn, sched, jnp.asarray(np.moveaxis(x_T, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_plms_matches_reference():
    m = import_reference_module("ldm.models.diffusion.plms")
    fake = _FakeLDM()
    sampler = _patch_cpu(m.PLMSSampler(fake))
    x_T = np.random.default_rng(2).standard_normal(SHAPE).astype(np.float32)
    with torch.no_grad():
        ref, _ = sampler.sample(S=8, batch_size=2, shape=SHAPE[1:],
                                conditioning=torch.zeros(2, 1),
                                unconditional_guidance_scale=1.0,
                                x_T=torch.tensor(x_T), verbose=False)
    ref = ref.numpy()

    def eps_fn(x, t, g):
        return 0.1 * x + 0.01 * jnp.sin(t.astype(jnp.float32))[:, None, None, None]

    sched = make_ddim_schedule(make_diffusion_schedule(), 8, guidance_scale=1.0)
    out = plms_sample(eps_fn, sched, jnp.asarray(np.moveaxis(x_T, 1, -1)), guide_scale=1.0)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_make_cfg_eps_fn_order():
    """(cond, uncond) concat order — cond must be the FIRST half."""
    calls = {}

    def apply_fn(x, t, ctx, ctx_k):
        calls["ctx"] = ctx
        b = x.shape[0]
        # eps = per-instance marker from context mean
        marker = ctx.mean(axis=(0, 2, 3))
        return jnp.broadcast_to(marker[:, None, None, None], x.shape)

    ctx_c = jnp.full((1, 2, 3, 4), 2.0)
    ctx_u = jnp.full((1, 2, 3, 4), 1.0)
    eps_fn = make_cfg_eps_fn(apply_fn, ctx_c, ctx_u)
    x = jnp.zeros((2, 2, 2, 1))
    out = eps_fn(x, jnp.array([0, 0]), jnp.float32(3.0))
    # e = e_u + 3*(e_c - e_u) = 1 + 3*(2-1) = 4
    np.testing.assert_allclose(np.asarray(out), 4.0, atol=1e-6)
    assert float(calls["ctx"][0, 0, 0, 0]) == 2.0  # cond first
    assert float(calls["ctx"][0, 2, 0, 0]) == 1.0  # uncond second
