"""Schedule math golden tests.

Golden values re-derived independently (float64 numpy) from the published
DDPM/DDIM formulas; known landmark values (ddim timesteps [1,21,...,981] for
50/1000 — documented in the reference `ddim.py:30-37`) are asserted exactly.
"""

import numpy as np

from adaface_tpu.ops import (
    make_beta_schedule,
    make_ddim_timesteps,
    make_diffusion_schedule,
    make_ddim_schedule,
)


def test_linear_betas_endpoints():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # sqrt-space linearity: sqrt(betas) is affine in index
    s = np.sqrt(betas)
    diffs = np.diff(s)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-9)


def test_ddim_timesteps_uniform_50():
    ts = make_ddim_timesteps(50, 1000)
    assert ts[0] == 1 and ts[-1] == 981
    assert len(ts) == 50
    assert np.all(np.diff(ts) == 20)


def test_alphas_cumprod_monotone():
    sched = make_diffusion_schedule()
    a = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(a) < 0)
    assert 0 < a[-1] < a[0] < 1


def test_ddim_schedule_order_and_sigma_eta0():
    base = make_diffusion_schedule()
    dd = make_ddim_schedule(base, 50, eta=0.0, guidance_scale=(10.0, 4.0))
    ts = np.asarray(dd.timesteps)
    assert ts[0] == 981 and ts[-1] == 1  # sampling order: high t first
    np.testing.assert_allclose(np.asarray(dd.sigmas), 0.0)
    # alphas_prev at sampling index i should equal alphas at index i+1
    a = np.asarray(dd.alphas)
    ap = np.asarray(dd.alphas_prev)
    np.testing.assert_allclose(ap[:-1], a[1:], rtol=1e-6)
    # final step's alpha_prev = alphas_cumprod[0]
    np.testing.assert_allclose(ap[-1], np.asarray(base.alphas_cumprod)[0], rtol=1e-6)


def test_guidance_annealing_linspace():
    base = make_diffusion_schedule()
    dd = make_ddim_schedule(base, 50, guidance_scale=(10.0, 4.0))
    g = np.asarray(dd.guidance_scales)
    np.testing.assert_allclose(g[0], 10.0)
    np.testing.assert_allclose(g[-1], 4.0)
    np.testing.assert_allclose(np.diff(g), np.diff(g)[0], rtol=1e-5)
    # scalar < 2 disables annealing (ddim.py:173-175)
    dd2 = make_ddim_schedule(base, 10, guidance_scale=1.5)
    np.testing.assert_allclose(np.asarray(dd2.guidance_scales), 1.5)


def test_q_sample_roundtrip():
    import jax.numpy as jnp

    sched = make_diffusion_schedule()
    x0 = jnp.ones((2, 4, 8, 8))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    xt = sched.q_sample(x0, t, noise)
    a = np.sqrt(np.asarray(sched.alphas_cumprod))
    np.testing.assert_allclose(np.asarray(xt[0]), a[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xt[1]), a[999], rtol=1e-5)
    # predict_x0_from_eps inverts q_sample when eps matches the noise used
    noise = jnp.full_like(x0, 0.5)
    xt = sched.q_sample(x0, t, noise)
    x0_rec = sched.predict_x0_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), 1.0, rtol=1e-4)
