"""CFG stem dedup (UNetModel cfg_dedup): the (cond, uncond) halves of a
CFG batch share latents and timestep, so the model can run its stem once
at batch B and tile to 2B before the first cross-attention. Must be
numerically identical to the naive doubled batch (every stem op is
batch-elementwise)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.models.unet import UNetConfig, UNetModel

CFG = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                 attention_levels=(0, 1), num_heads=4, context_dim=64)
B, HW, T = 2, 16, 8


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNetModel(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32)
    t = jnp.array([500, 500], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 2 * B, T, CFG.context_dim)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, cfg_dedup=True)
    return model, params, x, t, ctx


def test_dedup_matches_doubled_batch(unet_and_params):
    model, params, x, t, ctx = unet_and_params
    naive = model.apply(params, jnp.concatenate([x, x], 0),
                        jnp.concatenate([t, t], 0), ctx)
    dedup = model.apply(params, x, t, ctx, cfg_dedup=True)
    assert dedup.shape == naive.shape == (2 * B, HW, HW, 4)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(naive),
                               rtol=1e-5, atol=1e-5)


def test_dedup_halves_differ_only_by_context(unet_and_params):
    model, params, x, t, _ = unet_and_params
    rng = np.random.default_rng(1)
    same = jnp.asarray(rng.standard_normal((1, 1, T, CFG.context_dim)),
                       jnp.float32)
    ctx_same = jnp.broadcast_to(same, (1, 2 * B, T, CFG.context_dim))
    out = model.apply(params, x, t, ctx_same, cfg_dedup=True)
    # identical contexts -> identical halves (the tile is exact)
    np.testing.assert_allclose(np.asarray(out[:B]), np.asarray(out[B:]),
                               rtol=1e-6, atol=1e-6)


def test_dedup_param_structure_unchanged(unet_and_params):
    model, params, x, t, ctx = unet_and_params
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.concatenate([x, x], 0), jnp.concatenate([t, t], 0),
                     ctx)
    a = jax.tree_util.tree_structure(params)
    b = jax.tree_util.tree_structure(ref)
    assert a == b


def test_dedup_guards(unet_and_params):
    model, params, x, t, ctx = unet_and_params
    with pytest.raises(ValueError):
        model.apply(params, x, t, ctx, cfg_dedup=True, capture=True)
    mask = jnp.ones((B, HW, HW, 1), jnp.float32)
    with pytest.raises(ValueError):
        model.apply(params, x, t, ctx, cfg_dedup=True, img_mask=mask)


def test_sampler_dedup_eps_matches():
    from adaface_tpu.samplers.ddim import make_cfg_eps_fn

    model = UNetModel(CFG)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32)
    t = jnp.array([10, 10], jnp.int32)
    cc = jnp.asarray(rng.standard_normal((1, B, T, CFG.context_dim)), jnp.float32)
    cu = jnp.asarray(rng.standard_normal((1, B, T, CFG.context_dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t,
                        jnp.concatenate([cc, cu], 1), cfg_dedup=True)

    def apply_naive(x, tt, c, ck):
        return model.apply(params, x, tt, c)

    def apply_dedup(x, tt, c, ck):
        return model.apply(params, x, tt, c, cfg_dedup=True)

    e_naive = make_cfg_eps_fn(apply_naive, cc, cu)(x, t, 5.0)
    e_dedup = make_cfg_eps_fn(apply_dedup, cc, cu, dedup=True)(x, t, 5.0)
    np.testing.assert_allclose(np.asarray(e_dedup), np.asarray(e_naive),
                               rtol=1e-5, atol=1e-5)


def test_cross_kv_cache_with_dedup(unet_and_params):
    """Hoisted cross-attn K/V (precompute_cross_kv) is identical to in-loop
    projection, composed with cfg_dedup (the sampling fast path)."""
    from adaface_tpu.models.unet import precompute_cross_kv

    model, params, x, t, ctx = unet_and_params
    kvs = precompute_cross_kv(params["params"], CFG, ctx, dtype=jnp.float32)
    base = model.apply(params, x, t, ctx, cfg_dedup=True)
    cached = model.apply(params, x, t, ctx, cfg_dedup=True, cross_kv=kvs)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))
