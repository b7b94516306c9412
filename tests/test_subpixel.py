"""Subpixel upsample+conv decomposition vs the naive resize+conv path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.ops.subpixel import (
    nearest_upsample2x_conv_reference,
    upsample2x_conv,
)


@pytest.mark.parametrize("h,w,cin,cout", [(8, 8, 16, 24), (5, 7, 8, 8)])
def test_matches_naive_upsample_conv(rng, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(cout).astype(np.float32))
    ref = nearest_upsample2x_conv_reference(x, k, b)
    out = upsample2x_conv(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grad_matches_naive(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    g1 = jax.grad(lambda x, k: (upsample2x_conv(x, k) ** 2).sum(),
                  argnums=(0, 1))(x, k)
    g2 = jax.grad(
        lambda x, k: (nearest_upsample2x_conv_reference(x, k) ** 2).sum(),
        argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


def test_bf16_grad_through_upsample(rng):
    """bf16 inputs must be differentiable (regression: conv with
    preferred_element_type=f32 tripped jax's VJP dtype check, breaking
    every bf16 training path through an Upsample)."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)), jnp.bfloat16)
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 8)), jnp.bfloat16)
    gx, gk = jax.grad(
        lambda x, k: upsample2x_conv(x, k).astype(jnp.float32).sum(),
        argnums=(0, 1))(x, k)
    assert gx.dtype == jnp.bfloat16 and gk.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    gx32, gk32 = jax.grad(
        lambda x, k: upsample2x_conv(x, k).sum(), argnums=(0, 1))(
        x.astype(jnp.float32), k.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(gx, np.float32), np.asarray(gx32),
                               atol=0.1, rtol=0.1)


def test_bf16_grad_through_unet_backbone(rng):
    """End-to-end: grads flow through a bf16 UNet (frozen-backbone training
    differentiates w.r.t. the context THROUGH every Upsample)."""
    from adaface_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.tiny()
    model = UNetModel(cfg, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 8, cfg.context_dim)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    g = jax.grad(lambda c: model.apply(
        {"params": params}, x, t, c).astype(jnp.float32).sum())(ctx)
    assert np.isfinite(np.asarray(g, np.float32)).all()
