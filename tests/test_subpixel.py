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
