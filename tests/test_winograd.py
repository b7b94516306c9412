"""Parity tests for the fused Winograd F(2x2, 3x3) conv kernel."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.ops.winograd import (
    conv3x3_same, direct_conv3x3, transform_weights, winograd_conv3x3,
    winograd_eligible)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def test_weight_transform_reproduces_conv_on_one_tile():
    # F(2,3) identity check: winograd of a single 4x4 tile == direct conv
    g = np.asarray(_rand(0, (3, 3, 1, 1)))[:, :, 0, 0]
    d = np.asarray(_rand(1, (4, 4)))
    BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
                  np.float32)
    G = np.array([[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]],
                 np.float32)
    AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)
    u = G @ g @ G.T
    t = BT @ d @ BT.T
    y = AT @ (u * t) @ AT.T
    ref = np.array([[np.sum(g * d[a:a + 3, b:b + 3]) for b in range(2)]
                    for a in range(2)])
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 8, 128), 128),
    ((1, 16, 8, 192), 128),   # H != W, Cin not a lane multiple
    ((2, 8, 8, 128), 256),
])
def test_winograd_matches_direct_fp32(shape, cout):
    x = _rand(0, shape)
    k = _rand(1, (3, 3, shape[-1], cout)) * 0.1
    b = _rand(2, (cout,))
    got = winograd_conv3x3(x, k, b)
    want = direct_conv3x3(x, k, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_winograd_matches_direct_bf16():
    x = _rand(0, (2, 8, 8, 128), jnp.bfloat16)
    k = _rand(1, (3, 3, 128, 128), jnp.bfloat16) * 0.1
    b = _rand(2, (128,), jnp.bfloat16)
    got = np.asarray(winograd_conv3x3(x, k, b), np.float32)
    want = np.asarray(direct_conv3x3(x, k, b), np.float32)
    scale = max(1.0, float(np.abs(want).max()))
    assert np.max(np.abs(got - want)) / scale < 0.05


def test_gradients_match_direct_conv():
    x = _rand(0, (1, 8, 8, 128))
    k = _rand(1, (3, 3, 128, 128)) * 0.1
    b = _rand(2, (128,))

    def loss_w(x, k, b):
        return (winograd_conv3x3(x, k, b) ** 2).sum()

    def loss_d(x, k, b):
        return (direct_conv3x3(x, k, b) ** 2).sum()

    gw = jax.grad(loss_w, argnums=(0, 1, 2))(x, k, b)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(gw, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-3, atol=5e-3)


def test_dispatch_gates():
    # OFF by default (measured negative result): nothing dispatches with
    # the env unset or =0
    assert not winograd_eligible((1, 64, 64, 320), 320)
    os.environ["ADAFACE_WINOGRAD"] = "0"
    assert not winograd_eligible((1, 64, 64, 320), 320)
    # auto: heuristic gates (odd spatial / tiny tiles / thin lanes)
    os.environ["ADAFACE_WINOGRAD"] = "auto"
    try:
        assert winograd_eligible((1, 64, 64, 320), 320)
        assert not winograd_eligible((1, 7, 8, 320), 320)
        assert not winograd_eligible((1, 8, 8, 320), 320)  # 16 tiles < 256
        os.environ["ADAFACE_WINOGRAD_MIN_TILES"] = "16"
        assert winograd_eligible((1, 8, 8, 320), 320)
        assert not winograd_eligible((1, 8, 8, 64), 320)  # thin Cin
        # force mode skips the heuristics but not shape legality
        os.environ["ADAFACE_WINOGRAD"] = "1"
        assert winograd_eligible((1, 8, 8, 64), 320)
        assert not winograd_eligible((1, 7, 8, 320), 320)
    finally:
        os.environ.pop("ADAFACE_WINOGRAD", None)
        os.environ.pop("ADAFACE_WINOGRAD_MIN_TILES", None)


def test_conv3x3_same_dispatcher_parity():
    os.environ["ADAFACE_WINOGRAD"] = "auto"
    os.environ["ADAFACE_WINOGRAD_MIN_TILES"] = "16"
    try:
        x = _rand(0, (1, 8, 8, 128))
        k = _rand(1, (3, 3, 128, 128)) * 0.1
        b = _rand(2, (128,))
        on = conv3x3_same(x, k, b, enabled=True)
        off = conv3x3_same(x, k, b, enabled=False)
        np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                                   rtol=2e-4, atol=2e-4)
    finally:
        os.environ.pop("ADAFACE_WINOGRAD", None)
        os.environ.pop("ADAFACE_WINOGRAD_MIN_TILES", None)


def test_transform_weights_shape():
    k = _rand(0, (3, 3, 64, 96))
    u = transform_weights(k)
    assert u.shape == (16, 64, 96)
