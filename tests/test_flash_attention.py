"""Flash attention kernel vs einsum reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.ops.flash_attention import flash_attention, _reference_attention


@pytest.mark.parametrize("lq,lk,d", [(256, 256, 40), (512, 512, 64), (256, 512, 80)])
def test_flash_matches_reference(rng, lq, lk, d):
    b, h = 2, 2
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)).astype(np.float32))
    out = flash_attention(q, k, v)
    ref = _reference_attention(q, k, v, None, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_key_bias_mask(rng):
    b, h, l, d = 1, 2, 256, 40
    q = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    keep = rng.random((b, l)) > 0.3
    bias = jnp.where(jnp.asarray(keep), 0.0, -1e30).astype(jnp.float32)
    out = flash_attention(q, k, v, key_bias=bias)
    ref = _reference_attention(q, k, v, bias, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_short_seq_fallback(rng):
    """Cross-attn shape (Lk=77) must route to the einsum path and still be
    exact."""
    b, h, lq, lk, d = 2, 4, 64, 77, 40
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)).astype(np.float32))
    out = flash_attention(q, k, v)
    ref = _reference_attention(q, k, v, None, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_grad_matches_reference(rng):
    b, h, l, d = 1, 1, 256, 40
    q = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    g1 = jax.grad(lambda q: flash_attention(q, k, v).sum())(q)
    g2 = jax.grad(lambda q: _reference_attention(q, k, v, None, d ** -0.5).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_flash_full_backward_all_operands(rng):
    """The round-3 Pallas backward (dq/dk/dv + key-bias grad) vs the einsum
    reference VJP, interpret mode."""
    b, h, l, d = 2, 2, 256, 40
    q = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    bias = jnp.asarray(
        np.where(rng.random((b, l)) > 0.2, 0.0, -1e30).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))

    def loss_flash(q, k, v, bias):
        return (flash_attention(q, k, v, key_bias=bias) * g).sum()

    def loss_ref(q, k, v, bias):
        return (_reference_attention(q, k, v, bias, d ** -0.5) * g).sum()

    grads = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    refs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for got, ref, name in zip(grads, refs, "q k v bias".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def test_flash_backward_no_bias_matches_einsum_arm(rng, monkeypatch):
    b, h, l, d = 1, 2, 256, 40
    q = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))

    def grads():
        return jax.grad(
            lambda q, k, v: (flash_attention(q, k, v) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)

    g_pallas = grads()
    monkeypatch.setenv("ADAFACE_FLASH_BWD", "einsum")
    g_einsum = grads()
    for a, b_, name in zip(g_pallas, g_einsum, "q k v".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=1e-3, err_msg=name)
