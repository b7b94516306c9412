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


# ---------------------------------------------------------- packed layout
def _split_heads(t, h):
    b, l, w = t.shape
    d = w // h
    return t.reshape(b, l, h, d).transpose(0, 2, 1, 3)


def _merge_heads(t):
    b, h, l, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, l, h * d)


@pytest.mark.parametrize("l,heads,d", [(256, 8, 40), (512, 8, 80), (512, 4, 160)])
def test_packed_blc_matches_reference(rng, l, heads, d):
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b = 2
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    out = flash_attention_blc(q, k, v, heads)
    ref = _merge_heads(_reference_attention(
        _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads),
        None, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_qkv_fused_input(rng):
    from adaface_tpu.ops.flash_attention import flash_attention_qkv

    b, l, heads, d = 2, 256, 8, 40
    inner = heads * d
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * inner)).astype(np.float32))
    out = flash_attention_qkv(qkv, heads)
    q, k, v = (qkv[..., :inner], qkv[..., inner:2 * inner], qkv[..., 2 * inner:])
    ref = _merge_heads(_reference_attention(
        _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads),
        None, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_key_bias(rng):
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, l, heads, d = 2, 256, 8, 40
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    keep = rng.random((b, l)) > 0.3
    bias = jnp.where(jnp.asarray(keep), 0.0, -1e30).astype(jnp.float32)
    out = flash_attention_blc(q, q, q, heads, key_bias=bias)
    qh = _split_heads(q, heads)
    ref = _merge_heads(_reference_attention(qh, qh, qh, bias, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_grad_matches_reference(rng):
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, l, heads, d = 1, 256, 4, 40
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))

    def f_pack(q, k, v):
        return (flash_attention_blc(q, k, v, heads) ** 2).sum()

    def f_ref(q, k, v):
        o = _merge_heads(_reference_attention(
            _split_heads(q, heads), _split_heads(k, heads),
            _split_heads(v, heads), None, d ** -0.5))
        return (o ** 2).sum()

    g1 = jax.grad(f_pack, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_maxfree_guarded_parity(rng, monkeypatch):
    """ADAFACE_FLASH_MAXFREE=0 (guarded online recurrence) must agree with
    the max-free default on LN-scale inputs."""
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, l, heads, d = 1, 256, 4, 40
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    out_free = flash_attention_blc(q, q, q, heads)
    monkeypatch.setenv("ADAFACE_FLASH_MAXFREE", "0")
    out_guard = flash_attention_blc(q, q, q, heads)
    np.testing.assert_allclose(np.asarray(out_free), np.asarray(out_guard),
                               atol=2e-5)


def test_fused_ff_parity(rng, monkeypatch):
    from adaface_tpu.ops.fused_ff import ln_geglu_ff, _reference_ln_geglu_ff

    b, l, c = 2, 256, 64
    x = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray(0.05 * rng.standard_normal((c, 8 * c)).astype(np.float32))
    b1 = jnp.asarray(0.01 * rng.standard_normal(8 * c).astype(np.float32))
    w2 = jnp.asarray(0.05 * rng.standard_normal((4 * c, c)).astype(np.float32))
    b2 = jnp.asarray(0.01 * rng.standard_normal(c).astype(np.float32))
    ref = _reference_ln_geglu_ff(x, g, be, w1, b1, w2, b2, 1e-5)
    monkeypatch.setenv("ADAFACE_FUSED_FF", "1")
    out = ln_geglu_ff(x, g, be, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    grads = jax.grad(lambda *a: (ln_geglu_ff(*a) ** 2).sum(),
                     argnums=(0, 3, 5))(x, g, be, w1, b1, w2, b2)
    grads_ref = jax.grad(lambda *a: (_reference_ln_geglu_ff(*a, 1e-5) ** 2).sum(),
                         argnums=(0, 3, 5))(x, g, be, w1, b1, w2, b2)
    for a, b_ in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


@pytest.mark.parametrize("lk", [77, 100, 128])
def test_packed_short_lk_cross(rng, lk, monkeypatch):
    # cross-attention shape: Lk=77 keys padded to the 128-lane panel inside
    # flash_attention_blc (pad rows killed by a -1e30 key bias). The kernel
    # defaults OFF (end-to-end bench regression); opt in to test it.
    monkeypatch.setenv("ADAFACE_FLASH_CROSS", "1")
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, lq, heads, d = 2, 512, 8, 40
    q = jnp.asarray(rng.standard_normal((b, lq, heads * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, heads * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, heads * d)).astype(np.float32))
    out = flash_attention_blc(q, k, v, heads)
    ref = _merge_heads(_reference_attention(
        _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads),
        None, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_short_lk_cross_bias_and_grad(rng, monkeypatch):
    monkeypatch.setenv("ADAFACE_FLASH_CROSS", "1")
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, lq, lk, heads, d = 1, 256, 77, 4, 40
    q = jnp.asarray(rng.standard_normal((b, lq, heads * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, heads * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, heads * d)).astype(np.float32))
    keep = rng.random((b, lk)) > 0.3
    bias = jnp.where(jnp.asarray(keep), 0.0, -1e30).astype(jnp.float32)
    out = flash_attention_blc(q, k, v, heads, key_bias=bias)
    qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
    ref = _merge_heads(_reference_attention(qh, kh, vh, bias, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    loss = lambda q, k, v: flash_attention_blc(q, k, v, heads).sum()
    ref_loss = lambda q, k, v: _merge_heads(_reference_attention(
        _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads),
        None, d ** -0.5)).sum()
    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    assert gk.shape == k.shape and gv.shape == v.shape  # pad sliced back
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=3e-5)


@pytest.mark.parametrize("pvt2", ["0", "1"])
def test_packed_pvt2_parity(rng, monkeypatch, pvt2):
    # batched-head-transpose PVT variant must match the per-head kernel
    # bit-for-bit (same GEMMs, same softmax; only transpose granularity)
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    monkeypatch.setenv("ADAFACE_FLASH_PVT2", pvt2)
    b, l, heads, d = 2, 512, 4, 40
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    out = flash_attention_blc(q, k, v, heads)
    ref = _merge_heads(_reference_attention(
        _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads),
        None, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("env,atol", [
    ({"ADAFACE_FLASH_MXU_SUM": "1"}, 3e-5),
    ({"ADAFACE_FLASH_EXP_BF16": "1"}, 3e-2),
    ({"ADAFACE_FLASH_MXU_SUM": "1", "ADAFACE_FLASH_EXP_BF16": "1"}, 3e-2),
])
def test_packed_pvt_vpu_arms(rng, monkeypatch, env, atol):
    # PVT non-MXU A/B arms: ones-row MXU softmax denominator (numerically
    # the same sum, different reduction order) and bf16-quantized exp2
    # (input quantization |ds| <= |s| * 2^-9 -> loose tolerance).
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    for kk, vv in env.items():
        monkeypatch.setenv(kk, vv)
    b, l, heads, d = 2, 512, 4, 40
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    out = flash_attention_blc(q, k, v, heads)
    ref = _merge_heads(_reference_attention(
        _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads),
        None, d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_fully_masked_row_finite(rng):
    """A batch row whose key_bias masks EVERY key must yield finite,
    uniform attention (einsum semantics: equal logits -> uniform), not
    0/0 = NaN from the online kernels — regression for the _SCORE_FLOOR
    clamp."""
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, h, l, d = 2, 2, 256, 40
    q = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
    bias = jnp.where(jnp.arange(b)[:, None] == 0, -1e30, 0.0
                     ).astype(jnp.float32) * jnp.ones((b, l))
    out = flash_attention(q, k, v, key_bias=bias)
    assert np.isfinite(np.asarray(out)).all()
    ref = _reference_attention(q, k, v, bias, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # packed layout: short kernel (l<=256) and pvt kernel (l=512)
    for lp in (256, 512):
        heads = 4
        qp = jnp.asarray(rng.standard_normal((b, lp, heads * d)).astype(np.float32))
        bp = jnp.where(jnp.arange(b)[:, None] == 0, -1e30, 0.0
                       ).astype(jnp.float32) * jnp.ones((b, lp))
        outp = flash_attention_blc(qp, qp, qp, heads, key_bias=bp)
        assert np.isfinite(np.asarray(outp)).all()
        qh = _split_heads(qp, heads)
        refp = _merge_heads(_reference_attention(qh, qh, qh, bp, d ** -0.5))
        np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                                   atol=2e-5)


def test_einsum_bwd_arm_dbias_nonzero(rng, monkeypatch):
    """ADAFACE_FLASH_BWD=einsum must differentiate THROUGH key_bias like
    the default flash backward does (regression: the arm used to return
    an all-zeros bias cotangent in the packed layout)."""
    from adaface_tpu.ops.flash_attention import flash_attention_blc

    b, l, heads, d = 1, 256, 2, 40
    q = jnp.asarray(rng.standard_normal((b, l, heads * d)).astype(np.float32))
    keep = rng.random((b, l)) > 0.3
    bias0 = jnp.where(jnp.asarray(keep), 0.0, -30.0).astype(jnp.float32)

    def f(bias):
        return (flash_attention_blc(q, q, q, heads, key_bias=bias) ** 2).sum()

    def f_ref(bias):
        qh = _split_heads(q, heads)
        o = _merge_heads(_reference_attention(qh, qh, qh, bias, d ** -0.5))
        return (o ** 2).sum()

    g_ref = jax.grad(f_ref)(bias0)
    g_flash = jax.grad(f)(bias0)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                               atol=3e-4)
    monkeypatch.setenv("ADAFACE_FLASH_BWD", "einsum")
    g_einsum = jax.grad(f)(bias0)
    assert np.abs(np.asarray(g_einsum)).max() > 0
    np.testing.assert_allclose(np.asarray(g_einsum), np.asarray(g_ref),
                               atol=3e-4)
