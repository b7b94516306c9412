"""Core-op parity tests vs torch (CPU) implementations of the same math."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from adaface_tpu.ops import (
    timestep_embedding,
    group_norm,
    layer_norm,
    quick_gelu,
    multi_head_attention,
)


def test_timestep_embedding_matches_formula(rng):
    t = jnp.array([0, 1, 500, 999])
    emb = timestep_embedding(t, 320)
    assert emb.shape == (4, 320)
    # cos-half first: at t=0 cos(0)=1, sin(0)=0
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)
    # independent torch re-derivation
    import math

    half = 160
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = torch.tensor([0, 1, 500, 999], dtype=torch.float32)[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    # fp32 trig range reduction differs between XLA and torch for args ~1e3 rad;
    # ~2e-3 abs divergence is inherent to the dtype, not an implementation bug.
    np.testing.assert_allclose(np.asarray(emb), ref.numpy(), atol=3e-3)


def test_group_norm_vs_torch(rng):
    x = rng.standard_normal((2, 7, 5, 64)).astype(np.float32)  # NHWC
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    out = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), num_groups=32, eps=1e-6)
    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW for torch
    ref = F.group_norm(xt, 32, torch.tensor(scale), torch.tensor(bias), eps=1e-6)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_group_norm_large_common_mode(rng, monkeypatch):
    """Large common-mode offset (mean^2 >> var): the default one-pass
    E[x^2]-mean^2 loses all significant bits (exactly like torch's own
    fp32 GN kernel on the same input); ADAFACE_GN_SHIFT=1 opts into the
    probe-shifted moments that stay accurate."""
    monkeypatch.setenv("ADAFACE_GN_SHIFT", "1")
    x = (rng.standard_normal((2, 16, 16, 64)).astype(np.float32) * 0.01
         + 100.0)  # var ~ 1e-4, mean^2 = 1e4 -> 1e8x cancellation ratio
    scale = np.ones(64, np.float32)
    bias = np.zeros(64, np.float32)
    out = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                     num_groups=32, eps=1e-6)
    # float64 analytic reference (torch fp32 GN ALSO cancels on this input
    # — its CPU kernel loses the group variance the same way)
    x64 = x.astype(np.float64).reshape(2, 16 * 16, 32, 2)
    mu = x64.mean(axis=(1, 3), keepdims=True)
    var = x64.var(axis=(1, 3), keepdims=True)
    ref = ((x64 - mu) / np.sqrt(var + 1e-6)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-3)
    # normalized output must have ~unit std, not collapse to rsqrt(eps)
    assert 0.9 < float(np.std(np.asarray(out))) < 1.1


def test_layer_norm_vs_torch(rng):
    x = rng.standard_normal((3, 11, 768)).astype(np.float32)
    scale = rng.standard_normal(768).astype(np.float32)
    bias = rng.standard_normal(768).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), eps=1e-5)
    ref = F.layer_norm(torch.tensor(x), (768,), torch.tensor(scale), torch.tensor(bias), eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_quick_gelu_vs_torch(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    out = quick_gelu(jnp.asarray(x))
    xt = torch.tensor(x)
    ref = xt * torch.sigmoid(1.702 * xt)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_mha_vs_torch_sdpa(rng):
    b, lq, lk, h, d = 2, 9, 13, 4, 16
    q = rng.standard_normal((b, lq, h * d)).astype(np.float32)
    k = rng.standard_normal((b, lk, h * d)).astype(np.float32)
    v = rng.standard_normal((b, lk, h * d)).astype(np.float32)
    out = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h)

    def split(x, l):
        return torch.tensor(x).reshape(b, l, h, d).permute(0, 2, 1, 3)

    ref = F.scaled_dot_product_attention(split(q, lq), split(k, lk), split(v, lk))
    ref = ref.permute(0, 2, 1, 3).reshape(b, lq, h * d).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_mha_mask(rng):
    b, l, h, d = 1, 6, 2, 8
    q = rng.standard_normal((b, l, h * d)).astype(np.float32)
    k = rng.standard_normal((b, l, h * d)).astype(np.float32)
    v = rng.standard_normal((b, l, h * d)).astype(np.float32)
    # mask out the last 2 keys entirely
    mask = np.ones((b, 1, l, l), dtype=bool)
    mask[..., -2:] = False
    out, probs = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h,
        mask=jnp.asarray(mask), return_probs=True,
    )
    p = np.asarray(probs)
    np.testing.assert_allclose(p[..., -2:], 0.0, atol=1e-7)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_fused_group_norm_silu_matches_plain():
    import jax
    import jax.numpy as jnp

    from adaface_tpu.ops.basic import group_norm
    from adaface_tpu.ops.fused_norm import group_norm_silu

    rng = np.random.default_rng(0)
    # SD-style channels (320, not lane-aligned) take the Pallas path
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 320)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(320), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(320), jnp.float32)
    fused = group_norm_silu(x, scale, bias, 32, 1e-5)
    plain = jax.nn.silu(group_norm(x, scale, bias, 32, 1e-5))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=2e-5)
    # spatially unaligned slabs (n % 8 != 0) fall back to the plain path
    x2 = jnp.asarray(rng.standard_normal((2, 3, 3, 320)), jnp.float32)
    s2 = jnp.ones(320)
    b2 = jnp.zeros(320)
    f2 = group_norm_silu(x2, s2, b2, 32, 1e-5)
    p2 = jax.nn.silu(group_norm(x2, s2, b2, 32, 1e-5))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(p2), atol=2e-5)
    # gradients flow and match the plain implementation
    g_f = jax.grad(lambda x: group_norm_silu(x, scale, bias, 32, 1e-5).sum())(x)
    g_p = jax.grad(lambda x: jax.nn.silu(group_norm(x, scale, bias, 32, 1e-5)).sum())(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p), atol=2e-4)
