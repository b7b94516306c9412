"""Compel CFG weighting + subj-comp K/V ortho loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.ops.compel import apply_compel_cfg, sample_compel_cfg
from adaface_tpu.training.losses import (
    comp_extra_token_mask,
    normalized_ortho_subtract,
    ortho_subtract,
    ref_cosine_loss,
    subj_comp_ortho_loss,
)


class TestCompel:
    def test_level_zero_is_identity(self):
        k = jax.random.PRNGKey(0)
        ctx = jax.random.normal(k, (16, 2, 7, 8))
        empty = jax.random.normal(jax.random.PRNGKey(1), (7, 8))
        out = apply_compel_cfg(ctx, empty, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ctx), rtol=1e-6)

    def test_weight_math(self):
        ctx = jnp.ones((1, 1, 3, 4)) * 3.0
        empty = jnp.ones((3, 4))
        out = apply_compel_cfg(ctx, empty, 2.0)
        np.testing.assert_allclose(np.asarray(out),
                                   (3 - 1) * 1.1 ** 2 + 1, rtol=1e-6)

    def test_batch_mask(self):
        ctx = jnp.stack([jnp.full((3, 4), 2.0), jnp.full((3, 4), 5.0)])
        empty = jnp.zeros((3, 4))
        out = apply_compel_cfg(ctx, empty, 1.0,
                               batch_mask=jnp.asarray([0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(out[0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), 5.0 * 1.1, rtol=1e-6)

    def test_skipped_tokens(self):
        ctx = jnp.full((2, 3, 4), 2.0)
        out = apply_compel_cfg(ctx, jnp.zeros((3, 4)), 1.0,
                               skipped_token_mask=jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(out[:, 0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, 1:]), 2.2, rtol=1e-6)

    def test_host_sampler(self):
        rng = np.random.default_rng(0)
        lvl, mask = sample_compel_cfg(rng, 0.0, (2, 2), 4)
        assert lvl == 0.0 and mask is None
        seen_masked = seen_all = False
        for _ in range(50):
            lvl, mask = sample_compel_cfg(rng, 1.0, (2.0, 2.0), 4)
            assert lvl == 2.0
            if mask is None:
                seen_all = True
            else:
                np.testing.assert_allclose(np.asarray(mask), [0, 0, 1, 1])
                seen_masked = True
        assert seen_all and seen_masked


class TestSubjCompOrtho:
    def _inputs(self, seed=0, H=2, T=12, D=8, layers=(7, 12)):
        k = jax.random.PRNGKey(seed)
        ks, vs, sc = {}, {}, {}
        for i, layer in enumerate(layers):
            k1, k2, k3, k = jax.random.split(jax.random.fold_in(k, i), 4)
            ks[layer] = jax.random.normal(k1, (4, H, T, D))
            vs[layer] = jax.random.normal(k2, (4, H, T, D))
            # positive logits: all-negative per-token means clamp to zero
            # weights, degenerating the weighted token means
            sc[layer] = jax.random.uniform(k3, (4, H, 16, T))
        subj = jnp.zeros((T,)).at[2:4].set(1.0)
        extra = jnp.zeros((T,)).at[5:9].set(1.0)
        return ks, vs, sc, subj, extra

    def test_finite_and_nonnegative(self):
        ks, vs, sc, subj, extra = self._inputs()
        lk, lv = subj_comp_ortho_loss(ks, vs, sc, subj, extra, subj, extra)
        assert np.isfinite(float(lk)) and np.isfinite(float(lv))
        assert float(lk) >= 0 and float(lv) >= 0

    def test_margin_zeroes_aligned_diffs(self):
        # identical subj and cls instances -> the two ortho diffs coincide
        # -> cosine loss 0 -> fully under the 0.6/0.7 margins
        ks, vs, sc, subj, extra = self._inputs()
        for d in (ks, vs, sc):
            for layer in d:
                d[layer] = d[layer].at[3].set(d[layer][1])
        lk, lv = subj_comp_ortho_loss(ks, vs, sc, subj, extra, subj, extra)
        assert float(lk) == 0.0 and float(lv) == 0.0

    def test_grads_flow_to_subject_side(self):
        ks, vs, sc, subj, extra = self._inputs()

        def f(ks):
            lk, lv = subj_comp_ortho_loss(ks, vs, sc, subj, extra,
                                          subj, extra)
            return lk + lv

        g = jax.grad(f)(ks)
        assert any(float(jnp.abs(v).max()) > 0
                   for v in jax.tree_util.tree_leaves(g))

    def test_jits(self):
        ks, vs, sc, subj, extra = self._inputs()
        f = jax.jit(lambda a, b, c: subj_comp_ortho_loss(
            a, b, c, subj, extra, subj, extra))
        lk, lv = f(ks, vs, sc)
        lk2, lv2 = subj_comp_ortho_loss(ks, vs, sc, subj, extra, subj, extra)
        np.testing.assert_allclose(float(lk), float(lk2), rtol=1e-5)
        np.testing.assert_allclose(float(lv), float(lv2), rtol=1e-5)


def test_normalized_ortho_subtract_orthogonal():
    a = jnp.asarray([[3.0, 1.0, 0.0]])
    b = jnp.asarray([[0.5, 2.0, 1.0]])
    d = normalized_ortho_subtract(a, b)
    assert abs(float(jnp.sum(d * b))) < 1e-4
    # reduces to plain ortho_subtract when norms already match
    a2 = a / jnp.linalg.norm(a)
    b2 = b / jnp.linalg.norm(b)
    np.testing.assert_allclose(np.asarray(normalized_ortho_subtract(a2, b2)),
                               np.asarray(ortho_subtract(a2, b2)), atol=1e-5)


def test_comp_extra_token_mask():
    pm = jnp.asarray([[1, 1, 1, 1, 1, 0, 0]], jnp.float32)
    subj = jnp.asarray([[0, 1, 1, 0, 0, 0, 0]], jnp.float32)
    bg = jnp.asarray([[0, 0, 0, 0, 1, 0, 0]], jnp.float32)
    m = comp_extra_token_mask(pm, subj, bg)
    np.testing.assert_allclose(np.asarray(m), [[1, 0, 0, 1, 0, 0, 0]])


def test_ref_cosine_loss_margin():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])  # orthogonal -> loss 1.0
    base = ref_cosine_loss(a, b, do_demean_first=False, ref_grad_scale=1.0)
    clamped = ref_cosine_loss(a, b, do_demean_first=False, ref_grad_scale=1.0,
                              margin=0.6)
    np.testing.assert_allclose(float(clamped), float(base) - 0.6, rtol=1e-5)
    assert float(ref_cosine_loss(a, a, do_demean_first=False,
                                 ref_grad_scale=1.0, margin=0.6)) == 0.0
