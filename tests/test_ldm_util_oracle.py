"""Direct `ldm/util.py` oracles: the reference's own loss/mixing helpers
(imported from /root/reference, never copied) evaluated on random inputs
vs this repo's re-designs in the [L, B, T, D] layout. Stronger than the
formula-level tests in test_losses.py — these certify against the
reference CODE, including its per-sample averaging and layout quirks."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from tests.reference_oracle import (  # noqa: E402
    import_reference_module,
    reference_available,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference tree unavailable"),
]

L, T, D = 16, 11, 24


def _to_tucked(x_lbtd):
    """[L, B, T, D] numpy -> the reference's [B*L, T, D] per-instance-
    adjacent tucking (`embedding_manager.py:1341-1353`)."""
    import torch

    L_, B, T_, D_ = x_lbtd.shape
    return torch.tensor(
        np.transpose(x_lbtd, (1, 0, 2, 3)).reshape(B * L_, T_, D_))


def test_ortho_subtract_matches_reference():
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 7, D)).astype(np.float32)
    b = rng.standard_normal((5, 7, D)).astype(np.float32)
    ref = u.ortho_subtract(torch.tensor(a), torch.tensor(b)).numpy()
    from adaface_tpu.training.losses import ortho_subtract

    got = np.asarray(ortho_subtract(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ref_cosine_loss_matches_reference_per_instance_masks():
    """The reference loops instances and averages their per-instance
    weighted means — instances with DIFFERENT mask masses count equally
    (`ldm/util.py:456-540`). `instance_axis` reproduces that."""
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(1)
    B = 3
    delta = rng.standard_normal((B, L, T, D)).astype(np.float32)
    ref_d = rng.standard_normal((B, L, T, D)).astype(np.float32)
    # per-instance masks with different masses
    mask = np.zeros((B, 1, T, 1), np.float32)
    mask[0, :, :3] = 1.0
    mask[1, :, :7] = 0.5
    mask[2, :, :T] = 0.25
    ref = u.calc_ref_cosine_loss(
        torch.tensor(delta), torch.tensor(ref_d),
        emb_mask=torch.tensor(mask), exponent=2,
        do_demean_first=True, first_n_dims_to_flatten=3,
        ref_grad_scale=0.05, aim_to_align=True)
    ref = float(ref)  # already averaged over instances (`:535`)
    from adaface_tpu.training.losses import ref_cosine_loss

    # ours is [L, B, T, D]-native: transpose, weights [L?, B, T]
    got = float(ref_cosine_loss(
        jnp.asarray(np.transpose(delta, (1, 0, 2, 3))),
        jnp.asarray(np.transpose(ref_d, (1, 0, 2, 3))),
        emb_weights=jnp.asarray(mask[:, 0, :, 0])[None],
        exponent=2.0, do_demean_first=True, ref_grad_scale=0.05,
        aim_to_align=True, instance_axis=1))
    np.testing.assert_allclose(got, ref, rtol=3e-5)


def test_prompt_delta_loss_matches_reference():
    """`calc_prompt_emb_delta_loss` (`ldm/util.py:2278-2331`) on a 4-type
    battery with per-instance prompt lengths."""
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(2)
    B = 2
    types = rng.standard_normal((4, B, L, T, D)).astype(np.float32)
    # valid-token masks: single shorter than comp, different per instance
    single = np.zeros((B, T), np.float32)
    comp = np.zeros((B, T), np.float32)
    single[0, :4] = 1
    comp[0, :9] = 1
    single[1, :6] = 1
    comp[1, :T] = 1
    # reference input layouts: embeddings [4B, 16, 77, 768], mask [4B, 77, 1]
    static = torch.tensor(types.reshape(4 * B, L, T, D))
    pmask = torch.tensor(
        np.concatenate([single, comp, single, comp], 0)[..., None])
    ref = float(u.calc_prompt_emb_delta_loss(static, pmask))

    from adaface_tpu.training.losses import prompt_delta_loss

    ours_args = [jnp.asarray(np.transpose(types[i], (1, 0, 2, 3)))
                 for i in range(4)]
    got = float(prompt_delta_loss(*ours_args,
                                  single_mask=jnp.asarray(single),
                                  comp_mask=jnp.asarray(comp)))
    np.testing.assert_allclose(got, ref, rtol=3e-5)


def test_mix_static_vk_embeddings_matches_reference():
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(3)
    B = 2
    subj = rng.standard_normal((L, B, T, D)).astype(np.float32)
    cls = rng.standard_normal((L, B, T, D)).astype(np.float32)
    subj_cols = [2, 3, 4]
    t_frac = np.asarray([0.9, 0.35], np.float32)
    training_percent = 0.6

    c_static = torch.cat([_to_tucked(subj), _to_tucked(cls)], dim=0)
    out = u.mix_static_vk_embeddings(
        c_static, torch.tensor(subj_cols), training_percent,
        t_frac=torch.tensor(t_frac))
    c_vk = out[0].numpy()  # [2*B*L, 2T, D]: [subj_emb2 ; mix_emb]
    ref_subj_vk = np.transpose(
        c_vk[:B * L].reshape(B, L, 2 * T, D), (1, 0, 2, 3))
    ref_mix_vk = np.transpose(
        c_vk[B * L:].reshape(B, L, 2 * T, D), (1, 0, 2, 3))

    from adaface_tpu.training.mixing import mix_static_vk_embeddings

    mask = np.zeros((B, T), np.float32)
    mask[:, subj_cols] = 1.0
    subj_vk, mix_vk = mix_static_vk_embeddings(
        jnp.asarray(subj), jnp.asarray(cls), jnp.asarray(mask),
        training_percent, jnp.asarray(t_frac))
    np.testing.assert_allclose(np.asarray(subj_vk), ref_subj_vk,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mix_vk), ref_mix_vk,
                               rtol=1e-5, atol=1e-6)


def test_calc_dyn_loss_scale_matches_reference():
    import torch

    u = import_reference_module("ldm.util")
    from adaface_tpu.training.losses import calc_dyn_loss_scale

    for loss_val, base, scale_base in [(0.3, 0.2, 2.0), (0.01, 0.2, 2.0),
                                       (5.0, 0.2, 2.0), (0.3, 0.0, 2.0)]:
        ref = u.calc_dyn_loss_scale(torch.tensor(loss_val), base, scale_base)
        got = calc_dyn_loss_scale(loss_val, base, scale_base)
        assert float(got) == pytest.approx(float(ref), rel=1e-6), \
            (loss_val, base)


def test_distribute_embedding_matches_reference():
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((L, T, D)).astype(np.float32)  # one instance
    cols = [3, 4, 5, 6]
    ref = u.distribute_embedding_to_M_tokens(
        torch.tensor(x), torch.tensor(cols)).numpy()

    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    slot = np.full((1, T), -1, np.int32)
    slot[0, cols] = np.arange(len(cols))
    got = np.asarray(EmbeddingManager.distribute_cls_embeddings(
        jnp.asarray(x)[:, None], jnp.asarray(slot)))[:, 0]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # K=1 and no-placeholder instances pass through unchanged
    slot1 = np.full((1, T), -1, np.int32)
    slot1[0, 3] = 0
    same = np.asarray(EmbeddingManager.distribute_cls_embeddings(
        jnp.asarray(x)[:, None], jnp.asarray(slot1)))[:, 0]
    np.testing.assert_allclose(same, x, rtol=0, atol=0)


def test_elastic_matching_loss_matches_reference():
    """`calc_elastic_matching_loss` (`ldm/util.py:2481-2616`): q-similarity
    transport maps, map alignment, fg transport-reconstruction cosine, and
    soft-background comp-vs-mix match — our dense-mask static-shape form
    vs the reference's fg-column gathering."""
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(5)
    C, N = 40, 16
    ca_q = rng.standard_normal((4, C, N)).astype(np.float32)
    ca_feat = rng.standard_normal((4, C, N)).astype(np.float32)
    fg = (rng.random(N) < 0.4).astype(np.float32)
    fg[0] = 1.0  # non-empty

    r_map, r_fg, r_bg, r_sc_prob, r_mc_prob = u.calc_elastic_matching_loss(
        torch.tensor(ca_q), torch.tensor(ca_feat),
        torch.tensor(fg).reshape(1, 1, N))

    from adaface_tpu.training.losses import elastic_matching_loss

    g_map, g_fg, g_bg, (g_sc_prob, g_mc_prob) = elastic_matching_loss(
        jnp.asarray(ca_q), jnp.asarray(ca_feat), jnp.asarray(fg)[None])
    np.testing.assert_allclose(float(g_map), float(r_map), rtol=3e-5)
    np.testing.assert_allclose(float(g_fg), float(r_fg), rtol=3e-5)
    np.testing.assert_allclose(float(g_bg), float(r_bg), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(g_sc_prob).ravel(),
                               r_sc_prob.numpy().ravel(), rtol=3e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_mc_prob).ravel(),
                               r_mc_prob.numpy().ravel(), rtol=3e-5,
                               atol=1e-6)


def test_init_x_with_fg_matches_reference():
    """`init_x_with_fg_from_training_image` (`ldm/util.py:2403-2457`) with
    randomness pinned in both implementations (noise -> 0, scale and
    noise-amount -> fixed): masked noise-fill, bilinear fg down-scale,
    center pad, bool re-mask and annealed noise blend all line up."""
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(6)
    B, H, W = 2, 16, 16
    x = rng.standard_normal((B, H, W, 4)).astype(np.float32)
    m = np.zeros((B, H, W, 1), np.float32)
    m[0, 3:10, 4:12] = 1.0
    m[1, 2:14, 1:13] = 1.0  # large fg -> extra-scale branch

    SCALE, AMT = 0.85, 0.3
    # pin the reference's randomness
    orig_randn_like = torch.randn_like
    orig_uniform = u.np.random.uniform
    orig_rand_annealed = u.rand_annealed
    try:
        torch.randn_like = lambda t: torch.zeros_like(t)
        u.np.random.uniform = lambda lo, hi: SCALE
        u.rand_annealed = lambda *a, **k: AMT
        x_t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        m_t = torch.tensor(np.transpose(m, (0, 3, 1, 2)))
        rx, _rf, rff = u.init_x_with_fg_from_training_image(
            x_t, m_t, m_t, training_percent=0.5,
            fg_noise_anneal_mean_range=(0.1, 0.4))
    finally:
        torch.randn_like = orig_randn_like
        u.np.random.uniform = orig_uniform
        u.rand_annealed = orig_rand_annealed
    ref_x = np.transpose(rx.numpy(), (0, 2, 3, 1))
    ref_fgm = np.transpose(rff.numpy(), (0, 2, 3, 1))

    from adaface_tpu.training.x_init import init_x_with_fg_from_training_image

    class StubRng:
        def __init__(self):
            self.uniforms = [SCALE, AMT]

        def standard_normal(self, shape):
            return np.zeros(shape, np.float32)

        def uniform(self, lo, hi):
            return self.uniforms.pop(0)

    gx, gm = init_x_with_fg_from_training_image(
        StubRng(), x, m, training_percent=0.5)
    np.testing.assert_allclose(gm, (ref_fgm > 0).astype(np.float32),
                               rtol=0, atol=0)
    np.testing.assert_allclose(gx, ref_x, rtol=2e-4, atol=2e-5)


def test_compel_cfg_matches_reference():
    """`prob_apply_compel_cfg` (`ldm/util.py:2063-2094`) with the
    probability gate pinned open: offset-from-empty scaling by 1.1^level,
    per-instance batch mask, and skipped-token restoration."""
    import torch

    u = import_reference_module("ldm.util")
    rng = np.random.default_rng(7)
    B, T_, D_ = 4, 9, 12
    ctx = rng.standard_normal((B, T_, D_)).astype(np.float32)
    empty = rng.standard_normal((1, T_, D_)).astype(np.float32)
    bm = np.asarray([0, 1, 1, 0], np.float32)
    level = 2.0

    orig_random = u.random.random
    try:
        u.random.random = lambda: 0.0  # always apply
        ref = u.prob_apply_compel_cfg(
            torch.tensor(ctx), torch.tensor(empty), 1.0, level,
            batch_mask=torch.tensor(bm)).numpy()
    finally:
        u.random.random = orig_random

    from adaface_tpu.ops.compel import apply_compel_cfg

    got = np.asarray(apply_compel_cfg(
        jnp.asarray(ctx), jnp.asarray(empty), level,
        batch_mask=jnp.asarray(bm)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
    # unmasked instances keep the original context bit-exactly
    np.testing.assert_allclose(got[0], ctx[0], rtol=0, atol=0)


def test_probably_anneal_t_bounds_match_reference():
    """`probably_anneal_t` (`ldm/util.py:1748-1770`): with the keep-flip
    pinned to 'anneal' and the draw pinned to its lower bound, the
    per-element [lb, ub) rescale bounds arithmetic must match."""
    import torch

    u = import_reference_module("ldm.util")
    t = np.asarray([0, 3, 250, 700, 999], np.int64)
    T_total, ratio = 1000, (0.8, 1.3)

    captured = []
    orig_randint = u.np.random.randint
    orig_random = u.random.random
    try:
        u.random.random = lambda: 1.0  # never keep

        def rec(lo, hi):
            captured.append((int(lo), int(hi)))
            return lo

        u.np.random.randint = rec
        ref = u.probably_anneal_t(torch.tensor(t), 0.5, T_total,
                                  ratio).numpy()
    finally:
        u.np.random.randint = orig_randint
        u.random.random = orig_random

    from adaface_tpu.training.iter_plan import probably_anneal_t

    class SR:
        def random(self):
            return 1.0  # >= keep_p -> anneal

        def integers(self, lo, hi):
            return np.asarray(lo)

    got = probably_anneal_t(t, 0.5, T_total, ratio, rng=SR())
    np.testing.assert_array_equal(got, ref)
    # the ub side too (torch computes t*ratio in float32 — 700*1.3 -> 910
    # there but 911 in float64; our bounds mirror the float32 arithmetic)
    f32 = lambda ti, r: int(np.float32(ti) * np.float32(r))
    assert captured == [(min(max(f32(ti, ratio[0]), 0), T_total - 1),
                         min(f32(ti, ratio[1]) + 1, T_total))
                        for ti in t]


def _rand_attnscores(rng, layers, B, h, Q, T_):
    import torch

    scores = {}
    for l in layers:
        a = rng.random((B, h, Q, T_)).astype(np.float32)
        a = a / a.sum(-1, keepdims=True)  # softmax-like rows
        scores[l] = a
    return scores, {l: torch.tensor(v) for l, v in scores.items()}


def test_fg_bg_complementary_loss_matches_reference():
    """`calc_fg_bg_complementary_loss` (`ddpm.py:4039-4253`): the live
    recon-battery loss driven through the reference's own method (stub
    self — the bg path touches no instance state) vs our dense-mask form:
    complementary cosine + the three margin-contrast suppressions."""
    import torch
    import types

    d = import_reference_module("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(8)
    B, h, Q, T_ = 2, 2, 64, 12
    layers = [7, 8, 12, 16, 17, 18, 19, 20, 21, 22, 23, 24]
    scores_np, scores_t = _rand_attnscores(rng, layers, B, h, Q, T_)
    # K_fg=3 subject slots, K_bg=2 bg slots, different columns per instance
    subj_idx = (torch.tensor([0, 0, 0, 1, 1, 1]),
                torch.tensor([5, 6, 7, 4, 5, 6]))
    bg_idx = (torch.tensor([0, 0, 1, 1]), torch.tensor([9, 10, 8, 9]))
    fg = np.zeros((B, 16, 16), np.float32)
    fg[0, 2:9, 3:12] = 1.0
    fg[1, 5:14, 2:7] = 1.0
    inst = torch.ones(B)

    ref = d.LatentDiffusion.calc_fg_bg_complementary_loss(
        types.SimpleNamespace(), scores_t, subj_idx, bg_idx, BLOCK_SIZE=B,
        fg_grad_scale=0.1, fg_mask=torch.tensor(fg)[:, None],
        instance_mask=inst)
    ref = [float(x) for x in ref]

    from adaface_tpu.training.losses import fg_bg_complementary_loss

    subj_m = np.zeros((B, T_), np.float32)
    subj_m[0, [5, 6, 7]] = 1
    subj_m[1, [4, 5, 6]] = 1
    bg_m = np.zeros((B, T_), np.float32)
    bg_m[0, [9, 10]] = 1
    bg_m[1, [8, 9]] = 1
    got = fg_bg_complementary_loss(
        {l: jnp.asarray(v) for l, v in scores_np.items()},
        jnp.asarray(subj_m), jnp.asarray(bg_m), fg_mask=jnp.asarray(fg),
        instance_mask=jnp.ones(B), fg_grad_scale=0.1)
    got = [float(x) for x in got]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_fg_mb_suppress_loss_matches_reference():
    """`calc_fg_mb_suppress_loss` (`ddpm.py:3928-4037`) — the
    subject-only suppression arm used when no bg token rides along."""
    import torch
    import types

    d = import_reference_module("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(9)
    B, h, Q, T_ = 2, 2, 64, 12
    layers = [7, 8, 12, 16, 17, 18, 19, 20, 21, 22, 23, 24]
    scores_np, scores_t = _rand_attnscores(rng, layers, B, h, Q, T_)
    subj_idx = (torch.tensor([0, 0, 0, 1, 1, 1]),
                torch.tensor([5, 6, 7, 4, 5, 6]))
    fg = np.zeros((B, 16, 16), np.float32)
    fg[0, 1:6, 2:9] = 1.0
    fg[1, 8:15, 6:13] = 1.0

    ref = float(d.LatentDiffusion.calc_fg_mb_suppress_loss(
        types.SimpleNamespace(), scores_t, subj_idx, BLOCK_SIZE=B,
        fg_mask=torch.tensor(fg)[:, None], instance_mask=torch.ones(B)))

    from adaface_tpu.training.losses import fg_mb_suppress_loss

    subj_m = np.zeros((B, T_), np.float32)
    subj_m[0, [5, 6, 7]] = 1
    subj_m[1, [4, 5, 6]] = 1
    got = float(fg_mb_suppress_loss(
        {l: jnp.asarray(v) for l, v in scores_np.items()},
        jnp.asarray(subj_m), jnp.asarray(fg),
        instance_mask=jnp.ones(B)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_fg_bg_xlayer_consist_loss_matches_reference():
    """`calc_fg_bg_xlayer_consist_loss` (`ddpm.py:4255-4375`): each
    layer's head-averaged subject/bg attention map aligned with the layer
    below across resolutions (torch 2-tap bilinear downsample)."""
    import torch
    import types

    d = import_reference_module("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(10)
    B, h, T_ = 2, 2, 12
    layer_q = {7: 16, 8: 16, 12: 16, 16: 64, 17: 64, 18: 64}
    scores_np, scores_t = {}, {}
    for l, Q in layer_q.items():
        s, st = _rand_attnscores(rng, [l], B, h, Q, T_)
        scores_np[l] = s[l]
        scores_t[l] = st[l]
    subj_idx = (torch.tensor([0, 0, 0, 1, 1, 1]),
                torch.tensor([5, 6, 7, 4, 5, 6]))
    bg_idx = (torch.tensor([0, 0, 1, 1]), torch.tensor([9, 10, 8, 9]))

    ref_fg, ref_bg = d.LatentDiffusion.calc_fg_bg_xlayer_consist_loss(
        types.SimpleNamespace(), scores_t, subj_idx, bg_idx, SSB_SIZE=B)

    from adaface_tpu.training.losses import fg_bg_xlayer_consist_loss

    subj_m = np.zeros((B, T_), np.float32)
    subj_m[0, [5, 6, 7]] = 1
    subj_m[1, [4, 5, 6]] = 1
    bg_m = np.zeros((B, T_), np.float32)
    bg_m[0, [9, 10]] = 1
    bg_m[1, [8, 9]] = 1
    got_fg, got_bg = fg_bg_xlayer_consist_loss(
        {l: jnp.asarray(v) for l, v in scores_np.items()},
        jnp.asarray(subj_m), jnp.asarray(bg_m))
    np.testing.assert_allclose(float(got_fg), float(ref_fg), rtol=1e-4)
    np.testing.assert_allclose(float(got_bg), float(ref_bg), rtol=1e-4)


def test_prompt_mix_loss_matches_reference():
    """`calc_prompt_mix_loss` (`ddpm.py:3710-3925`) at one distill layer:
    attn delta alignment (exponent 3), attn norm distill, and the
    spatially-reweighted + avg-pooled feature delta alignment."""
    import torch
    import types

    d = import_reference_module("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(11)
    h, C, T_ = 2, 20, 12
    HW, Q = 16, 256
    layer = 16
    outfeat = rng.standard_normal((4, C, HW, HW)).astype(np.float32)
    attn = rng.random((4, h, Q, T_)).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    fg_2b = (torch.tensor([0, 0, 0, 1, 1, 1]),
             torch.tensor([5, 6, 7, 5, 6, 7]))  # K_fg=3, blocks ss/sc

    ref_feat, ref_attn_delta, ref_attn_norm = \
        d.LatentDiffusion.calc_prompt_mix_loss(
            types.SimpleNamespace(), {layer: torch.tensor(outfeat)}, None,
            {layer: torch.tensor(attn)}, fg_2b, BLOCK_SIZE=1)

    from adaface_tpu.training.losses import prompt_mix_layer_losses

    subj_m = np.zeros((T_,), np.float32)
    subj_m[[5, 6, 7]] = 1
    subj_attn = np.einsum("bhqt,t->bhq", attn, subj_m)
    got_feat, got_attn_delta, got_attn_norm = prompt_mix_layer_losses(
        jnp.asarray(np.transpose(outfeat, (0, 2, 3, 1))),
        jnp.asarray(subj_attn))
    # ours returns UNWEIGHTED per-layer losses (the train step applies the
    # normalized layer weights); the reference bakes them in — all three
    # of its tables are {7:.5, 8:.5, 12..24:1}, sum 11, so layer 16
    # carries 1/11
    w = 1.0 / 11.0
    np.testing.assert_allclose(float(got_attn_norm) * w,
                               float(ref_attn_norm), rtol=1e-4)
    np.testing.assert_allclose(float(got_attn_delta) * w,
                               float(ref_attn_delta), rtol=1e-4)
    np.testing.assert_allclose(float(got_feat) * w, float(ref_feat),
                               rtol=1e-4)


def test_comp_fg_bg_preserve_loss_matches_reference():
    """`calc_comp_fg_bg_preserve_loss` (`ddpm.py:4385-4549`) at a
    no-pooling layer (8x8 features): channel-fold of q, feature LayerNorm,
    elastic matching, and the soft-bg attention suppressions. The learned
    `ca_outfeat_lns` are replaced by affine-free LayerNorms on both sides
    (our re-design standardizes parameter-free)."""
    import torch
    import types

    d = import_reference_module("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(12)
    h, C, dh, T_ = 2, 20, 16, 12
    HW, Q = 8, 64
    layer = 7
    outfeat = rng.standard_normal((4, C, HW, HW)).astype(np.float32)
    q = rng.standard_normal((4, h, Q, dh)).astype(np.float32)
    attn = rng.random((4, h, Q, T_)).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    fg = np.zeros((1, 16, 16), np.float32)
    fg[0, 3:11, 2:10] = 1.0
    subj_idx = (torch.tensor([0, 0, 0]), torch.tensor([5, 6, 7]))

    lns = {str(layer): torch.nn.LayerNorm(C, elementwise_affine=False)}
    ref = d.LatentDiffusion.calc_comp_fg_bg_preserve_loss(
        types.SimpleNamespace(),
        {layer: torch.tensor(outfeat)}, lns,
        {layer: torch.tensor(q)}, None,
        {layer: torch.tensor(attn)},
        fg_mask=torch.tensor(fg)[:, None],  # [1, 1, 16, 16]
        batch_have_fg_mask=torch.ones(1),
        subj_indices=subj_idx, BLOCK_SIZE=1)
    # (map_align, sc_ss, mc_ms(disabled=0), sc_mc, subj_sup, mix_sup)
    ref5 = [float(ref[i]) for i in (0, 1, 3, 4, 5)]

    from adaface_tpu.training.losses import comp_fg_bg_preserve_loss

    subj_m = np.zeros((4, T_), np.float32)
    subj_m[:, [5, 6, 7]] = 1  # token-aligned across the 4 blocks
    got = comp_fg_bg_preserve_loss(
        {layer: jnp.asarray(np.transpose(outfeat, (0, 2, 3, 1)))},
        {layer: jnp.asarray(q)},
        {layer: jnp.asarray(attn)},
        fg_mask=jnp.asarray(fg)[..., None],  # [1, 16, 16, 1]
        subj_token_mask=jnp.asarray(subj_m))
    got5 = [float(x) for x in got]
    np.testing.assert_allclose(got5, ref5, rtol=2e-3, atol=1e-6)
