"""Loss battery vs torch-oracle formulas + behavioral invariants."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaface_tpu.training import losses as L
from adaface_tpu.training.mixing import (
    SYNC_LAYER_INDICES,
    gen_layer_cls_mix_scales,
    mix_static_vk_embeddings,
)


def test_ortho_subtract_oracle():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 5, 8)).astype(np.float32)
    b = rng.standard_normal((3, 5, 8)).astype(np.float32)
    ta, tb = torch.tensor(a), torch.tensor(b)
    w = (ta * tb).sum(-1) / ((tb * tb).sum(-1) + 1e-6)
    ref = ta - tb * w.unsqueeze(-1)
    out = L.ortho_subtract(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)
    # residual is orthogonal to b
    dots = np.einsum("...d,...d->...", np.asarray(out), b)
    np.testing.assert_allclose(dots, 0, atol=1e-4)


def test_ref_cosine_loss_oracle():
    """Matches the reference formula (`calc_ref_cosine_loss`): demean, ref
    signed-pow, cosine embedding loss."""
    rng = np.random.default_rng(1)
    d = rng.standard_normal((6, 8)).astype(np.float32)
    r = rng.standard_normal((6, 8)).astype(np.float32)
    td, tr = torch.tensor(d), torch.tensor(r)
    td2 = td - td.mean(-1, keepdim=True)
    tr2 = tr - tr.mean(-1, keepdim=True)
    exponent = 2
    tr_pow = tr2 * tr2.abs().pow(exponent - 1)
    ref = F.cosine_embedding_loss(td2, tr_pow, torch.ones(6),
                                  reduction="none").mean()
    out = L.ref_cosine_loss(jnp.asarray(d), jnp.asarray(r), exponent=2.0,
                            do_demean_first=True, ref_grad_scale=1.0)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_ref_cosine_loss_orthogonality_mode():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 8)).astype(np.float32)
    # aim_to_align=False penalizes positive cosine only (cos clamped at 0)
    out_same = L.ref_cosine_loss(jnp.asarray(a), jnp.asarray(a),
                                 do_demean_first=False, ref_grad_scale=1.0,
                                 aim_to_align=False, exponent=1.0)
    out_opp = L.ref_cosine_loss(jnp.asarray(a), jnp.asarray(-a),
                                do_demean_first=False, ref_grad_scale=1.0,
                                aim_to_align=False, exponent=1.0)
    assert float(out_same) > 0.99
    assert float(out_opp) < 1e-6


def test_masked_mean_instance_weights_and_sqr():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    m = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    np.testing.assert_allclose(float(L.masked_mean(x, m)), (1 + 3 + 4) / 3,
                               rtol=1e-6)
    np.testing.assert_allclose(float(L.masked_mean(x, m, do_sqr=True)),
                               (1 + 9 + 16) / 3, rtol=1e-6)
    iw = jnp.asarray([0.0, 1.0])
    np.testing.assert_allclose(float(L.masked_mean(x, m, instance_weights=iw)),
                               (3 + 4) / 2, rtol=1e-6)


def test_normalized_sum_preserves_total():
    losses = [jnp.asarray(0.1), jnp.asarray(2.0), jnp.asarray(0.5)]
    plain = float(L.normalized_sum(losses))
    np.testing.assert_allclose(plain, 2.6, rtol=1e-6)
    normed = float(L.normalized_sum(losses, norm_pow=0.5))
    np.testing.assert_allclose(normed, 2.6, rtol=1e-4)


def test_dyn_loss_scale_clamps():
    assert L.calc_dyn_loss_scale(1.0, 0, 2.0) == 0.0
    # loss/base ratio 3 clamps at max ratio 2
    assert L.calc_dyn_loss_scale(3.0, 1.0, 2.0) == 4.0
    # ratio 0.5 clamps at min ratio 1
    assert L.calc_dyn_loss_scale(0.5, 1.0, 2.0) == 2.0
    assert L.calc_dyn_loss_scale(1.5, 1.0, 2.0) == 3.0


def _fake_attn(rng, B=2, h=4, Q=16, T=12):
    a = rng.random((B, h, Q, T)).astype(np.float32)
    return jnp.asarray(a / a.sum(-1, keepdims=True))


def test_fg_mb_suppress_loss_behavior():
    rng = np.random.default_rng(3)
    B, T = 2, 12
    subj_mask = np.zeros((B, T), np.float32)
    subj_mask[:, 3:6] = 1.0
    fg = np.zeros((B, 8, 8, 1), np.float32)
    fg[:, :, :4] = 1.0  # left half fg

    # attention concentrated on fg -> low loss
    attn_good = np.full((B, 4, 16, T), 1e-4, np.float32)
    qgrid = np.arange(16).reshape(4, 4)
    fg_q = (qgrid % 4 < 2).reshape(-1)
    attn_good[:, :, fg_q, 3:6] = 0.3
    scores = {16: jnp.asarray(attn_good)}
    loss_good = float(L.fg_mb_suppress_loss(scores, jnp.asarray(subj_mask),
                                            jnp.asarray(fg)))
    # attention on bg -> high loss
    attn_bad = np.full((B, 4, 16, T), 1e-4, np.float32)
    attn_bad[:, :, ~fg_q, 3:6] = 0.3
    loss_bad = float(L.fg_mb_suppress_loss({16: jnp.asarray(attn_bad)},
                                           jnp.asarray(subj_mask),
                                           jnp.asarray(fg)))
    assert loss_bad > loss_good


def test_fg_bg_complementary_loss_runs():
    rng = np.random.default_rng(4)
    B, T = 2, 12
    subj_mask = np.zeros((B, T), np.float32)
    subj_mask[:, 3:6] = 1.0
    bg_mask = np.zeros((B, T), np.float32)
    bg_mask[:, 8:9] = 1.0
    fg = np.zeros((B, 8, 8, 1), np.float32)
    fg[:, 2:6, 2:6] = 1.0
    scores = {16: _fake_attn(rng), 17: _fake_attn(rng)}
    # K_fg=3/K_bg=1 are now derived from the masks (3 subj slots, 1 bg)
    comple, s_mb, b_mf, contrast = L.fg_bg_complementary_loss(
        scores, jnp.asarray(subj_mask), jnp.asarray(bg_mask),
        fg_mask=jnp.asarray(fg))
    for v in (comple, s_mb, b_mf, contrast):
        assert np.isfinite(float(v))
    # do_sqrt_norm (the wds variant): scores scale by 1/sqrt(K) per side,
    # so the pure-cosine complementary term is UNCHANGED while the
    # margin-hinge terms shift
    comple_sq, s_mb_sq, b_mf_sq, contrast_sq = L.fg_bg_complementary_loss(
        scores, jnp.asarray(subj_mask), jnp.asarray(bg_mask),
        fg_mask=jnp.asarray(fg), do_sqrt_norm=True)
    np.testing.assert_allclose(float(comple_sq), float(comple), rtol=1e-5)
    for v in (s_mb_sq, b_mf_sq, contrast_sq):
        assert np.isfinite(float(v))
    # identical attn maps for subj and bg -> highly non-complementary
    comple2, *_ = L.fg_bg_complementary_loss(
        scores, jnp.asarray(subj_mask), jnp.asarray(subj_mask),
        fg_mask=jnp.asarray(fg))
    assert float(comple2) > float(comple) * 0.99


def test_xlayer_consist_loss():
    rng = np.random.default_rng(5)
    B, T = 2, 12
    subj_mask = np.zeros((B, T), np.float32)
    subj_mask[:, 3] = 1.0
    a16 = _fake_attn(rng, Q=16)
    a64 = _fake_attn(rng, Q=64)
    fg_loss, bg_loss = L.fg_bg_xlayer_consist_loss(
        {16: a64, 12: a16}, jnp.asarray(subj_mask))
    assert np.isfinite(float(fg_loss))
    assert float(bg_loss) == 0.0


def test_delta_alignment_loss_aligned_pairs():
    rng = np.random.default_rng(6)
    base = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    delta = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    # perfectly parallel deltas -> near-zero ex_to_base loss
    out = L.delta_alignment_loss(base, base + delta, base * 1.1,
                                 base * 1.1 + delta)
    assert float(out["ex_to_base"]) < 0.2
    out_bad = L.delta_alignment_loss(base, base + delta, base * 1.1,
                                     base * 1.1 - delta)
    assert float(out_bad["ex_to_base"]) > float(out["ex_to_base"])


# ------------------------------------------------------------------ mixing

def test_layer_scales_ramp():
    s = gen_layer_cls_mix_scales(16, (1.0, 0.7))
    s = np.asarray(s)
    np.testing.assert_allclose(s[:4], 1.0)
    np.testing.assert_allclose(s[4], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[15], 0.7, atol=1e-6)
    assert np.all(np.diff(s[4:]) < 0)


def test_mix_static_vk_embeddings():
    rng = np.random.default_rng(7)
    Lz, B, T, D = 16, 2, 8, 6
    subj = jnp.asarray(rng.standard_normal((Lz, B, T, D)).astype(np.float32))
    cls = jnp.asarray(rng.standard_normal((Lz, B, T, D)).astype(np.float32))
    tok = np.zeros((B, T), np.float32)
    tok[:, 2:4] = 1.0

    subj_vk, mix_vk = mix_static_vk_embeddings(
        subj, cls, jnp.asarray(tok), training_percent=0.0,
        t_frac=jnp.asarray([1.0, 1.0]))
    assert subj_vk.shape == (Lz, B, 2 * T, D)
    assert mix_vk.shape == (Lz, B, 2 * T, D)
    # subject context is just token-doubled subject embeddings
    np.testing.assert_array_equal(np.asarray(subj_vk[:, :, :T]),
                                  np.asarray(subj))
    # t_frac=1, training_percent=0 -> blend=0 on sync layers: pure mix.
    # Non-sync layer 0: blend 0 as well -> mix everywhere.
    # At non-subject positions the mix equals the CLASS embedding.
    mix_v = np.asarray(mix_vk[:, :, :T])
    np.testing.assert_allclose(mix_v[0, :, 0], np.asarray(cls[0, :, 0]),
                               atol=1e-5)
    # K-context class scale is 1.0 -> subject slots in K are pure class
    mix_k = np.asarray(mix_vk[:, :, T:])
    np.testing.assert_allclose(mix_k[15, :, 2], np.asarray(cls[15, :, 2]),
                               atol=1e-5)
    # V-context final sync layer mixes 30% subject at subject slots
    expect = 0.7 * np.asarray(cls[15, :, 2]) + 0.3 * np.asarray(subj[15, :, 2])
    np.testing.assert_allclose(mix_v[15, :, 2], expect, atol=1e-5)

    # t_frac=0 -> sync layers become pure subject context
    _, mix_vk0 = mix_static_vk_embeddings(
        subj, cls, jnp.asarray(tok), training_percent=0.0,
        t_frac=jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(mix_vk0[15, :, :T]),
                               np.asarray(subj[15]), atol=1e-5)


def test_mix_grad_scale():
    """Gradients through the mixed branch are 0.05x (PROMPT_MIX_GRAD_SCALE)."""
    rng = np.random.default_rng(8)
    Lz, B, T, D = 16, 1, 4, 4
    subj = jnp.asarray(rng.standard_normal((Lz, B, T, D)).astype(np.float32))
    tok = jnp.asarray(np.ones((B, T), np.float32))

    def f(cls):
        _, mix = mix_static_vk_embeddings(subj, cls, tok, 0.0,
                                          t_frac=jnp.asarray([1.0]))
        return jnp.sum(mix)

    cls = jnp.asarray(rng.standard_normal((Lz, B, T, D)).astype(np.float32))
    g = jax.grad(f)(cls)
    # analytical: cls feeds the V and K halves once each, each grad-scaled
    # 0.05; at non-sync layer 0 with scale_mask=1 -> d sum/d cls = 0.1
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), 0.1, atol=1e-6)


def test_elastic_matching_loss_core():
    """Identical single/comp instances -> perfect transport: near-zero fg
    match and map misalignment; bg probs stay in [0, cutoff]."""
    rng = np.random.default_rng(10)
    C, N = 12, 16
    q1 = rng.standard_normal((1, C, N)).astype(np.float32) * 3
    f1 = rng.standard_normal((1, C, N)).astype(np.float32)
    ca_q = jnp.asarray(np.concatenate([q1, q1, q1, q1]))
    ca_f = jnp.asarray(np.concatenate([f1, f1, f1, f1]))
    fg = np.zeros((1, N), np.float32)
    fg[:, :8] = 1.0
    m_align, m_fg, m_bg, (sc_bg, mc_bg) = L.elastic_matching_loss(
        ca_q, ca_f, jnp.asarray(fg))
    assert float(m_align) < 1e-6  # identical maps
    assert np.all(np.asarray(sc_bg) >= 0) and np.all(np.asarray(sc_bg) <= 0.25)
    # shuffled comp features break the fg match
    perm = rng.permutation(N)
    f_bad = np.concatenate([f1, f1[:, :, perm], f1, f1[:, :, perm]])
    _, m_fg_bad, _, _ = L.elastic_matching_loss(ca_q, jnp.asarray(f_bad),
                                                jnp.asarray(fg))
    assert float(m_fg_bad) > float(m_fg)


def test_comp_fg_bg_preserve_loss_runs():
    rng = np.random.default_rng(11)
    B4, H, W, C, heads, T = 4, 8, 8, 12, 4, 10
    N = H * W
    outfeats = {16: jnp.asarray(rng.standard_normal((B4, H, W, C)), jnp.float32)}
    qs = {16: jnp.asarray(rng.standard_normal((B4, heads, N, 6)), jnp.float32)}
    attn = rng.random((B4, heads, N, T)).astype(np.float32)
    scores = {16: jnp.asarray(attn / attn.sum(-1, keepdims=True))}
    fg = np.zeros((1, 16, 16, 1), np.float32)
    fg[:, 4:12, 4:12] = 1.0
    subj_mask = np.zeros((4, T), np.float32)
    subj_mask[:, 3:5] = 1.0
    out = L.comp_fg_bg_preserve_loss(outfeats, qs, scores, jnp.asarray(fg),
                                     jnp.asarray(subj_mask))
    assert len(out) == 5
    for v in out:
        assert np.isfinite(float(v)), v
    # gradients flow and are finite
    def f(o):
        return sum(L.comp_fg_bg_preserve_loss({16: o}, qs, scores,
                                              jnp.asarray(fg),
                                              jnp.asarray(subj_mask)))
    g = jax.grad(f)(outfeats[16])
    assert np.isfinite(np.asarray(g)).all()


def test_padding_embs_align_loss():
    rng = np.random.default_rng(12)
    Lz, B, T, D = 4, 2, 10, 8
    embs = jnp.asarray(rng.standard_normal((Lz, B, T, D)), jnp.float32)
    prompt_mask = np.zeros((B, T), np.float32)
    prompt_mask[:, :6] = 1.0  # tokens 6.. are padding
    subj_mask = np.zeros((B, T), np.float32)
    subj_mask[:, 2:4] = 1.0
    bg_mask = np.zeros((B, T), np.float32)
    bg_mask[:, 5] = 1.0
    lp, lb = L.padding_embs_align_loss(embs, jnp.asarray(prompt_mask),
                                       jnp.asarray(subj_mask),
                                       jnp.asarray(bg_mask))
    assert np.isfinite(float(lp)) and np.isfinite(float(lb))
    # paddings identical to the subject embedding -> maximal loss
    subj_sum = np.einsum("lbtd,bt->bld", np.asarray(embs), subj_mask)
    embs2 = np.asarray(embs).copy()
    for t in range(6, T):
        embs2[:, :, t] = subj_sum.transpose(1, 0, 2)
    lp2, _ = L.padding_embs_align_loss(jnp.asarray(embs2),
                                       jnp.asarray(prompt_mask),
                                       jnp.asarray(subj_mask))
    assert float(lp2) > float(lp)


def test_prompt_emb_mask_excludes_padding():
    """`prompt_emb_mask` analog (`embedding_manager.py:1642`): BOS and the
    EOS-padded tail must drop out of the delta-loss token weights (eos is
    the pad token — an `ids > 0` mask would weight padding fully)."""
    import jax.numpy as jnp

    from adaface_tpu.training.train_step import BOS_ID, EOS_ID, _prompt_emb_mask

    ids = jnp.asarray([[BOS_ID, 5, 7, EOS_ID, EOS_ID]])
    np.testing.assert_array_equal(np.asarray(_prompt_emb_mask(ids))[0],
                                  [0, 1, 1, 0, 0])


def test_masked_recon_loss_img_mask():
    """`img_mask` (the aug valid-area mask) zeroes the augmentation margins
    out of the recon loss (`calc_recon_loss`, `ddpm.py:3567-3590`)."""
    from adaface_tpu.training.losses import masked_recon_loss

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    tgt = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    img = np.ones((1, 4, 4, 1), np.float32)
    img[:, 3:] = 0.0  # bottom row = empty aug margin
    fg = np.ones((1, 4, 4, 1), np.float32)
    base = float(masked_recon_loss(pred, tgt, fg, bg_weight=0.0,
                                   img_mask=img))
    # corrupting predictions inside the masked margin changes nothing
    pred2 = pred.copy()
    pred2[:, 3:] += 100.0
    corrupted = float(masked_recon_loss(pred2, tgt, fg, bg_weight=0.0,
                                        img_mask=img))
    assert base == pytest.approx(corrupted, rel=1e-6)
    # matches the plain mean over the valid area
    manual = float(np.mean((pred[:, :3] - tgt[:, :3]) ** 2))
    assert base == pytest.approx(manual, rel=1e-5)
    # img_mask alone (no fg weighting) also works
    only_img = float(masked_recon_loss(pred, tgt, None, img_mask=img))
    assert only_img == pytest.approx(manual, rel=1e-5)
