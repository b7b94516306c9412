"""Training losses.

Re-derivations of the reference's loss battery (`ddpm.py:3457-4779`,
SURVEY.md §2.6): masked reconstruction, prompt-delta regularization, the
attention suppression/complementarity/cross-layer-consistency family,
delta alignment, elastic matching (comp fg/bg preservation), padding
orthogonality, and the shared helpers (ortho subtract, weighted cosine,
masked means, normalized sums, dynamic scales). Dense-mask (static shape)
forms throughout; per-CA-layer weight tables match the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_recon_loss(
    eps_pred: jnp.ndarray,  # [B, H, W, C]
    eps_target: jnp.ndarray,
    fg_mask: Optional[jnp.ndarray] = None,  # [B, H, W, 1] in latent space
    bg_weight: float = 0.0,
    fg_weight: float = 1.0,
    img_mask: Optional[jnp.ndarray] = None,  # [B, H, W, 1] aug valid area
) -> jnp.ndarray:
    """Masked MSE eps-reconstruction (`calc_recon_loss`, `ddpm.py:3567`):
    foreground pixels weight `fg_weight`, background `bg_weight`
    (0 / 0.1 / 0.05 depending on iteration flavor, `ddpm.py:2917-2946`);
    `img_mask` (the augmentation valid-area mask, `aug_mask`) zeroes the
    empty margins created by scale/shift augmentation out of the loss.
    Returns a scalar averaged over the weighted pixel count."""
    err = jnp.square(eps_pred.astype(jnp.float32) - eps_target.astype(jnp.float32))
    if fg_mask is None and img_mask is None:
        return err.mean()
    if fg_mask is not None:
        w = fg_mask * fg_weight + (1.0 - fg_mask) * bg_weight
    else:
        w = jnp.ones(err.shape[:-1] + (1,), jnp.float32)
    if img_mask is not None:
        w = w * img_mask
    w = jnp.broadcast_to(w, err.shape)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-6)


def ortho_subtract(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Remove from `a` its projection onto `b` along the last dim
    (`ldm/util.py` ortho_subtract): a - (a·b / (b·b + 1e-6)) b."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    norm = jnp.sum(b * b, axis=-1, keepdims=True)
    return a - dot / (norm + eps) * b


def cosine_loss(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """1 - mean cosine similarity along the last dim."""
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
    return 1.0 - jnp.mean(jnp.sum(an * bn, axis=-1))


def grad_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Forward identity, backward gradient × scale — the functional analog of
    the reference's ubiquitous `gen_gradient_scaler` (`ldm/util.py:1324-1369`)."""
    if scale == 1.0:
        return x
    if scale == 0.0:
        return jax.lax.stop_gradient(x)
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


def _demean(x):
    return x - x.mean(axis=-1, keepdims=True)


def ref_cosine_loss(delta, ref_delta, emb_weights=None, exponent: float = 2.0,
                    do_demean_first: bool = True, ref_grad_scale: float = 0.05,
                    aim_to_align: bool = True,
                    margin: float = 0.0,
                    instance_axis: Optional[int] = None) -> jnp.ndarray:
    """Weighted cosine alignment of `delta` to `ref_delta`
    (`calc_ref_cosine_loss`, `ldm/util.py:438-540`): demean both over the
    embedding dim, gradient-scale + signed-pow the reference side
    (x·|x|^(e-1)), per-token cosine-embedding loss, weight-averaged.

    `instance_axis`: the reference loops instances and averages their
    per-instance weighted means (each instance counts equally even when
    its mask mass differs — e.g. delta batches over different-length
    prompts). Pass the batch axis of `losses` to reproduce that; None
    keeps the global weighted mean (equivalent whenever per-instance
    masses are equal, which holds at every other call site)."""
    if do_demean_first:
        delta = _demean(delta)
        ref_delta = _demean(ref_delta)
    ref_delta = grad_scale(ref_delta, ref_grad_scale)
    ref_pow = ref_delta * jnp.abs(ref_delta) ** (exponent - 1.0)
    # eps inside the sqrt: the norm's gradient stays finite at exactly-zero
    # vectors (all-masked rows produce them)
    safe_norm = lambda x: jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
    an = delta / safe_norm(delta)
    bn = ref_pow / safe_norm(ref_pow)
    cos = jnp.sum(an * bn, axis=-1)
    losses = (1.0 - cos) if aim_to_align else jnp.maximum(cos, 0.0)
    if emb_weights is not None and instance_axis is not None:
        w = jnp.broadcast_to(emb_weights, losses.shape)
        axes = tuple(i for i in range(losses.ndim) if i != instance_axis)
        per = jnp.sum(losses * w, axis=axes) / (jnp.sum(w, axis=axes) + 1e-8)
        if margin > 0:  # the reference clamps per instance (`:528-532`)
            per = jnp.maximum(per - margin, 0.0)
        return per.mean()
    if emb_weights is not None:
        w = jnp.broadcast_to(emb_weights, losses.shape)
        loss = jnp.sum(losses * w) / (jnp.sum(w) + 1e-8)
    else:
        loss = losses.mean()
    if margin > 0:
        # hinge: no gradient until the mean loss exceeds the margin
        # (`calc_ref_cosine_loss` margin clamp, `ldm/util.py:528-532`)
        loss = jnp.maximum(loss - margin, 0.0)
    return loss


def prompt_delta_loss(
    subj_single: jnp.ndarray,  # [L, B, T, D] prompt embeddings (4-type batch)
    subj_comp: jnp.ndarray,
    cls_single: jnp.ndarray,
    cls_comp: jnp.ndarray,
    single_mask: Optional[jnp.ndarray] = None,  # [B, T] valid-token masks
    comp_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Static prompt-delta regularizer (`calc_prompt_emb_delta_loss`,
    `ldm/util.py:2278-2331`): ortho-subtracted comp-single deltas of the
    subject prompts aligned to those of the class prompts. Token weights
    ((m_single + m_comp)² / 4 with BOS excluded) follow the reference."""
    d_subj = ortho_subtract(subj_comp, subj_single)
    d_cls = ortho_subtract(cls_comp, cls_single)
    weights = None
    if single_mask is not None and comp_mask is not None:
        agg = single_mask.astype(jnp.float32) + comp_mask.astype(jnp.float32)
        weights = (agg ** 2 / 4.0).at[:, 0].set(0.0)  # exclude BOS
        weights = weights[None]  # broadcast over L
    # instance_axis=1: each instance's weighted mean counts equally, like
    # the reference's per-sample loop (prompt lengths differ per instance
    # in recon-iter delta batches)
    return ref_cosine_loss(d_subj, d_cls, emb_weights=weights,
                           instance_axis=1)


def calc_align_coeffs(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Optimal projection coefficient of a onto b along the last dim
    (`calc_align_coeffs`, `ldm/util.py:344-373`)."""
    dot_ab = jnp.sum(a * b, axis=-1)
    dot_bb = jnp.sum(b * b, axis=-1)
    return dot_ab / (dot_bb + eps)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                axis=None, keepdims: bool = False,
                instance_weights: Optional[jnp.ndarray] = None,
                do_sqr: bool = False, eps: float = 1e-8) -> jnp.ndarray:
    """Mean of x over elements where mask is truthy (the reference's
    `masked_mean`, `subj_basis_generator.py:36-44` / ddpm call sites).
    With do_sqr, squares x first (more sensitivity to small values)."""
    m = mask.astype(jnp.float32)
    v = x.astype(jnp.float32)
    if do_sqr:
        v = v * v
    if instance_weights is not None:
        w_shape = (m.shape[0],) + (1,) * (m.ndim - 1)
        m = m * instance_weights.reshape(w_shape)
    return jnp.sum(v * m, axis=axis, keepdims=keepdims) / (
        jnp.sum(m, axis=axis, keepdims=keepdims) + eps)


def normalized_sum(losses, norm_pow: float = 0.0) -> jnp.ndarray:
    """Sum of per-layer losses; with norm_pow > 0, reweights each by
    1/|loss|^pow, rescaled to preserve the plain sum's value
    (`normalized_sum`, `ldm/util.py:2349-2362`). Values are treated as
    constants for the reweighting (stop_gradient), like `.item()` there."""
    if not losses:
        return jnp.asarray(0.0)
    total = sum(losses)
    if norm_pow == 0:
        return total
    consts = [jax.lax.stop_gradient(jnp.abs(l)) + 1e-8 for l in losses]
    normed = sum(l / c ** norm_pow for l, c in zip(losses, consts))
    scale = jax.lax.stop_gradient(total) / (jax.lax.stop_gradient(normed) + 1e-8)
    return normed * scale


def calc_dyn_loss_scale(loss_value: float, loss_base: float,
                        loss_scale_base: float,
                        min_scale_base_ratio: float = 1.0,
                        max_scale_base_ratio: float = 2.0) -> float:
    """Host-side dynamic loss scale (`calc_dyn_loss_scale`,
    `ldm/util.py:2333-2341`); call with a concrete float."""
    if loss_base == 0:
        return 0.0
    scale = float(loss_value) * loss_scale_base / loss_base
    return max(min(loss_scale_base * max_scale_base_ratio, scale),
               loss_scale_base * min_scale_base_ratio)


# Per-CA-layer alignment weights (`ddpm.py:3936-3944,4060-4068`), already
# normalized to sum to 1 by `normalize_dict_values` there.
ATTN_ALIGN_LAYER_WEIGHTS = {7: 0.5, 8: 0.5, 12: 1.0, 16: 1.0, 17: 1.0,
                            18: 1.0, 19: 1.0, 20: 1.0, 21: 1.0, 22: 1.0,
                            23: 1.0, 24: 1.0}
# Cross-layer alignment maps + weights (`ddpm.py:4258-4277`)
XLAYER_WEIGHTS = {8: 0.5, 12: 1.0, 16: 1.0, 17: 1.0, 18: 1.0, 19: 0.5,
                  20: 0.5, 21: 0.5, 22: 0.25, 23: 0.25, 24: 0.25}
XLAYER_MAPS = {8: 7, 12: 8, 16: 12, 17: 16, 18: 17, 19: 18, 20: 19,
               21: 20, 22: 21, 23: 22, 24: 23}


def _normalize_weights(d: dict) -> dict:
    s = sum(d.values())
    return {k: v / s for k, v in d.items()}


def _token_score(attn: jnp.ndarray, token_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, h, Q, T] x [B, T] -> [B, h, Q]: attention summed over the K
    token slots of one placeholder (`sel_emb_attns_by_indices` with
    do_sum=True)."""
    return jnp.einsum("bhqt,bt->bhq", attn.astype(jnp.float32),
                      token_mask.astype(jnp.float32))


def _bilinear_2tap(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """[B, H, W] bilinear resize with torch
    `F.interpolate(mode='bilinear', align_corners=False)` semantics:
    half-pixel mapping, 2 taps per axis, NO antialias filter (torch's
    default even when downsampling — `jax.image.resize` antialiases,
    which blurs differently)."""
    x = x.astype(jnp.float32)
    B, H, W = x.shape
    ys = jnp.clip((jnp.arange(oh) + 0.5) * (H / oh) - 0.5, 0, H - 1)
    xs = jnp.clip((jnp.arange(ow) + 0.5) * (W / ow) - 0.5, 0, W - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None]
    wx = (xs - x0)[None, None, :]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _resize_fg_mask_to_q(fg_mask: jnp.ndarray, q_len: int) -> jnp.ndarray:
    """[B, H, W(, 1)] spatial mask -> binarized [B, Q] at the attention's
    spatial resolution. The reference takes max(nearest, bilinear)
    downsamples before binarizing (`resize_mask_for_feat_or_attn`,
    `ldm/util.py:1810-1834`, mode="nearest|bilinear") — the bilinear arm
    keeps a 1-cell feather ring around small fg regions that a
    nearest-only subsample drops."""
    if fg_mask.ndim == 4:
        fg_mask = fg_mask[..., 0]
    fg_mask = fg_mask.astype(jnp.float32)
    B, H, W = fg_mask.shape
    s = int(round(q_len ** 0.5))
    # nearest (torch F.interpolate 'nearest': src = floor(dst * in/out))
    ri = (jnp.arange(s) * (H / s)).astype(jnp.int32)
    ci = (jnp.arange(s) * (W / s)).astype(jnp.int32)
    near = fg_mask[:, ri][:, :, ci]
    bilin = _bilinear_2tap(fg_mask, s, s)
    small = jnp.maximum(near, bilin).reshape(B, s * s)
    return (small > 1e-6).astype(jnp.float32)


def fg_mb_suppress_loss(ca_attnscores: dict, subj_token_mask: jnp.ndarray,
                        fg_mask: jnp.ndarray,
                        instance_mask: Optional[jnp.ndarray] = None,
                        margin: float = 0.4,
                        subj_mb_suppress_scale: float = 0.05) -> jnp.ndarray:
    """Suppress subject-token attention leaking into the background
    (`calc_fg_mb_suppress_loss`, `ddpm.py:3928-4037`): the average subject
    score inside the fg mask must beat every background-location score by
    `margin`. ca_attnscores: {ca_layer_idx: [B, h, Q, T]} softmaxed scores.
    """
    weights = _normalize_weights(ATTN_ALIGN_LAYER_WEIGHTS)
    losses = []
    for idx, attn in ca_attnscores.items():
        if idx not in weights:
            continue
        subj_score = _token_score(attn, subj_token_mask)  # [B, h, Q]
        fg3 = _resize_fg_mask_to_q(fg_mask, subj_score.shape[-1])[:, None]
        fg3 = jnp.broadcast_to(fg3, subj_score.shape)
        bg3 = 1.0 - fg3
        subj_at_mf = grad_scale(subj_score * fg3, 0.5)
        subj_at_mb = subj_score * bg3
        avg_mf = masked_mean(subj_at_mf, fg3, axis=(1, 2), keepdims=True)
        excess = subj_at_mb + margin - avg_mf
        loss = masked_mean(excess, excess > 0, instance_weights=instance_mask)
        losses.append(loss * weights[idx] * subj_mb_suppress_scale)
    return normalized_sum(losses)


def fg_bg_complementary_loss(
    ca_attnscores: dict,
    subj_token_mask: jnp.ndarray,  # [B, T]
    bg_token_mask: jnp.ndarray,  # [B, T]
    fg_mask: Optional[jnp.ndarray] = None,  # [B, H, W(,1)]
    instance_mask: Optional[jnp.ndarray] = None,
    fg_grad_scale: float = 0.1,
    do_sqrt_norm: bool = False,
):
    """Subject vs background token attention complementarity + four
    margin-contrast suppressions (`calc_fg_bg_complementary_loss`,
    `ddpm.py:4039-4253`). Returns (complementary, subj_mb_suppress,
    bg_mf_suppress, fg_bg_mask_contrast).

    K_fg/K_bg (embeddings per subject/bg token; 9/4 with the default
    static embedders) are derived from the masks like the reference
    derives them from its index tuples (`ddpm.py:4076-4079`) — essential
    for the wds variant, where the "bg" role is played by a much larger
    comp-extra token set. `do_sqrt_norm` divides each instance's summed
    score by sqrt(its token count) (`sel_emb_attns_by_indices`,
    `ldm/util.py:2209-2212`; the wds call sets it, `ddpm.py:3525-3536`)."""
    weights = _normalize_weights(ATTN_ALIGN_LAYER_WEIGHTS)
    subj_mb_scale, bg_mf_scale, contrast_scale = 0.05, 0.1, 0.05
    mfmb_margin = 0.4
    subj_m = subj_token_mask.astype(jnp.float32)
    bg_m = bg_token_mask.astype(jnp.float32)
    K_fg = jnp.maximum(jnp.mean(jnp.sum(subj_m, axis=-1)), 1.0)
    K_bg = jnp.maximum(jnp.mean(jnp.sum(bg_m, axis=-1)), 1.0)
    subj_bg_at_mf_margin = 0.4 * K_fg / K_bg
    bg_subj_at_mb_margin = 0.4
    # per-instance sqrt norms (stop_gradient: pure normalizers)
    sq_fg = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(jnp.sum(subj_m, axis=-1), 1.0)))[:, None, None]
    sq_bg = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(jnp.sum(bg_m, axis=-1), 1.0)))[:, None, None]

    l_comple, l_subj_mb, l_bg_mf, l_contrast = [], [], [], []
    for idx, attn in ca_attnscores.items():
        if idx not in weights:
            continue
        w = weights[idx]
        subj_score = _token_score(attn, subj_token_mask)
        bg_score = _token_score(attn, bg_token_mask)
        if do_sqrt_norm:
            subj_score = subj_score / sq_fg
            bg_score = bg_score / sq_bg
        # push bg attention to be orthogonal to subject attention
        l_comple.append(w * ref_cosine_loss(
            bg_score, subj_score, exponent=2.0, do_demean_first=False,
            ref_grad_scale=fg_grad_scale, aim_to_align=False))

        if fg_mask is None:
            continue
        fg3 = _resize_fg_mask_to_q(fg_mask, subj_score.shape[-1])[:, None]
        fg3 = jnp.broadcast_to(fg3, subj_score.shape)
        bg3 = 1.0 - fg3
        subj_at_mf = grad_scale(subj_score * fg3, 0.5)
        bg_at_mf = bg_score * fg3
        subj_at_mb = subj_score * bg3
        bg_at_mb = bg_score * bg3
        avg_subj_mf = masked_mean(subj_at_mf, fg3, axis=(1, 2), keepdims=True)
        avg_bg_mb = masked_mean(bg_at_mb, bg3, axis=(1, 2), keepdims=True)

        def hinge(excess):
            return masked_mean(excess, excess > 0,
                               instance_weights=instance_mask)

        l_subj_mb.append(w * subj_mb_scale
                         * hinge(subj_at_mb + mfmb_margin - avg_subj_mf))
        l_bg_mf.append(w * bg_mf_scale
                       * hinge(bg_at_mf + mfmb_margin - avg_bg_mb))
        l_contrast.append(w * contrast_scale * (
            hinge(bg_at_mf + subj_bg_at_mf_margin - avg_subj_mf)
            + hinge(subj_at_mb + bg_subj_at_mb_margin - avg_bg_mb)))
    return (normalized_sum(l_comple), normalized_sum(l_subj_mb),
            normalized_sum(l_bg_mf), normalized_sum(l_contrast))


def fg_bg_xlayer_consist_loss(ca_attnscores: dict,
                              subj_token_mask: jnp.ndarray,
                              bg_token_mask: Optional[jnp.ndarray] = None):
    """Cross-layer attention-map consistency (`calc_fg_bg_xlayer_consist_
    loss`, `ddpm.py:4255-4373`): each layer's head-averaged subject/bg
    attention map (bilinear-resized to the coarser grid) cosine-aligned
    with the layer below. Returns (fg_consist, bg_consist)."""
    weights = _normalize_weights(XLAYER_WEIGHTS)

    def head_avg_map(attn, token_mask):
        # [B,h,Q,T] -> [B,Q]: mean over heads, sum over token slots
        return jnp.einsum("bhqt,bt->bq", attn.astype(jnp.float32),
                          token_mask.astype(jnp.float32)) / attn.shape[1]

    def to_grid(v):  # [B, Q] -> [B, s, s, 1]
        B, Q = v.shape
        s = int(round(Q ** 0.5))
        return v.reshape(B, s, s, 1)

    l_fg, l_bg = [], []
    for idx, attn in ca_attnscores.items():
        if idx not in weights or XLAYER_MAPS[idx] not in ca_attnscores:
            continue
        w = weights[idx]
        attn_x = ca_attnscores[XLAYER_MAPS[idx]]
        if attn_x.shape[2] > attn.shape[2]:
            attn, attn_x = attn_x, attn
        for masks, acc in ((subj_token_mask, l_fg), (bg_token_mask, l_bg)):
            if masks is None:
                continue
            a = head_avg_map(attn, masks)
            ax = head_avg_map(attn_x, masks)
            sx = int(round(ax.shape[1] ** 0.5))
            a_grid = to_grid(a)[..., 0]  # [B, s, s]
            # 2-tap bilinear like torch F.interpolate (`ddpm.py:4334`) —
            # jax.image.resize would antialias the downsample
            a_small = _bilinear_2tap(a_grid, sx, sx)
            a_small = a_small.reshape(a.shape[0], sx * sx)
            acc.append(w * ref_cosine_loss(a_small, ax, exponent=2.0,
                                           do_demean_first=True,
                                           ref_grad_scale=1.0))
    return normalized_sum(l_fg), normalized_sum(l_bg)


def delta_alignment_loss(feat_base, feat_ex, ref_feat_base, ref_feat_ex,
                         ref_grad_scale: float = 0.1,
                         feat_base_grad_scale: float = 0.05,
                         cosine_exponent: float = 2.0,
                         delta_types=("feat_to_ref", "ex_to_base")) -> dict:
    """Delta alignment between (base -> extended) feature pairs and their
    reference pair (`calc_delta_alignment_loss`, `ldm/util.py:537-597`).
    Last dim is channels; all leading dims flatten into the batch."""
    if feat_base_grad_scale == -1:
        feat_base_grad_scale = min(ref_grad_scale / 2, 1.0)
    ref_base = grad_scale(ref_feat_base, ref_grad_scale)
    ref_ex = grad_scale(ref_feat_ex, ref_grad_scale)
    base = grad_scale(feat_base, feat_base_grad_scale)
    out = {}
    for t in delta_types:
        if t == "feat_to_ref":
            src = ortho_subtract(base, ref_base)
            tgt = ortho_subtract(feat_ex, ref_ex)
        elif t == "ex_to_base":
            src = ortho_subtract(ref_ex, ref_base)
            tgt = ortho_subtract(feat_ex, base)
        else:
            raise ValueError(t)
        out[t] = ref_cosine_loss(tgt, src, exponent=cosine_exponent,
                                 do_demean_first=False, ref_grad_scale=1.0)
    return out


def embedding_norm_loss(emb: jnp.ndarray, target_norm: float = 1.0) -> jnp.ndarray:
    """Keep subject embedding norms near the typical CLIP token norm
    (`embedding_manager.embedding_reg_loss`, `embedding_manager.py:2098-2207`).
    eps inside the sqrt keeps the gradient finite at exactly-zero embeddings
    (the reference's init zeroes one basis set entirely)."""
    norms = jnp.sqrt(jnp.sum(jnp.square(emb.astype(jnp.float32)), axis=-1) + 1e-12)
    return jnp.mean(jnp.square(norms - target_norm))


def ortho_l2loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MSE of the ortho residual of `a` against `b`
    (`ortho_l2loss`, `ldm/util.py:387-396`)."""
    r = ortho_subtract(a, b)
    return jnp.mean(r * r)


def dyn_loss_scale(loss, loss_base: float, loss_scale_base: float,
                   min_scale_base_ratio: float = 1.0,
                   max_scale_base_ratio: float = 2.0) -> jnp.ndarray:
    """Traced dynamic loss scale (`calc_dyn_loss_scale`,
    `ldm/util.py:2333-2341`): the reference reads `.item()` (a detached
    constant); stop_gradient is the traced equivalent. This is the in-jit
    twin of `calc_dyn_loss_scale` above (which needs concrete floats)."""
    if loss_base == 0:
        # a disabled loss must not divide by zero (`ldm/util.py:2333-2335`)
        return jnp.asarray(0.0)
    s = jax.lax.stop_gradient(loss) * loss_scale_base / loss_base
    return jnp.clip(s, loss_scale_base * min_scale_base_ratio,
                    loss_scale_base * max_scale_base_ratio)


def convert_attn_to_spatial_weight(flat_attn: jnp.ndarray, out_hw,
                                   reverse: bool = True) -> jnp.ndarray:
    """Attention-derived spatial weight (`convert_attn_to_spatial_weight`,
    `ldm/util.py:649-683`): head-mean the (stop-grad) summed subject
    attention, un-flatten to its own grid, bilinear-resize to `out_hw`,
    normalize by per-instance mean/std (std floored at mean/2), exp(-x)
    when `reverse` (high subject attention -> low weight, emphasizing the
    compositional context), clamp at 1, renormalize to unit spatial mean.
    flat_attn: [B, h, Q] -> weight [B, H, W, 1]."""
    a = jax.lax.stop_gradient(flat_attn.astype(jnp.float32))
    B = a.shape[0]
    s = int(round(a.shape[-1] ** 0.5))
    # the reference derives the grid from out_spatial_shape via spatial_scale
    # (`ldm/util.py:663-665`); all SD feature maps here are square, so a
    # square grid is asserted rather than silently mis-reshaped
    assert s * s == a.shape[-1], (
        f"non-square attention grid: Q={a.shape[-1]}")
    attn = a.mean(axis=1).reshape(B, s, s, 1)
    if (s, s) != tuple(out_hw):
        attn = jax.image.resize(attn, (B, out_hw[0], out_hw[1], 1),
                                "bilinear")
    mean = attn.mean(axis=(1, 2), keepdims=True)
    std = attn.std(axis=(1, 2), keepdims=True, ddof=1)
    denom = jnp.maximum(std + 0.001, mean / 2)
    sign = -1.0 if reverse else 1.0
    w = jnp.minimum(jnp.exp(sign * (attn - mean) / denom), 1.0)
    return w / w.mean(axis=(1, 2), keepdims=True)


# 8/16 px feature maps pool 4-stride-2; 32/64 px pool 8-stride-4
# (`feat_size2pooler_spec`, `ddpm.py:3758`)
FEAT_SIZE2POOLER_SPEC = {8: (4, 2), 16: (4, 2), 32: (8, 4), 64: (8, 4)}


def prompt_mix_layer_losses(outfeat: jnp.ndarray, subj_attn: jnp.ndarray):
    """One layer of `calc_prompt_mix_loss` (`ddpm.py:3710-3928`) over the
    4-type batch. outfeat: [4B, H, W, C]; subj_attn: [4B, h, Q] (scores
    summed over the subject-token slots, the reference's K_fg sum).
    Returns (feat_delta_align, subj_attn_delta_align, subj_attn_norm):

    - attn delta align: per-head ortho deltas (subj_single - 0.05·gs
      mix_single) vs (subj_comp - 0.05·gs mix_comp), cosine exponent 3,
      feat_to_ref only (`:3815-3827`);
    - attn norm distill: L1 of the spatial-mean per-head attention,
      subj_comp vs gs(mix_comp) AND subj_single vs gs(mix_single)
      (`:3849-3857`);
    - feat delta align: outfeat spatially reweighted by the reversed
      attention weights of mix_comp and subj_comp (averaged), avg-pooled
      per `FEAT_SIZE2POOLER_SPEC`, flattened; ortho deltas with 0.1-gs'ed
      mix halves; MSE between the comp and single deltas (`:3865-3925`).
    """
    B4 = outfeat.shape[0]
    B = B4 // 4
    a4 = subj_attn.reshape(4, B, *subj_attn.shape[1:])
    ss_a, sc_a, ms_a, mc_a = a4[0], a4[1], a4[2], a4[3]
    mix_attn_gs = 0.05

    src = ortho_subtract(ss_a, grad_scale(ms_a, mix_attn_gs))
    tgt = ortho_subtract(sc_a, grad_scale(mc_a, mix_attn_gs))
    attn_delta = ref_cosine_loss(tgt, src, exponent=3.0,
                                 do_demean_first=False, ref_grad_scale=1.0)

    attn_norm = (jnp.abs(sc_a.mean(-1)
                         - grad_scale(mc_a, mix_attn_gs).mean(-1)).mean()
                 + jnp.abs(ss_a.mean(-1)
                           - grad_scale(ms_a, mix_attn_gs).mean(-1)).mean())

    H, W, C = outfeat.shape[1:]
    sw = 0.5 * (convert_attn_to_spatial_weight(mc_a, (H, W))
                + convert_attn_to_spatial_weight(sc_a, (H, W)))  # [B,H,W,1]
    f4 = outfeat.reshape(4, B, H, W, C) * sw[None]
    # strict indexing like the reference (`ddpm.py:3889`): an unexpected
    # feature size must surface as an error, not a silent pooling change
    k, s = FEAT_SIZE2POOLER_SPEC[W]
    pooled = _avg_pool_nc(f4.reshape(4 * B, H, W, C).transpose(0, 3, 1, 2),
                          k, s)
    f2d = pooled.reshape(4, B, -1)
    comp_delta = ortho_subtract(f2d[1], grad_scale(f2d[3], 0.1))
    single_delta = ortho_subtract(f2d[0], grad_scale(f2d[2], 0.1))
    feat_delta = ortho_l2loss(comp_delta, single_delta)
    return feat_delta, attn_delta, attn_norm


def elastic_matching_loss(ca_q: jnp.ndarray, ca_outfeat: jnp.ndarray,
                          fg_mask: jnp.ndarray,
                          fg_bg_cutoff_prob: float = 0.25,
                          single_q_grad_scale: float = 0.1,
                          single_feat_grad_scale: float = 0.01,
                          mix_feat_grad_scale: float = 0.05):
    """Cross-instance elastic feature matching (`calc_elastic_matching_loss`,
    `ldm/util.py:2481-2616`): subj-comp tokens transport-reconstruct the
    subj-single fg features via q-similarity softmax; the sc->ss and mc->ms
    maps are aligned; comp-vs-mix features are matched on the soft
    background (tokens whose total fg-mapping prob is below the cutoff).

    ca_q, ca_outfeat: [4, C, N] (order ss, sc, ms, mc; N spatial tokens).
    fg_mask: [1, N] (0/1, subj-single instance's fg at this resolution).
    Dense-mask version: instead of gathering the N_fg fg columns (dynamic
    shape), all terms weight by fg_mask — identical values, static shapes.
    Returns (map_align, sc_ss_fg_match, sc_mc_bg_match, comp_bg_prob).
    """
    fg = fg_mask.astype(jnp.float32).reshape(1, -1)  # [1, N]
    ss_q, sc_q, ms_q, mc_q = [ca_q[i:i + 1] for i in range(4)]
    ss_q_gs = grad_scale(ss_q, single_q_grad_scale)
    ms_q_gs = grad_scale(ms_q, single_q_grad_scale)

    # [1, N_comp, N_single] matching scores; softmax over the COMP dim
    # (axis 1) to handle scale changes (`:2500-2516`)
    sc_map_ss = jax.nn.softmax(
        jnp.einsum("bcn,bcm->bnm", sc_q, ss_q_gs), axis=1)
    mc_map_ms = jax.nn.softmax(
        jnp.einsum("bcn,bcm->bnm", mc_q, ms_q_gs), axis=1)

    ss_feat, sc_feat, ms_feat, mc_feat = [ca_outfeat[i:i + 1]
                                          for i in range(4)]
    # transport-reconstruct subj-single tokens from subj-comp features
    sc_recon_ss = jnp.einsum("bcn,bnm->bmc", sc_feat, sc_map_ss)  # [1, N, C]
    ss_feat_t = jnp.transpose(ss_feat, (0, 2, 1))
    ss_feat_gs = grad_scale(ss_feat_t, single_feat_grad_scale)

    # map alignment on fg-pair entries
    fg_hw = fg[:, :, None] * fg[:, None, :]
    loss_map_align = masked_mean(jnp.abs(sc_map_ss - mc_map_ms), fg_hw)

    # fg match: cosine of reconstructed vs original subj-single features,
    # weighted by the fg mask (reference gathers the fg columns)
    loss_sc_ss_fg_match = ref_cosine_loss(
        sc_recon_ss, ss_feat_gs, emb_weights=fg[..., None][:, :, 0],
        exponent=2.0, do_demean_first=False, ref_grad_scale=1.0)

    # soft background prob of each comp token: below-cutoff total fg mapping
    sc_fg_prob = jnp.einsum("bnm,bm->bn", sc_map_ss, fg[0][None])  # [1, N]
    mc_fg_prob = jnp.einsum("bnm,bm->bn", mc_map_ms, fg[0][None])
    sc_bg_prob = jnp.maximum(fg_bg_cutoff_prob - sc_fg_prob, 0.0)
    mc_bg_prob = jnp.maximum(fg_bg_cutoff_prob - mc_fg_prob, 0.0)

    sc_feat_t = jnp.transpose(sc_feat, (0, 2, 1))
    mc_feat_t = jnp.transpose(mc_feat, (0, 2, 1))
    loss_sc_mc_bg_match = ref_cosine_loss(
        sc_feat_t, mc_feat_t, emb_weights=mc_bg_prob,
        exponent=2.0, do_demean_first=False,
        ref_grad_scale=mix_feat_grad_scale)
    return loss_map_align, loss_sc_ss_fg_match, loss_sc_mc_bg_match, \
        (sc_bg_prob, mc_bg_prob)


def _avg_pool_nc(x: jnp.ndarray, k: int, s: int) -> jnp.ndarray:
    """[B, C, H, W] avg pool (torch AvgPool2d semantics, no padding)."""
    b, c, h, w = x.shape
    x = x.transpose(0, 2, 3, 1)
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, s, s, 1), "VALID") / (k * k)
    return x.transpose(0, 3, 1, 2)


def comp_fg_bg_preserve_loss(ca_outfeats: dict, ca_qs: dict,
                             ca_attnscores: dict,
                             fg_mask: jnp.ndarray,  # [B, H, W, 1] latent res
                             subj_token_mask: jnp.ndarray,  # [4B, T]
                             pool_kernel: int = 4, pool_stride: int = 2,
                             mix_attn_grad_scale: float = 0.02):
    """Per-layer elastic-matching battery (`calc_comp_fg_bg_preserve_loss`,
    `ddpm.py:4385-4549`) over the 4-type compositional batch. Inputs are
    captured activations: outfeat [4B, H, W, C], q [4B, heads, N, d],
    attnscore [4B, heads, N, T]; fg_mask carries the B per-instance masks
    (the reference ships BLOCK_SIZE=1; B>1 vmaps the per-instance elastic
    matching and averages — each instance matches against its OWN mask).
    Returns (map_align, sc_ss_fg_match, sc_mc_bg_match,
    subj_bg_attn_suppress, mix_bg_attn_suppress)."""
    weights = _normalize_weights(ATTN_ALIGN_LAYER_WEIGHTS)
    l_map, l_fg, l_bg, l_subj_sup, l_mix_sup = [], [], [], [], []
    for idx, outfeat in ca_outfeats.items():
        if idx not in weights or idx not in ca_qs:
            continue
        w = weights[idx]
        B4, H, W, C = outfeat.shape
        B = B4 // 4
        q = ca_qs[idx]  # [4B, heads, N, d]
        qh = int(round(q.shape[2] ** 0.5))
        # [4B, heads*d, h, w] like the reference's channel-fold (`:4434-4439`)
        q_img = q.transpose(0, 1, 3, 2).reshape(B4, -1, qh, qh)
        feat_img = outfeat.transpose(0, 3, 1, 2)  # [4B, C, H, W]
        if (H, W) != (qh, qh):
            feat_img = jax.image.resize(feat_img, (B4, C, qh, qh), "bilinear")
        # LayerNorm over channels (the reference's ca_outfeat_lns)
        mu = feat_img.mean(axis=1, keepdims=True)
        sig = feat_img.std(axis=1, keepdims=True) + 1e-5
        feat_img = (feat_img - mu) / sig
        if qh > 8:
            q_img = _avg_pool_nc(q_img, pool_kernel, pool_stride)
            feat_img = _avg_pool_nc(feat_img, pool_kernel, pool_stride)
        Np = q_img.shape[-2] * q_img.shape[-1]
        q_grp = q_img.reshape(4, B, q_img.shape[1], Np)
        feat_grp = feat_img.reshape(4, B, C, Np)
        fg_small = _resize_fg_mask_to_q(fg_mask, Np)  # [B, Np]
        # per-instance elastic matching over the B block instances
        m_align, m_fg, m_bg, (sc_bg, mc_bg) = jax.vmap(
            lambda q4, f4, m: elastic_matching_loss(q4, f4, m[None]),
            in_axes=(1, 1, 0))(q_grp, feat_grp, fg_small)
        l_map.append(w * m_align.mean())
        l_fg.append(w * m_fg.mean())
        l_bg.append(w * m_bg.mean())

        if idx in ca_attnscores:
            score = ca_attnscores[idx]  # [4B, heads, N, T]
            subj_attn = jnp.einsum("bhnt,bt->bhn", score.astype(jnp.float32),
                                   subj_token_mask.astype(jnp.float32))
            n = subj_attn.shape[-1]
            if n != Np:
                s = int(round(n ** 0.5))
                grid = subj_attn.reshape(B4, -1, s, s, 1)
                ph2 = int(round(Np ** 0.5))
                grid = jax.image.resize(grid, (B4, grid.shape[1], ph2, ph2, 1),
                                        "bilinear")
                subj_attn = grid.reshape(B4, grid.shape[1], ph2 * ph2)
            a4 = subj_attn.reshape(4, B, *subj_attn.shape[1:])  # [4,B,h,Np]
            # suppress subject attention on soft-bg comp tokens
            # (`:4500-4549`): clamp(min=0), bg-prob-weighted mean; the mix
            # branch is 0.02-grad-scaled like the reference's mix_grad_scaler
            subj_pos = jnp.maximum(a4[1], 0.0)  # subj-comp rows
            mix_pos = jnp.maximum(grad_scale(a4[3], mix_attn_grad_scale), 0.0)
            sc_w = jnp.broadcast_to(sc_bg, subj_pos.shape)  # [B,1,Np]->[B,h,Np]
            mc_w = jnp.broadcast_to(mc_bg, mix_pos.shape)
            l_subj_sup.append(w * masked_mean(subj_pos, sc_w))
            l_mix_sup.append(w * masked_mean(mix_pos, mc_w))
    return (normalized_sum(l_map), normalized_sum(l_fg), normalized_sum(l_bg),
            normalized_sum(l_subj_sup), normalized_sum(l_mix_sup))


def padding_embs_align_loss(
    prompt_embs: jnp.ndarray,  # [L, B, T, D] encoded prompt embeddings
    prompt_emb_mask: jnp.ndarray,  # [B, T] 1 = real token
    subj_token_mask: jnp.ndarray,  # [B, T] 1 = subject slot
    bg_token_mask: Optional[jnp.ndarray] = None,  # [B, T]
    subj_contrast_paddings_grad_scale: float = 0.02,
    subj_contrast_bg_grad_scale: float = 0.3,
):
    """Padding/background embeddings pushed orthogonal to the (summed)
    subject embedding (`calc_padding_embs_align_loss`, `ddpm.py:4634-4779`;
    marked DISABLED there — provided for parity, off by default in our
    trainer too). Returns (padding_align, bg_subj_align)."""
    # summed subject embedding per instance: [L?, B, 1, D] -> use [B, L, D]
    subj_sum = jnp.einsum("lbtd,bt->bld", prompt_embs.astype(jnp.float32),
                          subj_token_mask.astype(jnp.float32))
    pad_mask = (1.0 - prompt_emb_mask.astype(jnp.float32)).at[:, 0].set(0.0)

    def contrast(token_mask, subj_grad_scale):
        subj = grad_scale(subj_sum, subj_grad_scale)  # [B, L, D]
        # per-token cosine vs the subject embedding; weight by the mask
        embs = jnp.transpose(prompt_embs, (1, 2, 0, 3)).astype(jnp.float32)
        # [B, T, L, D] vs [B, 1, L, D]; instance_axis=0: the reference
        # loops instances and divides by SSB_SIZE — each instance counts
        # equally even when its padding-token count differs
        return ref_cosine_loss(
            embs, subj[:, None], emb_weights=token_mask[:, :, None],
            exponent=2.0, do_demean_first=True, ref_grad_scale=1.0,
            aim_to_align=False, instance_axis=0)

    loss_pad = contrast(pad_mask, subj_contrast_paddings_grad_scale)
    loss_bg = (contrast(bg_token_mask.astype(jnp.float32),
                        subj_contrast_bg_grad_scale)
               if bg_token_mask is not None else jnp.asarray(0.0))
    return loss_pad, loss_bg


# Per-CA-layer weights for the subject/comp K/V orthogonality loss
# (`calc_subj_comp_ortho_loss`, `ddpm.py:4556-4576`).
K_ORTHO_LAYER_WEIGHTS = {7: 0.5, 8: 0.5, 12: 1.0, 16: 1.0, 17: 1.0, 18: 1.0,
                         19: 1.0, 20: 1.0, 21: 1.0, 22: 1.0, 23: 1.0, 24: 1.0}
V_ORTHO_LAYER_WEIGHTS = {7: 0.5, 8: 0.5, 12: 1.0, 16: 1.0, 17: 1.0, 18: 0.5,
                         19: 0.5, 20: 0.5, 21: 0.25, 22: 0.25,
                         23: 0.25, 24: 0.25}


def normalized_ortho_subtract(a: jnp.ndarray, b: jnp.ndarray,
                              eps: float = 1e-6) -> jnp.ndarray:
    """Scale both sides to their mean norm before the orthogonal subtract
    (`normalized_ortho_subtract`, `ldm/util.py:376-382`). eps lives INSIDE
    the sqrt: `jnp.linalg.norm` has a 0/0 backward at an exactly-zero
    vector (which `_weighted_token_mean` produces whenever a token mask or
    the clamped attention weights zero out), and the NaN would poison the
    whole embedder update."""
    an = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True) + eps * eps)
    bn = jnp.sqrt(jnp.sum(jnp.square(b), axis=-1, keepdims=True) + eps * eps)
    mean2 = (an + bn) / 2.0
    return ortho_subtract(a * mean2 / an, b * mean2 / bn)


def _weighted_token_mean(seq: jnp.ndarray, token_mask: jnp.ndarray,
                         token_weights: jnp.ndarray) -> jnp.ndarray:
    """Mean of weight-scaled selected tokens: [H, T, D], [T], [T] -> [H, D]
    (`sel_emb_attns_by_indices` with do_mean, `ldm/util.py:2185-2216`).
    The reference scales each selected row by its weight and divides by the
    COUNT of selected tokens (not the weight sum)."""
    m = token_mask.astype(jnp.float32)
    num = jnp.einsum("t,htd->hd", m * token_weights,
                     seq.astype(jnp.float32))
    return num / (jnp.sum(m) + 1e-8)


def comp_extra_token_mask(prompt_emb_mask: jnp.ndarray,
                          subj_token_mask: jnp.ndarray,
                          bg_token_mask: Optional[jnp.ndarray] = None):
    """Tokens belonging to the compositional suffix: real tokens that are
    neither subject nor background slots (`gen_comp_extra_indices_by_block`,
    `ldm/util.py:2218+`). All args [B, T] (or [T]); returns float mask."""
    m = prompt_emb_mask.astype(jnp.float32) * \
        (1.0 - subj_token_mask.astype(jnp.float32))
    if bg_token_mask is not None:
        m = m * (1.0 - bg_token_mask.astype(jnp.float32))
    return m


def subj_comp_ortho_loss(
    ca_ks: dict,            # layer -> [4, H, Tctx, Dh] captured CA keys
    ca_vs: dict,            # layer -> [4, H, Tctx, Dh] captured CA values
    ca_attnscores: dict,    # layer -> [4, H, Q, Tctx]
    subj_comp_subj_mask: jnp.ndarray,   # [T] subject slots, subj-comp instance
    subj_comp_extra_mask: jnp.ndarray,  # [T] comp-extra tokens, subj-comp
    cls_comp_subj_mask: jnp.ndarray,    # [T] class slots, cls-comp instance
    cls_comp_extra_mask: jnp.ndarray,   # [T] comp-extra tokens, cls-comp
    subj_block: int = 1,
    cls_block: int = 3,
    cls_grad_scale: float = 0.05,
):
    """Subject/comp K+V orthogonality alignment (`calc_subj_comp_ortho_loss`,
    `ddpm.py:4551-4629` + `calc_layer_subj_comp_k_or_v_ortho_loss`,
    `ldm/util.py:2129-2182`). NOTE: the reference defines but never CALLS
    this loss (its k/v captures are commented out, `ddpm.py:42`); provided
    for parity and kept off by default in the trainer as well.

    The 4-type compos batch is [subj-single, subj-comp, cls-single,
    cls-comp]; the subject-token and comp-extra-token weighted mean K (and V)
    of the subj-comp instance are ortho-subtracted, likewise for cls-comp,
    and the two difference directions are cosine-aligned (margins 0.6 K /
    0.7 V, cls side grad-scaled).
    Returns (loss_key_ortho, loss_value_ortho)."""
    kw = _normalize_weights({k: v for k, v in K_ORTHO_LAYER_WEIGHTS.items()
                             if k in ca_ks})
    vw = _normalize_weights({k: v for k, v in V_ORTHO_LAYER_WEIGHTS.items()
                             if k in ca_ks})
    loss_k = jnp.asarray(0.0)
    loss_v = jnp.asarray(0.0)

    def one(seq, scores, margin):
        # token importance = avg attention it receives, clamped >= 0
        # (`ddpm.py:4593-4598`)
        w_subj = jnp.maximum(scores[subj_block].mean(axis=(0, 1)), 0.0)
        w_cls = jnp.maximum(scores[cls_block].mean(axis=(0, 1)), 0.0)
        subj_subj = _weighted_token_mean(seq[subj_block],
                                         subj_comp_subj_mask, w_subj)
        subj_comp = _weighted_token_mean(seq[subj_block],
                                         subj_comp_extra_mask, w_subj)
        cls_subj = _weighted_token_mean(seq[cls_block],
                                        cls_comp_subj_mask, w_cls)
        cls_comp = _weighted_token_mean(seq[cls_block],
                                        cls_comp_extra_mask, w_cls)
        subj_diff = normalized_ortho_subtract(subj_subj, subj_comp)
        cls_diff = normalized_ortho_subtract(cls_subj, cls_comp)
        return ref_cosine_loss(subj_diff, cls_diff, exponent=2.0,
                               do_demean_first=False,
                               ref_grad_scale=cls_grad_scale,
                               aim_to_align=True, margin=margin)

    for layer in ca_ks:
        if layer not in kw:
            continue
        scores = ca_attnscores[layer].astype(jnp.float32)
        scores = jax.lax.stop_gradient(scores)  # `ddpm.py:4592` no BP via attn
        loss_k = loss_k + kw[layer] * one(ca_ks[layer], scores, margin=0.6)
        loss_v = loss_v + vw[layer] * one(ca_vs[layer], scores, margin=0.7)
    return loss_k, loss_v
