"""Attention primitives.

The XLA path: one batched einsum pair with a fp32 softmax — XLA fuses the
scale/softmax chain and maps the matmuls onto the MXU. The Pallas flash
kernel (`adaface_tpu.ops.flash_attention`) replaces this on the UNet hot
path for long self-attention sequences; this module stays the reference
semantics and the fallback.

Reference semantics being matched: `ldm/modules/attention.py:147-257`
(8-head einsum attention with optional additive mask and separate K/V
contexts) — re-expressed batched over heads instead of torch's
head-folded-into-batch layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_weights(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    mask: jnp.ndarray | None = None,  # broadcastable to [B, H, Lq, Lk]; True/1 = keep
    scale: float | None = None,
) -> jnp.ndarray:
    """Softmax attention probabilities [B, H, Lq, Lk] with fp32 softmax."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, neg)
    return jax.nn.softmax(logits, axis=-1)


def multi_head_attention(
    q: jnp.ndarray,  # [B, Lq, H*D]
    k: jnp.ndarray,  # [B, Lk, H*D]
    v: jnp.ndarray,  # [B, Lk, H*D]
    num_heads: int,
    mask: jnp.ndarray | None = None,  # broadcastable to [B, H, Lq, Lk]
    return_probs: bool = False,
):
    """Standard MHA on flattened-head inputs. Returns [B, Lq, H*D] (and the
    fp32 attention probabilities if `return_probs`, used by the distillation
    losses that capture `attn`/`attnscore` — `openaimodel.py:947-954`)."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    h = num_heads
    d = hd // h
    qh = q.reshape(b, lq, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, h, d).transpose(0, 2, 1, 3)
    probs = attention_weights(qh, kh, mask)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, hd)
    if return_probs:
        return out, probs
    return out


# padding per kernel size (`replace_rows_by_conv_attn`, `ldm/util.py:748-760`):
# (left, right, top, bottom)
_CONV_ATTN_PADS = {2: (0, 1, 0, 1), 3: (1, 1, 1, 1), 4: (1, 2, 1, 2)}


def conv_attn_scores(
    q: jnp.ndarray,  # [B, h, N, d] queries (already unscaled)
    k: jnp.ndarray,  # [B, h, T, d] keys
    slot_map: jnp.ndarray,  # [B, T] subject slot index (k in [0,K)) or -1
    hw,  # (H, W) spatial size of the q feature map
    ks: int,  # conv kernel size; ks^2 subject embeddings form the kernel
    sim_scale: float,
    shift_attn_maps: bool = True,
) -> jnp.ndarray:
    """Per-instance conv-attention maps for the first ks^2 subject slots.

    The TPU-native `replace_rows_by_conv_attn` (`ldm/util.py:701-882`): the
    ks^2 subject key embeddings form a ks x ks grouped conv kernel over the
    q feature map (one group per head); the resulting map (scaled by
    sim_scale / ks^1.5) replaces the subject rows of the attention scores,
    each embedding getting a (dy, dx)-shifted copy. Dense slot-map form: no
    index surgery, instances without the subject token are no-ops.

    Returns [ks*ks, B, h, N] conv score maps (sampling order s1..s_{ks^2}).
    """
    B, h, N, d = q.shape
    H, W = hw
    m = ks * ks
    # one-hot of the first ks^2 slots: [B, T, m]
    onehot = (slot_map[:, :, None] == jnp.arange(m)[None, None]).astype(q.dtype)
    subj_k = jnp.einsum("bhtd,btm->bhmd", k, onehot)  # [B, h, m, d]

    l, r, t, btm = _CONV_ATTN_PADS[ks]
    qi = q.transpose(0, 2, 1, 3).reshape(B, H, W, h * d)

    def one(qb, kb):
        # kb: [h, m, d] -> HWIO kernel [ks, ks, d, h] (grouped: one output
        # channel per head, d input channels per group)
        w = kb.transpose(1, 2, 0).reshape(ks, ks, d, h)
        out = jax.lax.conv_general_dilated(
            qb[None], w, window_strides=(1, 1),
            padding=((t, btm), (l, r)), feature_group_count=h,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out[0]  # [H, W, h]

    maps = jax.vmap(one)(qi, subj_k)  # [B, H, W, h]
    maps = maps.transpose(0, 3, 1, 2) * (sim_scale / ks ** 1.5)  # [B,h,H,W]

    outs = []
    if shift_attn_maps:
        # traversal order: dy outer, dx inner (s1..s4 row-major, `:831-849`)
        for dy in range(-t, btm + 1):
            for dx in range(-l, r + 1):
                shifted = jnp.roll(maps, (dy, dx), axis=(2, 3))
                if dy > 0:
                    shifted = shifted.at[:, :, :dy, :].set(0.0)
                elif dy < 0:
                    shifted = shifted.at[:, :, dy:, :].set(0.0)
                if dx > 0:
                    shifted = shifted.at[:, :, :, :dx].set(0.0)
                elif dx < 0:
                    shifted = shifted.at[:, :, :, dx:].set(0.0)
                outs.append(shifted.reshape(B, h, N))
    else:
        outs = [maps.reshape(B, h, N)] * m
    return jnp.stack(outs)  # [m, B, h, N]


def apply_conv_attn(
    sim: jnp.ndarray,  # [B, h, N, T] pre-softmax scores
    q: jnp.ndarray,
    k: jnp.ndarray,
    slot_map: jnp.ndarray,  # [B, T]
    hw,
    ks: int,
    sim_scale: float,
    mix_weight: float = 1.0,
) -> jnp.ndarray:
    """Replace the subject-slot rows of `sim` with conv-attention scores
    (mix_weight=1 fully replaces, like the reference call site,
    `attention.py:208-216`)."""
    if ks <= 1:
        return sim
    m = ks * ks
    conv = conv_attn_scores(q, k, slot_map, hw, ks, sim_scale)  # [m,B,h,N]
    onehot = (slot_map[:, :, None] == jnp.arange(m)[None, None]).astype(sim.dtype)
    conv_sel = jnp.einsum("mbhn,btm->bhnt", conv, onehot)
    is_subj = ((slot_map >= 0) & (slot_map < m)).astype(sim.dtype)
    w = mix_weight * is_subj[:, None, None, :]
    return sim * (1.0 - w) + conv_sel * w
