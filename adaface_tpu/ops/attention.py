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
