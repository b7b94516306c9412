"""CLIP ViT-L/14 text encoder, TPU-native.

Re-designed equivalent of the reference's `FrozenCLIPEmbedder`
(`ldm/modules/encoders/modules.py:179-463`), which monkey-patches four
forwards into a HuggingFace `CLIPTextModel` to (a) inject an embedding
manager between the token embedding and the position add, (b) collect all
hidden states, (c) return a weighted sum of the last-N hidden states
("clip skip", normalized weights, last element = final layer) passed through
the final LayerNorm, and (d) support extending the vocabulary with new
placeholder-token rows (`ldm/util.py:1371-1506`).

Here all of that is *native API*, no hijacking:

- `embed_tokens(...)` exposes the token-embedding lookup separately so the
  personalization layer can patch placeholder rows before the transformer
  runs (dense-mask patching, no dynamic gather/scatter — SURVEY.md §7.1).
- `__call__` takes pre-patched `input_embeds` (or raw `input_ids`) plus
  static `num_skip_layers`; the per-call skip weights are a traced vector so
  Dirichlet-sampled weights (`modules.py:410-440`) need no recompilation.
- Vocab extension is an extra embedding table concatenated logically after
  the frozen base table; ids >= vocab_size hit the extra (trainable) rows.

The whole prompt batch (incl. the 16-layerwise repeat) stays one batched
matmul-heavy forward — ideal MXU shape [16·B, 77, 768].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from adaface_tpu.ops.basic import layer_norm, quick_gelu


@struct.dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    num_extra_tokens: int = 0  # appended trainable vocab rows (placeholders)
    # Per-layer K/V head-multipliers — the native form of the reference's
    # `CLIPAttentionMKV` capacity-extension surgery
    # (`ldm/modules/arc2face_models.py:16-176`): each token contributes
    # `m` key/value copies (extra copies noise-perturbed at extension time),
    # softmax runs over the m-times-longer key axis. None = all 1.
    kv_multipliers: Optional[tuple] = None

    @classmethod
    def vit_l_14(cls, **kw) -> "CLIPTextConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "CLIPTextConfig":
        """Small config for fast CPU tests."""
        d = dict(vocab_size=99, hidden_size=64, num_layers=2, num_heads=4,
                 intermediate_size=128, max_position_embeddings=16)
        d.update(kw)
        return cls(**d)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    kv_multiplier: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h, d = c.num_heads, c.hidden_size // c.num_heads
        m = self.kv_multiplier
        dense = lambda feat, name: nn.Dense(feat, dtype=self.dtype, name=name)
        q = dense(c.hidden_size, "q_proj")(x)
        k = dense(c.hidden_size * m, "k_proj")(x)
        v = dense(c.hidden_size * m, "v_proj")(x)
        b, l, _ = x.shape
        split_q = lambda t: t.reshape(b, l, h, d).transpose(0, 2, 1, 3)
        # K/V copies are laid out [tok0_c0, .., tok0_cm, tok1_c0, ..]: copy
        # index innermost next to seq, matching the reference's `_shape` of a
        # repeated-weight projection (`arc2face_models.py:43-44,100-105`).
        split_kv = lambda t: (t.reshape(b, l, m, h, d)
                               .transpose(0, 3, 1, 2, 4)
                               .reshape(b, h, l * m, d))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split_q(q) * (d**-0.5), split_kv(k),
            preferred_element_type=jnp.float32,
        )
        mask = causal_mask if m == 1 else jnp.repeat(causal_mask, m, axis=-1)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split_kv(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c.hidden_size)
        return dense(c.hidden_size, "out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    kv_multiplier: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name=name)
        x = x + CLIPAttention(c, self.dtype, self.kv_multiplier,
                              name="self_attn")(ln("layer_norm1")(x), causal_mask)
        y = ln("layer_norm2")(x)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(y)
        return x + y


class CLIPTextEncoder(nn.Module):
    """The text transformer. See module docstring for the API contract."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                                        name="token_embedding")
        if c.num_extra_tokens > 0:
            self.extra_token_embedding = nn.Embed(
                c.num_extra_tokens, c.hidden_size, dtype=self.dtype,
                name="extra_token_embedding")
        self.position_embedding = nn.Embed(c.max_position_embeddings, c.hidden_size,
                                           dtype=self.dtype, name="position_embedding")
        mults = c.kv_multipliers or (1,) * c.num_layers
        self.layers = [CLIPEncoderLayer(c, self.dtype, mults[i], name=f"layers_{i}")
                       for i in range(c.num_layers)]
        self.final_layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                             name="final_layer_norm")

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Token-embedding lookup [B, L] -> [B, L, D] spanning base + extra
        vocab. Replaces the reference's in-place `extend_nn_embedding`
        (`ldm/util.py:1452-1506`) — extra rows live in their own trainable
        table instead of resizing the frozen one."""
        c = self.cfg
        base = self.token_embedding(jnp.minimum(input_ids, c.vocab_size - 1))
        if c.num_extra_tokens == 0:
            return base
        is_extra = input_ids >= c.vocab_size
        extra_ids = jnp.clip(input_ids - c.vocab_size, 0, c.num_extra_tokens - 1)
        extra = self.extra_token_embedding(extra_ids)
        return jnp.where(is_extra[..., None], extra, base)

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,  # [B, L] int32
        input_embeds: Optional[jnp.ndarray] = None,  # [B, L, D] pre-patched token embs
        skip_weights: Optional[jnp.ndarray] = None,  # [N] weights over last-N layers
        num_skip_layers: int = 2,  # static: how many trailing hidden states blend
    ) -> jnp.ndarray:
        """Returns [B, L, D] final-LN'd weighted blend of the last-N hidden
        states (`modules.py:361-372`). With skip_weights=None or
        num_skip_layers=1 this is the plain HF last_hidden_state."""
        c = self.cfg
        if input_embeds is None:
            input_embeds = self.embed_tokens(input_ids)
        b, l, _ = input_embeds.shape
        pos = self.position_embedding(jnp.arange(l, dtype=jnp.int32))
        x = input_embeds + pos[None]
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]

        # HF's hidden_states tuple is (embedding output, layer 1 out, ...,
        # layer N out) — num_layers+1 entries; the reference blends the last
        # `num_skip_layers` of THAT tuple (`arc2face_models.py:238-249`), so
        # the pre-encoder embedding output participates when
        # num_skip_layers > num_layers.
        n = min(max(1, num_skip_layers), c.num_layers + 1)
        if skip_weights is not None and skip_weights.shape[0] > n:
            skip_weights = skip_weights[-n:]
        collected = []  # last n of the (num_layers+1)-entry hidden-state tuple
        if n > c.num_layers:
            collected.append(x)
        for i, layer in enumerate(self.layers):
            x = layer(x, causal)
            if i + 1 >= c.num_layers + 1 - n:
                collected.append(x)
        if skip_weights is None or n == 1:
            blended = x
        else:
            # skip_weights: [N], [N, 1] or [N, D] (per-channel), normalized to
            # sum to 1 across layers (`modules.py:361-370`,
            # `arc2face_models.py:240-249`).
            w = skip_weights.astype(jnp.float32)
            if w.ndim == 1:
                w = w[:, None]
            w = w / jnp.sum(w, axis=0, keepdims=True)
            stack = jnp.stack(collected, axis=0).astype(jnp.float32)
            blended = jnp.sum(stack * w[:, None, None, :], axis=0).astype(self.dtype)
        return self.final_layer_norm(blended)
