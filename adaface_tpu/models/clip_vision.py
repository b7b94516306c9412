"""CLIP vision transformer with spatial attention masking — TPU-native.

Re-design of the reference `CLIPVisionModelWithMask`
(`ldm/modules/subj_basis_generator.py:624-747`), which monkey-patches
`CLIPVisionTransformer.forward` to accept a [B, H, W] spatial mask, resizes
it to the patch grid, prepends an always-on CLS slot, and applies the
PAIRWISE product `mask^T @ mask` as the attention mask — so a token pair
attends only when BOTH tokens are inside the mask. Used to extract separate
fg / bg image features for the zero-shot subject & background generators
(`ddpm.py:2415-2436`).

Here masking is a native argument. The patch embedding is a conv (MXU-friendly
NHWC), the mask resize is a nearest-neighbor gather on host-sized constants,
and the pairwise mask is computed once and broadcast over layers/heads.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from adaface_tpu.ops.basic import quick_gelu


@struct.dataclass
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_l_14(cls, **kw) -> "CLIPVisionConfig":
        return cls(**kw)

    @classmethod
    def vit_b_32(cls, **kw) -> "CLIPVisionConfig":
        d = dict(hidden_size=768, num_layers=12, num_heads=12,
                 intermediate_size=3072, patch_size=32)
        d.update(kw)
        return cls(**d)

    @classmethod
    def tiny(cls, **kw) -> "CLIPVisionConfig":
        d = dict(hidden_size=64, num_layers=2, num_heads=4,
                 intermediate_size=128, image_size=28, patch_size=14)
        d.update(kw)
        return cls(**d)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid + 1


class VisionAttention(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    mask_mode: str = "bias"  # 'bias' (reference-faithful) or 'hard'

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pair_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        h, d = c.num_heads, c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)
        b, l, _ = x.shape
        split = lambda t: t.reshape(b, l, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk",
                            split(dense("q_proj")(x)) * (d ** -0.5),
                            split(dense("k_proj")(x)),
                            preferred_element_type=jnp.float32)
        if pair_mask is not None:
            # pair_mask: [B, L, L] in {0,1}; 1 = token pair inside the mask.
            # NOTE: the reference feeds this {0,1} matrix to HF CLIP, whose
            # encoder ADDS attention_mask to the logits — so in-mask pairs
            # get a +1 logit bias rather than out-of-mask pairs being
            # hard-masked (`subj_basis_generator.py:691,707-711`; the hard
            # zeroing happens later via the token-mask output multiply,
            # `ddpm.py:2426-2436`). 'bias' reproduces that; 'hard' is the
            # documented intent.
            if self.mask_mode == "bias":
                logits = logits + pair_mask[:, None].astype(jnp.float32)
            else:
                logits = jnp.where(pair_mask[:, None].astype(bool), logits,
                                   jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(dense("v_proj")(x)))
        return dense("out_proj")(out.transpose(0, 2, 1, 3).reshape(b, l, c.hidden_size))


class VisionEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    mask_mode: str = "bias"

    @nn.compact
    def __call__(self, x, pair_mask):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        x = x + VisionAttention(c, self.dtype, self.mask_mode, name="self_attn")(
            ln("layer_norm1")(x), pair_mask)
        y = ln("layer_norm2")(x)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(y)
        return x + y


def resize_mask_to_grid(mask: jnp.ndarray, grid: int) -> jnp.ndarray:
    """[B, H, W] spatial mask -> [B, grid*grid+1] token mask with an
    always-on CLS slot prepended, nearest-neighbor like the reference's
    `F.interpolate(mode='nearest')` (`subj_basis_generator.py:683-689`)."""
    B, H, W = mask.shape
    # torch 'nearest' picks floor(i * scale) with scale = in/out
    ri = (jnp.arange(grid) * (H / grid)).astype(jnp.int32)
    ci = (jnp.arange(grid) * (W / grid)).astype(jnp.int32)
    small = mask[:, ri][:, :, ci].reshape(B, grid * grid)
    cls = jnp.ones((B, 1), small.dtype)
    return jnp.concatenate([cls, small], axis=1)


class CLIPVisionEncoder(nn.Module):
    """Vision tower: returns all-token features (last hidden state) and the
    pooled (post-LN CLS) output."""

    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    mask_mode: str = "bias"

    def setup(self):
        c = self.cfg
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,))
        self.patch_embedding = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding")
        self.position_embedding = nn.Embed(c.num_tokens, c.hidden_size,
                                           dtype=self.dtype,
                                           name="position_embedding")
        self.pre_layrnorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                         dtype=self.dtype, name="pre_layrnorm")
        self.layers = [VisionEncoderLayer(c, self.dtype, self.mask_mode,
                                          name=f"layers_{i}")
                       for i in range(c.num_layers)]
        self.post_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           dtype=self.dtype,
                                           name="post_layernorm")

    def __call__(
        self,
        pixel_values: jnp.ndarray,  # [B, H, W, 3] NHWC, CLIP-normalized
        attn_mask: Optional[jnp.ndarray] = None,  # [B, H, W] spatial {0,1}
        feature_layer: Optional[int] = None,  # static; HF hidden_states index
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Returns (features [B,L,D], pooled [B,D], token_mask [B,L,1] or
        None) — the reference returns the resized flattened mask alongside
        (`:727-730`). `feature_layer` selects which hidden state to return
        as features, indexed like HF `hidden_states` (0 = embeddings,
        -1 = last layer output); the zero-shot path uses -2
        (`ddpm.py:2424-2426`). None = last layer output."""
        c = self.cfg
        patches = self.patch_embedding(pixel_values)  # [B, g, g, D]
        B = patches.shape[0]
        tokens = patches.reshape(B, c.grid * c.grid, c.hidden_size)
        cls = jnp.broadcast_to(self.class_embedding.astype(tokens.dtype),
                               (B, 1, c.hidden_size))
        x = jnp.concatenate([cls, tokens], axis=1)
        x = x + self.position_embedding(jnp.arange(c.num_tokens, dtype=jnp.int32))
        x = self.pre_layrnorm(x)

        token_mask = None
        pair_mask = None
        if attn_mask is not None:
            token_mask = resize_mask_to_grid(attn_mask, c.grid)  # [B, L]
            pair_mask = token_mask[:, :, None] * token_mask[:, None, :]

        hidden = [x]  # hidden[i] == HF hidden_states[i]
        for layer in self.layers:
            x = layer(x, pair_mask)
            hidden.append(x)

        feats = hidden[feature_layer] if feature_layer is not None else x
        pooled = self.post_layernorm(x[:, 0])
        return feats, pooled, (token_mask[..., None] if token_mask is not None else None)


# CLIP image preprocessing constants (OpenAI CLIPImageProcessor)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] uint8/float [0,255] -> CLIP-normalized [B, S, S, 3].

    Bilinear resize + normalize, the device-side half of
    `CLIPImageProcessor` (`ddpm.py:2336-2341`); crop/convert stays on host.
    """
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3), "bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std
