"""Generic pre-LN Vision Transformer (HF `ViTModel`-compatible) — used for
the DINO ViT-S/16 evaluator and object-identity embeddings.

The reference consumes `facebook/dino-vits16` via HF `ViTModel`
(`evaluation/dino_eval.py:8-16`, `ddpm.py:921-933`) and uses only the
CLS-token feature of the final (layernormed) hidden state. This is the
equivalent tower in Flax NHWC: conv patch embedding (with bias, unlike
CLIP's), prepended CLS token, learned position embeddings, pre-LN blocks
with exact GELU, final LayerNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct


@struct.dataclass
class ViTConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    image_size: int = 224
    patch_size: int = 16
    layer_norm_eps: float = 1e-12

    @classmethod
    def dino_vits16(cls, **kw) -> "ViTConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        d = dict(hidden_size=64, num_layers=2, num_heads=4,
                 intermediate_size=128, image_size=32, patch_size=16)
        d.update(kw)
        return cls(**d)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid + 1


class ViTSelfAttention(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h, d = c.num_heads, c.hidden_size // c.num_heads
        b, l, _ = x.shape
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)
        split = lambda t: t.reshape(b, l, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk",
                            split(dense("query")(x)) * (d ** -0.5),
                            split(dense("key")(x)),
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(dense("value")(x)))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c.hidden_size)
        return dense("out")(out)


class ViTLayer(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        x = x + ViTSelfAttention(c, self.dtype, name="attention")(
            ln("layernorm_before")(x))
        y = ln("layernorm_after")(x)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(y)
        return x + y


class ViTEncoder(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B, S, S, 3] -> final-LN hidden states [B, L, D]; CLS feature is
        `out[:, 0]` (`dino_eval.py:49-53`)."""
        c = self.cfg
        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size),
                          dtype=self.dtype, name="patch_embedding")(pixel_values)
        B = patches.shape[0]
        tokens = patches.reshape(B, c.grid * c.grid, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(tokens.dtype),
                                              (B, 1, c.hidden_size)), tokens], axis=1)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, c.num_tokens, c.hidden_size))
        x = x + pos.astype(x.dtype)
        for i in range(c.num_layers):
            x = ViTLayer(c, self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="layernorm")(x)


# HF ViTFeatureExtractor (imagenet) normalization (`dino_eval.py:17-42`)
VIT_IMAGE_MEAN = (0.485, 0.456, 0.406)
VIT_IMAGE_STD = (0.229, 0.224, 0.225)


def preprocess_vit_images(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] uint8/[0,255] -> imagenet-normalized [B, S, S, 3]."""
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3), "bilinear")
    return (x - jnp.asarray(VIT_IMAGE_MEAN)) / jnp.asarray(VIT_IMAGE_STD)


def map_vit_params(sd, num_layers: int = 12, prefix: str = "") -> dict:
    """HF `ViTModel` state_dict -> `ViTEncoder` params."""
    g = lambda n: np.asarray(sd[prefix + n])
    params = {
        "cls_token": g("embeddings.cls_token"),
        "position_embeddings": g("embeddings.position_embeddings"),
        "patch_embedding": {
            "kernel": g("embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
            "bias": g("embeddings.patch_embeddings.projection.bias"),
        },
        "layernorm": {"scale": g("layernorm.weight"), "bias": g("layernorm.bias")},
    }
    for i in range(num_layers):
        lp = f"encoder.layer.{i}."
        dense = lambda n: {"kernel": g(lp + n + ".weight").T, "bias": g(lp + n + ".bias")}
        ln = lambda n: {"scale": g(lp + n + ".weight"), "bias": g(lp + n + ".bias")}
        params[f"layers_{i}"] = {
            "attention": {
                "query": dense("attention.attention.query"),
                "key": dense("attention.attention.key"),
                "value": dense("attention.attention.value"),
                "out": dense("attention.output.dense"),
            },
            "layernorm_before": ln("layernorm_before"),
            "layernorm_after": ln("layernorm_after"),
            "intermediate": dense("intermediate.dense"),
            "output": dense("output.dense"),
        }
    return params
