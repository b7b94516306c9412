"""AutoencoderKL (SD VAE), TPU-native NHWC.

Re-implementation of the reference's `ldm/models/autoencoder.py:285-424` +
`ldm/modules/diffusionmodules/model.py` (Encoder/Decoder/ResnetBlock/
AttnBlock) with:

- NHWC layout throughout (XLA TPU conv-native; torch reference is NCHW),
- fp32 GroupNorm statistics (eps 1e-6, `model.py:32-34`),
- the reference's *masked* mid-attention: when fg/aug masks are provided,
  attention probabilities between heterogeneous (fg↔bg) pixel pairs are
  zeroed AFTER the softmax without renormalization (`model.py:179-246` —
  deliberately post-softmax, see the comment there about -inf leading to
  uniform rows),
- single jnp attention over the 32×32 (encode@256) / 64×64 mid feature map.

SD v1.5 config: ch=128, ch_mult=(1,2,4,4), 2 res blocks, no down/up attn
(attn_resolutions=[]), z_channels=4, double_z (`v1-inference-ada.yaml:55-76`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from adaface_tpu.ops.basic import group_norm

SD_VAE_SCALE_FACTOR = 0.18215  # ddpm.py scale_factor (v1-inference-ada.yaml:18)


@struct.dataclass
class VAEConfig:
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True

    @classmethod
    def sd_v1(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, embed_dim=4)


def _conv(features, kernel=3, stride=1, padding=1, name=None, dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = group_norm(x, self.param("norm1_scale", nn.initializers.ones, (in_ch,)),
                       self.param("norm1_bias", nn.initializers.zeros, (in_ch,)), 32, 1e-6)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, name="conv1", dtype=self.dtype)(h)
        h = group_norm(h, self.param("norm2_scale", nn.initializers.ones, (self.out_ch,)),
                       self.param("norm2_bias", nn.initializers.zeros, (self.out_ch,)), 32, 1e-6)
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, name="conv2", dtype=self.dtype)(h)
        if in_ch != self.out_ch:
            x = _conv(self.out_ch, kernel=1, padding=0, name="nin_shortcut", dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention with optional fg/bg mask isolation
    (`model.py:179-246`). The unmasked path (decode, and encode without fg
    masks) runs through the Pallas flash kernel on TPU — the einsum path
    materializes [B, L, L] fp32 logits (67 MB/image at 64x64), which is the
    single largest VAE inefficiency. The masked path needs the explicit
    probability matrix (post-softmax zeroing without renorm) and keeps the
    einsum."""

    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, fg_mask: Optional[jnp.ndarray] = None,
                 aug_mask: Optional[jnp.ndarray] = None):
        c = x.shape[-1]
        h = group_norm(x, self.param("norm_scale", nn.initializers.ones, (c,)),
                       self.param("norm_bias", nn.initializers.zeros, (c,)), 32, 1e-6)
        q = _conv(c, kernel=1, padding=0, name="q", dtype=self.dtype)(h)
        k = _conv(c, kernel=1, padding=0, name="k", dtype=self.dtype)(h)
        v = _conv(c, kernel=1, padding=0, name="v", dtype=self.dtype)(h)
        b, hh, ww, _ = q.shape
        l = hh * ww
        qf, kf, vf = (t.reshape(b, l, c) for t in (q, k, v))

        if fg_mask is None and self.use_flash and l >= 1024:
            # query-chunked attention: peak logits footprint L*chunk instead
            # of L*L (the D=512 single head is too wide for the Pallas
            # flash kernel's VMEM-resident K/V)
            scale = c ** -0.5
            chunk = 512
            outs = []
            for s in range(0, l, chunk):
                lg = jnp.einsum("bic,bjc->bij", qf[:, s:s + chunk], kf,
                                preferred_element_type=jnp.float32) * scale
                p = jax.nn.softmax(lg, axis=-1).astype(vf.dtype)
                outs.append(jnp.einsum("bij,bjc->bic", p, vf))
            out = jnp.concatenate(outs, axis=1).reshape(b, hh, ww, c)
            return x + _conv(c, kernel=1, padding=0, name="proj_out",
                             dtype=self.dtype)(out)

        logits = jnp.einsum("bic,bjc->bij", qf, kf, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1)

        if fg_mask is not None:
            # masks arrive [B, H0, W0, 1] at image res; nearest-resize to (hh, ww)
            fg = _nearest_resize(fg_mask, hh, ww).astype(jnp.float32)
            bg = 1.0 - fg
            if aug_mask is not None:
                aug = _nearest_resize(aug_mask, hh, ww).astype(jnp.float32)
                fg = fg * aug
                bg = bg * aug
            fgf = fg.reshape(b, l)
            bgf = bg.reshape(b, l)
            homo = (jnp.einsum("bi,bj->bij", fgf, fgf) > 0) | (
                jnp.einsum("bi,bj->bij", bgf, bgf) > 0)
            # post-softmax zeroing of heterogeneous pairs, no renorm (model.py:238)
            probs = jnp.where(homo, probs, 0.0)

        out = jnp.einsum("bij,bjc->bic", probs.astype(vf.dtype), vf).reshape(b, hh, ww, c)
        return x + _conv(c, kernel=1, padding=0, name="proj_out", dtype=self.dtype)(out)


def _nearest_resize(m, h, w):
    """Nearest resize with torch F.interpolate(mode='nearest') index
    semantics (src = floor(dst * in/out)) so masked attention matches the
    reference bit-for-bit at the index level."""
    ih, iw = m.shape[1:3]
    ridx = (jnp.arange(h) * ih) // h
    cidx = (jnp.arange(w) * iw) // w
    return m[:, ridx][:, :, cidx]


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch pads (left,right,top,bottom)=(0,1,0,1) then stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from adaface_tpu import knobs

        b, h, w, c = x.shape
        if knobs.get("ADAFACE_SUBPIXEL_UP") != "0":
            # phase-decomposed upsample+conv (ops/subpixel.py): 0.44x the
            # flops of conv-on-upsampled, no HBM upsampled intermediate
            from adaface_tpu.ops.subpixel import (
                make_conv_params_module, upsample2x_conv)

            k, bias = make_conv_params_module()(c, name="conv")(c)
            return upsample2x_conv(x.astype(self.dtype), k.astype(self.dtype),
                                   bias.astype(self.dtype))
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return _conv(c, name="conv", dtype=self.dtype)(x)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fg_mask=None, aug_mask=None):
        c = self.cfg
        h = _conv(c.ch, name="conv_in", dtype=self.dtype)(x)
        for i, mult in enumerate(c.ch_mult):
            for j in range(c.num_res_blocks):
                h = ResnetBlock(c.ch * mult, self.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(c.ch_mult) - 1:
                h = Downsample(self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h, fg_mask, aug_mask)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = group_norm(h, self.param("norm_out_scale", nn.initializers.ones, (h.shape[-1],)),
                       self.param("norm_out_bias", nn.initializers.zeros, (h.shape[-1],)), 32, 1e-6)
        h = jax.nn.silu(h)
        out_ch = 2 * c.z_channels if c.double_z else c.z_channels
        return _conv(out_ch, name="conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        block_in = c.ch * c.ch_mult[-1]
        h = _conv(block_in, name="conv_in", dtype=self.dtype)(z)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(c.ch_mult))):
            for j in range(c.num_res_blocks + 1):
                h = ResnetBlock(c.ch * c.ch_mult[i], self.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(self.dtype, name=f"up_{i}_upsample")(h)
        h = group_norm(h, self.param("norm_out_scale", nn.initializers.ones, (h.shape[-1],)),
                       self.param("norm_out_bias", nn.initializers.zeros, (h.shape[-1],)), 32, 1e-6)
        h = jax.nn.silu(h)
        return _conv(c.out_channels, name="conv_out", dtype=self.dtype)(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) latent Gaussian; decode. Matches
    `ldm/models/autoencoder.py:285-345` incl. quant/post_quant 1x1 convs."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c, self.dtype, name="encoder")
        self.decoder = Decoder(c, self.dtype, name="decoder")
        mul = 2 if c.double_z else 1
        self.quant_conv = nn.Conv(mul * c.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(c.z_channels, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x, fg_mask=None, aug_mask=None):
        """Returns (mean, logvar), each [B, h, w, embed_dim], logvar clamped
        to [-30, 20] like DiagonalGaussianDistribution."""
        moments = self.quant_conv(self.encoder(x, fg_mask, aug_mask))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng, sample: bool = True, fg_mask=None, aug_mask=None):
        mean, logvar = self.encode(x, fg_mask, aug_mask)
        if sample:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar


def sample_posterior(mean, logvar, rng):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
