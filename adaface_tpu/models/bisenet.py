"""BiSeNet face-parsing network (19 classes) — XLA port.

The reference generates training fg masks with the external
face-parsing.PyTorch repo's BiSeNet
(`/root/reference/scripts-private/gen_face_masks.py:1-185`: 512px bilinear
resize, ImageNet normalization, argmax over 19 part classes, non-background
-> binary mask, parts-count trash/inspect routing). This is a from-scratch
Flax/NHWC implementation of that public architecture (BiSeNet V1 with a
ResNet-18 context path; the spatial path is replaced by the res8 feature,
as in that repo):

- ResNet-18 trunk -> feat8 / feat16 / feat32;
- ContextPath: global-avg context conv + two Attention Refinement Modules
  (ARM) with top-down NEAREST upsampling and 3x3 heads (the source repo
  trains conv_head32/conv_head16 on nearest-upsampled feature maps;
  bilinear here would feed the trained checkpoint smoothed activations);
- Feature Fusion Module (FFM) fusing feat8 with the refined feat16;
- 1x1 classifier head -> [B, H, W, 19] logits at input resolution.

Inference-only: BatchNorms are folded into the preceding conv's
kernel/bias by the checkpoint mapper (`interop/bisenet.py`), so every
ConvBNReLU here is a biased conv + relu. Init'able with random weights for
shape tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

N_PARSING_CLASSES = 19


def _conv(features, kernel, stride=1, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=True, name=name)


def _resize_nearest(x, h, w):
    """F.interpolate(mode='nearest') of the source repo's ContextPath —
    identical to torch for the exact-2x upsamples used there."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="nearest")


def _resize_bilinear_ac(x, h, w):
    """Bilinear with align_corners=True (the source repo's final logits
    upsample, F.interpolate(..., mode='bilinear', align_corners=True)) —
    jax.image.resize implements half-pixel centers only, so the corner-
    aligned sample grid is built explicitly."""
    b, ih, iw, c = x.shape

    def grid(n_out, n_in):
        if n_out <= 1 or n_in <= 1:
            return jnp.zeros((max(n_out, 1),), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys, xs = grid(h, ih), grid(w, iw)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    gather = lambda yi, xi: x[:, yi][:, :, xi]
    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(self.features, 3, self.stride, name="conv1")(x))
        h = _conv(self.features, 3, name="conv2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _conv(self.features, 1, self.stride, name="downsample")(x)
        return nn.relu(x + h)


class ResNet18(nn.Module):
    """Returns (feat8, feat16, feat32) — strides 8/16/32."""

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(64, 7, 2, name="conv1")(x))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            h = BasicBlock(64, name=f"layer1_{i}")(h)
        h = BasicBlock(128, 2, name="layer2_0")(h)
        h = BasicBlock(128, name="layer2_1")(h)
        feat8 = h
        h = BasicBlock(256, 2, name="layer3_0")(h)
        h = BasicBlock(256, name="layer3_1")(h)
        feat16 = h
        h = BasicBlock(512, 2, name="layer4_0")(h)
        h = BasicBlock(512, name="layer4_1")(h)
        return feat8, feat16, h


class ARM(nn.Module):
    """Attention Refinement Module: 3x3 conv, then a global channel gate."""

    features: int

    @nn.compact
    def __call__(self, x):
        feat = nn.relu(_conv(self.features, 3, name="conv")(x))
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = _conv(self.features, 1, name="conv_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class FFM(nn.Module):
    """Feature Fusion Module: 1x1 fuse + squeeze-excite residual gate."""

    features: int

    @nn.compact
    def __call__(self, sp, cp):
        feat = nn.relu(_conv(self.features, 1, name="convblk")(
            jnp.concatenate([sp, cp], axis=-1)))
        a = feat.mean(axis=(1, 2), keepdims=True)
        a = nn.relu(_conv(self.features // 4, 1, name="conv1")(a))
        a = jax.nn.sigmoid(_conv(self.features, 1, name="conv2")(a))
        return feat * a + feat


class Head(nn.Module):
    """BiSeNetOutput: 3x3 conv head + 1x1 classifier."""

    mid: int
    n_classes: int = N_PARSING_CLASSES

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(self.mid, 3, name="conv")(x))
        return _conv(self.n_classes, 1, name="conv_out")(h)


class BiSeNet(nn.Module):
    n_classes: int = N_PARSING_CLASSES

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] ImageNet-normalized. Returns [B, H, W, classes]
        logits (the main head only — aux heads exist solely to consume the
        checkpoint's weights and are not computed)."""
        B, H, W, _ = x.shape
        feat8, feat16, feat32 = ResNet18(name="resnet")(x)

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = nn.relu(_conv(128, 1, name="conv_avg")(avg))
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        f32 = ARM(128, name="arm32")(feat32) + avg_up
        f32 = _resize_nearest(f32, *feat16.shape[1:3])
        f32 = nn.relu(_conv(128, 3, name="conv_head32")(f32))

        f16 = ARM(128, name="arm16")(feat16) + f32
        f16 = _resize_nearest(f16, *feat8.shape[1:3])
        f16 = nn.relu(_conv(128, 3, name="conv_head16")(f16))

        fused = FFM(256, name="ffm")(feat8, f16)
        out = Head(256, self.n_classes, name="conv_out")(fused)
        return _resize_bilinear_ac(out, H, W)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> ImageNet-normalized float32 (the reference's
    `to_tensor` + Normalize, `gen_face_masks.py:84-88`)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def parsing_to_mask(parsing: jnp.ndarray):
    """argmax parsing [B, H, W] -> (binary mask uint8 [B, H, W],
    parts count [B]): every non-background class is foreground
    (`vis_parsing_maps`, `gen_face_masks.py:44-50`); the unique-parts count
    feeds the <=9 trash / >=18 inspect routing (`:148-163`)."""
    mask = (parsing != 0).astype(jnp.uint8) * 255
    onehot = jax.nn.one_hot(parsing, N_PARSING_CLASSES, axis=-1)
    parts = (onehot.max(axis=(1, 2)) > 0).sum(axis=-1).astype(jnp.int32)
    return mask, parts
