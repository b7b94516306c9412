"""ArcFace face recognizer (IResNet) — XLA port of the ONNX model.

The reference embeds faces with insightface antelopev2's `glintr100`
recognizer (IResNet-100 trained with ArcFace loss) through onnxruntime
(`ddpm.py:904-919,2343-2365`, `eval_utils.py:155-218`). The BASELINE north
star asks for the recognition forward ported to XLA; this is that port:

IResNet (insightface `iresnet.py` layout):
  conv3x3(64, s1) -> BN -> PReLU
  4 stages of IBasicBlocks, channels (64, 128, 256, 512),
  depths: iresnet50 = (3, 4, 14, 3), iresnet100 = (3, 13, 30, 3)
  IBasicBlock: BN -> conv3x3 -> BN -> PReLU -> conv3x3(stride) -> BN,
               + shortcut (1x1 conv + BN when stride/channels change)
  head: BN -> flatten -> FC(512) -> BN(no affine scale in some exports)

Input: 112x112 RGB, ArcFace preprocessing (x - 127.5) / 127.5, NHWC here.
Output: 512-d embedding; callers L2-normalize (`normed_embedding`).

Weights load from the ONNX file via `interop.onnx_weights` +
`map_arcface_onnx_params` (topology-driven name mapping — insightface ONNX
exports use opaque numeric initializer names, so the mapping walks the
graph's Conv/BatchNormalization/PRelu/Gemm node order).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct


@struct.dataclass
class IResNetConfig:
    depths: Tuple[int, ...] = (3, 13, 30, 3)  # iresnet100
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    emb_dim: int = 512
    input_size: int = 112
    bn_eps: float = 1e-5

    @classmethod
    def iresnet100(cls) -> "IResNetConfig":
        return cls()

    @classmethod
    def iresnet50(cls) -> "IResNetConfig":
        return cls(depths=(3, 4, 14, 3))

    @classmethod
    def tiny(cls) -> "IResNetConfig":
        return cls(depths=(1, 1, 1, 1), channels=(8, 8, 16, 16),
                   emb_dim=32, input_size=16)


class BN(nn.Module):
    """Inference-mode BatchNorm folded as scale/shift (training uses the
    frozen recognizer, so running stats are baked parameters)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class IBasicBlock(nn.Module):
    out_ch: int
    stride: int
    bn_eps: float

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, s, name: nn.Conv(
            ch, (3, 3), strides=(s, s), padding=1, use_bias=False, name=name)
        y = BN(self.bn_eps, name="bn1")(x)
        y = conv(self.out_ch, 1, "conv1")(y)
        y = BN(self.bn_eps, name="bn2")(y)
        y = PReLU(name="prelu")(y)
        y = conv(self.out_ch, self.stride, "conv2")(y)
        y = BN(self.bn_eps, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="downsample_conv")(x)
            x = BN(self.bn_eps, name="downsample_bn")(x)
        return y + x


class IResNet(nn.Module):
    cfg: IResNetConfig = IResNetConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, S, S, 3] ArcFace-normalized NHWC -> [B, emb_dim]."""
        c = self.cfg
        x = nn.Conv(c.channels[0], (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        x = BN(c.bn_eps, name="bn1")(x)
        x = PReLU(name="prelu1")(x)
        for si, (depth, ch) in enumerate(zip(c.depths, c.channels)):
            for bi in range(depth):
                x = IBasicBlock(ch, 2 if bi == 0 else 1, c.bn_eps,
                                name=f"layer{si + 1}_{bi}")(x)
        x = BN(c.bn_eps, name="bn2")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(c.emb_dim, name="fc")(x)
        x = BN(c.bn_eps, name="features")(x)
        return x


def preprocess_faces(images: jnp.ndarray, size: int = 112) -> jnp.ndarray:
    """[B, H, W, 3] uint8 RGB -> ArcFace-normalized [B, S, S, 3]
    ((x - 127.5) / 127.5, bilinear resize; insightface `face_align` handles
    alignment before this on host)."""
    x = images.astype(jnp.float32)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bilinear")
    return (x - 127.5) / 127.5


def map_arcface_onnx_params(weights: dict, nodes: Sequence[dict],
                            cfg: IResNetConfig = IResNetConfig()) -> dict:
    """ONNX (initializers + node list from `load_onnx_weights(with_graph=
    True)`) -> IResNet params. Walks Conv/BatchNormalization/PRelu/Gemm
    nodes in graph order, which for insightface exports equals the forward
    order used above. Conv weights OIHW -> HWIO; Gemm [out,in] -> [in,out].
    """
    convs = [n for n in nodes if n["op_type"] == "Conv"]
    bns = [n for n in nodes if n["op_type"] == "BatchNormalization"]
    prelus = [n for n in nodes if n["op_type"] == "PRelu"]
    gemms = [n for n in nodes if n["op_type"] == "Gemm"]

    ci = iter(convs)
    bi = iter(bns)
    pi = iter(prelus)

    def take_conv():
        n = next(ci)
        w = weights[n["input"][1]].astype(np.float32)
        return {"kernel": w.transpose(2, 3, 1, 0)}

    def take_bn():
        n = next(bi)
        s, b, m, v = (weights[n["input"][k]].astype(np.float32)
                      for k in (1, 2, 3, 4))
        return {"scale": s, "bias": b, "mean": m, "var": v}

    def take_prelu():
        n = next(pi)
        a = weights[n["input"][1]].astype(np.float32).reshape(-1)
        return {"alpha": a}

    params = {"conv1": take_conv(), "bn1": take_bn(), "prelu1": take_prelu()}
    for si, (depth, ch) in enumerate(zip(cfg.depths, cfg.channels)):
        for bidx in range(depth):
            blk = {
                "bn1": take_bn(),
                "conv1": take_conv(),
                "bn2": take_bn(),
                "prelu": take_prelu(),
                "conv2": take_conv(),
                "bn3": take_bn(),
            }
            if bidx == 0:  # stride-2 first block always has a downsample
                blk["downsample_conv"] = take_conv()
                blk["downsample_bn"] = take_bn()
            params[f"layer{si + 1}_{bidx}"] = blk
    params["bn2"] = take_bn()
    g = gemms[0]
    w = weights[g["input"][1]].astype(np.float32)
    fc = {"kernel": w.T}
    if len(g["input"]) > 2:
        fc["bias"] = weights[g["input"][2]].astype(np.float32)
    else:
        fc["bias"] = np.zeros(w.shape[0], np.float32)
    params["fc"] = fc
    params["features"] = take_bn()
    return params


# ------------------------------------------------------------------ align

# insightface `arcface_dst`: canonical 5-point template for 112x112 crops
ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)


def estimate_norm(landmarks: np.ndarray, size: int = 112) -> np.ndarray:
    """Umeyama similarity transform from 5 detected landmarks to the
    ArcFace template (insightface `face_align.estimate_norm`). Returns a
    2x3 affine matrix."""
    src = np.asarray(landmarks, np.float32)
    dst = ARCFACE_DST * (size / 112.0)
    src_mean = src.mean(0)
    dst_mean = dst.mean(0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / src.shape[0]
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    diag = np.diag([1.0, d])
    var_src = (src_c ** 2).sum() / src.shape[0]
    scale = np.trace(np.diag(s) @ diag) / var_src
    R = u @ diag @ vt
    M = np.zeros((2, 3), np.float32)
    M[:2, :2] = scale * R
    M[:, 2] = dst_mean - scale * R @ src_mean
    return M


def warp_affine(image: np.ndarray, M: np.ndarray, size: int = 112) -> np.ndarray:
    """Bilinear affine crop with zero border (host-side, numpy) — the
    alignment warp insightface does with `cv2.warpAffine` (default
    INTER_LINEAR, borderValue=0) before embedding."""
    A = np.vstack([M, [0, 0, 1]]).astype(np.float32)
    Ainv = np.linalg.inv(A)
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones], axis=-1).reshape(-1, 3).astype(np.float32)
    pts = pts @ Ainv.T
    sx, sy = pts[:, 0], pts[:, 1]
    h, w = image.shape[:2]
    img = image.astype(np.float32)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0)[:, None]
    fy = (sy - y0)[:, None]

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        vals = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
        return np.where(valid[:, None], vals, 0.0)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    out = (top * (1 - fy) + bot * fy).reshape(size, size, -1)
    if np.issubdtype(image.dtype, np.integer):
        info = np.iinfo(image.dtype)
        out = np.clip(np.rint(out), info.min, info.max).astype(image.dtype)
    return out


def warp_affine_jax(image: jnp.ndarray, Ms: jnp.ndarray,
                    size: int = 112) -> jnp.ndarray:
    """Device-side BATCHED bilinear affine crop, zero border — the XLA
    form of the insightface `face_align.norm_crop` warp so that
    align+crop+normalize+embed runs as ONE device program with no host
    round-trips (BASELINE config 4: "fused face-align preprocessing";
    reference host path: `cv2.warpAffine` in insightface then ONNX
    forward, `ddpm.py:2343-2365`).

    image: [H, W, C] uint8/float; Ms: [N, 2, 3] forward (src->dst)
    similarity transforms from `estimate_norm`. Returns [N, size, size, C]
    float32 crops. Jittable; grid coordinates are traced, so one compile
    per (H, W) — callers bucket the canvas (see `FaceApp`)."""
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)
    a, b_, tx = Ms[:, 0, 0], Ms[:, 0, 1], Ms[:, 0, 2]
    c_, d_, ty = Ms[:, 1, 0], Ms[:, 1, 1], Ms[:, 1, 2]
    det = a * d_ - b_ * c_
    ys, xs = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32), indexing="ij")
    dx = xs.reshape(-1)[None, :] - tx[:, None]          # [N, P]
    dy = ys.reshape(-1)[None, :] - ty[:, None]
    sx = (d_[:, None] * dx - b_[:, None] * dy) / det[:, None]
    sy = (-c_[:, None] * dx + a[:, None] * dy) / det[:, None]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return jnp.where(valid[..., None], img[yc, xc], 0.0)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    out = top * (1 - fy) + bot * fy
    if jnp.issubdtype(image.dtype, jnp.integer):
        # cv2.warpAffine on integer images rounds the interpolated crop
        # back to the integer dtype — match it so the device path embeds
        # the same pixels as the host/insightface path
        info = jnp.iinfo(image.dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.reshape(Ms.shape[0], size, size, -1)
