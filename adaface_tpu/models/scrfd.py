"""SCRFD face detector (insightface antelopev2's `scrfd_10g_bnkps`) — XLA port.

The reference's training-time face stack is insightface
`FaceAnalysis(name='antelopev2')` whose detector is SCRFD-10G with
batch-norm and keypoints, run via onnxruntime
(`/root/reference/ldm/models/diffusion/ddpm.py:904-933`,
`ldm/util.py:1240-1321`). This is the TPU-native equivalent: the conv tower
(backbone + neck + head) runs in Flax/XLA; anchor decode + NMS stay on host
(SURVEY.md §7.2's host/device boundary). It replaces the round-1
RetinaFace-MobileNet stand-in for training-time detection parity.

Architecture (per the insightface SCRFD release configs; sizes are
config-driven so other SCRFD variants map too):

- backbone: ResNetV1e — deep 3x3x3 stem, BasicBlocks, per-stage
  (blocks, planes) from the 10G NAS search result;
- neck: PAFPN over the last 3 stages (top-down FPN + bottom-up path
  aggregation), lateral 1x1 + fpn 3x3 convs;
- head: shared SCRFD head applied per scale (strides 8/16/32): stacked
  3x3 conv+GN+ReLU towers, then 1x1 predictors for score (1/anchor,
  sigmoid), bbox distances (4/anchor) and 5-point kps distances
  (10/anchor); 2 anchors per location.

Decode follows insightface `scrfd.py` exactly: `distance2bbox`/
`distance2kps` from anchor centers at `(x*stride, y*stride)` with the
distance predictions scaled by stride, score threshold then greedy NMS.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from adaface_tpu.models.retinaface import nms

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2
NUM_KPS = 5


@struct.dataclass
class SCRFDConfig:
    # ResNetV1e backbone: NAS-searched stage widths/depths of SCRFD-10G
    stem_channels: int = 28  # stem convs run at stem_channels, out 2x
    stage_blocks: tuple = (3, 5, 2, 3)
    stage_planes: tuple = (56, 88, 88, 224)
    neck_out: int = 56
    head_stacked_convs: int = 4
    head_feat_channels: int = 80
    gn_groups: int = 8

    @classmethod
    def scrfd_10g(cls) -> "SCRFDConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SCRFDConfig":
        return cls(stem_channels=8, stage_blocks=(1, 1, 1, 1),
                   stage_planes=(16, 16, 16, 16), neck_out=16,
                   head_stacked_convs=1, head_feat_channels=16,
                   gn_groups=4)


def _conv(out, k=3, s=1, name=None, use_bias=False):
    pad = (k - 1) // 2
    return nn.Conv(out, (k, k), strides=(s, s),
                   padding=[(pad, pad), (pad, pad)], use_bias=use_bias,
                   name=name)


class BN(nn.Module):
    """Inference-mode batch norm (running stats are parameters: imported
    checkpoints are frozen; synthetic init gives identity)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        inv = scale * jax.lax.rsqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        h = _conv(self.planes, 3, self.stride, name="conv1")(x)
        h = BN(name="bn1")(h)
        h = nn.relu(h)
        h = _conv(self.planes, 3, 1, name="conv2")(h)
        h = BN(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            # ResNetV1e downsample: 2x2 avg-pool then 1x1 conv
            if self.stride != 1:
                identity = nn.avg_pool(x, (2, 2), strides=(2, 2))
            identity = _conv(self.planes, 1, 1, name="ds_conv")(identity)
            identity = BN(name="ds_bn")(identity)
        return nn.relu(h + identity)


class ResNetV1e(nn.Module):
    cfg: SCRFDConfig

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        c = self.cfg
        # deep stem: 3x3/2 -> 3x3 -> 3x3, widths (s, s, 2s)
        h = nn.relu(BN(name="stem_bn1")(_conv(c.stem_channels, 3, 2,
                                              name="stem1")(x)))
        h = nn.relu(BN(name="stem_bn2")(_conv(c.stem_channels, 3, 1,
                                              name="stem2")(h)))
        h = nn.relu(BN(name="stem_bn3")(_conv(c.stem_channels * 2, 3, 1,
                                              name="stem3")(h)))
        outs = []
        for i, (blocks, planes) in enumerate(zip(c.stage_blocks,
                                                 c.stage_planes)):
            for j in range(blocks):
                stride = 2 if j == 0 else 1
                h = BasicBlock(planes, stride, name=f"layer{i + 1}_{j}")(h)
            outs.append(h)
        return outs  # strides 4, 8, 16, 32


class PAFPN(nn.Module):
    """Path-aggregation FPN over the last 3 backbone stages -> 3 maps at
    strides 8/16/32, all `neck_out` channels."""

    cfg: SCRFDConfig

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        c = self.cfg.neck_out
        used = feats[-3:]
        lat = [_conv(c, 1, 1, name=f"lateral_{i}", use_bias=True)(f)
               for i, f in enumerate(used)]
        # top-down
        for i in range(len(lat) - 1, 0, -1):
            b, h, w, _ = lat[i - 1].shape
            up = jax.image.resize(lat[i], (b, h, w, c), method="nearest")
            lat[i - 1] = lat[i - 1] + up
        inter = [_conv(c, 3, 1, name=f"fpn_{i}", use_bias=True)(l)
                 for i, l in enumerate(lat)]
        # bottom-up path aggregation
        outs = [inter[0]]
        for i in range(1, len(inter)):
            down = _conv(c, 3, 2, name=f"down_{i - 1}", use_bias=True)(
                outs[-1])
            outs.append(inter[i] + down)
        return [_conv(c, 3, 1, name=f"pafpn_{i}", use_bias=True)(o)
                for i, o in enumerate(outs)]


class SCRFDHead(nn.Module):
    """Shared head applied to each scale: conv+GN+ReLU tower, kps branch
    rides the reg tower (the `bnkps` variant)."""

    cfg: SCRFDConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        cls = reg = x
        for i in range(c.head_stacked_convs):
            cls = _conv(c.head_feat_channels, 3, 1, name=f"cls_conv_{i}",
                        use_bias=True)(cls)
            cls = nn.GroupNorm(num_groups=c.gn_groups,
                               name=f"cls_gn_{i}")(cls)
            cls = nn.relu(cls)
            reg = _conv(c.head_feat_channels, 3, 1, name=f"reg_conv_{i}",
                        use_bias=True)(reg)
            reg = nn.GroupNorm(num_groups=c.gn_groups,
                               name=f"reg_gn_{i}")(reg)
            reg = nn.relu(reg)
        score = _conv(NUM_ANCHORS * 1, 1, 1, name="cls_pred",
                      use_bias=True)(cls)
        bbox = _conv(NUM_ANCHORS * 4, 1, 1, name="bbox_pred",
                     use_bias=True)(reg)
        kps = _conv(NUM_ANCHORS * NUM_KPS * 2, 1, 1, name="kps_pred",
                    use_bias=True)(reg)
        return jax.nn.sigmoid(score), bbox, kps


class SCRFD(nn.Module):
    cfg: SCRFDConfig

    @nn.compact
    def __call__(self, x) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """x: [B, H, W, 3] normalized ((rgb - 127.5) / 128). Returns per
        stride (8, 16, 32): (scores [B,h,w,2], bbox [B,h,w,8],
        kps [B,h,w,20]) — distances in stride units, like the onnx model."""
        feats = ResNetV1e(self.cfg, name="backbone")(x)
        maps = PAFPN(self.cfg, name="neck")(feats)
        head = SCRFDHead(self.cfg, name="head")
        return [head(m) for m in maps]


# ------------------------------------------------------------- host decode

def distance2bbox(centers: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """(l, t, r, b) stride-scaled distances -> x1y1x2y2 (insightface
    `scrfd.py:distance2bbox`)."""
    return np.stack([centers[:, 0] - dist[:, 0], centers[:, 1] - dist[:, 1],
                     centers[:, 0] + dist[:, 2], centers[:, 1] + dist[:, 3]],
                    axis=-1)


def distance2kps(centers: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """[N, 10] offsets -> [N, 5, 2] keypoints."""
    pts = dist.reshape(-1, NUM_KPS, 2) + centers[:, None, :]
    return pts


def decode_scrfd(outputs, score_thresh: float = 0.5,
                 nms_thresh: float = 0.4) -> List[tuple]:
    """Per-stride head outputs (numpy, batch 1) -> detections
    [(bbox[4], kps[5,2], score)], insightface `SCRFD.forward/detect`
    semantics: distances are multiplied by stride, anchor centers are
    `(x, y) * stride` repeated per anchor, threshold then greedy NMS."""
    boxes_all, kps_all, scores_all = [], [], []
    for stride, (score, bbox, kps) in zip(STRIDES, outputs):
        s = np.asarray(score)[0].reshape(-1)  # [h*w*2]
        h, w = np.asarray(score).shape[1:3]
        b = np.asarray(bbox)[0].reshape(h * w, NUM_ANCHORS, 4) * stride
        k = np.asarray(kps)[0].reshape(h * w, NUM_ANCHORS, NUM_KPS * 2) * stride
        yy, xx = np.mgrid[:h, :w]
        centers = np.stack([xx.ravel(), yy.ravel()], axis=-1) * stride
        centers = np.repeat(centers, NUM_ANCHORS, axis=0).astype(np.float32)
        keep = np.nonzero(s >= score_thresh)[0]
        if len(keep) == 0:
            continue
        boxes_all.append(distance2bbox(centers[keep],
                                       b.reshape(-1, 4)[keep]))
        kps_all.append(distance2kps(centers[keep],
                                    k.reshape(-1, NUM_KPS * 2)[keep]))
        scores_all.append(s[keep])
    if not boxes_all:
        return []
    boxes = np.concatenate(boxes_all)
    kps = np.concatenate(kps_all)
    scores = np.concatenate(scores_all)
    order = nms(boxes, scores, nms_thresh)
    return [(boxes[i], kps[i], float(scores[i])) for i in order]


class SCRFDDetector:
    """`detect_fn`-compatible wrapper (see `face_app.py`): letterbox to
    `input_size` (top-left pad, like insightface `SCRFD.detect`), jitted
    XLA forward, host decode, boxes/kps rescaled to the original frame."""

    def __init__(self, model: SCRFD, params: dict,
                 input_size: Tuple[int, int] = (640, 640),
                 score_thresh: float = 0.5, nms_thresh: float = 0.4):
        self.model = model
        self.params = params
        self.input_size = input_size
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self._fwd = jax.jit(
            lambda p, x: model.apply({"params": p}, x))

    def __call__(self, image: np.ndarray) -> List[tuple]:
        H, W = image.shape[:2]
        ih, iw = self.input_size
        scale = min(ih / H, iw / W)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        try:
            from PIL import Image as PILImage

            resized = np.asarray(PILImage.fromarray(
                image.astype(np.uint8)).resize((nw, nh)))
        except ImportError:
            yi = (np.arange(nh) * H / nh).astype(int)
            xi = (np.arange(nw) * W / nw).astype(int)
            resized = image[yi][:, xi]
        canvas = np.zeros((ih, iw, 3), np.float32)
        canvas[:nh, :nw] = resized
        x = (canvas - 127.5) / 128.0
        outs = self._fwd(self.params, jnp.asarray(x[None]))
        dets = decode_scrfd([(np.asarray(a), np.asarray(b), np.asarray(c))
                             for a, b, c in outs],
                            self.score_thresh, self.nms_thresh)
        return [(box / scale, kp / scale, sc) for box, kp, sc in dets]


def init_scrfd(key: jax.Array, cfg: Optional[SCRFDConfig] = None,
               input_size: Tuple[int, int] = (640, 640)):
    """(model, params) with synthetic weights."""
    cfg = cfg or SCRFDConfig.scrfd_10g()
    model = SCRFD(cfg)
    x = jnp.zeros((1, input_size[0], input_size[1], 3), jnp.float32)
    params = model.init(key, x)["params"]
    return model, params
