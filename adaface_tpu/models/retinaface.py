"""RetinaFace (MobileNetV1-0.25) face detector — XLA port.

The reference detects faces through ONNX sessions: insightface's detector
in training (`ddpm.py:904-919`) and deepface's RetinaFace in evaluation
(`eval_utils.py:88-153`). This is the TPU-native detector: the widely-used
RetinaFace-MobileNet0.25 architecture (biubug6/Pytorch_RetinaFace layout)
with the network forward in Flax/XLA and anchor decoding + NMS on host
(SURVEY.md §7.2's host/device boundary: detection post-processing is
branch-heavy; the conv tower is the FLOPs).

Outputs per pyramid level (strides 8/16/32, 2 anchors each): class logits,
bbox regressions (4), 5-point landmarks (10). Decode uses the standard SSD
variances (0.1, 0.2). Weights import from the reference torch checkpoint
(`mobilenet0.25_Final.pth`) via `map_retinaface_torch_params`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STRIDES = (8, 16, 32)
VARIANCES = (0.1, 0.2)


def _leaky(c_out):
    return 0.1 if c_out <= 64 else 0.0


class ConvBN(nn.Module):
    c_out: int
    stride: int = 1
    kernel: int = 3
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.c_out, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=_leaky(self.c_out)) \
                if _leaky(self.c_out) else nn.relu(x)
        return x


class ConvDW(nn.Module):
    """Depthwise-separable block (MobileNetV1)."""

    c_out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = nn.Conv(c_in, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=c_in, use_bias=False,
                    name="dw_conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="dw_bn")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Conv(self.c_out, (1, 1), use_bias=False, name="pw_conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="pw_bn")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class SSH(nn.Module):
    """Context module: 3x3 + 5x5 + 7x7 receptive branches -> concat."""

    c_out: int = 64

    @nn.compact
    def __call__(self, x):
        half = self.c_out // 2
        quarter = self.c_out // 4
        c3 = ConvBN(half, relu=False, name="conv3x3")(x)
        c5_1 = ConvBN(quarter, name="conv5x5_1")(x)
        c5 = ConvBN(quarter, relu=False, name="conv5x5_2")(c5_1)
        c7_1 = ConvBN(quarter, name="conv7x7_2")(c5_1)
        c7 = ConvBN(quarter, relu=False, name="conv7x7_3")(c7_1)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFace(nn.Module):
    out_ch: int = 64
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """[B, H, W, 3] (RGB - (104,117,123) BGR-mean convention handled by
        the caller) -> per-level (cls [B,Ni,2], bbox [B,Ni,4],
        ldm [B,Ni,10]) lists."""
        # MobileNetV1-0.25 backbone
        h = ConvBN(8, 2, name="stage1_0")(x)
        h = ConvDW(16, 1, name="stage1_1")(h)
        h = ConvDW(32, 2, name="stage1_2")(h)
        h = ConvDW(32, 1, name="stage1_3")(h)
        h = ConvDW(64, 2, name="stage1_4")(h)
        h = ConvDW(64, 1, name="stage1_5")(h)
        c1 = h  # stride 8, 64ch
        h = ConvDW(128, 2, name="stage2_0")(h)
        for i in range(1, 6):
            h = ConvDW(128, 1, name=f"stage2_{i}")(h)
        c2 = h  # stride 16, 128ch
        h = ConvDW(256, 2, name="stage3_0")(h)
        h = ConvDW(256, 1, name="stage3_1")(h)
        c3 = h  # stride 32, 256ch

        # FPN
        p3 = ConvBN(self.out_ch, kernel=1, name="fpn_output3")(c3)
        p2 = ConvBN(self.out_ch, kernel=1, name="fpn_output2")(c2)
        p1 = ConvBN(self.out_ch, kernel=1, name="fpn_output1")(c1)
        up3 = jax.image.resize(p3, p2.shape, "nearest")
        p2 = ConvBN(self.out_ch, name="fpn_merge2")(p2 + up3)
        up2 = jax.image.resize(p2, p1.shape, "nearest")
        p1 = ConvBN(self.out_ch, name="fpn_merge1")(p1 + up2)

        feats = [SSH(self.out_ch, name=f"ssh{i + 1}")(p)
                 for i, p in enumerate((p1, p2, p3))]

        outs = []
        for i, f in enumerate(feats):
            b = f.shape[0]
            cls = nn.Conv(self.num_anchors * 2, (1, 1),
                          name=f"class_head_{i}")(f).reshape(b, -1, 2)
            box = nn.Conv(self.num_anchors * 4, (1, 1),
                          name=f"bbox_head_{i}")(f).reshape(b, -1, 4)
            ldm = nn.Conv(self.num_anchors * 10, (1, 1),
                          name=f"landmark_head_{i}")(f).reshape(b, -1, 10)
            outs.append((cls, box, ldm))
        return outs


# ---------------------------------------------------------------- decoding

def make_priors(height: int, width: int) -> np.ndarray:
    """[N, 4] (cx, cy, w, h) normalized anchor boxes."""
    priors = []
    for (s, sizes) in zip(STRIDES, MIN_SIZES):
        fh = int(np.ceil(height / s))
        fw = int(np.ceil(width / s))
        for y in range(fh):
            for x in range(fw):
                for m in sizes:
                    priors.append([(x + 0.5) * s / width,
                                   (y + 0.5) * s / height,
                                   m / width, m / height])
    return np.asarray(priors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """SSD decode with variances (0.1, 0.2) -> [N, 4] xyxy normalized."""
    cxcy = priors[:, :2] + loc[:, :2] * VARIANCES[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * VARIANCES[1])
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=1)
    return boxes


def decode_landmarks(ldm: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """[N, 10] -> [N, 5, 2] normalized landmark points."""
    pts = ldm.reshape(-1, 5, 2)
    return priors[:, None, :2] + pts * VARIANCES[0] * priors[:, None, 2:]


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float = 0.4) -> List[int]:
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = ((boxes[order[1:], 2] - boxes[order[1:], 0])
             * (boxes[order[1:], 3] - boxes[order[1:], 1]))
        iou = inter / (a + b - inter + 1e-12)
        order = order[1:][iou <= thresh]
    return keep


# RGB means in RGB order (the torch impl subtracts BGR (104,117,123))
RGB_MEAN = (123.0, 117.0, 104.0)


class RetinaFaceDetector:
    """Host-facing detector with the `detect_fn` contract of `FaceApp`:
    image -> [(bbox[4], landmarks[5,2], score)]."""

    def __init__(self, model: Optional[RetinaFace] = None,
                 variables: Optional[dict] = None, input_size: int = 320,
                 score_thresh: float = 0.5, nms_thresh: float = 0.4):
        self.model = model or RetinaFace()
        self.variables = variables  # {'params': ..., 'batch_stats': ...}
        self.size = input_size
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.priors = make_priors(input_size, input_size)

        @jax.jit
        def _fwd(variables, x):
            outs = self.model.apply(variables, x)
            cls = jnp.concatenate([jax.nn.softmax(o[0], -1) for o in outs], 1)
            box = jnp.concatenate([o[1] for o in outs], 1)
            ldm = jnp.concatenate([o[2] for o in outs], 1)
            return cls, box, ldm

        self._fwd = _fwd

    def __call__(self, image: np.ndarray):
        h, w = image.shape[:2]
        ri = (np.arange(self.size) * (h / self.size)).astype(np.int64)
        ci = (np.arange(self.size) * (w / self.size)).astype(np.int64)
        img = image[ri][:, ci].astype(np.float32) - np.asarray(RGB_MEAN)
        cls, box, ldm = self._fwd(self.variables, jnp.asarray(img[None]))
        scores = np.asarray(cls[0, :, 1])
        sel = scores > self.score_thresh
        if not sel.any():
            return []
        boxes = decode_boxes(np.asarray(box[0])[sel], self.priors[sel])
        lms = decode_landmarks(np.asarray(ldm[0])[sel], self.priors[sel])
        sc = scores[sel]
        keep = nms(boxes, sc, self.nms_thresh)
        out = []
        scale = np.asarray([w, h, w, h], np.float32)
        for i in keep:
            out.append((boxes[i] * scale,
                        lms[i] * np.asarray([w, h], np.float32), float(sc[i])))
        return out


def map_retinaface_torch_params(sd: dict) -> dict:
    """biubug6/Pytorch_RetinaFace `mobilenet0.25_Final.pth` state_dict ->
    RetinaFace params (name-mapped; conv OIHW->HWIO, depthwise OIHW->HWIO
    with the group dim folded)."""
    g = lambda n: np.asarray(sd[n])

    def conv(n, depthwise=False):
        w = g(n + ".weight")
        if depthwise:
            # torch depthwise [C,1,k,k] -> flax [k,k,1,C]
            return {"kernel": w.transpose(2, 3, 1, 0)}
        return {"kernel": w.transpose(2, 3, 1, 0)}

    def bn(n):
        return {"scale": g(n + ".weight"), "bias": g(n + ".bias"),
                "mean": g(n + ".running_mean"), "var": g(n + ".running_var")}

    def bn_flax(n):
        return {"scale": g(n + ".weight"), "bias": g(n + ".bias")}

    def bn_stats(n):
        return {"mean": g(n + ".running_mean"), "var": g(n + ".running_var")}

    # NOTE: flax BatchNorm(use_running_average=True) keeps stats in the
    # 'batch_stats' collection; this mapper returns a {'params', 'batch_stats'}
    # pair for `model.apply(variables, ...)`.
    params: dict = {}
    stats: dict = {}

    def put(dst_params, dst_stats, prefix, torch_conv, torch_bn, dw=False):
        dst_params[prefix] = {"conv" if not dw else "dw_conv": conv(torch_conv, dw)}
        dst_params[prefix]["bn" if not dw else "dw_bn"] = bn_flax(torch_bn)
        dst_stats[prefix] = {"bn" if not dw else "dw_bn": bn_stats(torch_bn)}

    # body.stage1.0 = conv_bn; stage1.1.. = conv_dw(0=dw conv,3=pw conv)
    put(params, stats, "stage1_0", "body.stage1.0.0", "body.stage1.0.1")
    layout = [("stage1_1", "body.stage1.1"), ("stage1_2", "body.stage1.2"),
              ("stage1_3", "body.stage1.3"), ("stage1_4", "body.stage1.4"),
              ("stage1_5", "body.stage1.5"),
              ("stage2_0", "body.stage2.0"), ("stage2_1", "body.stage2.1"),
              ("stage2_2", "body.stage2.2"), ("stage2_3", "body.stage2.3"),
              ("stage2_4", "body.stage2.4"), ("stage2_5", "body.stage2.5"),
              ("stage3_0", "body.stage3.0"), ("stage3_1", "body.stage3.1")]
    for ours, theirs in layout:
        params[ours] = {
            "dw_conv": conv(theirs + ".0", depthwise=True),
            "dw_bn": bn_flax(theirs + ".1"),
            "pw_conv": conv(theirs + ".3"),
            "pw_bn": bn_flax(theirs + ".4"),
        }
        stats[ours] = {"dw_bn": bn_stats(theirs + ".1"),
                       "pw_bn": bn_stats(theirs + ".4")}

    fpn = [("fpn_output1", "fpn.output1"), ("fpn_output2", "fpn.output2"),
           ("fpn_output3", "fpn.output3"), ("fpn_merge1", "fpn.merge1"),
           ("fpn_merge2", "fpn.merge2")]
    for ours, theirs in fpn:
        put(params, stats, ours, theirs + ".0", theirs + ".1")

    for i in range(3):
        ssh_ours = f"ssh{i + 1}"
        ssh_theirs = f"ssh{i + 1}"
        sub = {}
        sub_stats = {}
        for br, tb in (("conv3x3", "conv3X3"), ("conv5x5_1", "conv5X5_1"),
                       ("conv5x5_2", "conv5X5_2"), ("conv7x7_2", "conv7X7_2"),
                       ("conv7x7_3", "conv7x7_3")):
            sub[br] = {"conv": conv(f"{ssh_theirs}.{tb}.0"),
                       "bn": bn_flax(f"{ssh_theirs}.{tb}.1")}
            sub_stats[br] = {"bn": bn_stats(f"{ssh_theirs}.{tb}.1")}
        params[ssh_ours] = sub
        stats[ssh_ours] = sub_stats

    for i in range(3):
        params[f"class_head_{i}"] = {
            "kernel": g(f"ClassHead.{i}.conv1x1.weight").transpose(2, 3, 1, 0),
            "bias": g(f"ClassHead.{i}.conv1x1.bias")}
        params[f"bbox_head_{i}"] = {
            "kernel": g(f"BboxHead.{i}.conv1x1.weight").transpose(2, 3, 1, 0),
            "bias": g(f"BboxHead.{i}.conv1x1.bias")}
        params[f"landmark_head_{i}"] = {
            "kernel": g(f"LandmarkHead.{i}.conv1x1.weight").transpose(2, 3, 1, 0),
            "bias": g(f"LandmarkHead.{i}.conv1x1.bias")}
    return {"params": params, "batch_stats": stats}
