"""BiSeNet face-parsing checkpoint import (torch -> Flax, BN folded).

Maps the face-parsing.PyTorch `79999_iter.pth` state-dict layout (the
checkpoint the reference's mask generator loads,
`scripts-private/gen_face_masks.py:80-83`) onto
`adaface_tpu.models.bisenet.BiSeNet` params. All BatchNorms fold into the
preceding conv at import time (inference-only):

    scale = gamma / sqrt(running_var + eps)
    kernel' = kernel * scale   (output-channel axis)
    bias'   = beta - running_mean * scale

Key layout consumed (ConvBNReLU = `X.conv.weight` + `X.bn.*`):
  cp.resnet.{conv1,bn1,layerL.B.{conv1,bn1,conv2,bn2[,downsample.0/1]}}
  cp.{arm16,arm32}.{conv.*, conv_atten.weight, bn_atten.*}
  cp.{conv_avg,conv_head16,conv_head32}.*
  ffm.{convblk.*, conv1.weight[, bias], conv2.weight[, bias]}
  conv_out{,16,32}.{conv.*, conv_out.weight[, bias]}

The aux heads (conv_out16/32) exist only at training time in the source
repo; they are consumed and dropped. `load_bisenet` reads the .pth through
the restricted unpickler (`interop/torch_pickle.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

BN_EPS = 1e-5


def _fold(flat: Dict[str, np.ndarray], conv_key: str, bn_key: str):
    """(kernel NHWC-style [kh, kw, in, out], bias) with bn folded in."""
    w = np.asarray(flat[conv_key + ".weight"], np.float32)
    w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    b = np.asarray(flat[conv_key + ".bias"], np.float32) \
        if conv_key + ".bias" in flat else np.zeros(w.shape[-1], np.float32)
    if bn_key is None:
        return {"kernel": w, "bias": b}
    gamma = np.asarray(flat[bn_key + ".weight"], np.float32)
    beta = np.asarray(flat[bn_key + ".bias"], np.float32)
    mean = np.asarray(flat[bn_key + ".running_mean"], np.float32)
    var = np.asarray(flat[bn_key + ".running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"kernel": w * scale, "bias": (b - mean) * scale + beta}


class _Tracker(dict):
    def __init__(self, d):
        super().__init__(d)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        has = super().__contains__(k)
        if has:
            self.read.add(k)
        return has


def map_bisenet_params(sd: Dict[str, np.ndarray],
                       strict: bool = True) -> dict:
    """torch state dict -> Flax params for `BiSeNet` (BN folded)."""
    flat = _Tracker(sd)

    def cbr(prefix):  # ConvBNReLU module
        return _fold(flat, prefix + ".conv", prefix + ".bn")

    def resnet():
        p = {"conv1": _fold(flat, "cp.resnet.conv1", "cp.resnet.bn1")}
        widths = {1: 64, 2: 128, 3: 256, 4: 512}
        for layer in (1, 2, 3, 4):
            for blk in (0, 1):
                pre = f"cp.resnet.layer{layer}.{blk}"
                d = {"conv1": _fold(flat, pre + ".conv1", pre + ".bn1"),
                     "conv2": _fold(flat, pre + ".conv2", pre + ".bn2")}
                if pre + ".downsample.0.weight" in flat:
                    d["downsample"] = _fold(flat, pre + ".downsample.0",
                                            pre + ".downsample.1")
                p[f"layer{layer}_{blk}"] = d
        return p

    def arm(prefix):
        return {"conv": cbr(prefix + ".conv"),
                "conv_atten": _fold(flat, prefix + ".conv_atten",
                                    prefix + ".bn_atten")}

    def head(prefix):
        return {"conv": cbr(prefix + ".conv"),
                "conv_out": _fold(flat, prefix + ".conv_out", None)}

    params = {
        "resnet": resnet(),
        "arm16": arm("cp.arm16"),
        "arm32": arm("cp.arm32"),
        "conv_avg": cbr("cp.conv_avg"),
        "conv_head16": cbr("cp.conv_head16"),
        "conv_head32": cbr("cp.conv_head32"),
        "ffm": {"convblk": cbr("ffm.convblk"),
                "conv1": _fold(flat, "ffm.conv1", None),
                "conv2": _fold(flat, "ffm.conv2", None)},
        "conv_out": head("conv_out"),
    }
    # training-only aux heads: consume + drop
    for aux in ("conv_out16", "conv_out32"):
        if aux + ".conv.conv.weight" in flat:
            head(aux)
    if strict:
        left = {k for k in flat if k not in flat.read
                and "num_batches_tracked" not in k}
        if left:
            raise ValueError(
                f"bisenet import: {len(left)} unconsumed keys, e.g. "
                f"{sorted(left)[:8]}")
    return params


def load_bisenet(path: str) -> Tuple[object, dict]:
    """Load a face-parsing .pth -> (BiSeNet module, params)."""
    from adaface_tpu.interop.torch_pickle import load_torch_checkpoint
    from adaface_tpu.models.bisenet import BiSeNet

    sd = load_torch_checkpoint(path)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return BiSeNet(), map_bisenet_params(sd)
