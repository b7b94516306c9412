"""Name mapping: diffusers `UNet2DConditionModel` state dict -> adaface_tpu UNet.

The reference's Arc2Face teacher loads a diffusers-format UNet
(`/root/reference/ldm/models/diffusion/ddpm.py:5398-5427`:
`UNet2DConditionModel.from_pretrained('models/arc2face', subfolder='arc2face')`).
The arc2face release uses the SD v1.5 UNet architecture (320ch, mult 1/2/4/4,
cross_attention_dim 768), i.e. exactly `UNetConfig.sd_v1()`; this module maps
the diffusers key layout onto `models.unet.UNetModel` params so the teacher
can run with real weights.

Diffusers layout vs the CompVis layout handled by `sd_unet.py`:
  time_embedding.linear_{1,2}      <- time_embed.{0,2}
  conv_in / conv_out / conv_norm_out
  down_blocks.{i}.resnets.{j}      (norm1/conv1/time_emb_proj/norm2/conv2/
                                    conv_shortcut)
  down_blocks.{i}.attentions.{j}   (norm/proj_in/proj_out/transformer_blocks.0)
  down_blocks.{i}.downsamplers.0.conv
  mid_block.resnets.{0,1} / mid_block.attentions.0
  up_blocks.{i}.resnets.{j} / attentions.{j} / upsamplers.0.conv
    (up_blocks are ordered deepest-first: up_blocks.0 == our highest level)

`proj_in`/`proj_out` are Conv2d 1x1 in SD1.5 checkpoints and Linear when the
model was saved with `use_linear_projection=True`; both are accepted.
"""

from __future__ import annotations

from typing import Dict, Set

import numpy as np

from adaface_tpu.models.unet import UNetConfig


def map_diffusers_unet_params(sd: Dict[str, np.ndarray], cfg: UNetConfig,
                              prefix: str = "", strict: bool = True) -> dict:
    """Translate a diffusers UNet state dict into a `UNetModel` param tree.

    With `strict=True`, raises if any checkpoint key under `prefix` is left
    unconsumed (catching silent architecture drift).
    """
    used: Set[str] = set()

    def g(n):
        key = prefix + n
        used.add(key)
        return np.asarray(sd[key])

    def conv(n):
        return {"kernel": g(n + ".weight").transpose(2, 3, 1, 0),
                "bias": g(n + ".bias")}

    def conv_1x1_or_linear(n):
        w = g(n + ".weight")
        b = g(n + ".bias")
        if w.ndim == 4:  # Conv2d 1x1: [out, in, 1, 1]
            return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
        # Linear: [out, in] -> conv kernel [1, 1, in, out]
        return {"kernel": w.T[None, None], "bias": b}

    def dense(n):
        return {"kernel": g(n + ".weight").T, "bias": g(n + ".bias")}

    def dense_nobias(n):
        return {"kernel": g(n + ".weight").T}

    def resblock(n, cin, cout):
        d = {
            "in_norm_scale": g(n + ".norm1.weight"),
            "in_norm_bias": g(n + ".norm1.bias"),
            "in_conv": conv(n + ".conv1"),
            "emb_proj": dense(n + ".time_emb_proj"),
            "out_norm_scale": g(n + ".norm2.weight"),
            "out_norm_bias": g(n + ".norm2.bias"),
            "out_conv": conv(n + ".conv2"),
        }
        if cin != cout:
            d["skip"] = conv(n + ".conv_shortcut")
        return d

    def xattn(n):
        return {
            "to_q": dense_nobias(n + ".to_q"),
            "to_k": dense_nobias(n + ".to_k"),
            "to_v": dense_nobias(n + ".to_v"),
            "to_out": dense(n + ".to_out.0"),
        }

    def spatial(n):
        tb = n + ".transformer_blocks.0"
        ln = lambda m: {"scale": g(f"{tb}.{m}.weight"), "bias": g(f"{tb}.{m}.bias")}
        return {
            "norm_scale": g(n + ".norm.weight"),
            "norm_bias": g(n + ".norm.bias"),
            "proj_in": conv_1x1_or_linear(n + ".proj_in"),
            "proj_out": conv_1x1_or_linear(n + ".proj_out"),
            "block_0": {
                "attn1": xattn(tb + ".attn1"),
                "attn2": xattn(tb + ".attn2"),
                "norm1": ln("norm1"), "norm2": ln("norm2"), "norm3": ln("norm3"),
                "ff_in": dense(tb + ".ff.net.0.proj"),
                "ff_out": dense(tb + ".ff.net.2"),
            },
        }

    ch0 = cfg.model_channels
    n_levels = len(cfg.channel_mult)
    params: dict = {
        "time_embed_0": dense("time_embedding.linear_1"),
        "time_embed_2": dense("time_embedding.linear_2"),
        "in_conv": conv("conv_in"),
        "out_norm_scale": g("conv_norm_out.weight"),
        "out_norm_bias": g("conv_norm_out.bias"),
        "out_conv": conv("conv_out"),
    }

    # down blocks (diffusers level i == our level i)
    ch = ch0
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = ch0 * mult
        base = f"down_blocks.{level}"
        for blk in range(cfg.num_res_blocks):
            params[f"down_{level}_res_{blk}"] = resblock(
                f"{base}.resnets.{blk}", ch, out_ch)
            if level in cfg.attention_levels:
                params[f"down_{level}_attn_{blk}"] = spatial(
                    f"{base}.attentions.{blk}")
            ch = out_ch
        if level != n_levels - 1:
            params[f"down_{level}_downsample"] = {
                "conv": conv(f"{base}.downsamplers.0.conv")}

    # middle
    params["mid_res_0"] = resblock("mid_block.resnets.0", ch, ch)
    params["mid_attn"] = spatial("mid_block.attentions.0")
    params["mid_res_1"] = resblock("mid_block.resnets.1", ch, ch)

    # up blocks: diffusers up_blocks.0 is the DEEPEST level; skip-channel
    # bookkeeping mirrors the UNetModel constructor (same as sd_unet.py)
    skip_chs = [ch0]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            skip_chs.append(ch0 * mult)
        if level != n_levels - 1:
            skip_chs.append(ch0 * mult)

    for up_idx, level in enumerate(reversed(range(n_levels))):
        out_ch = ch0 * cfg.channel_mult[level]
        base = f"up_blocks.{up_idx}"
        for blk in range(cfg.num_res_blocks + 1):
            cin = ch + skip_chs.pop()
            params[f"up_{level}_res_{blk}"] = resblock(
                f"{base}.resnets.{blk}", cin, out_ch)
            if level in cfg.attention_levels:
                params[f"up_{level}_attn_{blk}"] = spatial(
                    f"{base}.attentions.{blk}")
            ch = out_ch
        if level != 0:
            params[f"up_{level}_upsample"] = {
                "conv": conv(f"{base}.upsamplers.0.conv")}

    if strict:
        keys = {k for k in sd if k.startswith(prefix)}
        unused = sorted(keys - used)
        if unused:
            raise ValueError(
                f"{len(unused)} diffusers UNet keys not consumed by the mapper "
                f"(architecture mismatch?): {unused[:8]}...")
    return params


def load_diffusers_unet(path: str, cfg: UNetConfig | None = None) -> dict:
    """Load a diffusers UNet checkpoint file/dir into `UNetModel` params.

    `path` may be a `diffusion_pytorch_model.safetensors` / `.bin` file or a
    directory containing one (the arc2face release layout:
    `models/arc2face/arc2face/diffusion_pytorch_model.safetensors`).
    """
    import os

    from adaface_tpu.interop.torch_pickle import (load_safetensors,
                                                  load_torch_checkpoint)

    if os.path.isdir(path):
        for name in ("diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no diffusers UNet weights under {path}")
    if path.endswith(".safetensors"):
        sd = load_safetensors(path)
    else:
        sd = load_torch_checkpoint(path)
    return map_diffusers_unet_params(sd, cfg or UNetConfig.sd_v1())
