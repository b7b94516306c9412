"""Name mapping: SD/CompVis UNetModel state_dict -> adaface_tpu UNet params.

SD `.ckpt` stores the UNet under `model.diffusion_model.`. Torch block
numbering (input_blocks 0..11 / middle_block / output_blocks 0..11) is
translated to the level/block names of `models.unet.UNetModel`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from adaface_tpu.models.unet import UNetConfig


def _conv_w(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def map_unet_params(sd: Dict[str, np.ndarray], cfg: UNetConfig,
                    prefix: str = "model.diffusion_model.") -> dict:
    g = lambda n: np.asarray(sd[prefix + n])

    def conv(n):
        return {"kernel": _conv_w(g(n + ".weight")), "bias": g(n + ".bias")}

    def dense(n):
        return {"kernel": g(n + ".weight").T, "bias": g(n + ".bias")}

    def dense_nobias(n):
        return {"kernel": g(n + ".weight").T}

    def resblock(n, cin, cout):
        d = {
            "in_norm_scale": g(n + ".in_layers.0.weight"),
            "in_norm_bias": g(n + ".in_layers.0.bias"),
            "in_conv": conv(n + ".in_layers.2"),
            "emb_proj": dense(n + ".emb_layers.1"),
            "out_norm_scale": g(n + ".out_layers.0.weight"),
            "out_norm_bias": g(n + ".out_layers.0.bias"),
            "out_conv": conv(n + ".out_layers.3"),
        }
        if cin != cout:
            d["skip"] = conv(n + ".skip_connection")
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
            "proj_in": conv(n + ".proj_in"),
            "proj_out": conv(n + ".proj_out"),
            "block_0": {
                "attn1": xattn(tb + ".attn1"),
                "attn2": xattn(tb + ".attn2"),
                "norm1": ln("norm1"), "norm2": ln("norm2"), "norm3": ln("norm3"),
                "ff_in": dense(tb + ".ff.net.0.proj"),
                "ff_out": dense(tb + ".ff.net.2"),
            },
        }

    ch0 = cfg.model_channels
    params: dict = {
        "time_embed_0": dense("time_embed.0"),
        "time_embed_2": dense("time_embed.2"),
        "in_conv": conv("input_blocks.0.0"),
        "out_norm_scale": g("out.0.weight"),
        "out_norm_bias": g("out.0.bias"),
        "out_conv": conv("out.2"),
    }

    # input blocks
    n = 1
    ch = ch0
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = ch0 * mult
        for blk in range(cfg.num_res_blocks):
            params[f"down_{level}_res_{blk}"] = resblock(
                f"input_blocks.{n}.0", ch, out_ch)
            if level in cfg.attention_levels:
                params[f"down_{level}_attn_{blk}"] = spatial(f"input_blocks.{n}.1")
            ch = out_ch
            n += 1
        if level != len(cfg.channel_mult) - 1:
            params[f"down_{level}_downsample"] = {"conv": conv(f"input_blocks.{n}.0.op")}
            n += 1

    # middle
    params["mid_res_0"] = resblock("middle_block.0", ch, ch)
    params["mid_attn"] = spatial("middle_block.1")
    params["mid_res_1"] = resblock("middle_block.2", ch, ch)

    # output blocks: torch numbers 0..11 from the deepest level outward;
    # skip-channel bookkeeping mirrors the constructor
    skip_chs = [ch0]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            skip_chs.append(ch0 * mult)
        if level != len(cfg.channel_mult) - 1:
            skip_chs.append(ch0 * mult)

    n = 0
    for level in reversed(range(len(cfg.channel_mult))):
        out_ch = ch0 * cfg.channel_mult[level]
        for blk in range(cfg.num_res_blocks + 1):
            cin = ch + skip_chs.pop()
            params[f"up_{level}_res_{blk}"] = resblock(f"output_blocks.{n}.0", cin, out_ch)
            sub = 1
            if level in cfg.attention_levels:
                params[f"up_{level}_attn_{blk}"] = spatial(f"output_blocks.{n}.{sub}")
                sub += 1
            if level != 0 and blk == cfg.num_res_blocks:
                params[f"up_{level}_upsample"] = {
                    "conv": conv(f"output_blocks.{n}.{sub}.conv")}
            ch = out_ch
            n += 1

    return params
