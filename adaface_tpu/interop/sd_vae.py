"""Name mapping: CompVis/SD AutoencoderKL state_dict -> adaface_tpu VAE params.

SD `.ckpt` stores the VAE under `first_stage_model.`; standalone VAE files
have no prefix. Torch conv weights [O,I,kh,kw] transpose to Flax HWIO.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from adaface_tpu.models.vae import VAEConfig


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def map_vae_params(sd: Dict[str, np.ndarray], cfg: VAEConfig,
                   prefix: str = "first_stage_model.") -> dict:
    g = lambda n: np.asarray(sd[prefix + n])

    def conv(n):
        return {"kernel": _conv_w(g(n + ".weight")), "bias": g(n + ".bias")}

    def resblock(n, has_shortcut):
        d = {
            "norm1_scale": g(n + ".norm1.weight"), "norm1_bias": g(n + ".norm1.bias"),
            "norm2_scale": g(n + ".norm2.weight"), "norm2_bias": g(n + ".norm2.bias"),
            "conv1": conv(n + ".conv1"), "conv2": conv(n + ".conv2"),
        }
        if has_shortcut:
            d["nin_shortcut"] = conv(n + ".nin_shortcut")
        return d

    def attnblock(n):
        return {
            "norm_scale": g(n + ".norm.weight"), "norm_bias": g(n + ".norm.bias"),
            "q": conv(n + ".q"), "k": conv(n + ".k"),
            "v": conv(n + ".v"), "proj_out": conv(n + ".proj_out"),
        }

    nm = len(cfg.ch_mult)
    in_mults = (1,) + tuple(cfg.ch_mult)

    enc: dict = {"conv_in": conv("encoder.conv_in")}
    for i in range(nm):
        for j in range(cfg.num_res_blocks):
            cin = cfg.ch * (in_mults[i] if j == 0 else cfg.ch_mult[i])
            cout = cfg.ch * cfg.ch_mult[i]
            enc[f"down_{i}_block_{j}"] = resblock(
                f"encoder.down.{i}.block.{j}", cin != cout)
        if i != nm - 1:
            enc[f"down_{i}_downsample"] = {"conv": conv(f"encoder.down.{i}.downsample.conv")}
    enc["mid_block_1"] = resblock("encoder.mid.block_1", False)
    enc["mid_attn_1"] = attnblock("encoder.mid.attn_1")
    enc["mid_block_2"] = resblock("encoder.mid.block_2", False)
    enc["norm_out_scale"] = g("encoder.norm_out.weight")
    enc["norm_out_bias"] = g("encoder.norm_out.bias")
    enc["conv_out"] = conv("encoder.conv_out")

    dec: dict = {"conv_in": conv("decoder.conv_in")}
    dec["mid_block_1"] = resblock("decoder.mid.block_1", False)
    dec["mid_attn_1"] = attnblock("decoder.mid.attn_1")
    dec["mid_block_2"] = resblock("decoder.mid.block_2", False)
    block_in = cfg.ch * cfg.ch_mult[-1]
    for i in reversed(range(nm)):
        cout = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            cin = block_in if j == 0 else cout
            dec[f"up_{i}_block_{j}"] = resblock(f"decoder.up.{i}.block.{j}", cin != cout)
        block_in = cout
        if i != 0:
            dec[f"up_{i}_upsample"] = {"conv": conv(f"decoder.up.{i}.upsample.conv")}
    dec["norm_out_scale"] = g("decoder.norm_out.weight")
    dec["norm_out_bias"] = g("decoder.norm_out.bias")
    dec["conv_out"] = conv("decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }
