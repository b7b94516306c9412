#!/usr/bin/env python
"""Splice a different text encoder or VAE into an SD checkpoint's params.

Equivalent of `scripts/repl_textencoder.py` + `repl_vae.py` (the surgery
that produced the reference's `v1-5-dste8-vae.ckpt` backbone): load an SD
v1.x `.ckpt`, replace the CLIP text tower and/or the VAE with weights from
another checkpoint (SD ckpt or HF state_dict .pt/.bin), and write the
merged param trees as a native `.npz` bundle the pipeline can load.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, key + "/"))
        elif v is not None:
            out[key] = np.asarray(v)
    return out


def main(opt):
    from adaface_tpu.interop.hf_clip import map_clip_text_params
    from adaface_tpu.interop.sd_unet import map_unet_params
    from adaface_tpu.interop.sd_vae import map_vae_params
    from adaface_tpu.interop.torch_pickle import load_sd_state_dict
    from adaface_tpu.models.unet import UNetConfig
    from adaface_tpu.models.vae import VAEConfig

    base_sd = load_sd_state_dict(opt.base)
    unet = map_unet_params(base_sd, UNetConfig.sd_v1())
    vae = map_vae_params(base_sd, VAEConfig.sd_v1())
    clip = map_clip_text_params(
        base_sd, prefix="cond_stage_model.transformer.text_model.")

    if opt.textencoder:
        src_sd = load_sd_state_dict(opt.textencoder)
        prefix = ("cond_stage_model.transformer.text_model."
                  if any(k.startswith("cond_stage_model.") for k in src_sd)
                  else "text_model.")
        clip = map_clip_text_params(src_sd, prefix=prefix)
        print(f"replaced text encoder from {opt.textencoder}")

    if opt.vae:
        src_sd = load_sd_state_dict(opt.vae)
        prefix = ("first_stage_model."
                  if any(k.startswith("first_stage_model.") for k in src_sd)
                  else "")
        vae = map_vae_params(src_sd, prefix=prefix)
        print(f"replaced VAE from {opt.vae}")

    arrays = {}
    for name, tree in (("unet", unet), ("vae", vae), ("clip", clip)):
        for k, v in flatten_tree(tree, f"{name}/").items():
            arrays[k] = v
    np.savez(opt.out, **arrays)
    print(f"wrote {len(arrays)} arrays -> {opt.out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True, help="SD v1.x .ckpt or .safetensors")
    p.add_argument("--textencoder", default=None,
                   help="ckpt to take the text encoder from")
    p.add_argument("--vae", default=None, help="ckpt to take the VAE from")
    p.add_argument("--out", required=True, help="output .npz bundle")
    main(p.parse_args())
