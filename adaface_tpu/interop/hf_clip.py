"""Name mapping: HuggingFace CLIPTextModel state_dict -> adaface_tpu params.

The reference consumes `openai/clip-vit-large-patch14` via HF
(`ldm/modules/encoders/modules.py:185`); SD .ckpt files store the same
weights under a `cond_stage_model.transformer.` prefix. This maps either
flat dict (numpy arrays, e.g. from `torch_pickle.load_torch_checkpoint`)
into the Flax param tree of `models.clip_text.CLIPTextEncoder`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def map_clip_text_params(sd: Dict[str, np.ndarray], num_layers: int = 12,
                         prefix: str = "text_model.") -> dict:
    """Build the Flax params dict. `sd` keys are HF names, optionally under
    `prefix` (use 'cond_stage_model.transformer.text_model.' for SD ckpts)."""

    def g(name):
        return np.asarray(sd[prefix + name])

    params = {
        "token_embedding": {"embedding": g("embeddings.token_embedding.weight")},
        "position_embedding": {"embedding": g("embeddings.position_embedding.weight")},
        "final_layer_norm": {
            "scale": g("final_layer_norm.weight"),
            "bias": g("final_layer_norm.bias"),
        },
    }
    for i in range(num_layers):
        lp = f"encoder.layers.{i}."
        dense = lambda n: {"kernel": g(lp + n + ".weight").T, "bias": g(lp + n + ".bias")}
        ln = lambda n: {"scale": g(lp + n + ".weight"), "bias": g(lp + n + ".bias")}
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense("self_attn.q_proj"),
                "k_proj": dense("self_attn.k_proj"),
                "v_proj": dense("self_attn.v_proj"),
                "out_proj": dense("self_attn.out_proj"),
            },
            "layer_norm1": ln("layer_norm1"),
            "layer_norm2": ln("layer_norm2"),
            "fc1": dense("mlp.fc1"),
            "fc2": dense("mlp.fc2"),
        }
    return params


def map_clip_model_params(sd: Dict[str, np.ndarray],
                          text_layers: int = 12, vision_layers: int = 12):
    """Full HF `CLIPModel` (dual tower + projections, e.g.
    openai/clip-vit-base-patch32 for the CLIP-I/CLIP-T scorer) ->
    (text_params, vision_params, text_projection, visual_projection).
    Projections are returned [D_tower, D_joint] ready for `pooled @ proj`."""
    text = map_clip_text_params(sd, num_layers=text_layers,
                                prefix="text_model.")
    vision = map_clip_vision_params(sd, num_layers=vision_layers,
                                    prefix="vision_model.")
    tp = np.asarray(sd["text_projection.weight"]).T
    vp = np.asarray(sd["visual_projection.weight"]).T
    return text, vision, tp, vp


def map_clip_vision_params(sd: Dict[str, np.ndarray], num_layers: int = 24,
                           prefix: str = "vision_model.") -> dict:
    """HF CLIPVisionModel state_dict -> `models.clip_vision.CLIPVisionEncoder`
    params. The patch-embedding conv weight is torch OIHW -> flax HWIO."""

    def g(name):
        return np.asarray(sd[prefix + name])

    params = {
        "class_embedding": g("embeddings.class_embedding"),
        "patch_embedding": {
            "kernel": g("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
        },
        "position_embedding": {"embedding": g("embeddings.position_embedding.weight")},
        "pre_layrnorm": {
            "scale": g("pre_layrnorm.weight"), "bias": g("pre_layrnorm.bias"),
        },
        "post_layernorm": {
            "scale": g("post_layernorm.weight"), "bias": g("post_layernorm.bias"),
        },
    }
    for i in range(num_layers):
        lp = f"encoder.layers.{i}."
        dense = lambda n: {"kernel": g(lp + n + ".weight").T, "bias": g(lp + n + ".bias")}
        ln = lambda n: {"scale": g(lp + n + ".weight"), "bias": g(lp + n + ".bias")}
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense("self_attn.q_proj"),
                "k_proj": dense("self_attn.k_proj"),
                "v_proj": dense("self_attn.v_proj"),
                "out_proj": dense("self_attn.out_proj"),
            },
            "layer_norm1": ln("layer_norm1"),
            "layer_norm2": ln("layer_norm2"),
            "fc1": dense("mlp.fc1"),
            "fc2": dense("mlp.fc2"),
        }
    return params
