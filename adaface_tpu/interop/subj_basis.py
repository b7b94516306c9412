"""Name mapping: pickled reference `SubjBasisGenerator` -> adaface_tpu params.

The reference's zero-shot checkpoints (`embeddings.pt`) pickle live torch
modules under `string_to_subj_basis_generator_dict`
(`ldm/modules/embedding_manager.py:1820-1834`); the restricted unpickler
turns each into a `TorchObjectStub` tree. This module converts such a stub
into (flax param tree, config metadata) for
`personalization.subj_basis_generator.SubjBasisGenerator`, and back out to a
torch-style state dict for export.

Reference module layout (`ldm/modules/subj_basis_generator.py:369-470`):

  fg (subject) generator:
    pos_embs [1,16,D], pos_embs_ln (LayerNorm)
    obj_proj_in = Sequential(Linear(384, 16*D, bias=False), Rearrange,
                             LayerNorm(D), Dropout)      -> keys .0 / .2
    prompt2token_proj = CLIPTextModelWrapper (full HF CLIPTextModel under
                        `prompt2token_proj.text_model.`)
    hidden_state_layer_weights [3,1] (or legacy [3,768])
    (k/v projections may be MKV-extended: weight [D*m, D] per layer,
     `arc2face_models.py:47-87`)

  bg generator:
    pos_embs [1,257,D], pos_embs_ln
    bg_proj_in = Sequential(Linear(D_img, D, bias=False), LayerNorm)
                                                        -> keys .0 / .1
    latent_queries [1, L*K, D], latent_queries_ln
    prompt_translator = CrossAttention with to_q/to_k/to_v each
        Sequential(Linear(D, D, bias=False), LayerNorm) -> keys .0 / .1
        and to_out either Identity or Sequential(Linear, Dropout, LayerNorm)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

from adaface_tpu.interop.hf_clip import map_clip_text_params
from adaface_tpu.interop.torch_pickle import TorchObjectStub, walk_stub_tree


@dataclasses.dataclass
class SubjBasisGeneratorMeta:
    """Constructor facts recovered from the pickled module."""

    placeholder_is_bg: bool
    output_dim: int
    num_out_layers: int
    num_out_embs_per_layer: int
    num_heads: int = 6
    image_embedding_dim: Optional[int] = None  # bg only
    bg_num_id_vecs: Optional[int] = None  # bg only
    dino_embedding_dim: Optional[int] = None  # fg only
    kv_multipliers: Optional[tuple] = None  # fg prompt2token_proj extension
    num_proj_layers: Optional[int] = None  # fg prompt2token_proj depth
    prompt_translator_has_to_out: bool = False  # bg only
    hidden_state_weights_were_per_feature: bool = False
    # full prompt2token_proj encoder config recovered from the pickled HF
    # config object (hidden_size/num_heads/intermediate_size/...)
    proj_config: Optional[dict] = None
    fg_num_id_vecs: int = 77  # fg pos_embs rows (unused at runtime)


def _ln(flat, name):
    return {"scale": np.asarray(flat[name + ".weight"]),
            "bias": np.asarray(flat[name + ".bias"])}


def map_subj_basis_generator(
    stub_or_flat: Any,
) -> Tuple[dict, SubjBasisGeneratorMeta]:
    """Pickled `SubjBasisGenerator` (stub or pre-flattened state dict) ->
    (flax params, meta). Handles MKV-extended prompt2token_proj attention
    (multiplier inferred per layer from the k_proj shape) and legacy
    `[3, 768]` hidden-state weights (averaged to `[3, 1]`, matching the
    reference's load repair, `embedding_manager.py:1914-1921`)."""
    attrs: Dict[str, Any] = {}
    if isinstance(stub_or_flat, TorchObjectStub):
        attrs = stub_or_flat.__dict__
        flat = walk_stub_tree(stub_or_flat)
    else:
        flat = dict(stub_or_flat)

    is_bg = bool(attrs.get("placeholder_is_bg", "bg_proj_in.0.weight" in flat))
    if is_bg:
        return _map_bg(flat, attrs)
    return _map_fg(flat, attrs)


def _extract_hf_config(attrs) -> Optional[dict]:
    """Pull the pickled transformers config of `prompt2token_proj` (an HF
    `CLIPTextConfig` captured as a stub) so the rebuilt encoder matches the
    checkpoint's true architecture, not assumed ViT-L defaults."""
    proj = (attrs.get("_modules") or {}).get("prompt2token_proj")
    if proj is None:
        return None
    cfg = proj.__dict__.get("config") if isinstance(proj, TorchObjectStub) else None
    if cfg is None:
        return None
    d = cfg.__dict__ if isinstance(cfg, TorchObjectStub) else cfg
    keys = ("hidden_size", "num_hidden_layers", "num_attention_heads",
            "intermediate_size", "vocab_size", "max_position_embeddings",
            "layer_norm_eps")
    return {k: d[k] for k in keys if k in d and isinstance(d[k], (int, float))}


def _map_fg(flat, attrs) -> Tuple[dict, SubjBasisGeneratorMeta]:
    D = int(flat["pos_embs"].shape[-1])
    proj_prefix = "prompt2token_proj.text_model."
    layer_ids = sorted({
        int(k.split("encoder.layers.")[1].split(".")[0])
        for k in flat if k.startswith(proj_prefix + "encoder.layers.")})
    num_layers = len(layer_ids)
    hidden = int(flat[proj_prefix + "embeddings.token_embedding.weight"].shape[1])

    params = {
        "pos_embs": np.asarray(flat["pos_embs"]),
        "pos_embs_ln": _ln(flat, "pos_embs_ln"),
        "prompt2token_proj": map_clip_text_params(
            flat, num_layers=num_layers, prefix=proj_prefix),
    }
    dino_dim = None
    if "obj_proj_in.0.weight" in flat:
        w = np.asarray(flat["obj_proj_in.0.weight"])  # [16*D, dino]
        dino_dim = int(w.shape[1])
        params["obj_proj_dense"] = {"kernel": w.T}
        params["obj_proj_ln"] = _ln(flat, "obj_proj_in.2")

    hslw = np.asarray(flat["hidden_state_layer_weights"])
    per_feature = hslw.ndim == 2 and hslw.shape[1] > 1
    if per_feature:  # legacy [3, 768] -> [3, 1]
        hslw = hslw.mean(axis=1, keepdims=True)
    params["hidden_state_layer_weights"] = hslw.reshape(-1, 1)

    # MKV extension: k/v out-dim a multiple of hidden
    mults = []
    for i in layer_ids:
        kw = flat[f"{proj_prefix}encoder.layers.{i}.self_attn.k_proj.weight"]
        m, rem = divmod(int(np.asarray(kw).shape[0]), hidden)
        if rem:
            raise ValueError(
                f"layer {i} k_proj out dim {kw.shape[0]} is not a multiple of "
                f"hidden {hidden}")
        mults.append(m)
    kv_multipliers = tuple(mults) if any(m != 1 for m in mults) else None

    meta = SubjBasisGeneratorMeta(
        placeholder_is_bg=False, output_dim=D,
        num_out_layers=int(attrs.get("num_out_layers", 16)),
        num_out_embs_per_layer=int(attrs.get("num_out_embs_per_layer", 16)),
        dino_embedding_dim=dino_dim, kv_multipliers=kv_multipliers,
        num_proj_layers=num_layers,
        hidden_state_weights_were_per_feature=per_feature,
        proj_config=_extract_hf_config(attrs),
        fg_num_id_vecs=int(flat["pos_embs"].shape[1]))
    return params, meta


def _map_bg(flat, attrs) -> Tuple[dict, SubjBasisGeneratorMeta]:
    D = int(flat["pos_embs"].shape[-1])
    bg_w = np.asarray(flat["bg_proj_in.0.weight"])  # [D, D_img]
    params = {
        "pos_embs": np.asarray(flat["pos_embs"]),
        "pos_embs_ln": _ln(flat, "pos_embs_ln"),
        "bg_proj_dense": {"kernel": bg_w.T},
        "bg_proj_ln": _ln(flat, "bg_proj_in.1"),
        "latent_queries": np.asarray(flat["latent_queries"]),
        "latent_queries_ln": _ln(flat, "latent_queries_ln"),
    }
    pt = {}
    for name in ("to_q", "to_k", "to_v"):
        pt[f"{name}_dense"] = {"kernel": np.asarray(
            flat[f"prompt_translator.{name}.0.weight"]).T}
        pt[f"{name}_ln"] = _ln(flat, f"prompt_translator.{name}.1")
    has_to_out = "prompt_translator.to_out.0.weight" in flat
    if has_to_out:
        pt["to_out"] = {"kernel": np.asarray(
            flat["prompt_translator.to_out.0.weight"]).T}
        pt["to_out_ln"] = _ln(flat, "prompt_translator.to_out.2")
    params["prompt_translator"] = pt

    n_latents = int(np.asarray(flat["latent_queries"]).shape[1])
    num_out_layers = int(attrs.get("num_out_layers", 16))
    meta = SubjBasisGeneratorMeta(
        placeholder_is_bg=True, output_dim=D,
        num_out_layers=num_out_layers,
        num_out_embs_per_layer=int(attrs.get(
            "num_out_embs_per_layer", n_latents // num_out_layers)),
        image_embedding_dim=int(bg_w.shape[1]),
        bg_num_id_vecs=int(np.asarray(flat["pos_embs"]).shape[1]),
        prompt_translator_has_to_out=has_to_out)
    return params, meta


def build_generator_from_meta(meta: SubjBasisGeneratorMeta,
                              pad_token_id: Optional[int] = None):
    """Construct the flax `SubjBasisGenerator` module matching `meta`.
    `pad_token_id` defaults to vocab-1 (the CLIP convention: pad == eos ==
    49407 for the 49408-token vocab), taken from the recovered config."""
    from adaface_tpu.models.clip_text import CLIPTextConfig
    from adaface_tpu.personalization.subj_basis_generator import (
        SubjBasisGenerator,
    )

    if meta.placeholder_is_bg:
        return SubjBasisGenerator(
            placeholder_is_bg=True,
            num_out_layers=meta.num_out_layers,
            num_out_embs_per_layer=meta.num_out_embs_per_layer,
            output_dim=meta.output_dim,
            image_embedding_dim=meta.image_embedding_dim or 1280,
            bg_num_id_vecs=meta.bg_num_id_vecs or 257,
            num_heads=meta.num_heads)
    hf = meta.proj_config or {}
    proj_cfg = CLIPTextConfig.vit_l_14(
        kv_multipliers=meta.kv_multipliers,
        num_layers=meta.num_proj_layers or hf.get("num_hidden_layers", 12),
        hidden_size=hf.get("hidden_size", 768),
        num_heads=hf.get("num_attention_heads", 12),
        intermediate_size=hf.get("intermediate_size", 3072),
        vocab_size=hf.get("vocab_size", 49408))
    if pad_token_id is None:
        pad_token_id = proj_cfg.vocab_size - 1
    return SubjBasisGenerator(
        placeholder_is_bg=False,
        num_out_layers=meta.num_out_layers,
        num_out_embs_per_layer=meta.num_out_embs_per_layer,
        output_dim=meta.output_dim,
        dino_embedding_dim=meta.dino_embedding_dim or 384,
        fg_num_id_vecs=meta.fg_num_id_vecs,
        proj_cfg=proj_cfg, pad_token_id=pad_token_id)


# ---------------------------------------------------------------- export

def export_subj_basis_generator(params: dict,
                                placeholder_is_bg: bool) -> Dict[str, np.ndarray]:
    """Flax params -> torch-style state dict (numpy) in the reference's key
    layout, suitable for `module.load_state_dict` on a reference-constructed
    `SubjBasisGenerator` (`scripts/export_embeddings.py` wraps this in a
    `.pt`)."""
    out: Dict[str, np.ndarray] = {}

    def ln(name, p):
        out[name + ".weight"] = np.asarray(p["scale"])
        out[name + ".bias"] = np.asarray(p["bias"])

    out["pos_embs"] = np.asarray(params["pos_embs"])
    if "pos_embs_ln" in params:
        ln("pos_embs_ln", params["pos_embs_ln"])

    if placeholder_is_bg:
        out["bg_proj_in.0.weight"] = np.asarray(
            params["bg_proj_dense"]["kernel"]).T
        ln("bg_proj_in.1", params["bg_proj_ln"])
        out["latent_queries"] = np.asarray(params["latent_queries"])
        ln("latent_queries_ln", params["latent_queries_ln"])
        pt = params["prompt_translator"]
        for name in ("to_q", "to_k", "to_v"):
            out[f"prompt_translator.{name}.0.weight"] = np.asarray(
                pt[f"{name}_dense"]["kernel"]).T
            ln(f"prompt_translator.{name}.1", pt[f"{name}_ln"])
        if "to_out" in pt:
            out["prompt_translator.to_out.0.weight"] = np.asarray(
                pt["to_out"]["kernel"]).T
            ln("prompt_translator.to_out.2", pt["to_out_ln"])
        return out

    out["hidden_state_layer_weights"] = np.asarray(
        params["hidden_state_layer_weights"])
    if "obj_proj_dense" in params:
        out["obj_proj_in.0.weight"] = np.asarray(
            params["obj_proj_dense"]["kernel"]).T
        ln("obj_proj_in.2", params["obj_proj_ln"])

    proj = params["prompt2token_proj"]
    pfx = "prompt2token_proj.text_model."
    out[pfx + "embeddings.token_embedding.weight"] = np.asarray(
        proj["token_embedding"]["embedding"])
    out[pfx + "embeddings.position_embedding.weight"] = np.asarray(
        proj["position_embedding"]["embedding"])
    ln(pfx + "final_layer_norm", proj["final_layer_norm"])
    i = 0
    while f"layers_{i}" in proj:
        lp = proj[f"layers_{i}"]
        base = f"{pfx}encoder.layers.{i}."
        for tname, ours in (("self_attn.q_proj", "q_proj"),
                            ("self_attn.k_proj", "k_proj"),
                            ("self_attn.v_proj", "v_proj"),
                            ("self_attn.out_proj", "out_proj")):
            p = lp["self_attn"][ours]
            out[base + tname + ".weight"] = np.asarray(p["kernel"]).T
            out[base + tname + ".bias"] = np.asarray(p["bias"])
        for tname, ours in (("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")):
            out[base + tname + ".weight"] = np.asarray(lp[ours]["kernel"]).T
            out[base + tname + ".bias"] = np.asarray(lp[ours]["bias"])
        ln(base + "layer_norm1", lp["layer_norm1"])
        ln(base + "layer_norm2", lp["layer_norm2"])
        i += 1
    return out
