#!/usr/bin/env python
"""Export native .npz subject embeddings to the reference's .pt format.

Cross-validation interop: the reference loads `embeddings_gs-*.pt` dicts
with `string_to_token`, `string_to_static_embedder` (StaticLayerwiseEmbedding
modules), `token2num_vectors`, `background_strings`
(`embedding_manager.py:1820-1834`). We can't construct its live nn.Module
classes without the reference codebase, so this writes the plain-tensor
variant its legacy-repair path accepts (a ParameterDict of stacked
[16, K, 768] embeddings), using the baked-in torch (cpu) only here, at the
interop boundary.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def export(npz_path: str, out_path: str):
    import torch

    from adaface_tpu.personalization.embedding_manager import EmbeddingManager
    from adaface_tpu.personalization.static_embedding import compute_static_embedding

    mgr = EmbeddingManager.load_native(npz_path)
    string_to_token = {}
    string_to_emb = {}
    token2num_vectors = {}
    bg_strings = []
    for s, info in mgr.placeholders.items():
        string_to_token[s] = torch.tensor(info.token_id)
        emb = np.asarray(compute_static_embedding(mgr.embedders[s]))
        string_to_emb[s] = torch.nn.Parameter(torch.tensor(emb),
                                              requires_grad=False)
        token2num_vectors[s] = info.num_vectors
        if info.is_background:
            bg_strings.append(s)
    ckpt = {
        "string_to_token": string_to_token,
        "string_to_static_embedder": torch.nn.ParameterDict(string_to_emb),
        "token2num_vectors": token2num_vectors,
        "background_strings": bg_strings,
        "use_conv_attn_kernel_size": mgr.use_conv_attn_kernel_size
        if mgr.use_conv_attn_kernel_size > 0 else None,
        "emb_global_scale_scores": torch.tensor(
            [mgr.emb_global_scale_scores.get(s, 0.0)
             for s in mgr.placeholders]),
    }
    torch.save(ckpt, out_path)
    print(f"exported {len(string_to_token)} placeholders -> {out_path}")


def export_zs(pkl_path: str, out_path: str):
    """Export a ZeroShotTrainer checkpoint (`subj_basis_*.pkl`, a pytree of
    per-placeholder SubjBasisGenerator params) to a .pt whose
    `string_to_subj_basis_generator_state_dicts` entry holds torch-layout
    state dicts — a reference-side user loads each with
    `module.load_state_dict(sd)` on a constructed `SubjBasisGenerator`
    (`ldm/modules/subj_basis_generator.py:369`). The import direction
    (pickled modules -> flax) lives in `interop/subj_basis.py`."""
    import pickle

    import torch

    from adaface_tpu.interop.subj_basis import export_subj_basis_generator

    with open(pkl_path, "rb") as f:
        ckpt = pickle.load(f)
    gen_params = ckpt["generator_params"]
    state_dicts = {}
    for name, params in gen_params.items():
        is_bg = "bg_proj_dense" in params
        sd = export_subj_basis_generator(params, placeholder_is_bg=is_bg)
        state_dicts[name] = {k: torch.tensor(np.asarray(v))
                             for k, v in sd.items()}
    torch.save({
        "string_to_subj_basis_generator_state_dicts": state_dicts,
        "placeholder_strings": list(gen_params),
        "background_strings": [n for n, p in gen_params.items()
                               if "bg_proj_dense" in p],
        "global_step": ckpt.get("global_step", 0),
        "do_zero_shot": True,
    }, out_path)
    print(f"exported {len(state_dicts)} subj-basis generators -> {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("--out", required=True)
    p.add_argument("--zs", action="store_true",
                   help="input is a ZeroShotTrainer subj_basis_*.pkl")
    a = p.parse_args()
    (export_zs if a.zs else export)(a.input, a.out)
