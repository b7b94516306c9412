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


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("--out", required=True)
    a = p.parse_args()
    export(a.input, a.out)
