#!/usr/bin/env python
"""Merge per-subject embedding checkpoints into one, renaming collisions.

Equivalent of `scripts/merge_embeddings.py` (111 LoC): placeholders that
collide across checkpoints get numeric suffixes (z, z2, z3, ...). Accepts
native `.npz` and reference `.pt` checkpoints; writes native `.npz`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adaface_tpu.personalization.embedding_manager import EmbeddingManager  # noqa: E402


def merge(paths, out_path):
    merged = EmbeddingManager()
    next_id = 49408
    for path in paths:
        if path.endswith(".npz"):
            src = EmbeddingManager.load_native(path)
        else:
            src = EmbeddingManager()
            src.load_reference_checkpoint(path)
        for s, info in src.placeholders.items():
            target = s
            n = 2
            while target in merged.placeholders:
                target = f"{s}{n}"
                n += 1
            if target != s:
                print(f"{path}: {s} -> {target} (collision)")
            info.string = target
            info.token_id = next_id
            next_id += 1
            merged.placeholders[target] = info
            merged.embedders[target] = src.embedders[s]
            merged.emb_global_scale_scores[target] = \
                src.emb_global_scale_scores.get(s, 0.0)
    merged.save_native(out_path)
    print(f"merged {len(merged.placeholders)} placeholders -> {out_path}")
    return merged


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    a = p.parse_args()
    merge(a.inputs, a.out)
