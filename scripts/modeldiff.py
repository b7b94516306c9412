#!/usr/bin/env python
"""Checkpoint weight diffing.

Equivalent of `scripts-private/modeldiff.py` (32 LoC): per-parameter L2
norms of the difference between two checkpoints (.npz native embeddings or
torch .ckpt/.pt state dicts), sorted by relative change.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def load_flat(path):
    if path.endswith(".npz"):
        z = np.load(path)
        return {k: z[k] for k in z.files if k != "__header__"}
    from adaface_tpu.interop.torch_pickle import load_torch_checkpoint, walk_stub_tree

    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    if isinstance(sd, dict) and all(isinstance(v, np.ndarray) for v in sd.values()):
        return sd
    return walk_stub_tree(sd)


def main(opt):
    a = load_flat(opt.ckpt_a)
    b = load_flat(opt.ckpt_b)
    rows = []
    for k in sorted(set(a) & set(b)):
        if not hasattr(a[k], "shape") or a[k].shape != b[k].shape:
            continue
        d = float(np.linalg.norm(np.asarray(a[k], np.float32)
                                 - np.asarray(b[k], np.float32)))
        base = float(np.linalg.norm(np.asarray(a[k], np.float32))) + 1e-12
        rows.append((d / base, d, k))
    rows.sort(reverse=True)
    for rel, d, k in rows[:opt.top]:
        print(f"rel {rel:8.4f}  abs {d:10.4f}  {k}")
    only_a = set(a) - set(b)
    only_b = set(b) - set(a)
    if only_a:
        print(f"only in A: {len(only_a)} keys")
    if only_b:
        print(f"only in B: {len(only_b)} keys")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_a")
    p.add_argument("ckpt_b")
    p.add_argument("--top", type=int, default=20)
    sys.exit(main(p.parse_args()))
