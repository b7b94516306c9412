#!/usr/bin/env python
"""Average (SWA) embedding checkpoints across training iterations.

Equivalent of `scripts/avgemb.py` (110 LoC): load a set of
`embeddings_gs-*.npz` checkpoints (typically the trailing ones of a run)
and write their parameter-wise average.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from adaface_tpu.personalization.embedding_manager import EmbeddingManager  # noqa: E402
from adaface_tpu.personalization.static_embedding import StaticEmbedderParams  # noqa: E402


def average(paths, out_path):
    mgrs = [EmbeddingManager.load_native(p) for p in paths]
    base = mgrs[0]
    fields = ("basis_rand_weights", "basis_comm_weights", "basis_vecs",
              "pre_vecs", "bias")
    for s in base.placeholders:
        vals = {}
        for f in fields:
            arrs = [getattr(m.embedders[s], f) for m in mgrs
                    if getattr(m.embedders[s], f) is not None]
            vals[f] = (np.mean([np.asarray(a) for a in arrs], axis=0)
                       if arrs else None)
        base.embedders[s] = StaticEmbedderParams(**vals)
    base.save_native(out_path)
    print(f"averaged {len(paths)} ckpts -> {out_path}")
    return base


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+",
                   help="checkpoints or a glob like 'logs/run/embeddings_gs-*.npz'")
    p.add_argument("--out", required=True)
    p.add_argument("--last_n", type=int, default=0,
                   help="use only the N newest checkpoints")
    a = p.parse_args()
    paths = []
    for item in a.inputs:
        paths.extend(glob.glob(item) if any(c in item for c in "*?[") else [item])
    paths.sort(key=os.path.getmtime)
    if a.last_n > 0:
        paths = paths[-a.last_n:]
    average(paths, a.out)
