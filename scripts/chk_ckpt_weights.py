#!/usr/bin/env python
"""Track embedding weight norms across training checkpoints.

Equivalent of `scripts/chk_ckpt_weights.py` (88 LoC): print per-placeholder
parameter norms for each checkpoint to watch drift/explosion across iters.
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from adaface_tpu.personalization.embedding_manager import EmbeddingManager  # noqa: E402


def main(paths):
    paths = sorted(paths, key=lambda p: int(
        (re.search(r"gs-(\d+)", p) or re.search(r"(\d+)", p) or [0, "0"])[1]
    ) if re.search(r"\d", p) else 0)
    for path in paths:
        mgr = EmbeddingManager.load_native(path)
        parts = []
        for s, emb in mgr.embedders.items():
            norms = []
            for f in ("basis_rand_weights", "basis_vecs", "bias"):
                v = getattr(emb, f)
                if v is not None:
                    norms.append(f"{f.split('_')[-1]}={np.linalg.norm(np.asarray(v)):.3f}")
            parts.append(f"{s}({', '.join(norms)})")
        print(f"{os.path.basename(path)}: {'  '.join(parts)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    a = p.parse_args()
    paths = []
    for item in a.inputs:
        paths.extend(glob.glob(item) if any(c in item for c in "*?[") else [item])
    main(paths)
