#!/usr/bin/env python
"""Folder-pair face similarity reports.

Equivalent of `scripts-private/comparefaces.py` (59 LoC): mean pairwise
face similarity between two folders, or a folder against itself
(`--self`, the intra-subject upper bound)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("folder1")
    p.add_argument("folder2", nargs="?", default=None)
    p.add_argument("--self", dest="self_compare", action="store_true")
    a = p.parse_args()

    from filter_faces import default_face_app

    from adaface_tpu.evaluation.eval_utils import compare_face_folders

    app = default_face_app()
    f2 = a.folder1 if (a.self_compare or a.folder2 is None) else a.folder2
    sim, nf1, nf2 = compare_face_folders(app.embed_image, a.folder1, f2)
    print(f"{a.folder1} vs {f2}: face sim {sim:.4f} "
          f"(no-face: {nf1}/{nf2})")
