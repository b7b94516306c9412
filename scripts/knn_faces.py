#!/usr/bin/env python
"""Face-embedding KNN retrieval over image folders.

Equivalent of `scripts-private/knn-faces.py` (110 LoC): embed a query image
and a gallery of folders, print the nearest neighbors by cosine similarity.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(opt):
    from PIL import Image

    from filter_faces import default_face_app

    from adaface_tpu.evaluation.eval_utils import list_image_files

    app = default_face_app()
    q = app.embed_image(np.asarray(Image.open(opt.query).convert("RGB")))
    if q is None:
        raise SystemExit("no face in query image")
    entries = []
    for folder in opt.gallery:
        for p in list_image_files(folder):
            e = app.embed_image(np.asarray(Image.open(p).convert("RGB")))
            if e is not None:
                entries.append((p, float(q @ e)))
    entries.sort(key=lambda x: -x[1])
    for p, s in entries[:opt.k]:
        print(f"{s:.4f}  {p}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--query", required=True)
    p.add_argument("--gallery", nargs="+", required=True)
    p.add_argument("-k", type=int, default=10)
    sys.exit(main(p.parse_args()))
