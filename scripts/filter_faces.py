#!/usr/bin/env python
"""Dataset curation: filter out low-face-similarity / faceless images.

Equivalent of `scripts-private/filter_faces.py` (169 LoC): embed every image
in a subject folder (largest detected face), compute each image's cosine
similarity to the folder mean, and move images below the threshold (default
0.65) or without a detected face into a `trash/` subfolder — the curation
step for zero-shot training corpora.
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def filter_folder(face_embed_fn, folder: str, threshold: float = 0.65,
                  dry_run: bool = False):
    from adaface_tpu.evaluation.eval_utils import list_image_files

    paths = list_image_files(folder)
    embs, keep_paths, faceless = [], [], []
    for p in paths:
        from PIL import Image

        img = np.asarray(Image.open(p).convert("RGB"))
        e = face_embed_fn(img)
        if e is None:
            faceless.append(p)
        else:
            embs.append(np.asarray(e, np.float32))
            keep_paths.append(p)

    moved = list(faceless)
    if embs:
        mat = np.stack(embs)
        mat = mat / np.linalg.norm(mat, axis=-1, keepdims=True)
        mean = mat.mean(axis=0)
        mean = mean / (np.linalg.norm(mean) + 1e-12)
        sims = mat @ mean
        for p, s in zip(keep_paths, sims):
            if s < threshold:
                moved.append(p)
                print(f"low sim {s:.3f}: {os.path.basename(p)}")

    trash = os.path.join(folder, "trash")
    if not dry_run and moved:
        os.makedirs(trash, exist_ok=True)
        for p in moved:
            shutil.move(p, os.path.join(trash, os.path.basename(p)))
            stem = os.path.splitext(p)[0]
            for extra in (stem + "_mask.png", stem + ".txt"):
                if os.path.exists(extra):
                    shutil.move(extra, os.path.join(trash, os.path.basename(extra)))
    print(f"{folder}: kept {len(paths) - len(moved)}/{len(paths)}, "
          f"moved {len(moved)} ({len(faceless)} faceless)")
    return moved


def default_face_app():
    import jax
    import jax.numpy as jnp

    from adaface_tpu.face_app import FaceApp
    from adaface_tpu.interop.onnx_weights import load_onnx_weights
    from adaface_tpu.models.arcface import (
        IResNet, IResNetConfig, map_arcface_onnx_params,
    )

    onnx_path = os.environ.get("ARCFACE_ONNX")
    if onnx_path and os.path.exists(onnx_path):
        weights, nodes = load_onnx_weights(onnx_path, with_graph=True)
        cfg = IResNetConfig.iresnet100()
        params = map_arcface_onnx_params(weights, nodes, cfg)
        return FaceApp(IResNet(cfg), params)
    print("NOTE: no ARCFACE_ONNX weights; random recognizer (smoke mode)")
    cfg = IResNetConfig.tiny()
    model = IResNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))["params"]
    return FaceApp(model, params)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("folders", nargs="+")
    p.add_argument("--threshold", type=float, default=0.65)
    p.add_argument("--dry_run", action="store_true")
    a = p.parse_args()
    app = default_face_app()
    for folder in a.folders:
        filter_folder(app.embed_image, folder, a.threshold, a.dry_run)
