#!/usr/bin/env python
"""Generate `*_mask.png` foreground masks for subject folders.

Equivalent of `scripts-private/gen_face_masks.py` (185 LoC). The reference
runs an external BiSeNet face-parsing repo; here the mask comes from the
in-repo RetinaFace detector: an elliptical face+hair region grown from the
detected box (landmark-anchored), which is what the training losses
actually consume (a binary fg region, `personalized.py:247-330`). Plug a
parsing model via --precise when available.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def bbox_to_mask(shape, bbox, landmarks=None, grow=(0.35, 0.55)) -> np.ndarray:
    """Elliptical mask around the face box, grown wider/taller to cover
    hair and chin (grow = fractional margins)."""
    h, w = shape[:2]
    x1, y1, x2, y2 = bbox
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    rx = (x2 - x1) / 2 * (1 + grow[0])
    ry = (y2 - y1) / 2 * (1 + grow[1])
    cy -= (y2 - y1) * 0.08  # shift up a bit toward the hairline
    yy, xx = np.mgrid[0:h, 0:w]
    m = (((xx - cx) / max(rx, 1)) ** 2 + ((yy - cy) / max(ry, 1)) ** 2) <= 1.0
    return (m * 255).astype(np.uint8)


def make_parser(opt):
    """--precise: BiSeNet face-parsing masks (the reference's method,
    `scripts-private/gen_face_masks.py`) with trash/inspect parts-count
    routing. Returns parse(img_uint8) -> (mask_uint8 [H,W], n_parts)."""
    import jax
    import jax.numpy as jnp

    from adaface_tpu.models.bisenet import (
        BiSeNet,
        parsing_to_mask,
        preprocess,
    )

    if opt.parsing_ckpt:
        # an explicitly-given but missing checkpoint is a hard error:
        # silently parsing with random weights would feed garbage parts
        # counts into the destructive --route renames
        if not os.path.exists(opt.parsing_ckpt):
            raise SystemExit(f"--parsing_ckpt not found: {opt.parsing_ckpt}")
        from adaface_tpu.interop.bisenet import load_bisenet

        model, params = load_bisenet(opt.parsing_ckpt)
    else:
        print("NOTE: no --parsing_ckpt; random BiSeNet weights (smoke) — "
              "masks are architecture-real but untrained")
        model = BiSeNet()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]

    @jax.jit
    def forward(x):
        logits = model.apply({"params": params}, x)
        parsing = jnp.argmax(logits, axis=-1)
        return parsing_to_mask(parsing)

    from PIL import Image

    def parse(img: np.ndarray):
        im = Image.fromarray(img).resize((opt.parsing_size, opt.parsing_size),
                                         Image.BILINEAR)
        x = preprocess(jnp.asarray(np.asarray(im)[None]))
        mask, parts = forward(x)
        m = np.asarray(
            Image.fromarray(np.asarray(mask[0])).resize(
                (img.shape[1], img.shape[0]), Image.NEAREST))
        return m, int(parts[0])

    return parse


def main(opt):
    from PIL import Image

    from adaface_tpu.evaluation.eval_utils import list_image_files

    if opt.precise:
        parse = make_parser(opt)
        for folder in opt.folders:
            n = n_trash = n_inspect = 0
            for p in list_image_files(folder):
                stem = os.path.splitext(p)[0]
                out = stem + "_mask.png"
                if os.path.exists(out) and not opt.overwrite:
                    continue
                img = np.asarray(Image.open(p).convert("RGB"))
                mask, parts = parse(img)
                # parts-count routing (`gen_face_masks.py:148-163`):
                # too few parts = bad image, too many = needs inspection
                if opt.route and parts <= 9:
                    trash = os.path.join(folder + "_trash")
                    os.makedirs(trash, exist_ok=True)
                    os.rename(p, os.path.join(trash, os.path.basename(p)))
                    n_trash += 1
                    continue
                if opt.route and parts >= 18:
                    insp = os.path.join(folder + "_inspect")
                    os.makedirs(insp, exist_ok=True)
                    os.rename(p, os.path.join(insp, os.path.basename(p)))
                    n_inspect += 1
                    continue
                Image.fromarray(mask).save(out)
                n += 1
            print(f"{folder}: wrote {n} masks "
                  f"(trash {n_trash}, inspect {n_inspect})")
        return 0

    if opt.use_detector and opt.detector == "scrfd":
        # antelopev2-parity detector (`ddpm.py:904-933`)
        import jax

        from adaface_tpu.models.scrfd import SCRFDDetector, init_scrfd

        model, params = init_scrfd(jax.random.PRNGKey(0))
        print("NOTE: SCRFD with synthetic weights (smoke) — boxes are "
              "architecture-real but untrained")
        detect = SCRFDDetector(model, params, score_thresh=opt.score_thresh)
    elif opt.use_detector:
        import jax
        import jax.numpy as jnp

        from adaface_tpu.face_app import FaceApp
        from adaface_tpu.models.retinaface import RetinaFace, RetinaFaceDetector

        model = RetinaFace()
        weights_path = os.environ.get("RETINAFACE_PT")
        if weights_path and os.path.exists(weights_path):
            from adaface_tpu.interop.torch_pickle import load_torch_checkpoint
            from adaface_tpu.models.retinaface import map_retinaface_torch_params

            sd = load_torch_checkpoint(weights_path)
            variables = map_retinaface_torch_params(
                sd.get("state_dict", sd))
        else:
            print("NOTE: no RETINAFACE_PT weights; random detector (smoke)")
            variables = dict(model.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 320, 320, 3))))
        detect = RetinaFaceDetector(model, variables,
                                    score_thresh=opt.score_thresh)
    else:
        detect = None

    for folder in opt.folders:
        n = 0
        for p in list_image_files(folder):
            stem = os.path.splitext(p)[0]
            out = stem + "_mask.png"
            if os.path.exists(out) and not opt.overwrite:
                continue
            img = np.asarray(Image.open(p).convert("RGB"))
            if detect is not None:
                faces = detect(img)
                if not faces:
                    print(f"no face: {p}")
                    continue
                bbox, lm, _ = max(faces, key=lambda f: (f[0][2] - f[0][0])
                                  * (f[0][3] - f[0][1]))
                mask = bbox_to_mask(img.shape, bbox, lm)
            else:
                # centered default ellipse (subject-crop datasets)
                h, w = img.shape[:2]
                mask = bbox_to_mask(img.shape,
                                    (w * 0.2, h * 0.12, w * 0.8, h * 0.88))
            Image.fromarray(mask).save(out)
            n += 1
        print(f"{folder}: wrote {n} masks")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("folders", nargs="+")
    p.add_argument("--use_detector", action="store_true")
    p.add_argument("--detector", choices=["scrfd", "retinaface"],
                   default="scrfd",
                   help="scrfd = antelopev2 parity (the reference's "
                        "training-time detector)")
    p.add_argument("--score_thresh", type=float, default=0.5)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--precise", action="store_true",
                   help="BiSeNet face-parsing masks (the reference's "
                        "method) instead of the detector ellipse")
    p.add_argument("--parsing_ckpt", type=str, default=None,
                   help="face-parsing .pth (e.g. 79999_iter.pth)")
    p.add_argument("--parsing_size", type=int, default=512)
    p.add_argument("--route", action="store_true",
                   help="move <=9-part images to *_trash and >=18-part "
                        "to *_inspect like the reference")
    sys.exit(main(p.parse_args()))
