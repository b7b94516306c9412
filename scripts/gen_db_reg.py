#!/usr/bin/env python
"""Generate DreamBooth class-regularization images.

Equivalent of the reference's `scripts/gen-db-reg.sh` (loops
stable_txt2img over the class prompt to fill the reg folder consumed by
`main_db.py` / here `train.py --dreambooth --reg_data_root`). In-process:
wraps `txt2img.main` with the class prompt and the requested count.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--class_prompt", required=True,
                   help='e.g. "a photo of a person"')
    p.add_argument("--out", required=True, help="reg image folder")
    p.add_argument("--num_images", type=int, default=200)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    opt = p.parse_args(argv)

    import txt2img

    os.makedirs(opt.out, exist_ok=True)
    done = 0
    batch = 0
    while done < opt.num_images:
        n = min(opt.n_samples, opt.num_images - done)
        argv2 = ["--prompt", opt.class_prompt, "--out",
                 os.path.join(opt.out, f"b{batch:04}"),
                 "--steps", str(opt.steps), "--size", str(opt.size),
                 "--n_samples", str(n), "--seed", str(opt.seed + batch)]
        if opt.ckpt:
            argv2 += ["--ckpt", opt.ckpt]
        if opt.tiny:
            argv2 += ["--tiny"]
        txt2img.main(txt2img.parse_args(argv2))
        done += n
        batch += 1
    # flatten: move jpgs up so the folder is a plain image dir
    idx = 0
    for root, _, files in os.walk(opt.out):
        if root == opt.out:
            continue
        for f in sorted(files):
            if f.endswith((".jpg", ".png")) and "grid" not in f:
                os.replace(os.path.join(root, f),
                           os.path.join(opt.out, f"reg_{idx:05}.jpg"))
                idx += 1
    print(f"wrote {idx} class-regularization images to {opt.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
