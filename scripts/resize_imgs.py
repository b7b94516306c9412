#!/usr/bin/env python
"""Batch image resizing — the `scripts/resize-imgs.py` analog.

    python scripts/resize_imgs.py SRC_DIR DST_DIR --size 512
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--size", type=int, default=512,
                   help="target short-side length")
    opt = p.parse_args(argv)
    from PIL import Image

    os.makedirs(opt.dst, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(opt.src)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png", ".webp")):
            continue
        img = Image.open(os.path.join(opt.src, name)).convert("RGB")
        w, h = img.size
        scale = opt.size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)),
                         Image.LANCZOS)
        img.save(os.path.join(opt.dst, name))
        n += 1
    print(f"resized {n} images -> {opt.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
