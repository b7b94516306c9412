#!/usr/bin/env python
"""Inspect webdataset shards — the `scripts/exam_wds.py` analog.

Streams samples from LAION-style tar shards, applies the same prompt/aspect
filters the training compositor uses, and reports pass rates; optionally
dumps the first N accepted images.

    python scripts/exam_wds.py shard-000.tar --n 20 --dump /tmp/wds
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("shards", nargs="+")
    p.add_argument("--n", type=int, default=20, help="samples to examine")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dump", type=str, default=None,
                   help="save accepted backgrounds here")
    opt = p.parse_args(argv)

    from adaface_tpu.data.wds import BackgroundCompositor

    comp = BackgroundCompositor(opt.shards, size=opt.size)
    if opt.dump:
        os.makedirs(opt.dump, exist_ok=True)
    accepted = 0
    for i in range(opt.n):
        out = comp.next_background()
        if out is None:
            print(f"stream exhausted after {i} draws")
            break
        img, caption = out
        accepted += 1
        print(f"[{i}] {img.shape} {caption[:100]!r}")
        if opt.dump:
            from PIL import Image

            Image.fromarray(img).save(
                os.path.join(opt.dump, f"bg_{i:04d}.jpg"))
    print(f"{accepted}/{opt.n} backgrounds accepted "
          f"(filters: {comp.rejected} rejected)"
          if hasattr(comp, "rejected") else f"{accepted}/{opt.n} accepted")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
