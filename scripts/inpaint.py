#!/usr/bin/env python
"""Masked inpainting CLI — the `scripts/inpaint.py` analog.

Thin front over scripts/img2img.py's masked-latent-blend path (`--mask`):
keeps the unmasked region pinned to the stochastic-encoded original at
every DDIM step (`scripts/inpaint.py` reference semantics).

    python scripts/inpaint.py --init_img img.png --mask mask.png \
        --prompt "a z wearing a hat" --out outputs/inpaint
"""

import sys

from img2img import main, parse_args  # same option surface


if __name__ == "__main__":
    opt = parse_args(sys.argv[1:])
    if not opt.mask:
        sys.exit("inpaint.py requires --mask (use img2img.py for full-image)")
    sys.exit(main(opt))
