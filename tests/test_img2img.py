"""img2img + masked-latent inpainting CLI smoke (the reference's
scripts/img2img.py + inpaint.py surface)."""

import os
import sys

import numpy as np


def _write_img(path, size=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (size, size, 3)
                                 ).astype(np.uint8)).save(path)


def test_img2img_and_inpaint_smoke(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import img2img

    init = str(tmp_path / "init.png")
    _write_img(init)
    out1 = str(tmp_path / "o1")
    rc = img2img.main(img2img.parse_args([
        "--init_img", init, "--prompt", "a photo of a z",
        "--strength", "0.5", "--steps", "4", "--n_samples", "1",
        "--size", "64", "--tiny", "--out", out1]))
    assert rc in (0, None)
    assert any(f.endswith((".jpg", ".png")) for f in os.listdir(out1))

    # masked-latent inpainting path
    from PIL import Image

    mask = str(tmp_path / "mask.png")
    m = np.zeros((64, 64), np.uint8)
    m[16:48, 16:48] = 255
    Image.fromarray(m).save(mask)
    out2 = str(tmp_path / "o2")
    rc = img2img.main(img2img.parse_args([
        "--init_img", init, "--prompt", "a photo of a z", "--mask", mask,
        "--strength", "0.6", "--steps", "4", "--n_samples", "1",
        "--size", "64", "--tiny", "--out", out2]))
    assert rc in (0, None)
    assert any(f.endswith((".jpg", ".png")) for f in os.listdir(out2))
