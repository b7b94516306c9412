"""BiSeNet face-parsing port: shapes, checkpoint mapping (BN folding,
strict consumption), mask decode, and the --precise CLI path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.interop.bisenet import map_bisenet_params
from adaface_tpu.models.bisenet import (
    BiSeNet,
    N_PARSING_CLASSES,
    parsing_to_mask,
    preprocess,
)


def synth_state_dict(seed=0):
    """Synthetic torch-format face-parsing state dict (zllrunning layout)."""
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    flat = {}

    def conv(name, cout, cin, k):
        flat[name + ".weight"] = r(cout, cin, k, k)

    def bn(name, c):
        flat[name + ".weight"] = r(c) + 1
        flat[name + ".bias"] = r(c)
        flat[name + ".running_mean"] = r(c)
        flat[name + ".running_var"] = np.abs(r(c)) + 1
        flat[name + ".num_batches_tracked"] = np.asarray(7)

    def cbr(name, cout, cin, k):
        conv(name + ".conv", cout, cin, k)
        bn(name + ".bn", cout)

    conv("cp.resnet.conv1", 64, 3, 7)
    bn("cp.resnet.bn1", 64)
    widths = {1: (64, 64), 2: (128, 64), 3: (256, 128), 4: (512, 256)}
    for layer, (cout, cin_first) in widths.items():
        for blk in (0, 1):
            pre = f"cp.resnet.layer{layer}.{blk}"
            cin = cin_first if blk == 0 else cout
            conv(pre + ".conv1", cout, cin, 3)
            bn(pre + ".bn1", cout)
            conv(pre + ".conv2", cout, cout, 3)
            bn(pre + ".bn2", cout)
            if blk == 0 and layer > 1:
                conv(pre + ".downsample.0", cout, cin, 1)
                bn(pre + ".downsample.1", cout)
    for arm, cin in (("arm16", 256), ("arm32", 512)):
        cbr(f"cp.{arm}.conv", 128, cin, 3)
        conv(f"cp.{arm}.conv_atten", 128, 128, 1)
        bn(f"cp.{arm}.bn_atten", 128)
    cbr("cp.conv_avg", 128, 512, 1)
    cbr("cp.conv_head16", 128, 128, 3)
    cbr("cp.conv_head32", 128, 128, 3)
    cbr("ffm.convblk", 256, 256, 1)
    conv("ffm.conv1", 64, 256, 1)
    conv("ffm.conv2", 256, 64, 1)
    for head, mid, cin in (("conv_out", 256, 256), ("conv_out16", 64, 128),
                           ("conv_out32", 64, 128)):
        cbr(head + ".conv", mid, cin, 3)
        conv(head + ".conv_out", N_PARSING_CLASSES, mid, 1)
    return flat


def test_map_and_forward():
    params = map_bisenet_params(synth_state_dict())
    x = preprocess(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8)))
    logits = BiSeNet().apply({"params": params}, x)
    assert logits.shape == (1, 64, 64, N_PARSING_CLASSES)
    assert np.isfinite(np.asarray(logits)).all()


def test_strict_consumption():
    sd = synth_state_dict()
    sd["cp.resnet.bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        map_bisenet_params(sd)


def test_bn_folding_matches_unfolded():
    """Folded conv+BN == conv then batchnorm in fp64-ish tolerance."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.1
    gamma = rng.standard_normal(8).astype(np.float32) + 1
    beta = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = np.abs(rng.standard_normal(8)).astype(np.float32) + 1
    flat = {"m.conv.weight": w, "m.bn.weight": gamma, "m.bn.bias": beta,
            "m.bn.running_mean": mean, "m.bn.running_var": var}
    from adaface_tpu.interop.bisenet import _fold, BN_EPS

    folded = _fold(flat, "m.conv", "m.bn")
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    y_folded = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(folded["kernel"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + folded["bias"]
    y_raw = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_bn = (np.asarray(y_raw) - mean) / np.sqrt(var + BN_EPS) * gamma + beta
    np.testing.assert_allclose(np.asarray(y_folded), y_bn, rtol=1e-4,
                               atol=1e-5)


def test_resize_modes_match_torch():
    """The source repo's ContextPath upsamples with mode='nearest' and its
    final logits resize with bilinear align_corners=True; both ports must
    match torch exactly — trained-checkpoint parity depends on it."""
    import torch
    import torch.nn.functional as F

    from adaface_tpu.models.bisenet import _resize_bilinear_ac, _resize_nearest

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 9, 5)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for h, w in [(64, 72), (8, 9), (3, 4)]:
        ours = np.asarray(_resize_bilinear_ac(jnp.asarray(x), h, w))
        ref = F.interpolate(xt, (h, w), mode="bilinear",
                            align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)
    ours = np.asarray(_resize_nearest(jnp.asarray(x), 16, 18))
    ref = F.interpolate(xt, (16, 18), mode="nearest"
                        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_parsing_to_mask_and_parts():
    parsing = jnp.asarray(np.array([[[0, 1, 2], [0, 17, 1], [0, 0, 0]]]))
    mask, parts = parsing_to_mask(parsing)
    assert mask.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(mask[0]), [[0, 255, 255], [0, 255, 255], [0, 0, 0]])
    assert int(parts[0]) == 4  # classes {0, 1, 2, 17}


@pytest.mark.slow
def test_precise_cli(tmp_path):
    from PIL import Image
    import subprocess
    import sys
    import os

    d = tmp_path / "faces"
    d.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
                    ).save(d / "a.jpg")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/gen_face_masks.py", str(d), "--precise",
         "--parsing_size", "64"],
        cwd=repo_root, env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (d / "a_mask.png").exists()
    m = np.asarray(Image.open(d / "a_mask.png"))
    assert m.shape == (40, 40)
