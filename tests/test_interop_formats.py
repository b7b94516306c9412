"""Checkpoint-container formats: the torch-free safetensors reader/writer and
the `.ckpt`/`.safetensors` router `load_sd_state_dict`.

The reference loads SD backbones only as torch pickles (`main.py:27-50`,
`scripts/stable_txt2img.py:400`); SD v1.5 weights are distributed as
single-file `.safetensors` today, so the pipeline accepts both containers.
Cross-validated against the real `safetensors` package (bundled with
transformers) in both directions.
"""

import numpy as np
import pytest
import torch

from adaface_tpu.interop.torch_pickle import (
    load_safetensors,
    load_sd_state_dict,
    save_safetensors,
)


def _sample_tensors():
    rng = np.random.default_rng(0)
    return {
        "model.diffusion_model.w": rng.standard_normal((3, 4)).astype(np.float32),
        "first_stage_model.b": rng.standard_normal((7,)).astype(np.float16),
        "cond_stage_model.idx": np.arange(6, dtype=np.int64).reshape(2, 3),
        "flags": np.array([True, False, True]),
        "bytes": np.arange(5, dtype=np.uint8),
    }


def test_save_load_safetensors_roundtrip(tmp_path):
    tensors = _sample_tensors()
    path = str(tmp_path / "x.safetensors")
    save_safetensors(tensors, path, metadata={"format": "pt"})
    out = load_safetensors(path)
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        assert out[k].dtype == v.dtype and out[k].shape == v.shape
        np.testing.assert_array_equal(out[k], v)


def test_save_safetensors_normalizes_big_endian(tmp_path):
    path = str(tmp_path / "be.safetensors")
    save_safetensors({"w": np.arange(4, dtype=">f4")}, path)
    out = load_safetensors(path)
    assert out["w"].dtype == np.float32
    np.testing.assert_array_equal(out["w"], [0.0, 1.0, 2.0, 3.0])


def test_safetensors_cross_validation_with_real_package(tmp_path):
    from safetensors.numpy import load_file, save_file

    tensors = _sample_tensors()
    ours = str(tmp_path / "ours.safetensors")
    theirs = str(tmp_path / "theirs.safetensors")
    save_safetensors(tensors, ours)
    save_file(tensors, theirs)
    # our writer -> real reader
    real_read = load_file(ours)
    for k, v in tensors.items():
        np.testing.assert_array_equal(real_read[k], v)
    # real writer -> our reader
    our_read = load_safetensors(theirs)
    for k, v in tensors.items():
        np.testing.assert_array_equal(our_read[k], v)


def test_safetensors_bf16_read(tmp_path):
    from safetensors.torch import save_file

    t = torch.tensor([[1.5, -2.0], [0.25, 3.0]], dtype=torch.bfloat16)
    path = str(tmp_path / "bf16.safetensors")
    save_file({"w": t}, path)
    out = load_safetensors(path)
    assert out["w"].dtype == np.float32  # bf16 widened to f32
    np.testing.assert_array_equal(out["w"], t.float().numpy())


@pytest.mark.parametrize("wrap_state_dict", [True, False])
def test_load_sd_state_dict_torch_zip(tmp_path, wrap_state_dict):
    tensors = _sample_tensors()
    path = str(tmp_path / "sd.ckpt")
    sd = {k: torch.from_numpy(v.copy()) for k, v in tensors.items()
          if v.dtype != np.uint8}  # torch.save path; uint8 fine but keep small
    torch.save({"state_dict": sd, "epoch": 3} if wrap_state_dict else sd, path)
    out = load_sd_state_dict(path)
    for k, v in sd.items():
        np.testing.assert_array_equal(np.asarray(out[k]), v.numpy())
    assert "epoch" not in out or not wrap_state_dict


def test_load_sd_state_dict_safetensors_route(tmp_path):
    tensors = _sample_tensors()
    path = str(tmp_path / "sd.safetensors")
    save_safetensors(tensors, path)
    out = load_sd_state_dict(path)
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)
