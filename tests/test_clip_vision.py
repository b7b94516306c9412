"""CLIP vision encoder: HF parity (unmasked) + mask semantics.

The masked path mirrors `CLIPVisionModelWithMask`
(`subj_basis_generator.py:624-747`): pairwise {0,1} mask ADDED to logits
('bias' mode, reference-faithful) and the resized token mask returned.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
from transformers import CLIPVisionConfig as HFVisionConfig
from transformers import CLIPVisionModel

from adaface_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    preprocess_images,
    resize_mask_to_grid,
)
from adaface_tpu.interop.torch_pickle import load_torch_checkpoint
from adaface_tpu.interop.hf_clip import map_clip_vision_params

CFG = dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
           intermediate_size=128, image_size=28, patch_size=14,
           hidden_act="quick_gelu")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    torch.manual_seed(0)
    hf = CLIPVisionModel(HFVisionConfig(**CFG)).eval()
    path = tmp_path_factory.mktemp("ckpt") / "vis.pt"
    torch.save(hf.state_dict(), str(path))
    sd = load_torch_checkpoint(str(path))
    params = map_clip_vision_params(sd, num_layers=2, prefix="vision_model.")
    model = CLIPVisionEncoder(CLIPVisionConfig.tiny())
    return hf, model, {"params": params}


def test_unmasked_parity(pair):
    hf, model, variables = pair
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    feats, pooled, tm = model.apply(variables, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(feats),
                               ref.last_hidden_state.numpy(), atol=3e-5)
    assert tm is None
    # pooled = post-LN CLS
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), atol=3e-5)


def test_penultimate_feature_layer(pair):
    hf, model, variables = pair
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    feats, _, _ = model.apply(variables, jnp.asarray(px), feature_layer=-2)
    np.testing.assert_allclose(np.asarray(feats),
                               ref.hidden_states[-2].numpy(), atol=3e-5)


def test_mask_grid_and_cls():
    mask = np.zeros((1, 28, 28), np.float32)
    mask[:, :14, :] = 1.0  # top half fg
    tm = resize_mask_to_grid(jnp.asarray(mask), grid=2)
    np.testing.assert_array_equal(np.asarray(tm), [[1, 1, 1, 0, 0]])


def test_bias_mask_changes_features_and_returns_token_mask(pair):
    _, model, variables = pair
    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    mask = np.zeros((1, 28, 28), np.float32)
    mask[:, :, :14] = 1.0
    f0, _, _ = model.apply(variables, jnp.asarray(px))
    f1, _, tm = model.apply(variables, jnp.asarray(px), attn_mask=jnp.asarray(mask))
    assert tm.shape == (1, 5, 1)
    np.testing.assert_array_equal(np.asarray(tm[..., 0]), [[1, 1, 0, 1, 0]])
    # fg and bg masks give different features (bias mode shifts logits)
    f2, _, _ = model.apply(variables, jnp.asarray(px),
                           attn_mask=jnp.asarray(1 - mask))
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-6
    assert np.abs(np.asarray(f1) - np.asarray(f0)).max() > 1e-6


def test_hard_mask_blocks_info_flow(pair):
    """In 'hard' mode, out-of-mask pixel changes cannot affect in-mask
    tokens (CLS + fg patches only attend within the mask)."""
    _, model, variables = pair
    cfg = CLIPVisionConfig.tiny()
    hard = CLIPVisionEncoder(cfg, mask_mode="hard")
    rng = np.random.default_rng(3)
    px = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    px2 = px.copy()
    px2[:, :, 14:] += 10.0  # perturb right half (out of mask)
    mask = np.zeros((1, 28, 28), np.float32)
    mask[:, :, :14] = 1.0
    f1, _, _ = hard.apply(variables, jnp.asarray(px), attn_mask=jnp.asarray(mask))
    f2, _, _ = hard.apply(variables, jnp.asarray(px2), attn_mask=jnp.asarray(mask))
    # in-mask tokens: CLS(0), patch 1 and 3 (left column of 2x2 grid)
    for t in (0, 1, 3):
        np.testing.assert_allclose(np.asarray(f1[0, t]), np.asarray(f2[0, t]),
                                   atol=1e-5)


def test_preprocess_matches_clip_stats():
    img = np.full((1, 32, 32, 3), 255, np.uint8)
    out = np.asarray(preprocess_images(jnp.asarray(img), 28))
    # white pixel -> (1 - mean) / std
    expect = (1.0 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(out[0, 0, 0, 0], expect, rtol=1e-5)
