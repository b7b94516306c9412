"""Arc2Face stack: template patching, emb-type variants, MKV extension.

Covers the behavioral contracts of `ldm/util.py:1085-1237` and
`ldm/modules/arc2face_models.py` without needing the HF pretrained weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.personalization.arc2face import (
    CORE_BEGIN,
    CORE_END,
    FORWARD_TEMPLATE,
    INVERSE_TEMPLATE,
    extend_clip_mkv_params,
    forward_face_embs,
    inverse_face_prompt_embs,
    make_pad_embeddings,
)

T, D = 32, 64


@pytest.fixture(scope="module")
def enc():
    cfg = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=3,
                              max_position_embeddings=T)
    model = CLIPTextEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.zeros((1, T), jnp.int32))["params"]
    return model, params


@pytest.fixture(scope="module")
def tok():
    t = HashTokenizer()
    t.max_length = T
    return t


def test_forward_face_embs_core_slice(enc, tok):
    model, params = enc
    ids = tok([FORWARD_TEMPLATE], max_length=T)
    face = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((2, 60)).astype(np.float32))
    arc_id = int(tok.encode("id")[0])
    full, core = forward_face_embs(model, params, face, jnp.asarray(ids), arc_id)
    assert full.shape == (2, T, D)
    np.testing.assert_array_equal(np.asarray(core),
                                  np.asarray(full[:, CORE_BEGIN:CORE_END]))
    # the face embedding actually influences the output
    full2, _ = forward_face_embs(model, params, face * 2, jnp.asarray(ids), arc_id)
    assert np.abs(np.asarray(full) - np.asarray(full2)).max() > 1e-5


def test_inverse_emb_types(enc, tok):
    model, params = enc
    ids = tok([INVERSE_TEMPLATE], max_length=T)
    rng = np.random.default_rng(1)
    core_in = jnp.asarray(rng.standard_normal((1, 16, D)).astype(np.float32))
    pad = make_pad_embeddings(model, params, tok.eos_id, length=T)
    hslw = jnp.asarray([[1.0], [2.0], [4.0]])
    full, full_pad, half_pad, zeroed, b_core_e, core = inverse_face_prompt_embs(
        model, params, core_in, jnp.asarray(ids), pad,
        ("full", "full_pad", "full_half_pad", "full_zeroed_extra",
         "b_core_e", "core"),
        hidden_state_layer_weights=hslw)
    assert full.shape == (1, T, D)
    np.testing.assert_array_equal(np.asarray(core),
                                  np.asarray(full[:, CORE_BEGIN:CORE_END]))
    # full_pad: rows 24:-1 come from pad embeddings (`ldm/util.py:1218-1221`)
    ref = np.asarray(full).copy()
    ref[:, 24:-1] = np.asarray(pad)[24:-1]
    np.testing.assert_allclose(np.asarray(full_pad), ref, atol=1e-6)
    # full_half_pad keeps the tail of the pads
    n_half = (T - 25) // 2
    ref2 = np.asarray(full).copy()
    if n_half >= 1:
        ref2[:, 24:24 + n_half] = np.asarray(pad)[24:24 + n_half]
    np.testing.assert_allclose(np.asarray(half_pad), ref2, atol=1e-6)
    # zeroed-extra zeroes 24:-1
    assert np.abs(np.asarray(zeroed)[:, 24:-1]).max() == 0.0
    # b_core_e = rows :22 + last row
    assert b_core_e.shape == (1, 23, D)
    np.testing.assert_array_equal(np.asarray(b_core_e[:, :22]),
                                  np.asarray(full[:, :22]))


def test_layer_weights_change_output(enc, tok):
    model, params = enc
    ids = tok([INVERSE_TEMPLATE], max_length=T)
    core_in = jnp.asarray(np.random.default_rng(2)
                          .standard_normal((1, 16, D)).astype(np.float32))
    pad = make_pad_embeddings(model, params, tok.eos_id, length=T)
    (a,) = inverse_face_prompt_embs(
        model, params, core_in, jnp.asarray(ids), pad, ("full",),
        hidden_state_layer_weights=jnp.asarray([[1.0], [2.0], [4.0]]))
    (b,) = inverse_face_prompt_embs(
        model, params, core_in, jnp.asarray(ids), pad, ("full",),
        hidden_state_layer_weights=jnp.asarray([[4.0], [2.0], [1.0]]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_mkv_extension_noiseless_is_identity(enc):
    """Duplicated K/V copies without noise leave attention exactly invariant
    (softmax over m identical keys = original probabilities) — the invariant
    behind the reference's extension-then-perturb scheme
    (`arc2face_models.py:47-87`)."""
    model, params = enc
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 500, (2, T)),
                      jnp.int32)
    base = model.apply({"params": params}, ids)
    new_params, new_cfg = extend_clip_mkv_params(
        params, model.cfg, jax.random.PRNGKey(0), multiplier=2, noise_std=0.0)
    model2 = CLIPTextEncoder(new_cfg)
    ext = model2.apply({"params": new_params}, ids)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(base), atol=2e-5)


def test_mkv_extension_with_noise_differs(enc):
    model, params = enc
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 500, (1, T)),
                      jnp.int32)
    base = model.apply({"params": params}, ids)
    new_params, new_cfg = extend_clip_mkv_params(
        params, model.cfg, jax.random.PRNGKey(1), multiplier=2, noise_std=0.5)
    ext = CLIPTextEncoder(new_cfg).apply({"params": new_params}, ids)
    assert np.abs(np.asarray(ext) - np.asarray(base)).max() > 1e-4


def test_mkv_partial_range(enc):
    model, params = enc
    new_params, new_cfg = extend_clip_mkv_params(
        params, model.cfg, jax.random.PRNGKey(2), multiplier=3,
        noise_std=0.1, begin_layer_idx=1, end_layer_idx=2)
    assert new_cfg.kv_multipliers == (1, 3, 1)
    assert new_params["layers_1"]["self_attn"]["k_proj"]["kernel"].shape == (D, 3 * D)
    assert new_params["layers_0"]["self_attn"]["k_proj"]["kernel"].shape == (D, D)
