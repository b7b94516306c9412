"""SubjBasisGenerator: shapes, pad blending, bg branch, grad scaling.

Behavioral contracts of `ldm/modules/subj_basis_generator.py:369-622`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig
from adaface_tpu.personalization.arc2face import INVERSE_TEMPLATE, CORE_BEGIN
from adaface_tpu.personalization.subj_basis_generator import (
    PerceiverCrossAttention,
    SubjBasisGenerator,
)

T, D = 32, 64
L, K_BG = 4, 2


@pytest.fixture(scope="module")
def tok():
    t = HashTokenizer()
    t.max_length = T
    return t


@pytest.fixture(scope="module")
def subj_gen(tok):
    cfg = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=3,
                              max_position_embeddings=T)
    gen = SubjBasisGenerator(placeholder_is_bg=False, num_out_layers=L,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=cfg, pad_token_id=tok.eos_id)
    ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=T))
    arc_embs = jnp.asarray(np.random.default_rng(0)
                           .standard_normal((2, 16, D)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), None, None, arc_embs,
                      inverse_template_ids=ids)["params"]
    return gen, params, ids, arc_embs


def test_subject_branch_shapes(subj_gen):
    gen, params, ids, arc_embs = subj_gen
    out, inv = gen.apply({"params": params}, None, None, arc_embs,
                         out_id_embs_scale=1.0, is_face=True,
                         is_training=True, inverse_template_ids=ids)
    assert out.shape == (2, L, 16, D)
    assert inv.shape == (2, T, D)
    # all layers share the same core embeddings (subject branch broadcasts)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(out[:, 1]))


def test_pad_blend_at_zero_scale(subj_gen, tok):
    """out_id_embs_scale=0 -> output is exactly the pad-embedding rows
    (`subj_basis_generator.py:552-556`)."""
    gen, params, ids, arc_embs = subj_gen
    out, _ = gen.apply({"params": params}, None, None, arc_embs,
                       out_id_embs_scale=0.0, is_face=True,
                       inverse_template_ids=ids)
    # independent of the identity
    out2, _ = gen.apply({"params": params}, None, None, arc_embs * 3,
                        out_id_embs_scale=0.0, is_face=True,
                        inverse_template_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_inf_emb_type_switch(subj_gen):
    gen, params, ids, arc_embs = subj_gen
    _, inv_train = gen.apply({"params": params}, None, None, arc_embs,
                             is_face=True, is_training=True,
                             inverse_template_ids=ids)
    _, inv_inf = gen.apply({"params": params}, None, None, arc_embs,
                           is_face=True, is_training=False,
                           inverse_template_ids=ids)
    # training uses full_pad, inference full_half_pad -> tail rows differ
    assert np.abs(np.asarray(inv_train)[:, -2] - np.asarray(inv_inf)[:, -2]).max() > 0


def test_object_branch(tok):
    cfg = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=2,
                              max_position_embeddings=T)
    gen = SubjBasisGenerator(placeholder_is_bg=False, num_out_layers=L,
                             num_out_embs_per_layer=16, output_dim=D,
                             dino_embedding_dim=48, proj_cfg=cfg,
                             pad_token_id=tok.eos_id)
    dino = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((3, 48)).astype(np.float32))
    ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=T))
    params = gen.init(jax.random.PRNGKey(1), None, dino, None, is_face=False,
                      inverse_template_ids=ids)["params"]
    out, inv = gen.apply({"params": params}, None, dino, None, is_face=False,
                         inverse_template_ids=ids)
    assert out.shape == (3, L, 16, D)
    assert inv is None


def test_bg_branch_shapes():
    gen = SubjBasisGenerator(placeholder_is_bg=True, num_out_layers=L,
                             num_out_embs_per_layer=K_BG, output_dim=D,
                             image_embedding_dim=80, num_heads=4)
    clip_feats = jnp.asarray(np.random.default_rng(2)
                             .standard_normal((2, 257, 80)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(2), clip_feats, None, None)["params"]
    out, inv = gen.apply({"params": params}, clip_feats, None, None)
    assert out.shape == (2, L, K_BG, D)
    assert inv is None
    # no text encoder in the bg generator
    assert "prompt2token_proj" not in params


def test_grad_scaling_applied(subj_gen):
    """prompt2token_proj gradients are scaled 0.4 relative to a scale-1.0
    generator (`subj_basis_generator.py:414-417,530-533`)."""
    gen, params, ids, arc_embs = subj_gen
    gen_noscale = SubjBasisGenerator(
        placeholder_is_bg=False, num_out_layers=L, num_out_embs_per_layer=16,
        output_dim=D, proj_cfg=gen.proj_cfg, pad_token_id=gen.pad_token_id,
        prompt2token_proj_grad_scale=1.0, hidden_state_weights_grad_scale=1.0)

    def loss(p, g):
        out, _ = g.apply({"params": p}, None, None, arc_embs,
                         is_face=True, inverse_template_ids=ids)
        return jnp.sum(out ** 2)

    g_scaled = jax.grad(loss)(params, gen)
    g_plain = jax.grad(loss)(params, gen_noscale)
    # fp32 grads here are tiny and cancellation-heavy; compare norm ratios
    k = np.linalg.norm(np.asarray(
        g_scaled["prompt2token_proj"]["layers_0"]["self_attn"]["out_proj"]["kernel"]))
    k0 = np.linalg.norm(np.asarray(
        g_plain["prompt2token_proj"]["layers_0"]["self_attn"]["out_proj"]["kernel"]))
    np.testing.assert_allclose(k / k0, 0.4, rtol=0.15)
    w = np.linalg.norm(np.asarray(g_scaled["hidden_state_layer_weights"]))
    w0 = np.linalg.norm(np.asarray(g_plain["hidden_state_layer_weights"]))
    # hslw grad: scaled by 5 (outer) * 0.4 (core_id path) vs 1 * 1
    np.testing.assert_allclose(w / w0, 2.0, rtol=0.05)


def test_perceiver_cross_attention_shapes():
    pca = PerceiverCrossAttention(dim=D, num_heads=4)
    x = jnp.zeros((2, 8, D))
    ctx = jnp.asarray(np.random.default_rng(3)
                      .standard_normal((2, 17, D)).astype(np.float32))
    params = pca.init(jax.random.PRNGKey(3), x, ctx)["params"]
    out = pca.apply({"params": params}, x, ctx)
    assert out.shape == (2, 8, D)
    # identity_to_out: no to_out projection params
    assert "to_out" not in params
