"""Personalization core: static embedder parity vs the reference torch
module, slot-map patching semantics, and reference-checkpoint import."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaface_tpu.personalization.static_embedding import (
    init_static_embedder, compute_static_embedding, StaticEmbedderParams,
)
from adaface_tpu.personalization.embedding_manager import EmbeddingManager, NUM_CA_LAYERS
from tests.reference_oracle import reference_available, import_reference_module


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
def test_static_embedder_parity_vs_reference():
    m = import_reference_module("ldm.modules.embedding_manager")
    torch.manual_seed(0)
    init_vecs = torch.randn(2, 768)
    ref = m.StaticLayerwiseEmbedding(
        num_layers=16, num_vectors_per_subj_token=3, out_emb_dim=768, r=6,
        init_vecs=init_vecs, token_string="z", device_type="cpu")
    with torch.no_grad():
        # randomize bias so the bias path is covered
        ref.bias.data = torch.randn_like(ref.bias) * 0.02
        want = ref(None).numpy()
    params = StaticEmbedderParams(
        basis_rand_weights=jnp.asarray(ref.basis_rand_weights.detach().numpy()),
        basis_comm_weights=jnp.asarray(ref.basis_comm_weights.detach().numpy()),
        basis_vecs=jnp.asarray(ref.basis_vecs.detach().numpy()),
        pre_vecs=jnp.asarray(ref.pre_vecs.detach().numpy()),
        bias=jnp.asarray(ref.bias.detach().numpy()),
    )
    got = compute_static_embedding(params)
    assert got.shape == (16, 3, 768)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_init_static_embedder_structure():
    init_vecs = np.random.default_rng(0).standard_normal((2, 768)).astype(np.float32)
    p = init_static_embedder(jax.random.PRNGKey(0), num_vectors=2, rank=6,
                             init_vecs=init_vecs)
    assert p.pre_vecs.shape == (2, 2, 768)
    assert p.basis_vecs.shape == (2, 4, 768)
    # comm weights: first N = 1/N, rest 1/N * 0.4
    np.testing.assert_allclose(np.asarray(p.basis_comm_weights[0, 0, :2]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.basis_comm_weights[0, 0, 2:]), 0.2, atol=1e-6)
    # last random basis vector zeroed
    np.testing.assert_allclose(np.asarray(p.basis_vecs[-1]), 0.0, atol=1e-7)
    emb = compute_static_embedding(p)
    assert emb.shape == (16, 2, 768)


def _manager_with(z_k=2, y_k=1):
    mgr = EmbeddingManager()
    mgr.add_placeholder("z", token_id=1000, num_vectors=z_k,
                        init_key=jax.random.PRNGKey(1))
    mgr.add_placeholder("y", token_id=1001, num_vectors=y_k, is_background=True,
                        init_key=jax.random.PRNGKey(2))
    return mgr


def test_slot_maps_multivector_and_first_occurrence_only():
    mgr = _manager_with(z_k=3)
    ids = np.array([
        [5, 1000, 7, 7, 9, 1000, 0, 0],  # z at 1, again at 5 (ignored)
        [5, 6, 7, 1001, 9, 0, 0, 0],     # y at 3
    ])
    maps = mgr.build_slot_maps(ids)
    z = maps["z"]
    assert list(z[0]) == [-1, 0, 1, 2, -1, -1, -1, -1]  # K=3 consecutive slots
    assert list(z[1]) == [-1] * 8
    y = maps["y"]
    assert list(y[1]) == [-1, -1, -1, 0, -1, -1, -1, -1]


def test_patch_prompt_embeddings_values():
    mgr = _manager_with(z_k=2)
    B, T, D = 2, 8, 768
    ids = np.array([[5, 1000, 7, 7, 9, 2, 0, 0],
                    [5, 6, 7, 1001, 9, 0, 0, 0]])
    maps = mgr.build_slot_maps(ids)
    embedded = jnp.zeros((B, T, D))
    subj = mgr.compute_subject_embeddings()
    out = EmbeddingManager.patch_prompt_embeddings(embedded, maps, subj)
    assert out.shape == (NUM_CA_LAYERS, B, T, D)
    z_emb = np.asarray(subj["z"])  # [16, 2, 768]
    np.testing.assert_allclose(np.asarray(out[:, 0, 1]), z_emb[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 0, 2]), z_emb[:, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]), 0.0, atol=1e-7)  # untouched
    y_emb = np.asarray(subj["y"])
    np.testing.assert_allclose(np.asarray(out[:, 1, 3]), y_emb[:, 0], atol=1e-6)


def test_native_checkpoint_roundtrip(tmp_path):
    mgr = _manager_with()
    path = str(tmp_path / "emb.npz")
    mgr.save_native(path)
    mgr2 = EmbeddingManager.load_native(path)
    assert set(mgr2.placeholders) == {"z", "y"}
    assert mgr2.placeholders["z"].num_vectors == 2
    a = compute_static_embedding(mgr.embedders["z"])
    b = compute_static_embedding(mgr2.embedders["z"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_save_native_skips_generator_backed_placeholders(tmp_path):
    """save_native must not KeyError on zero-shot (generator-backed)
    placeholders, which have no static embedder — regression. The static
    placeholders still round-trip; num_vectors is derived from the
    generator's K and a mismatch is rejected (a larger value would make
    the clipping gather silently duplicate the last embedding)."""
    import dataclasses as _dc

    class FakeGen:  # only the field add_zero_shot_placeholder reads
        num_out_embs_per_layer = 4

    mgr = _manager_with()
    mgr.add_zero_shot_placeholder("w", token_id=49999, generator=FakeGen(),
                                  generator_params={}, is_background=True)
    assert mgr.placeholders["w"].num_vectors == 4  # derived from the gen
    with pytest.raises(ValueError, match="num_out_embs_per_layer"):
        mgr.add_zero_shot_placeholder("v", token_id=50000,
                                      generator=FakeGen(),
                                      generator_params={}, num_vectors=16)
    path = str(tmp_path / "emb.npz")
    mgr.save_native(path)  # used to KeyError: 'w'
    mgr2 = EmbeddingManager.load_native(path)
    assert set(mgr2.placeholders) == {"z", "y"}  # statics survive


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
def test_reference_checkpoint_import(tmp_path):
    """Save a real reference EmbeddingManager-style ckpt with torch, read it
    back through the restricted unpickler, and match embeddings."""
    m = import_reference_module("ldm.modules.embedding_manager")
    torch.manual_seed(0)
    emb_z = m.StaticLayerwiseEmbedding(num_layers=16, num_vectors_per_subj_token=9,
                                       out_emb_dim=768, r=5, token_string="z",
                                       device_type="cpu")
    emb_y = m.StaticLayerwiseEmbedding(num_layers=16, num_vectors_per_subj_token=4,
                                       out_emb_dim=768, r=5, token_string="y",
                                       device_type="cpu")
    with torch.no_grad():
        emb_z.bias.data = torch.randn_like(emb_z.bias) * 0.05
        want_z = emb_z(None).numpy()
        want_y = emb_y(None).numpy()
    path = str(tmp_path / "embeddings_gs-100.pt")
    torch.save({
        "string_to_token": {"z": torch.tensor(49408), "y": torch.tensor(49409)},
        "string_to_static_embedder": torch.nn.ModuleDict({"z": emb_z, "y": emb_y}),
        "string_to_subj_basis_generator_dict": {},
        "token2num_vectors": {"z": 9, "y": 4},
        "emb_global_scale_scores": torch.zeros(2),
        "use_conv_attn_kernel_size": None,
        "placeholder_strings": ["z", "y"],
        "subject_strings": ["z"],
        "background_strings": ["y"],
        "ca_q_bns": None, "ca_outfeat_lns": None, "do_zero_shot": False,
    }, path)

    mgr = EmbeddingManager()
    mgr.load_reference_checkpoint(path)
    assert mgr.placeholders["z"].num_vectors == 9
    assert mgr.placeholders["y"].num_vectors == 4
    assert mgr.placeholders["y"].is_background
    got = mgr.compute_subject_embeddings()
    np.testing.assert_allclose(np.asarray(got["z"]), want_z, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["y"]), want_y, atol=2e-5)

    # placeholder remap, the analog of `ckpt:z-z2` syntax
    mgr2 = EmbeddingManager()
    mgr2.load_reference_checkpoint(path, placeholder_remap={"z": "z2"})
    assert "z2" in mgr2.placeholders and "y" in mgr2.placeholders


def test_distribute_cls_embeddings():
    """`distribute_embedding_to_M_tokens` analog (`ldm/util.py:883-919`):
    at the K subject-aligned positions of a class prompt, every slot takes
    the FIRST slot's embedding / sqrt(K); K=1 and absent instances pass
    through untouched."""
    import jax.numpy as jnp

    L, B, T, D = 2, 3, 6, 4
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
    sm = -np.ones((B, T), np.int32)
    sm[0, 2], sm[0, 3], sm[0, 4] = 0, 1, 2  # K=3 at positions 2..4
    sm[1, 1] = 0                            # K=1 -> untouched
    # instance 2: placeholder absent -> untouched
    out = np.asarray(EmbeddingManager.distribute_cls_embeddings(ctx, sm))
    ref = np.asarray(ctx).copy()
    ref[:, 0, 2:5] = ref[:, 0, 2:3] / np.sqrt(3.0)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # gradient flows (the cls side feeds the mixing teacher contexts)
    import jax

    g = jax.grad(lambda c: jnp.sum(
        EmbeddingManager.distribute_cls_embeddings(c, sm) ** 2))(ctx)
    assert np.isfinite(np.asarray(g)).all()
