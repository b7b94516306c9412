"""Zero-shot checkpoint interop: reference SubjBasisGenerator -> flax.

Two layers of testing:
1. Format tests on synthetic state dicts (fast, torch-free): key mapping,
   MKV-multiplier inference, export round-trip.
2. Oracle round-trip (VERDICT item 4's done-criterion): construct the REAL
   reference `SubjBasisGenerator` (torch, random weights, from_pretrained
   patched to avoid network), `torch.save` it in the reference's
   `embeddings.pt` layout, import through `EmbeddingManager
   .load_reference_checkpoint`, and assert identical generated embeddings.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.interop.subj_basis import (
    build_generator_from_meta,
    export_subj_basis_generator,
    map_subj_basis_generator,
)

D = 768  # the reference hard-wires output_dim == prompt2token_proj hidden
VOCAB = 1000
PAD_ID = 999
N_LAYERS = 2
HEADS = 12
INTER = 256


def synth_fg_flat(num_layers=N_LAYERS, hidden=D, kv_mult=1, seed=0):
    """Torch-style state dict of a fg SubjBasisGenerator (numpy)."""
    rng = np.random.RandomState(seed)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.02
    flat = {
        "pos_embs": r(1, 16, hidden),
        "pos_embs_ln.weight": r(hidden) + 1, "pos_embs_ln.bias": r(hidden),
        "obj_proj_in.0.weight": r(16 * hidden, 384),
        "obj_proj_in.2.weight": r(hidden) + 1, "obj_proj_in.2.bias": r(hidden),
        "hidden_state_layer_weights": np.array([[1.0], [2.0], [4.0]], np.float32),
    }
    p = "prompt2token_proj.text_model."
    flat[p + "embeddings.token_embedding.weight"] = r(VOCAB, hidden)
    flat[p + "embeddings.position_embedding.weight"] = r(77, hidden)
    flat[p + "final_layer_norm.weight"] = r(hidden) + 1
    flat[p + "final_layer_norm.bias"] = r(hidden)
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}."
        for nm in ("q_proj", "out_proj"):
            flat[lp + f"self_attn.{nm}.weight"] = r(hidden, hidden)
            flat[lp + f"self_attn.{nm}.bias"] = r(hidden)
        for nm in ("k_proj", "v_proj"):
            flat[lp + f"self_attn.{nm}.weight"] = r(hidden * kv_mult, hidden)
            flat[lp + f"self_attn.{nm}.bias"] = r(hidden * kv_mult)
        flat[lp + "mlp.fc1.weight"] = r(INTER, hidden)
        flat[lp + "mlp.fc1.bias"] = r(INTER)
        flat[lp + "mlp.fc2.weight"] = r(hidden, INTER)
        flat[lp + "mlp.fc2.bias"] = r(hidden)
        for nm in ("layer_norm1", "layer_norm2"):
            flat[lp + nm + ".weight"] = r(hidden) + 1
            flat[lp + nm + ".bias"] = r(hidden)
    return flat


def synth_bg_flat(hidden=64, img_dim=48, n_latents=8, seed=1):
    rng = np.random.RandomState(seed)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.02
    flat = {
        "pos_embs": r(1, 9, hidden),
        "pos_embs_ln.weight": r(hidden) + 1, "pos_embs_ln.bias": r(hidden),
        "bg_proj_in.0.weight": r(hidden, img_dim),
        "bg_proj_in.1.weight": r(hidden) + 1, "bg_proj_in.1.bias": r(hidden),
        "latent_queries": r(1, n_latents, hidden),
        "latent_queries_ln.weight": r(hidden) + 1,
        "latent_queries_ln.bias": r(hidden),
    }
    for nm in ("to_q", "to_k", "to_v"):
        flat[f"prompt_translator.{nm}.0.weight"] = r(hidden, hidden)
        flat[f"prompt_translator.{nm}.1.weight"] = r(hidden) + 1
        flat[f"prompt_translator.{nm}.1.bias"] = r(hidden)
    return flat


def test_fg_map_and_export_roundtrip():
    flat = synth_fg_flat()
    params, meta = map_subj_basis_generator(flat)
    assert not meta.placeholder_is_bg
    assert meta.kv_multipliers is None
    assert meta.num_proj_layers == N_LAYERS
    out = export_subj_basis_generator(params, placeholder_is_bg=False)
    assert set(out) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(out[k], flat[k], err_msg=k)


def test_fg_mkv_multiplier_inference():
    flat = synth_fg_flat(kv_mult=2)
    params, meta = map_subj_basis_generator(flat)
    assert meta.kv_multipliers == (2,) * N_LAYERS
    k = params["prompt2token_proj"]["layers_0"]["self_attn"]["k_proj"]["kernel"]
    assert k.shape == (D, D * 2)


def test_bg_map_and_export_roundtrip():
    flat = synth_bg_flat()
    params, meta = map_subj_basis_generator(flat)
    assert meta.placeholder_is_bg
    assert meta.image_embedding_dim == 48
    assert meta.bg_num_id_vecs == 9
    out = export_subj_basis_generator(params, placeholder_is_bg=True)
    assert set(out) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(out[k], flat[k], err_msg=k)


def test_bg_mapped_generator_runs():
    flat = synth_bg_flat(hidden=64, img_dim=48, n_latents=8)
    params, meta = map_subj_basis_generator(flat)
    meta.num_out_layers = 4  # 8 latents = 4 layers x 2
    meta.num_out_embs_per_layer = 2
    meta.num_heads = 8
    gen = build_generator_from_meta(meta)
    p = jax.tree_util.tree_map(jnp.asarray, params)
    out, inv = gen.apply({"params": p}, jnp.ones((2, 9, 48)), None, None)
    assert out.shape == (2, 4, 2, 64)
    assert inv is None
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------- oracle

def _patch_transformers_pretrained(monkeypatch):
    """Make HF from_pretrained constructors work offline with a small
    random config, and the module-level tokenizer deterministic."""
    import torch
    import transformers

    cfg = transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=D, num_hidden_layers=N_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=77)

    ids_row = [49406 % VOCAB, 2, 3, 4] + [5] * 16 + [6] + [PAD_ID] * (77 - 21)

    class FakeTok:
        pad_token_id = PAD_ID

        def __call__(self, prompts, **kw):
            out = types.SimpleNamespace()
            out.input_ids = torch.tensor([ids_row] * len(prompts))
            return out

    monkeypatch.setattr(
        transformers.CLIPTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTok()))
    monkeypatch.setattr(
        transformers.CLIPTextModel, "from_pretrained",
        classmethod(lambda cls, *a, **k: cls(cfg)))
    return cfg, np.array([ids_row], np.int64)


def _import_ref_sbg(monkeypatch):
    """Import the reference subj_basis_generator module with offline
    from_pretrained + deterministic tokenizer patches active."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import import_reference_module, reference_available

    if not reference_available():
        pytest.skip("reference tree unavailable")
    cfg, template_ids = _patch_transformers_pretrained(monkeypatch)
    import transformers

    arc2face_models = import_reference_module("ldm.modules.arc2face_models")
    monkeypatch.setattr(
        arc2face_models.CLIPTextModelWrapper, "from_pretrained",
        classmethod(lambda cls, *a, **k: cls(cfg)))
    # the reference targets transformers 4.34; >=4.5x CLIPEncoder.forward
    # dropped `return_dict` (it always returns a ModelOutput, which still
    # supports the tuple indexing the reference uses)
    from transformers.models.clip import modeling_clip as _mc
    import inspect as _inspect

    if "return_dict" not in _inspect.signature(_mc.CLIPEncoder.forward).parameters:
        _orig_fwd = _mc.CLIPEncoder.forward

        def _fwd(self, *a, return_dict=None, **k):
            return _orig_fwd(self, *a, **k)

        monkeypatch.setattr(_mc.CLIPEncoder, "forward", _fwd)
    # reference_oracle pre-stubs subj_basis_generator (it downloads a CLIP
    # tokenizer at import time); our from_pretrained patches make the real
    # module importable, so replace the stub
    mod = sys.modules.get("ldm.modules.subj_basis_generator")
    if mod is not None and not hasattr(mod, "clip_tokenizer"):
        del sys.modules["ldm.modules.subj_basis_generator"]
    ref_sbg = import_reference_module("ldm.modules.subj_basis_generator")
    monkeypatch.setattr(ref_sbg, "clip_tokenizer",
                        transformers.CLIPTokenizer.from_pretrained("x"))
    monkeypatch.setattr(
        ref_sbg.CLIPTextModelWrapper, "from_pretrained",
        classmethod(lambda cls, *a, **k: cls(cfg)), raising=False)
    return ref_sbg, cfg, template_ids


@pytest.mark.slow
def test_oracle_roundtrip_identical_embeddings(tmp_path, monkeypatch):
    """reference-format ckpt -> native import -> identical embeddings
    (VERDICT round-2 item 4)."""
    torch = pytest.importorskip("torch")
    ref_sbg, cfg, template_ids = _import_ref_sbg(monkeypatch)

    torch.manual_seed(0)
    ref_gen = ref_sbg.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16, output_dim=D)
    ref_gen.eval()

    # reference forward
    B = 2
    arc_embs_t = torch.randn(B, 16, D) * 0.05
    with torch.no_grad():
        ref_out, ref_inv = ref_gen(
            clip_features=torch.zeros(B, 1, 1), raw_id_embs=None,
            arc2face_id_embs=arc_embs_t, out_id_embs_scale=0.9,
            is_face=True, is_training=True)

    # save in the reference's embeddings.pt layout
    ckpt_path = tmp_path / "embeddings_gs-1.pt"
    torch.save({
        "string_to_token": {"z": torch.tensor(49408)},
        "string_to_static_embedder": torch.nn.ParameterDict(),
        "string_to_subj_basis_generator_dict": torch.nn.ModuleDict(
            {"z": ref_gen}),
        "token2num_vectors": {"z": 16},
        "placeholder_strings": ["z"],
        "subject_strings": ["z"],
        "background_strings": [],
        "do_zero_shot": True,
    }, str(ckpt_path))

    # native import
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    mgr = EmbeddingManager()
    mgr.load_reference_checkpoint(str(ckpt_path))
    assert "z" in mgr.subj_basis_generators
    gen, params = mgr.subj_basis_generators["z"]
    assert gen.proj_cfg.hidden_size == D
    assert gen.proj_cfg.num_layers == N_LAYERS
    assert gen.proj_cfg.num_heads == HEADS
    assert gen.proj_cfg.intermediate_size == INTER

    out, inv = gen.apply(
        {"params": params}, None, None,
        jnp.asarray(arc_embs_t.numpy()), out_id_embs_scale=0.9,
        is_face=True, is_training=True,
        inverse_template_ids=jnp.asarray(template_ids.astype(np.int32)))

    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(inv), ref_inv.numpy(),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_oracle_mkv_extended_roundtrip(tmp_path, monkeypatch):
    """Checkpoint saved AFTER the reference's attention-extension surgery
    (`extend_prompt2token_proj_attention`) imports with inferred
    kv_multipliers and matches numerically."""
    torch = pytest.importorskip("torch")
    ref_sbg, cfg, template_ids = _import_ref_sbg(monkeypatch)

    torch.manual_seed(1)
    ref_gen = ref_sbg.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16, output_dim=D)
    # noise_std=0 so the extension is exactly weight-tiling
    ref_gen.extend_prompt2token_proj_attention(-1, -1, multiplier=2,
                                               noise_std=0)
    ref_gen.eval()

    B = 1
    arc_embs_t = torch.randn(B, 16, D) * 0.05
    with torch.no_grad():
        ref_out, _ = ref_gen(
            clip_features=torch.zeros(B, 1, 1), raw_id_embs=None,
            arc2face_id_embs=arc_embs_t, out_id_embs_scale=1.0,
            is_face=True, is_training=True)

    ckpt_path = tmp_path / "embeddings_gs-2.pt"
    torch.save({
        "string_to_token": {"z": torch.tensor(49408)},
        "string_to_static_embedder": torch.nn.ParameterDict(),
        "string_to_subj_basis_generator_dict": torch.nn.ModuleDict(
            {"z": ref_gen}),
        "token2num_vectors": {"z": 16},
        "placeholder_strings": ["z"], "subject_strings": ["z"],
        "background_strings": [], "do_zero_shot": True,
    }, str(ckpt_path))

    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    mgr = EmbeddingManager()
    mgr.load_reference_checkpoint(str(ckpt_path))
    gen, params = mgr.subj_basis_generators["z"]
    assert gen.proj_cfg.kv_multipliers == (2,) * N_LAYERS

    out, _ = gen.apply(
        {"params": params}, None, None, jnp.asarray(arc_embs_t.numpy()),
        out_id_embs_scale=1.0, is_face=True, is_training=True,
        inverse_template_ids=jnp.asarray(template_ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=2e-5, rtol=2e-4)
